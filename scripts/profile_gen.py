"""Generator-inference attribution profile (run on the real chip).

Times the bench.py headline path and ablated variants to attribute
milliseconds to: spacer+insert_spaces, noise-injection RNG (threefry vs the
TPU hardware ``rbg`` generator), the depthwise blur passes, and the styled
conv trunk itself.  Ablations change semantics — they exist ONLY to locate
the time; the shipped model is unchanged.

Usage: python scripts/profile_gen.py [--batch 512] [--iters 12]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def scan_ms(fn, iters=20, warm=4, key=None):
    """Per-iteration milliseconds via the scan-delta method.

    ``fn(key) -> array``.  The dev-env relay executes lazily and drops
    dispatches whose outputs are never consumed, so repeat-and-block-once
    loops only run their final iteration; a dependency-chained scan timed
    at two iteration counts (value-fetched) is the reliable barrier.
    """
    import jax
    import jax.numpy as jnp

    def run_n(n):
        @jax.jit
        def run(key):
            def body(c, i):
                k = jax.random.fold_in(key, i)
                out = fn(k)
                return c + jnp.float32(jnp.mean(out)), None
            r, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
            return r
        k0 = key if key is not None else jax.random.PRNGKey(0)
        float(run(k0))                        # compile + warm
        t0 = time.perf_counter()
        float(run(k0))
        return time.perf_counter() - t0

    return 1e3 * (run_n(iters) - run_n(warm)) / (iters - warm)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from handwriting_line_generation_tpu.charset import IAM_CHARSET
    from handwriting_line_generation_tpu.config import (
        Config, DiscriminatorConfig, GeneratorConfig, HWRConfig, ModelConfig,
        SpacerConfig, StyleConfig)
    from handwriting_line_generation_tpu.inference.generate import (
        GenerationSession, cast_params_bf16)
    from handwriting_line_generation_tpu.models.hw_with_style import HWWithStyle
    from handwriting_line_generation_tpu.ops.spacing import insert_spaces, onehot

    mc = ModelConfig(
        num_class=80,
        style=StyleConfig(style_dim=128, dim=64, char_dim=128, window=2),
        generator=GeneratorConfig(dim=256, append_style=True),
        discriminator=DiscriminatorConfig(enabled=False),
        spacer=SpacerConfig(dim=128, count_duplicates=True),
        hwr=HWRConfig(kind="none"),
        compute_dtype="bfloat16",
    )
    model = HWWithStyle(mc)
    text = "The quick brown fox jumps over dogs"
    label = jnp.asarray(IAM_CHARSET.encode(text))
    B = args.batch
    labels = jnp.tile(label[None], (B, 1))
    lens = jnp.full((B,), label.shape[0], jnp.int32)
    spaced_len = 192
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda r, l, ln, s: model.init(
            {"params": r, "noise": r}, l, ln, s, r,
            spaced_len=spaced_len, method="generate")
    )(rng, labels, lens, jnp.zeros((B, 128)))
    params = cast_params_bf16(variables["params"])
    styles = jax.random.normal(jax.random.PRNGKey(1), (B, 128),
                               ).astype(jnp.bfloat16)

    report = {"batch": B, "spaced_len": spaced_len,
              "device": str(jax.devices()[0])}

    # 1. full headline path (spacer -> insert_spaces -> generator)
    session = GenerationSession(model, params, IAM_CHARSET)
    full = session._gen_fn(spaced_len)
    report["full_ms"] = scan_ms(
        lambda k: full(params, labels, lens, styles, k, k)[0],
        iters=args.iters)

    # 2. generator alone on a precomputed spaced input
    counts = model.apply({"params": params}, onehot(labels, mc.num_class),
                         styles, method=lambda m, oh, s: m.spacer(oh, s))
    spaced, _ = insert_spaces(labels, lens, counts, rng, max_len=spaced_len,
                              count_std=0.0, dup_std=0.0,
                              count_duplicates=True)
    spaced = jax.block_until_ready(spaced)

    gen_only = jax.jit(lambda p, sp, st, k: model.apply(
        {"params": p}, sp, st, method="generate_spaced", rngs={"noise": k}))
    report["generator_ms"] = scan_ms(
        lambda k: gen_only(params, spaced, styles, k), iters=args.iters)
    report["spacer_scatter_ms"] = report["full_ms"] - report["generator_ms"]

    # 3. RNG cost: same generator with the hardware rbg PRNG for noise
    rbg_key = jax.random.key(0, impl="rbg")
    report["generator_rbg_noise_ms"] = scan_ms(
        lambda k: gen_only(params, spaced, styles, k), iters=args.iters,
        key=rbg_key)

    # 4. raw threefry normal at the largest injected shapes, for scale
    noise_shapes = [(B, 4, 192), (B, 8, 192), (B, 16, 192),
                    (B, 32, 384), (B, 64, 768)]

    @jax.jit
    def draw_all(k):
        acc = 0.0
        for i, s in enumerate(noise_shapes):
            for j in range(2):
                acc += jnp.sum(jax.random.normal(
                    jax.random.fold_in(k, 2 * i + j), s + (1,), jnp.bfloat16))
        return acc

    report["noise_draws_threefry_ms"] = scan_ms(draw_all, iters=args.iters)
    report["noise_draws_rbg_ms"] = scan_ms(draw_all, iters=args.iters,
                                           key=rbg_key)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

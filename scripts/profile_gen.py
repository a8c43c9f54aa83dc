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


def timed(fn, *args, iters=12):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


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
    report["full_ms"] = 1e3 * timed(
        lambda: full(params, labels, lens, styles, rng, rng),
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
    report["generator_ms"] = 1e3 * timed(
        lambda: gen_only(params, spaced, styles, rng), iters=args.iters)
    report["spacer_scatter_ms"] = report["full_ms"] - report["generator_ms"]

    # 3. RNG cost: same generator with the hardware rbg PRNG for noise
    rbg_key = jax.random.key(0, impl="rbg")
    report["generator_rbg_noise_ms"] = 1e3 * timed(
        lambda: gen_only(params, spaced, styles, rbg_key), iters=args.iters)

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

    report["noise_draws_threefry_ms"] = 1e3 * timed(
        lambda: draw_all(rng), iters=args.iters)
    report["noise_draws_rbg_ms"] = 1e3 * timed(
        lambda: draw_all(rbg_key), iters=args.iters)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

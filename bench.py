#!/usr/bin/env python
"""Headline benchmark: generated handwriting lines/sec/chip.

Measures the BASELINE.md north-star metric — batched ``pure_gen`` inference
from pretrained-style vectors at paper scale (num_class 80, style_dim 128,
gen_dim 256, spacer on), text ~40 chars -> 64x768 px lines — on whatever
chip ``jax.devices()[0]`` is.  Prints ONE JSON line:
``{"metric", "value", "unit", "vs_baseline"}`` with ``vs_baseline``
relative to the 2,000 lines/sec/chip target (the reference publishes no
throughput numbers, SURVEY.md §6).
"""

import json
import sys
import time


def main():
    import jax
    from handwriting_line_generation_tpu.utils.compile_cache import (
        enable_compile_cache)
    enable_compile_cache()
    from handwriting_line_generation_tpu.utils.acquire import (
        ensure_device_or_reexec)
    ensure_device_or_reexec()
    import jax.numpy as jnp
    import numpy as np

    from handwriting_line_generation_tpu.charset import IAM_CHARSET
    from handwriting_line_generation_tpu.config import (
        Config, DiscriminatorConfig, GeneratorConfig, HWRConfig, ModelConfig,
        SpacerConfig, StyleConfig)
    from handwriting_line_generation_tpu.inference.generate import \
        GenerationSession
    from handwriting_line_generation_tpu.models.hw_with_style import \
        HWWithStyle

    # paper-scale generator path (configs/cf_IAMslant_...sMG.json model block)
    # compute_dtype bfloat16: true MXU-rate convs/matmuls (norm statistics,
    # spacing math and the tanh output stay float32)
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

    text = "The quick brown fox jumps over dogs"      # 35 chars
    label = jnp.asarray(IAM_CHARSET.encode(text))
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    labels = jnp.tile(label[None], (batch, 1))
    lens = jnp.full((batch,), label.shape[0], jnp.int32)
    spaced_len = 192                                   # -> 64 x 768 px lines

    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda r, l, ln, s: model.init(
            {"params": r, "noise": r}, l, ln, s, r,
            spaced_len=spaced_len, method="generate")
    )(rng, labels, lens, jnp.zeros((batch, 128)))
    params = variables["params"]

    # whole-network bfloat16 inference: ~1.6x over f32, ~0.016 mean abs
    # deviation in the tanh range (verified against f32 on-chip)
    from handwriting_line_generation_tpu.inference.generate import \
        cast_params_bf16
    params = cast_params_bf16(params)
    session = GenerationSession(model, params, IAM_CHARSET)
    fn = session._gen_fn(spaced_len)
    styles = jax.random.normal(jax.random.PRNGKey(1),
                               (batch, 128)).astype(jnp.bfloat16)

    from handwriting_line_generation_tpu.inference.generate import noise_key
    nkey = noise_key(0)        # TPU hardware RNG for the noise planes
    img, _ = fn(params, labels, lens, styles, rng, nkey)
    img.block_until_ready()

    # one device dispatch for all timed iterations: the dev-env TPU sits
    # behind an RPC tunnel whose per-launch latency would otherwise dominate;
    # production serving batches launches the same way
    iters = 20

    @jax.jit
    def scanned(params, labels, lens, styles, rng, nkey):
        def body(acc, i):
            k = jax.random.fold_in(rng, i)
            nk = jax.random.fold_in(nkey, i)
            im, _ = fn(params, labels, lens, styles, k, nk)
            return acc + jnp.mean(im), None
        out, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
        return out

    # device_get of the scalar (not block_until_ready): some transports
    # (the dev-env axon tunnel) resolve ready-state before execution
    # completes; fetching the value is the only portable completion barrier
    float(scanned(params, labels, lens, styles, rng, nkey))       # compile+warm
    t0 = time.perf_counter()
    float(scanned(params, labels, lens, styles, rng, nkey))
    dt = time.perf_counter() - t0

    lines_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "generated_lines_per_sec_per_chip",
        "value": round(lines_per_sec, 2),
        "unit": "lines/s",
        "vs_baseline": round(lines_per_sec / 2000.0, 3),
    }))


if __name__ == "__main__":
    main()

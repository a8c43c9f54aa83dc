"""Per-block timing of the generator trunk at bench shapes (real chip).

Times each StyledConvBlock standalone at the exact shape it sees in the
bench.py headline path (batch 512, spaced_len 192 -> 64x768 output), plus
the final EqualConv+tanh, to attribute the trunk milliseconds.

Timing method: the dev-env axon tunnel resolves ``block_until_ready``
before execution completes, so per-dispatch timing is meaningless.  Each
case runs inside a dependency-chained ``lax.scan`` at two iteration counts
and reports the per-iteration delta, with ``device_get`` of a scalar as the
completion barrier.

Usage: python scripts/profile_gen_blocks.py [--batch 512]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from handwriting_line_generation_tpu.models.generator import (
        StyledConvBlock)
    from handwriting_line_generation_tpu.models.layers import EqualConv

    B, T, S = args.batch, 192, 128
    dt = jnp.bfloat16

    cases = [
        ("blk0_init_H4_c256",
         StyledConvBlock(256, initial=True, dtype=dt), (B, 1, T, 80 + S)),
        ("blk1_up_v_H8_c128",
         StyledConvBlock(128, upsample=True, only_vertical=True, dtype=dt),
         (B, 4, T, 256)),
        ("blk2_up_v_H16_c64",
         StyledConvBlock(64, upsample=True, only_vertical=True, dtype=dt),
         (B, 8, T, 128)),
        ("blk3_fused_H32_c32",
         StyledConvBlock(32, upsample=True, fused=True, dtype=dt),
         (B, 16, T, 64)),
        ("blk4_fused_H64_c16",
         StyledConvBlock(16, upsample=True, fused=True, dtype=dt),
         (B, 32, 2 * T, 32)),
    ]

    rng = jax.random.PRNGKey(0)
    style = jax.random.normal(rng, (B, S)).astype(dt)

    def scan_time(apply_fn, x, n1, n2):
        """Per-iter seconds via two scanned runs (dependency-chained)."""
        def mk(iters):
            @jax.jit
            def run(x):
                def body(carry, i):
                    xx = (x + carry * 1e-20).astype(x.dtype)
                    out = apply_fn(xx)
                    return jnp.float32(jnp.mean(out)), None
                r, _ = jax.lax.scan(body, jnp.float32(0),
                                    jnp.arange(iters, dtype=jnp.float32))
                return r
            float(run(x))          # compile + warm
            t0 = time.perf_counter()
            float(run(x))
            return time.perf_counter() - t0
        return (mk(n2) - mk(n1)) / (n2 - n1)

    total = 0.0
    for name, blk, shape in cases:
        x = jax.random.normal(rng, shape).astype(dt)
        params = blk.init({"params": rng, "noise": rng}, x, style)
        fn = lambda xx, blk=blk, params=params: blk.apply(
            params, xx, style, rngs={"noise": rng})
        ms = scan_time(fn, x, 4, args.iters) * 1e3
        total += ms
        in_b = np.prod(shape) * 2
        print(f"{name:24s} {ms:8.2f} ms   in={in_b/1e6:7.1f} MB", flush=True)

    x = jax.random.normal(rng, (B, 64, 4 * T, 16)).astype(dt)
    eq = EqualConv(1, kernel=(1, 1))
    p = eq.init(rng, x)
    fn = lambda xx: jnp.tanh(eq.apply(p, xx).astype(jnp.float32))
    ms = scan_time(fn, x, 4, args.iters) * 1e3
    total += ms
    print(f"{'equal_conv_tanh':24s} {ms:8.2f} ms")
    print(f"{'TOTAL (isolated)':24s} {total:8.2f} ms")


if __name__ == "__main__":
    main()

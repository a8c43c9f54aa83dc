"""On-chip A/B of the two parity-tested generator variants.

Both variants are exact (parity-tested on CPU) and share the sequential
path's param tree, so one init serves all four flag combinations:

- ``phase_upsample``: dense phase-decomposed upsample convs — a single
  2x2-kernel VALID conv over the padded source replaces the 3/4-zeros
  dilated conv-transpose in the fused blocks, and a [2,3] kernel replaces
  the nearest+3x3 pair in the vertical-only blocks.
- ``fused_epilogue``: Pallas one-pass [blur]+noise+lrelu+AdaIN per
  half-block (whole per-sample extent in VMEM).

Times the full bench.py headline path (spacer -> insert_spaces ->
generator, batch 512, spaced_len 192) with the scan-delta method.

Usage: python scripts/ab_gen_variants.py [--batch 512] [--iters 20]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

from profile_gen import scan_ms  # noqa: E402  (sibling script)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from handwriting_line_generation_tpu.charset import IAM_CHARSET
    from handwriting_line_generation_tpu.config import (
        DiscriminatorConfig, GeneratorConfig, HWRConfig, ModelConfig,
        SpacerConfig, StyleConfig)
    from handwriting_line_generation_tpu.inference.generate import (
        GenerationSession, cast_params_bf16, noise_key)
    from handwriting_line_generation_tpu.models.hw_with_style import \
        HWWithStyle

    def make_model(phase, fused):
        mc = ModelConfig(
            num_class=80,
            style=StyleConfig(style_dim=128, dim=64, char_dim=128, window=2),
            generator=GeneratorConfig(dim=256, append_style=True,
                                      phase_upsample=phase,
                                      fused_epilogue=fused),
            discriminator=DiscriminatorConfig(enabled=False),
            spacer=SpacerConfig(dim=128, count_duplicates=True),
            hwr=HWRConfig(kind="none"),
            compute_dtype="bfloat16",
        )
        return HWWithStyle(mc)

    B, spaced_len = args.batch, 192
    text = "The quick brown fox jumps over dogs"
    label = jnp.asarray(IAM_CHARSET.encode(text))
    labels = jnp.tile(label[None], (B, 1))
    lens = jnp.full((B,), label.shape[0], jnp.int32)
    rng = jax.random.PRNGKey(0)

    base = make_model(False, False)
    variables = jax.jit(
        lambda r, l, ln, s: base.init(
            {"params": r, "noise": r}, l, ln, s, r,
            spaced_len=spaced_len, method="generate")
    )(rng, labels, lens, jnp.zeros((B, 128)))
    params = cast_params_bf16(variables["params"])
    styles = jax.random.normal(jax.random.PRNGKey(1), (B, 128),
                               ).astype(jnp.bfloat16)
    nkey = noise_key(0)

    report = {"batch": B, "device": str(jax.devices()[0])}
    cases = [("baseline", False, False), ("phase", True, False),
             ("fused_epi", False, True), ("phase+fused", True, True)]
    for name, phase, fused in cases:
        model = make_model(phase, fused)
        fn = GenerationSession(model, params, IAM_CHARSET)._gen_fn(spaced_len)
        try:
            ms = scan_ms(lambda k: fn(params, labels, lens, styles, k, nkey)[0],
                         iters=args.iters)
            report[name + "_ms"] = round(ms, 3)
            report[name + "_lines_per_s"] = round(B / ms * 1e3, 1)
        except Exception as e:  # pallas lowering may fail on some shapes
            report[name + "_error"] = f"{type(e).__name__}: {e}"[:300]
        print(json.dumps({k: v for k, v in report.items()
                          if k.startswith(name)}), flush=True)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

"""MFU / roofline report for the GAN training step.

Times the compiled paper-shape lesson steps on the active backend and reads
XLA's cost analysis to report FLOPs/step, achieved FLOP/s, and model FLOPs
utilization vs the chip's peak (VERDICT r1 asked for a tokens/FLOP or
profiler accounting behind the lessons/s number; reference context:
``hw_with_style_trainer.py:277-324`` separated backwards are the step cost).

Usage: python scripts/mfu_report.py [--peak-tflops 197] [--iters 30]
(197 = TPU v5e bf16 peak; pass your chip's number.)
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--config", default="configs/syn_gan_long.json")
    ap.add_argument("--gen-batch", type=int, default=512)
    ap.add_argument("--dtype", default=None,
                    choices=("float32", "bfloat16"),
                    help="override model.compute_dtype for the measurement")
    ap.add_argument("--spaced-cache", action="store_true",
                    help="feed a precomputed spaced_label (the spaced_loc "
                         "production path) so the steps skip the in-step "
                         "Viterbi scan; reports the cached-alignment MFU")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from handwriting_line_generation_tpu.utils.compile_cache import (
        enable_compile_cache)
    enable_compile_cache()
    from handwriting_line_generation_tpu.utils.acquire import (
        ensure_device_or_reexec)
    ensure_device_or_reexec()
    import numpy as np

    from handwriting_line_generation_tpu.config import load_config
    from handwriting_line_generation_tpu.data.datasets import (
        forever, make_batcher)
    from handwriting_line_generation_tpu.training.gan_trainer import GanTrainer

    cfg = load_config(args.config)
    cfg.trainer.save_dir = "/tmp/mfu"
    if args.dtype:
        cfg.model.compute_dtype = args.dtype
    tr = GanTrainer(cfg)
    it = forever(make_batcher(cfg.data, "train"), seed=0)
    batch = next(it)
    tr.state = tr.init_state(batch)

    # match the dtypes run_lesson actually ships (u8_transfer default on) so
    # the warm-up cycle and the timed loop hit the SAME compiled executable
    if cfg.data.u8_transfer:
        from handwriting_line_generation_tpu.data.datasets import \
            quantize_image_u8
        image = jnp.asarray(quantize_image_u8(batch["image"]))
        fg = (jnp.asarray(batch["fg_mask"] > 0.5)
              if "fg_mask" in batch else None)
    else:
        image = jnp.asarray(batch["image"])
        fg = jnp.asarray(batch["fg_mask"]) if "fg_mask" in batch else None
    label = jnp.asarray(batch["label"])
    lens = jnp.asarray(batch["label_lengths"])
    width = jnp.asarray(batch["width"])
    a_batch = batch.get("a_batch_size", 1)

    report = {"device": str(jax.devices()[0]),
              "batch": int(image.shape[0]),
              "image_w": int(image.shape[2]),
              "compute_dtype": cfg.model.compute_dtype,
              "spaced_cache": bool(args.spaced_cache)}

    # --spaced-cache: a precomputed alignment rides the step exactly like
    # the dataset's spaced_loc rows, so the jitted step drops its serial
    # Viterbi scan (values don't affect timing; shapes/dtype match the
    # production cache)
    spaced = None
    if args.spaced_cache:
        from handwriting_line_generation_tpu.ops.spacing import insert_spaces
        B, L = label.shape
        spaced, _ = insert_spaces(
            label, lens, jnp.ones((B, L, 2)), jax.random.PRNGKey(0),
            max_len=int(image.shape[2]) // 4)
        spaced = jax.block_until_ready(spaced)

    # FLOPs from XLA cost analysis of the dominant (auto) lesson step
    # bound-jit .lower does not auto-insert self: go through the class attr
    lowered = type(tr).step_auto.lower(tr, tr.state, image, label, lens, fg,
                                       width, a_batch, "main", 0, spaced)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):                      # older jax returns [dict]
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    report["auto_step_gflops"] = flops / 1e9

    # timed full curriculum cycle (what training actually runs)
    def one_cycle(i0):
        for j in range(7):
            lesson = tr.curriculum.get_lesson(i0 + j)
            tr.run_lesson(lesson, it, iteration=i0 + j)

    one_cycle(0)                                    # compile everything
    jax.block_until_ready(tr.state.params)
    t0 = time.perf_counter()
    n_cycles = max(args.iters // 7, 1)
    for c in range(n_cycles):
        one_cycle(7 * (c + 1))
    jax.block_until_ready(tr.state.params)
    dt = time.perf_counter() - t0
    lessons = 7 * n_cycles
    report["sec_per_lesson"] = dt / lessons
    report["lessons_per_sec"] = lessons / dt

    # MFU on the auto lesson (2 of 7 lessons; the FLOPs-dominant one)
    # warm the (possibly spaced-cache) signature outside the timer — the
    # curriculum warm-up above only compiled the no-cache variant
    tr.state, _ = tr.step_auto(tr.state, image, label, lens, fg,
                               width, a_batch, "main", 0, spaced)
    jax.block_until_ready(tr.state.params)
    t0 = time.perf_counter()
    for j in range(args.iters):
        tr.state, _ = tr.step_auto(tr.state, image, label, lens, fg,
                                   width, a_batch, "main", 0, spaced)
    jax.block_until_ready(tr.state.params)
    dt_auto = (time.perf_counter() - t0) / args.iters
    report["auto_sec_per_step"] = dt_auto
    achieved = flops / dt_auto
    report["auto_achieved_tflops"] = achieved / 1e12
    report["auto_mfu"] = achieved / (args.peak_tflops * 1e12)

    # generator-inference roofline (the bench.py headline path): bf16
    # batched generate at paper scale, XLA cost analysis vs wall time
    from handwriting_line_generation_tpu.inference.generate import \
        cast_params_bf16
    gb = args.gen_batch
    labels = jnp.tile(label[:1, :], (gb, 1))
    lens_g = jnp.full((gb,), label.shape[1], jnp.int32)
    styles = jnp.zeros((gb, cfg.model.style.style_dim), jnp.bfloat16)
    gparams = cast_params_bf16(tr.state.params)
    spaced = tr.gen_spaced_len

    def gen_fn(p, lb, ln, st):
        img, _ = tr.model.apply(
            {"params": p}, lb, ln, st, jax.random.PRNGKey(1),
            spaced_len=spaced, method="generate",
            rngs={"noise": jax.random.PRNGKey(2)})
        return img

    glow = jax.jit(gen_fn).lower(gparams, labels, lens_g, styles)
    gcost = glow.compile().cost_analysis()
    if isinstance(gcost, list):
        gcost = gcost[0]
    gflops = float(gcost.get("flops", 0.0))
    gbytes = float(gcost.get("bytes accessed", 0.0))
    # scan-delta timing: the dev relay executes lazily and drops repeat
    # dispatches whose outputs are unconsumed, so a repeat-and-block-once
    # loop times only its final iteration; a dependency-chained scan at
    # two iteration counts is the reliable barrier (see bench.py)
    def scanned_s(n):
        @jax.jit
        def run(p, lb, ln, st):
            def body(c, i):
                k = jax.random.fold_in(jax.random.PRNGKey(1), i)
                img, _ = tr.model.apply(
                    {"params": p}, lb, ln, st, k, spaced_len=spaced,
                    method="generate", rngs={"noise": k})
                return c + jnp.float32(jnp.mean(img)), None
            r, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
            return r
        float(run(gparams, labels, lens_g, styles))        # compile+warm
        t0 = time.perf_counter()
        float(run(gparams, labels, lens_g, styles))
        return time.perf_counter() - t0
    n1, n2 = 3, max(args.iters // 2, 9)
    dt_gen = (scanned_s(n2) - scanned_s(n1)) / (n2 - n1)
    report["gen_batch"] = gb
    report["gen_step_gflops"] = gflops / 1e9
    report["gen_sec_per_batch"] = dt_gen
    report["gen_lines_per_sec"] = gb / dt_gen
    report["gen_achieved_tflops"] = gflops / dt_gen / 1e12
    report["gen_mfu"] = gflops / dt_gen / (args.peak_tflops * 1e12)
    # roofline attribution: arithmetic intensity vs the chip's ridge point
    # (v5e: ~197 bf16 TFLOP/s / ~0.82 TB/s HBM ~ 240 FLOP/byte); achieved
    # HBM bandwidth says whether the next lever is traffic or compute
    if gbytes:
        report["gen_bytes_accessed_gb"] = gbytes / 1e9
        report["gen_arith_intensity_flop_per_byte"] = gflops / gbytes
        report["gen_achieved_hbm_gbps"] = gbytes / dt_gen / 1e9
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

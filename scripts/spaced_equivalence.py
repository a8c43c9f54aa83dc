"""Decisive cache-vs-live experiment for the ``spaced_loc`` alignment cache.

Round 4's IAM v3 GAN collapsed to blank output when trained through the
precomputed ``spaced_loc`` cache while the identical live-alignment recipe
converged (docs/RESULTS.md, commit f26a2a7).  The forensics proved the bank
rows *decode* to the right text and that the trainer *consumes* them, but
stopped short of the decisive check: if the cached path is semantically
identical to the live path, then (a) the cached alignment tensor must equal
the live ``viterbi_align`` output on every training batch, and (b) a
same-seed N-step training run must produce the same loss trajectory with
the cache on and off.

This script runs both checks on CPU (``JAX_PLATFORMS=cpu``) with a small
synthetic corpus and the production pretrained recognizer:

  stage 1 (tensor level): for K batches from the cache-enabled batcher,
      recompute the in-step alignment exactly as ``step_count`` does
      (dequantize -> recognize -> width-mask -> viterbi) and diff it
      against the attached ``spaced_label`` rows.
  stage 2 (trajectory level): train N iterations live, precompute the
      cache with scripts/precompute_spaced.py, retrain same-seed cached,
      and diff the per-iteration loss dicts.

Reference anchor: the cached workflow this mirrors is
``/root/reference/datasets/author_hw_dataset.py:283-290`` (precomputed
``spaced_loc`` pickles consumed per line).

Usage: python scripts/spaced_equivalence.py [BASE_CONFIG] [N_ITERS]
"""

import copy
import json
import os
import sys
import tempfile

# Force-override BOTH ways (tests/conftest.py pattern): the environment
# pre-sets JAX_PLATFORMS=axon and the axon plugin can win platform
# selection over the env var alone.  This experiment must NEVER touch the
# exclusive TPU tunnel — it runs beside a live chip trainer.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def small_cfg(base_path: str, save_dir: str, iters: int):
    from handwriting_line_generation_tpu.config import load_config
    cfg = load_config(base_path)
    cfg.data.synthetic_authors = 10
    cfg.data.synthetic_lines = 12
    cfg.trainer.iterations = iters
    cfg.trainer.log_step = 1
    cfg.trainer.val_step = 10 ** 9
    cfg.trainer.save_step = 10 ** 9
    cfg.trainer.save_step_minor = None
    cfg.trainer.print_every = 0
    cfg.trainer.swa = False
    cfg.trainer.save_dir = save_dir
    return cfg


def stage1_tensor_identity(cfg, cache_path: str, k_batches: int = 8):
    """Cached rows vs in-step live alignment, exactly as step_count sees
    them (gan_trainer.py:270-290): dequantize(+u8 round trip when
    data.u8_transfer is on) -> recognize -> mask frames -> viterbi."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from handwriting_line_generation_tpu.data.datasets import (
        forever, make_batcher, quantize_image_u8)
    from handwriting_line_generation_tpu.ops.align import viterbi_align
    from handwriting_line_generation_tpu.ops.augment import dequantize_image
    from handwriting_line_generation_tpu.ops.ctc import mask_frames_to_blank
    from handwriting_line_generation_tpu.training.gan_trainer import GanTrainer

    ccfg = copy.deepcopy(cfg)
    ccfg.data.spaced_loc = cache_path
    trainer = GanTrainer(ccfg)
    batcher = make_batcher(ccfg.data, "train")
    it = forever(batcher, seed=ccfg.trainer.seed)
    state = trainer.init_state(next(it))

    @jax.jit
    def live_align(params, image, width, label, lens):
        T = image.shape[2] // 4
        frames = jnp.clip(jnp.ceil(width / 4.0).astype(jnp.int32), 1, T)
        pred = trainer.model.apply({"params": params}, image,
                                   method="recognize")
        pred = mask_frames_to_blank(pred, frames)
        return viterbi_align(pred, label, lens)

    rows = mismatch = 0
    worst = 0
    for _ in range(k_batches):
        batch = next(it)
        assert "spaced_label" in batch, "cache rows not attached"
        img = batch["image"]
        if ccfg.data.u8_transfer:
            img = dequantize_image(quantize_image_u8(img),
                                   jnp.asarray(batch["width"]))
        live = np.asarray(live_align(
            state.params, jnp.asarray(img), jnp.asarray(batch["width"]),
            jnp.asarray(batch["label"]), jnp.asarray(batch["label_lengths"])))
        cached = np.asarray(batch["spaced_label"])
        if cached.shape != live.shape:
            print(f"  shape mismatch: cached {cached.shape} vs live "
                  f"{live.shape}")
            return {"rows": rows, "mismatch_rows": rows or 1,
                    "shape_mismatch": True}
        for b in range(live.shape[0]):
            rows += 1
            d = int((cached[b] != live[b]).sum())
            if d:
                mismatch += 1
                worst = max(worst, d)
    return {"rows": rows, "mismatch_rows": mismatch,
            "worst_positions": worst}


def run_arm(cfg, name: str):
    """One N-iteration training run; returns the per-iteration log entries."""
    from handwriting_line_generation_tpu.training.gan_trainer import GanTrainer
    entries = []
    trainer = GanTrainer(cfg)
    trainer.train(on_log=entries.append, resume=False)
    print(f"  [{name}] {len(entries)} log entries")
    return entries


def main(base="configs/syn_gan3.json", iters=140):
    import numpy as np
    iters = int(iters)
    # SPACED_EQ_RESUME=<workdir>: reuse a prior invocation's arm-A
    # trajectory (live/syn_gan3/train_log.json, written by train()'s
    # finally) and cache npz instead of re-burning ~70 CPU-minutes.
    resume = os.environ.get("SPACED_EQ_RESUME")
    work = resume or tempfile.mkdtemp(prefix="spaced_eq_")
    cfg = small_cfg(base, os.path.join(work, "live"), iters)
    cfg.data.spaced_loc = None
    cache = os.path.join(work, "spaced.npz")

    if resume:
        with open(os.path.join(work, "live", cfg.name,
                               "train_log.json")) as f:
            live_log = [e for e in json.load(f) if "iteration" in e]
        print(f"== arm A: resumed {len(live_log)} entries from {work} ==",
              flush=True)
        assert os.path.exists(cache), "resume workdir has no spaced.npz"
    else:
        # ---- stage 2 arm A: live alignment ---------------------------
        print(f"== arm A: live alignment, {iters} iters (CPU) ==",
              flush=True)
        live_log = run_arm(copy.deepcopy(cfg), "live")

        # ---- precompute the cache (the production script) ------------
        print("== precompute spaced cache ==", flush=True)
        cfg_path = os.path.join(work, "cfg_small.json")
        with open(cfg_path, "w") as f:
            json.dump(cfg.to_dict(), f)
        import importlib
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        pre = importlib.import_module("precompute_spaced")
        pre.main(cfg_path, cache)

    # ---- stage 1: tensor-level identity ------------------------------
    print("== stage 1: cached rows vs in-step live viterbi ==", flush=True)
    t = stage1_tensor_identity(cfg, cache)
    print(f"  rows={t['rows']} mismatching={t['mismatch_rows']} "
          f"worst_positions={t.get('worst_positions')}")

    # ---- stage 2 arm B: cached alignment, same seed ------------------
    print(f"== arm B: cached alignment, {iters} iters (CPU) ==", flush=True)
    ccfg = copy.deepcopy(cfg)
    ccfg.data.spaced_loc = cache
    ccfg.trainer.save_dir = os.path.join(work, "cached")
    cached_log = run_arm(ccfg, "cached")

    # ---- diff the trajectories ---------------------------------------
    keys = sorted({k for e in live_log for k in e} &
                  {k for e in cached_log for k in e}
                  - {"iteration", "sec_per_iter"})  # wall-clock keys are
    # run-local noise, not semantics — comparing them falsely fails the
    # equality verdict
    print("== stage 2: per-iteration loss deltas ==")
    report = {"iters": iters, "stage1": t, "keys": {}}
    for k in keys:
        a = np.array([e[k] for e in live_log if k in e], np.float64)
        b = np.array([e[k] for e in cached_log if k in e], np.float64)
        n = min(len(a), len(b))
        if n == 0:
            continue
        a, b = a[:n], b[:n]
        scale = np.maximum(np.abs(a), 1e-6)
        rel = np.abs(a - b) / scale
        first_bad = int(np.argmax(rel > 0.02)) if (rel > 0.02).any() else -1
        report["keys"][k] = {
            "n": n, "max_rel": float(rel.max()),
            "mean_rel": float(rel.mean()),
            "first_iter_over_2pct": first_bad,
            "final_live": float(a[-1]), "final_cached": float(b[-1]),
        }
        print(f"  {k:20s} max_rel={rel.max():.2e} mean_rel={rel.mean():.2e}"
              f" first>2%@{first_bad} final {a[-1]:.4f} vs {b[-1]:.4f}")

    ident = t["mismatch_rows"] == 0 and not t.get("shape_mismatch")
    traj_ok = all(v["max_rel"] < 0.02 for v in report["keys"].values())
    report["tensor_identical"] = bool(ident)
    report["trajectory_equal"] = bool(traj_ok)
    print(json.dumps({"tensor_identical": ident,
                      "trajectory_equal": traj_ok, "workdir": work}))
    out = os.environ.get("SPACED_EQ_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(report, f, indent=1)
    return report


if __name__ == "__main__":
    main(*sys.argv[1:])

"""Precompute the ``spaced_loc`` alignment cache for a GAN config.

The reference trains its GAN from precomputed per-line alignments
(``datasets/author_hw_dataset.py:283-290`` reads ``spaced_loc`` pickles that
an earlier eval pass dumped).  With a frozen recognizer and no train-time
augmentation the forced alignment of every line is a constant, so computing
it once here and shipping it via ``DataConfig.spaced_loc`` removes the
per-step Viterbi scan from the count and auto lessons — the serial
``lax.scan`` is the one non-MXU stage of those steps.

Usage: python scripts/precompute_spaced.py CONFIG OUT.npz [SPLITS]

``SPLITS`` defaults to ``train,valid`` — the batcher attaches cache rows on
every split it serves, so the validation records need rows too.  Loads the
config's pretrained HWR + encoder weights exactly like GAN training
startup, runs the evaluator's ``save_spaced`` side channel over each
split, and verifies every record is covered (a partial cache would
KeyError mid-training).
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(config_path: str, out_path: str,
         splits: str = "train,valid") -> None:
    import numpy as np

    from handwriting_line_generation_tpu.config import load_config
    from handwriting_line_generation_tpu.utils.acquire import (
        ensure_device_or_reexec)
    ensure_device_or_reexec()
    from handwriting_line_generation_tpu.data.datasets import (
        forever, get_charset, make_batcher)
    from handwriting_line_generation_tpu.inference.eval import Evaluator
    from handwriting_line_generation_tpu.training.gan_trainer import GanTrainer

    cfg = load_config(config_path)
    if cfg.data.spaced_loc:
        # precomputing FROM a cache would just echo it back
        cfg.data.spaced_loc = None
    trainer = GanTrainer(cfg)
    rows = {}
    state = None
    ev = None
    for split in splits.split(","):
        batcher = make_batcher(cfg.data, split)
        # both batchers drop the tail that doesn't fill a batch
        # (range stop = len - batch_size + 1); the dump must cover EVERY
        # record (shuffled training epochs rotate which records land in the
        # tail), so pad the group/record list to a batch_size multiple by
        # cycling from the front — duplicate rids just overwrite their row
        def _pad(items, bs):
            short = (-len(items)) % bs
            if short and items:
                reps = -(-short // len(items))
                items = list(items) + (list(items) * reps)[:short]
            return items
        if hasattr(batcher, "groups"):
            batcher.groups = _pad(batcher.groups, batcher.batch_size)
        else:
            batcher.records = _pad(batcher.records, batcher.batch_size)
        if state is None:
            state = trainer.init_state(next(forever(batcher, seed=0)))
            ev = Evaluator(trainer.model, state.params,
                           get_charset(cfg.data))
        tmp = tempfile.mkdtemp()
        ev.run(batcher, out_dir=tmp, save_spaced=True)
        with np.load(os.path.join(tmp, "spaced.npz")) as d:
            for k in d.files:
                rows[k] = d[k]
        shutil.rmtree(tmp, ignore_errors=True)
        want = {r.rid for g in getattr(batcher, "groups", [])
                for r in g} or {r.rid for r in batcher.records}
        missing = want - set(rows)
        if missing:
            raise SystemExit(
                f"[{split}] cache covers {len(rows)} rids but the split "
                f"needs {len(want)}; {len(missing)} missing (first: "
                f"{sorted(missing)[:5]}) — incomplete cache would "
                f"KeyError mid-training")
    out_abs = os.path.abspath(out_path)
    os.makedirs(os.path.dirname(out_abs), exist_ok=True)
    np.savez_compressed(out_abs, **rows)
    print(f"spaced cache: {len(rows)} records -> {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], *sys.argv[3:])

#!/usr/bin/env python
"""Evaluation CLI.

Counterpart of the reference's ``new_eval.py``: run the model over a split,
aggregate CER/WER and reconstruction losses, dump recon side-by-sides,
optionally side-channel styles/spaced labels.
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-k", "--checkpoint", required=True)
    ap.add_argument("-d", "--split", default="valid")
    ap.add_argument("-n", "--max-batches", type=int, default=None)
    ap.add_argument("-o", "--out-dir", default=None)
    ap.add_argument("--save-images", action="store_true")
    ap.add_argument("--save-styles", action="store_true")
    ap.add_argument("--save-spaced", action="store_true")
    ap.add_argument("--save-preds", action="store_true",
                    help="per-sample prediction CSV (new_eval save_preds)")
    ap.add_argument("--save-nns", action="store_true",
                    help="style-space nearest-neighbor CSV (new_eval save_nns)")
    ap.add_argument("-a", "--override", action="append",
                    default=[], metavar="PATH=VALUE",
                    help="nested config override, e.g. -a trainer.iterations=100")
    args = ap.parse_args()

    import numpy as np
    from handwriting_line_generation_tpu.config import (apply_overrides,
                                                    load_config)
    from handwriting_line_generation_tpu.data.datasets import (
        get_charset, make_batcher)
    from handwriting_line_generation_tpu.inference.eval import Evaluator
    from handwriting_line_generation_tpu.training.gan_trainer import GanTrainer
    from handwriting_line_generation_tpu.utils.checkpoint import (
        CheckpointManager)

    cfg = load_config(args.config)
    apply_overrides(cfg, args.override)
    trainer = GanTrainer(cfg)
    batcher = make_batcher(cfg.data, args.split)
    first = next(iter(batcher.batches(np.random.default_rng(0))))
    state = CheckpointManager(args.checkpoint).latest(
        trainer.init_state(first))
    ev = Evaluator(trainer.model, state.params, get_charset(cfg.data))
    metrics = ev.run(batcher, args.max_batches, args.out_dir,
                     save_images=args.save_images,
                     save_styles=args.save_styles,
                     save_spaced=args.save_spaced,
                     save_preds=args.save_preds,
                     save_nns=args.save_nns)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()

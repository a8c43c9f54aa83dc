#!/usr/bin/env python
"""Batch style-extraction CLI.

Counterpart of the reference's ``get_styles.py``: run the style extractor
over train/valid (or test with ``-T``) and write ``{styles, authors, ids}``
to ``.npz`` files next to the checkpoint.
"""

import argparse
import os


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-k", "--checkpoint", required=True,
                    help="directory containing checkpoint-latest.msgpack")
    ap.add_argument("-T", "--test", action="store_true",
                    help="use the test split instead of train/valid")
    ap.add_argument("-o", "--out-dir", default=None)
    ap.add_argument("-n", "--max-batches", type=int, default=None)
    ap.add_argument("-S", "--through-emb", action="store_true",
                    help="pass styles through the generator's style_emb "
                         "MLP before saving (get_styles.py:184-186)")
    ap.add_argument("-a", "--override", action="append",
                    default=[], metavar="PATH=VALUE",
                    help="nested config override, e.g. -a trainer.iterations=100")
    args = ap.parse_args()

    import jax
    from handwriting_line_generation_tpu.utils.compile_cache import (
        enable_compile_cache)
    enable_compile_cache()
    from handwriting_line_generation_tpu.utils.acquire import (
        ensure_device_or_reexec)
    ensure_device_or_reexec()
    import numpy as np
    from handwriting_line_generation_tpu.config import (apply_overrides,
                                                    load_config)
    from handwriting_line_generation_tpu.data.datasets import (
        get_charset, make_batcher)
    from handwriting_line_generation_tpu.inference.styles import (
        StyleExtractor, save_styles)
    from handwriting_line_generation_tpu.models.hw_with_style import HWWithStyle
    from handwriting_line_generation_tpu.training.gan_trainer import GanTrainer
    from handwriting_line_generation_tpu.utils.checkpoint import (
        CheckpointManager)

    cfg = load_config(args.config)
    apply_overrides(cfg, args.override)
    trainer = GanTrainer(cfg)
    splits = ["test"] if args.test else ["train", "valid"]
    first = next(iter(make_batcher(cfg.data, splits[0]).batches(
        np.random.default_rng(0))))
    state = trainer.init_state(first)
    ckpt = CheckpointManager(args.checkpoint)
    state = ckpt.latest(state)
    it = int(state.step)
    ex = StyleExtractor(trainer.model, state.params)
    out_dir = args.out_dir or args.checkpoint
    for split in splits:
        b = make_batcher(cfg.data, split)
        data = ex.extract_dataset(b, args.max_batches,
                                  through_emb=args.through_emb)
        path = os.path.join(out_dir, f"{split}_styles_{it}.npz")
        save_styles(path, data)
        print(f"wrote {len(data['authors'])} styles -> {path}", flush=True)


if __name__ == "__main__":
    main()

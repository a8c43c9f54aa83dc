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
    ap.add_argument("--ckpt-name", default="checkpoint-latest",
                    help="checkpoint file stem in the -k directory; "
                         "'model_best' (params-only) is supported")
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
    ap.add_argument("--save-gen", action="store_true",
                    help="dump generated-line images per sample "
                         "(hwdataset_eval.py:267-279 channel)")
    ap.add_argument("--quality", action="store_true",
                    help="generation-quality harness: gen-CER, writer-ID, "
                         "inter/intra style distances, HWR-feature FID")
    ap.add_argument("--texts", default=None,
                    help="text corpus for --quality gen lines (default: the "
                         "config's data.text_data, else split transcripts)")
    ap.add_argument("--n-gen", type=int, default=256,
                    help="number of lines to generate for --quality")
    ap.add_argument("-a", "--override", action="append",
                    default=[], metavar="PATH=VALUE",
                    help="nested config override, e.g. -a trainer.iterations=100")
    args = ap.parse_args()

    import faulthandler
    import signal
    import sys
    import time

    # a driver/pipeline timeout kills this process with SIGTERM; dump every
    # thread's stack on the way out so a hang says WHERE it hung (the round-3
    # measurement pass lost a 40-minute budget to an undiagnosed pre-init
    # hang with zero output)
    faulthandler.register(signal.SIGTERM, chain=True)
    t0 = time.time()

    def mark(msg):
        print(f"[evaluate +{time.time() - t0:7.1f}s] {msg}", file=sys.stderr,
              flush=True)

    import numpy as np
    from handwriting_line_generation_tpu.utils.compile_cache import (
        enable_compile_cache)
    enable_compile_cache()
    from handwriting_line_generation_tpu.utils.acquire import (
        ensure_device_or_reexec)
    ensure_device_or_reexec()
    mark("imports + compile cache ready")

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
    mark("config loaded")
    trainer = GanTrainer(cfg)
    mark("trainer built")
    batcher = make_batcher(cfg.data, args.split)
    first = next(iter(batcher.batches(np.random.default_rng(0))))
    mark("init_state start")
    template = trainer.init_state(first)
    mark("init_state done")
    if args.ckpt_name == "checkpoint-latest":
        state = CheckpointManager(args.checkpoint).latest(template)
    else:
        import flax.serialization as ser
        from handwriting_line_generation_tpu.utils.checkpoint import (
            load_raw_checkpoint)
        raw = load_raw_checkpoint(args.checkpoint, args.ckpt_name)
        if set(raw) <= {"params", "spectral"}:  # params-only model_best
            state = template.replace(
                params=ser.from_state_dict(template.params, raw["params"]),
                **({"spectral": ser.from_state_dict(template.spectral,
                                                    raw["spectral"])}
                   if "spectral" in raw else {}))
        elif set(raw) == set(template.params):   # bare params tree (the
            # SWA average saved beside checkpoints as <name>-swa)
            state = template.replace(
                params=ser.from_state_dict(template.params, raw))
        else:
            state = ser.from_state_dict(template, raw)
    charset = get_charset(cfg.data)
    if args.quality:
        from handwriting_line_generation_tpu.inference.quality import (
            QualityEvaluator, load_texts)
        texts_path = args.texts or getattr(cfg.data, "text_data", None)
        if texts_path:
            texts = load_texts(texts_path, args.n_gen)
        else:
            rng = np.random.default_rng(0)
            texts = []
            for b in batcher.batches(rng, shuffle=False):
                texts.extend(t for t in b["gt"] if t != "$UNKOWN$")
                if len(texts) >= args.n_gen:
                    break
            texts = texts[:args.n_gen]
        qe = QualityEvaluator(trainer.model, state.params, charset)
        metrics = qe.run(batcher, texts, args.max_batches,
                         out_dir=args.out_dir)
        print(json.dumps(metrics, indent=2))
        return
    ev = Evaluator(trainer.model, state.params, charset)
    metrics = ev.run(batcher, args.max_batches, args.out_dir,
                     save_images=args.save_images,
                     save_styles=args.save_styles,
                     save_spaced=args.save_spaced,
                     save_preds=args.save_preds,
                     save_nns=args.save_nns,
                     save_gen=args.save_gen)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Generation CLI.

Counterpart of the reference's interactive ``generate.py`` mode menu
(``generate.py:259-788``), scriptable: modes ``render`` (fixed text, random
interpolated styles — reference 'R'), ``interp`` (two-style sweep — 'f' /
default), ``stretch`` ('s'), ``math`` ('m'), ``author`` ('a'),
``mturk`` ('t').
"""

import argparse
import os


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-k", "--checkpoint", required=True)
    ap.add_argument("-s", "--styles", default=None,
                    help="styles .npz (required except in from-to mode)")
    ap.add_argument("-m", "--mode", default="render",
                    choices=["render", "interp", "stretch", "math",
                             "author", "mturk", "from-to", "vae"])
    ap.add_argument("--from-image", default=None,
                    help="from-to mode: source handwriting image")
    ap.add_argument("--to-image", default=None,
                    help="from-to mode: target handwriting image")
    ap.add_argument("-t", "--text", default="the quick brown fox")
    ap.add_argument("--text-file", default=None,
                    help="file with one line of text per render")
    ap.add_argument("-a", "--author", default=None)
    ap.add_argument("-n", "--count", type=int, default=8)
    ap.add_argument("-o", "--out-dir", default="generated")
    ap.add_argument("--seed", type=int, default=0)
    # -a is taken by --author here; overrides use the long flag only
    ap.add_argument("--override", action="append",
                    default=[], metavar="PATH=VALUE",
                    help="nested config override, e.g. "
                         "--override trainer.iterations=100")
    args = ap.parse_args()

    import cv2
    import numpy as np
    from handwriting_line_generation_tpu.utils.compile_cache import (
        enable_compile_cache)
    enable_compile_cache()
    from handwriting_line_generation_tpu.utils.acquire import (
        ensure_device_or_reexec)
    ensure_device_or_reexec()
    from handwriting_line_generation_tpu.config import (apply_overrides,
                                                    load_config)
    from handwriting_line_generation_tpu.data.datasets import get_charset, \
        make_batcher
    from handwriting_line_generation_tpu.inference.generate import (
        GenerationSession, to_uint8)
    from handwriting_line_generation_tpu.inference.styles import (
        load_styles, styles_by_author)
    from handwriting_line_generation_tpu.training.gan_trainer import GanTrainer
    from handwriting_line_generation_tpu.utils.checkpoint import (
        CheckpointManager)

    cfg = load_config(args.config)
    apply_overrides(cfg, args.override)
    trainer = GanTrainer(cfg)
    first = next(iter(make_batcher(cfg.data, "train").batches(
        np.random.default_rng(0))))
    state = CheckpointManager(args.checkpoint).latest(
        trainer.init_state(first))
    session = GenerationSession(trainer.model, state.params,
                                get_charset(cfg.data))
    if args.mode not in ("from-to", "vae") and not args.styles:
        ap.error("-s/--styles is required except in from-to/vae modes")
    data = load_styles(args.styles) if args.styles else None
    bank = data["styles"] if data else None

    if args.text_file:
        with open(args.text_file) as f:
            texts = [l.rstrip("\n") for l in f if l.strip()]
    else:
        texts = [args.text] * args.count

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    if args.mode == "render":
        imgs = session.random_interpolated(texts, bank, seed=args.seed)
    elif args.mode == "interp":
        a, b = bank[rng.integers(0, len(bank), 2)]
        imgs = session.interpolate(texts[0], a, b, steps=args.count,
                                   seed=args.seed)
    elif args.mode == "stretch":
        style = bank[rng.integers(0, len(bank))]
        outs = session.stretch_sweep(texts[0], style, seed=args.seed)
        imgs = np.concatenate(outs, axis=0)
    elif args.mode == "math":
        a, b, c = bank[rng.integers(0, len(bank), 3)]
        imgs = session.style_math(texts[0], a, b, c, seed=args.seed)
    elif args.mode == "author":
        by = styles_by_author(data)
        author = args.author or sorted(by)[0]
        imgs = session.author_samples(texts, by, author, seed=args.seed)
    elif args.mode == "vae":
        # reference 'v' mode: sample styles from the VAE prior N(0, I)
        # (generate.py:444-470; meaningful with a VAE-trained extractor,
        # style.vae=true)
        z = rng.standard_normal(
            (len(texts), cfg.model.style.style_dim)).astype(np.float32)
        imgs = session.render(texts, z, seed=args.seed)
    elif args.mode == "from-to":
        # reference 'f' mode (generate.py:655-688): extract the style of two
        # handwriting images and sweep between them
        if not (args.from_image and args.to_image):
            ap.error("from-to mode needs --from-image and --to-image")
        import jax.numpy as jnp

        from handwriting_line_generation_tpu.data.synthetic import \
            normalize_image
        from handwriting_line_generation_tpu.inference.styles import \
            StyleExtractor

        def style_of(path):
            img = cv2.imread(path, 0)
            if img is None:
                raise FileNotFoundError(path)
            h = cfg.data.img_height
            w = max(4, round(img.shape[1] * h / img.shape[0]) // 4 * 4)
            img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
            x = normalize_image(img)[None, :, :, None]
            frames = jnp.asarray([max(1, w // 4)], jnp.int32)
            s, _, _ = StyleExtractor(trainer.model, state.params)._extract(
                jnp.asarray(x), frames, 1)
            return np.asarray(s)[0]

        imgs = session.interpolate(texts[0], style_of(args.from_image),
                                   style_of(args.to_image),
                                   steps=args.count, seed=args.seed)
    else:  # mturk
        imgs = np.stack(session.mturk_batch(texts, bank, seed=args.seed))

    for i in range(imgs.shape[0]):
        path = os.path.join(args.out_dir, f"{args.mode}_{i:03d}.png")
        cv2.imwrite(path, to_uint8(imgs[i]))
    print(f"wrote {imgs.shape[0]} images to {args.out_dir}/", flush=True)


if __name__ == "__main__":
    main()

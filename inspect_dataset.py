#!/usr/bin/env python
"""Dataset visual-inspection dump.

Counterpart of the reference's debug scripts (``datasets/testhw_dataset.py``,
``datasets/testauthor_hw_dataset.py``, ``datasets/testauthor_rimeslines_
dataset.py`` — SURVEY.md §4.1): iterate a few batches and write line images,
fg masks, blob masks, top/bottom extents and center lines, plus a
``gt.txt`` with transcriptions and width stats.
"""

import argparse
import os


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-d", "--split", default="train")
    ap.add_argument("-n", "--batches", type=int, default=2)
    ap.add_argument("-o", "--out-dir", default="dataset_dump")
    ap.add_argument("--augment", action="store_true",
                    help="also dump the device-side augmented versions")
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np
    from handwriting_line_generation_tpu.config import load_config
    from handwriting_line_generation_tpu.data.datasets import make_batcher
    from handwriting_line_generation_tpu.ops.augment import apply_augmentation
    from handwriting_line_generation_tpu.ops.masks import line_geometry, make_mask

    cfg = load_config(args.config)
    b = make_batcher(cfg.data, args.split)
    os.makedirs(args.out_dir, exist_ok=True)
    gts = []
    widths = []
    rng = np.random.default_rng(0)
    for i, batch in enumerate(b.batches(rng)):
        if i >= args.batches:
            break
        img = jnp.asarray(batch["image"])
        mask = make_mask(img, morph_kernel=9)
        tb, center = line_geometry(img, mask)
        aug = None
        if args.augment:
            aug, _, _ = apply_augmentation(cfg.data.augmentation or "warp",
                                           img, None, jax.random.PRNGKey(i))
        for j in range(img.shape[0]):
            u8 = ((1 - np.asarray(img)[j, :, :, 0]) * 127.5
                  ).clip(0, 255).astype(np.uint8)
            # overlay geometry: top/bottom red-ish (dark), center dotted
            vis = cv2.cvtColor(u8, cv2.COLOR_GRAY2BGR)
            w = int(batch["width"][j])
            for x in range(0, w, 2):
                vis[int(np.asarray(center)[j, x]) % 64, x] = (0, 0, 255)
                vis[int(np.asarray(tb)[j, 0, x]) % 64, x] = (0, 255, 0)
                vis[int(np.asarray(tb)[j, 1, x]) % 64, x] = (255, 0, 0)
            cv2.imwrite(f"{args.out_dir}/b{i}_{j}_line.png", vis)
            cv2.imwrite(f"{args.out_dir}/b{i}_{j}_mask.png",
                        (np.asarray(mask)[j, :, :, 0] * 255).astype(np.uint8))
            if "fg_mask" in batch:
                cv2.imwrite(f"{args.out_dir}/b{i}_{j}_fg.png",
                            (batch["fg_mask"][j, :, :, 0] * 255
                             ).astype(np.uint8))
            if aug is not None:
                a8 = ((1 - np.asarray(aug)[j, :, :, 0]) * 127.5
                      ).clip(0, 255).astype(np.uint8)
                cv2.imwrite(f"{args.out_dir}/b{i}_{j}_aug.png", a8)
            gts.append(f"b{i}_{j}\t{batch['author'][j]}\t{batch['gt'][j]}")
            widths.append(w)
    with open(f"{args.out_dir}/gt.txt", "w") as f:
        f.write("\n".join(gts) + "\n")
    print(f"dumped {len(gts)} lines -> {args.out_dir}/ | width "
          f"min/mean/max = {min(widths)}/{sum(widths)//len(widths)}/"
          f"{max(widths)}")


if __name__ == "__main__":
    main()

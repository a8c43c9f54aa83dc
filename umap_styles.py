#!/usr/bin/env python
"""2-D style-space plot (counterpart of the reference's ``umap_styles.py``).

UMAP when installed, PCA fallback otherwise; per-author colors, optional
author-mean pooling.
"""

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("styles", help="styles .npz from get_styles.py")
    ap.add_argument("-o", "--out", default="style_map.png")
    ap.add_argument("--author-mean", action="store_true")
    ap.add_argument("--thumbnails", default=None, metavar="DIR",
                    help="directory of <id>.png line images to place at "
                         "their embedding positions (reference image mode)")
    args = ap.parse_args()

    from handwriting_line_generation_tpu.inference.styles import (
        load_styles, plot_style_map)
    plot_style_map(load_styles(args.styles), args.out,
                   author_mean=args.author_mean,
                   thumbnail_dir=args.thumbnails)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

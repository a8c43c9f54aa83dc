#!/usr/bin/env python
"""Style-space statistics: inter- vs intra-author distance distributions.

Counterpart of the reference's ``play_styles.py`` (``play_styles.py:25-39``):
given a styles file from ``get_styles.py``, report mean/std of pairwise
distances between styles of the same author (intra) and different authors
(inter) — the separation statistic quoted in the reference's experiment log
(``notes.txt:16-35``) — and optionally render the author-sorted pairwise
distance matrix as a heatmap image.
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("styles", help="styles .npz from get_styles.py")
    ap.add_argument("--metric", default="l2", choices=["l1", "l2"])
    ap.add_argument("--heatmap", default=None, metavar="PNG",
                    help="write author-sorted pairwise-distance heatmap")
    ap.add_argument("--max-styles", type=int, default=512,
                    help="subsample cap for the heatmap")
    args = ap.parse_args()

    import numpy as np

    from handwriting_line_generation_tpu.inference.styles import (
        inter_intra_distances, load_styles)
    data = load_styles(args.styles)
    stats = inter_intra_distances(data, metric=args.metric)
    print(json.dumps({"n": len(data["authors"]), **stats}, indent=2))

    if args.heatmap:
        import cv2
        styles = np.asarray(data["styles"], np.float32)
        authors = np.asarray(data["authors"])
        order = np.argsort(authors, kind="stable")[: args.max_styles]
        s = styles[order]
        if args.metric == "l1":
            d = np.abs(s[:, None] - s[None, :]).sum(-1)
        else:
            d = np.linalg.norm(s[:, None] - s[None, :], axis=-1)
        d = (255 * d / max(d.max(), 1e-8)).astype(np.uint8)
        cv2.imwrite(args.heatmap, cv2.applyColorMap(d, cv2.COLORMAP_VIRIDIS))
        print(f"wrote {args.heatmap} ({d.shape[0]}x{d.shape[0]})")


if __name__ == "__main__":
    main()

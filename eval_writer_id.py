#!/usr/bin/env python
"""Writer-ID retrieval scoring from style files.

Counterpart of the reference's ``eval_writer_id.py``: pairwise L1/L2
distances between extracted styles, top-1/5/20 same-author retrieval and
mean rank; plus inter/intra distance stats (``play_styles.py``).
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("styles", help="styles .npz from get_styles.py")
    ap.add_argument("--metric", default="l2", choices=["l1", "l2"])
    args = ap.parse_args()

    from handwriting_line_generation_tpu.inference.styles import (
        inter_intra_distances, load_styles, writer_id_retrieval)
    data = load_styles(args.styles)
    out = {"n": len(data["authors"]),
           **writer_id_retrieval(data, args.metric),
           **inter_intra_distances(data)}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

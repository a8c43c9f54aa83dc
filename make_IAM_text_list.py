#!/usr/bin/env python
"""Dump a split's transcriptions to a text file.

Counterpart of the reference's ``make_IAM_text_list.py`` (test-set line
transcriptions for generation input); works for any configured dataset.
"""

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-d", "--split", default="test")
    ap.add_argument("-o", "--out", default="text_list.txt")
    args = ap.parse_args()

    from handwriting_line_generation_tpu.config import load_config
    from handwriting_line_generation_tpu.data.datasets import make_batcher
    cfg = load_config(args.config)
    b = make_batcher(cfg.data, args.split)
    records = getattr(b, "records", None)
    if records is None:
        records = [r for g in b.groups for r in g]
    with open(args.out, "w") as f:
        for r in records:
            f.write(r.gt + "\n")
    print(f"wrote {len(records)} lines -> {args.out}")


if __name__ == "__main__":
    main()

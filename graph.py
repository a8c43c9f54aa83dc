#!/usr/bin/env python
"""Training-curve plotting (counterpart of the reference's ``graph.py``).

Reads the JSON training log written by the trainers and renders loss curves.
"""

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("log", help="train log .json (TrainLog.save output)")
    ap.add_argument("-o", "--out", default="curves.png")
    ap.add_argument("-k", "--keys", nargs="*", default=None)
    ap.add_argument("--csv", default=None, help="also export CSV here")
    args = ap.parse_args()

    from handwriting_line_generation_tpu.utils.train_log import TrainLog
    log = TrainLog.load(args.log)
    log.plot(args.out, args.keys)
    if args.csv:
        log.export_csv(args.csv)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

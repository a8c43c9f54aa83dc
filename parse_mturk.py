#!/usr/bin/env python
"""Score a human real-vs-generated study CSV.

Counterpart of the reference's ``parse_mturk.py``: per-worker gold-trap and
transcription filtering, fooling rate of generated lines, worker stats.
Accepts either the reference's raw MTurk export layout (``--reference-csv``)
or the clean schema ``worker,gt,answered_real,transcription_ok``.
"""

import argparse
import csv
import json


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("csv_file")
    ap.add_argument("--reference-csv", action="store_true",
                    help="parse the reference's raw MTurk column layout")
    ap.add_argument("--min-gold", type=float, default=1.0)
    ap.add_argument("--workers", action="store_true",
                    help="include per-worker stats")
    args = ap.parse_args()

    from handwriting_line_generation_tpu.analysis.mturk import (
        load_reference_csv, score_study)
    if args.reference_csv:
        records = load_reference_csv(args.csv_file)
    else:
        with open(args.csv_file) as f:
            records = [{"worker": r["worker"], "gt": r["gt"],
                        "answered_real": r["answered_real"] in ("1", "true",
                                                                "True"),
                        "transcription_ok": r["transcription_ok"] in (
                            "1", "true", "True")}
                       for r in csv.DictReader(f)]
    out = score_study(records, args.min_gold)
    if not args.workers:
        out.pop("worker_stats")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

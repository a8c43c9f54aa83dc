"""Write a text corpus matching the synthetic dataset's text distribution.

The GAN's gen-only lessons draw text from ``data.text_data`` (the reference
feeds an external English corpus there, ``trainer`` config key ``text_data``).
For the synthetic dataset the matching corpus is ``random_text`` draws — this
script materializes one so gen lessons train on the same text distribution
the gen-CER probe evaluates on.

Usage: python scripts/make_synthetic_corpus.py [out_path] [n_lines] [charset]
(charset: iam | rimes | path to a charset json, default iam)
"""
import sys

import numpy as np

sys.path.insert(0, ".")
from handwriting_line_generation_tpu.charset import (
    Charset, IAM_CHARSET, RIMES_CHARSET)
from handwriting_line_generation_tpu.data.synthetic import random_text

out = sys.argv[1] if len(sys.argv) > 1 else "saved/syn_text.txt"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
cs_name = sys.argv[3] if len(sys.argv) > 3 else "iam"
charset = {"iam": IAM_CHARSET, "rimes": RIMES_CHARSET}.get(
    cs_name) or Charset.load(cs_name)
rng = np.random.default_rng(99)
with open(out, "w") as f:
    for _ in range(n):
        f.write(random_text(rng, charset) + "\n")
print(f"wrote {n} lines ({cs_name} charset) to {out}")

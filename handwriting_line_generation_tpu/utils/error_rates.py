"""Character / word error rates.

Replaces ``utils/error_rates.py`` (``/root/reference/utils/error_rates.py:2-26``)
which leaned on the ``editdistance`` C++ pip extension.  We ship our own fast
native Levenshtein (see ``handwriting_line_generation_tpu/utils/_editdistance``)
with a pure-numpy fallback — eval-only, never on the training hot path.
"""

from __future__ import annotations

from typing import Hashable, List, Sequence

import numpy as np

try:  # optional C extension built by setup.py / Makefile
    from handwriting_line_generation_tpu.utils import _editdistance as _native
except ImportError:  # pragma: no cover
    _native = None


def levenshtein(a: Sequence[Hashable], b: Sequence[Hashable]) -> int:
    """Edit distance via the classic two-row DP (numpy-vectorized inner loop)."""
    if len(a) < len(b):
        a, b = b, a
    if len(b) == 0:
        return len(a)
    # Map tokens to ints for vector comparison.
    vocab = {}
    enc_a = np.array([vocab.setdefault(t, len(vocab)) for t in a])
    enc_b = np.array([vocab.setdefault(t, len(vocab)) for t in b])
    if _native is not None:
        return _native.levenshtein(enc_a.astype(np.int32),
                                   enc_b.astype(np.int32))
    prev = np.arange(len(enc_b) + 1)
    for i, ca in enumerate(enc_a):
        cur = np.empty_like(prev)
        cur[0] = i + 1
        sub = prev[:-1] + (enc_b != ca)
        dele = prev[1:] + 1
        # insertion chains resolve in closed form:
        #   cur[j] = min_{k<=j}(cand[k] + (j-k)) = (running min of cand[k]-k) + j
        cand = np.minimum(sub, dele)
        offsets = np.arange(len(cand))
        run = np.minimum.accumulate(cand - offsets)
        cur[1:] = run + offsets
        prev = cur
    return int(prev[-1])


def _err(r: Sequence, h: Sequence) -> float:
    dist = levenshtein(r, h)
    if len(r) == 0:
        return float(len(h))
    return float(dist) / float(len(r))


def cer(r: str, h: str, casesensitive: bool = True) -> float:
    """Character error rate with whitespace normalization
    (``/root/reference/utils/error_rates.py:2-17``)."""
    if not casesensitive:
        r, h = r.lower(), h.lower()
    r = " ".join(r.split())
    h = " ".join(h.split())
    return _err(r, h)


def wer(r: str, h: str, casesensitive: bool = True) -> float:
    """Word error rate (``/root/reference/utils/error_rates.py:19-26``)."""
    if not casesensitive:
        r, h = r.lower(), h.lower()
    return _err(r.split(), h.split())


def batch_cer_wer(gts: List[str], preds: List[str],
                  casesensitive: bool = True) -> tuple:
    """Mean CER/WER over aligned lists (trainer logging contract,
    ``/root/reference/trainer/hw_with_style_trainer.py:894-914``)."""
    n = max(len(gts), 1)
    c = sum(cer(g, p, casesensitive) for g, p in zip(gts, preds)) / n
    w = sum(wer(g, p, casesensitive) for g, p in zip(gts, preds)) / n
    return c, w

"""Character sets and label <-> string codecs.

Replaces the reference's JSON charset files plus ``utils/string_utils.py``
(``/root/reference/utils/string_utils.py:3-57``) with a typed ``Charset``
object.  Index 0 is always the CTC blank; characters are indexed from 1, so
``num_class == len(chars) + 1`` (the reference's ``num_class: 80`` for IAM,
78 for RIMES — see ``/root/reference/data/IAM_char_set.json`` and
``trainer/hw_with_style_trainer.py:65``).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, List, Sequence

import numpy as np

# The 79 IAM characters, in reference index order (index 1..79); blank is 0.
# Data parity with /root/reference/data/IAM_char_set.json.
IAM_CHARS = (
    " !\"#&'()*+,-./0123456789:;?"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "abcdefghijklmnopqrstuvwxyz"
)

# The 77 RIMES line characters (index 1..77); blank is 0.
# Data parity with /root/reference/data/RIMES_characterset_lines.json.
RIMES_CHARS = (
    "'-/0123456789"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "abcdefghijklmnopqrstuvwxyz"
    "°àâçèéêîôùû "
)

BLANK = 0


@dataclasses.dataclass(frozen=True)
class Charset:
    """Immutable charset with 0 reserved for the CTC blank."""

    chars: str

    @property
    def num_class(self) -> int:
        return len(self.chars) + 1

    @property
    def char_to_idx(self) -> Dict[str, int]:
        return {c: i + 1 for i, c in enumerate(self.chars)}

    @property
    def idx_to_char(self) -> Dict[int, str]:
        return {i + 1: c for i, c in enumerate(self.chars)}

    def encode(self, text: str) -> np.ndarray:
        """String -> int labels, silently dropping unknown characters.

        Matches ``string_utils.str2label_single`` semantics
        (``/root/reference/utils/string_utils.py:3-13``).
        """
        table = self.char_to_idx
        return np.array([table[c] for c in text if c in table], dtype=np.int32)

    def decode(self, label: Sequence[int], as_raw: bool = False,
               blank_char: str = "~") -> str:
        """Int labels -> string; stops at the first blank unless ``as_raw``.

        Matches ``string_utils.label2str_single``
        (``/root/reference/utils/string_utils.py:38-49``).
        """
        table = self.idx_to_char
        out: List[str] = []
        for v in label:
            v = int(v)
            if v == BLANK:
                if as_raw:
                    out.append(blank_char)
                else:
                    break
            else:
                out.append(table[v])
        return "".join(out)

    def save(self, path: str) -> None:
        """Write the reference-compatible JSON schema."""
        payload = {
            "char_to_idx": self.char_to_idx,
            "idx_to_char": {str(k): v for k, v in self.idx_to_char.items()},
        }
        with open(path, "w") as f:
            json.dump(payload, f, ensure_ascii=False)

    @staticmethod
    def load(path: str) -> "Charset":
        """Read either our JSON or the reference charset JSON schema."""
        with open(path) as f:
            payload = json.load(f)
        idx_to_char = {int(k): v for k, v in payload["idx_to_char"].items()}
        chars = "".join(idx_to_char[i] for i in range(1, len(idx_to_char) + 1))
        return Charset(chars)


IAM_CHARSET = Charset(IAM_CHARS)
RIMES_CHARSET = Charset(RIMES_CHARS)


def ctc_greedy_decode(logits: np.ndarray) -> List[int]:
    """Greedy CTC decode of a ``[T, num_class]`` log-prob/logit matrix.

    Collapses repeats then removes blanks, as ``string_utils.naive_decode``
    (``/root/reference/utils/string_utils.py:51-57``).
    """
    raw = np.argmax(np.asarray(logits), axis=1)
    out: List[int] = []
    prev = -1
    for v in raw:
        v = int(v)
        if v != BLANK and v != prev:
            out.append(v)
        prev = v
    return out


def ctc_greedy_decode_batch(logits: np.ndarray, charset: Charset) -> List[str]:
    """Decode a ``[B, T, num_class]`` batch straight to strings."""
    logits = np.asarray(logits)
    return [charset.decode(ctc_greedy_decode(logits[b]))
            for b in range(logits.shape[0])]


def collapse_argmax_batch(argmaxes: np.ndarray, charset: Charset
                          ) -> List[str]:
    """Strings from precomputed per-frame argmax classes ``[B, T]``.

    Same collapse-repeats-then-drop-blanks rule as
    :func:`ctc_greedy_decode`, for callers that move only the int argmax
    off-device (the in-loop CER probes) instead of full log-probs.
    """
    argmaxes = np.asarray(argmaxes)
    out: List[str] = []
    for row in argmaxes:
        ids: List[int] = []
        prev = -1
        for v in row:
            v = int(v)
            if v != BLANK and v != prev:
                ids.append(v)
            prev = v
        out.append(charset.decode(ids))
    return out

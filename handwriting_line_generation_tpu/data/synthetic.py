"""Synthetic handwriting-like line renderer.

The reference requires the (licensed) IAM/RIMES corpora on disk; this module
provides a self-contained stand-in with the same batch contract so the whole
training/eval stack runs end-to-end without them: every character gets a
deterministic pseudo-glyph (seeded stroke set) and every "author" a
deterministic style (slant, stroke width, jitter, spacing).  HWR can reach
low CER on it and the style extractor has real writer signal to separate,
which is what the framework tests and benches need.

Images follow the reference normalization ``1 - px/128`` => background -1,
ink ~ +1 (``datasets/hw_dataset.py:156-157``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import cv2
import numpy as np

from handwriting_line_generation_tpu.charset import Charset, IAM_CHARSET


def _char_strokes(char_idx: int, n_strokes: int = 4) -> np.ndarray:
    """Deterministic stroke set for a char: [n, 4] of (x0,y0,x1,y1) in [0,1]."""
    rng = np.random.default_rng(1000 + char_idx)
    pts = rng.uniform(0.05, 0.95, size=(n_strokes + 1, 2))
    segs = np.concatenate([pts[:-1], pts[1:]], axis=1)
    return segs


@dataclasses.dataclass
class AuthorStyle:
    slant: float          # shear in x per y
    thickness: int
    width_scale: float
    jitter: float
    spacing: float

    @staticmethod
    def for_author(author_id: int) -> "AuthorStyle":
        rng = np.random.default_rng(7000 + author_id)
        return AuthorStyle(
            slant=float(rng.uniform(-0.35, 0.35)),
            thickness=int(rng.integers(1, 4)),
            width_scale=float(rng.uniform(0.7, 1.3)),
            jitter=float(rng.uniform(0.0, 1.5)),
            spacing=float(rng.uniform(0.5, 2.0)),
        )


def render_line(text: str, charset: Charset, author_id: int = 0,
                img_height: int = 64, seed: int = 0,
                max_width: Optional[int] = None) -> np.ndarray:
    """Render a text line as uint8 grayscale (255 = paper, 0 = ink)."""
    style = AuthorStyle.for_author(author_id)
    rng = np.random.default_rng(seed)
    glyph_h = int(img_height * 0.6)
    glyph_w = int(img_height * 0.45 * style.width_scale)
    space_w = max(2, int(glyph_w * 0.6))
    gap = max(1, int(2 * style.spacing))

    width = sum((space_w if c == " " else glyph_w) + gap for c in text) + 16
    img = np.full((img_height, max(width, 32)), 255, np.uint8)
    y_top = (img_height - glyph_h) // 2
    x = 8
    for c in text:
        idx = charset.char_to_idx.get(c)
        if c == " " or idx is None:
            x += space_w + gap
            continue
        segs = _char_strokes(idx)
        jx = rng.normal(0, style.jitter)
        jy = rng.normal(0, style.jitter)
        for x0, y0, x1, y1 in segs:
            ax = x + x0 * glyph_w + (1 - y0) * style.slant * glyph_h + jx
            bx = x + x1 * glyph_w + (1 - y1) * style.slant * glyph_h + jx
            ay = y_top + y0 * glyph_h + jy
            by = y_top + y1 * glyph_h + jy
            cv2.line(img, (int(round(ax)), int(round(ay))),
                     (int(round(bx)), int(round(by))), 0,
                     style.thickness, lineType=cv2.LINE_AA)
        x += glyph_w + gap
    if max_width is not None and img.shape[1] > max_width:
        img = img[:, :max_width]
    return img


def normalize_image(img_u8: np.ndarray) -> np.ndarray:
    """uint8 -> float32, reference normalization ``1 - px/128``."""
    return (1.0 - img_u8.astype(np.float32) / 128.0)


def random_text(rng: np.random.Generator, charset: Charset,
                min_len: int = 4, max_len: int = 12) -> str:
    n = int(rng.integers(min_len, max_len + 1))
    chars = list(charset.chars.replace(" ", ""))
    out = []
    for i in range(n):
        if i > 0 and rng.random() < 0.15:
            out.append(" ")
        out.append(str(rng.choice(chars)))
    return "".join(out)[:max_len]


class SyntheticCorpus:
    """Author-grouped synthetic line corpus with a stable line index."""

    def __init__(self, n_authors: int = 8, lines_per_author: int = 24,
                 charset: Charset = IAM_CHARSET, img_height: int = 64,
                 seed: int = 0, min_len: int = 4, max_len: int = 12):
        self.charset = charset
        self.img_height = img_height
        rng = np.random.default_rng(seed)
        self.records: List[Tuple[int, str, int]] = []  # author, text, seed
        for a in range(n_authors):
            for i in range(lines_per_author):
                text = random_text(rng, charset, min_len, max_len)
                self.records.append((a, text, int(rng.integers(1 << 30))))

    def __len__(self) -> int:
        return len(self.records)

    def get(self, i: int) -> Tuple[np.ndarray, str, str]:
        author, text, seed = self.records[i]
        img = render_line(text, self.charset, author, self.img_height, seed)
        return normalize_image(img), text, f"synth{author:03d}"

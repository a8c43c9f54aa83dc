"""Long-form text source for generation.

Counterpart of the reference's ``wiki_text.py`` (HF-datasets Wikipedia
paragraphs, reference-section stripping, charset filtering,
``wiki_text.py:8-125``).  This environment has no network and no HF
``datasets`` package guarantee, so the source tries HF Wikipedia first and
falls back to any local plain-text corpus (or the built-in one).  The API is
the reference's: index in, a charset-clean paragraph out.
"""

from __future__ import annotations

import re
from typing import List, Optional

from handwriting_line_generation_tpu.charset import Charset, IAM_CHARSET

_SECTION_HEADERS = ("References", "External links", "See also", "Sources",
                    "Further reading", "Bibliography", "Notes")


class WikiText:
    def __init__(self, charset: Charset = IAM_CHARSET,
                 corpus_path: Optional[str] = None,
                 min_paragraph: int = 40, try_hf: bool = False):
        self.charset = charset
        self.min_paragraph = min_paragraph
        self._paragraphs: List[str] = []
        # HF download is opt-in: zero-egress environments burn ~25s of
        # retries before failing over
        if not (try_hf and self._try_hf()):
            self._load_local(corpus_path)

    def _try_hf(self) -> bool:
        try:                                      # pragma: no cover
            import datasets
            ds = datasets.load_dataset("wikipedia", "20220301.en",
                                       split="train", streaming=True)
            it = iter(ds)
            for _ in range(512):
                art = next(it)["text"]
                self._paragraphs.extend(self._clean_article(art))
            return len(self._paragraphs) > 0
        except Exception:
            return False

    def _load_local(self, corpus_path: Optional[str]) -> None:
        if corpus_path:
            with open(corpus_path, encoding="utf-8", errors="ignore") as f:
                text = f.read()
        else:
            from handwriting_line_generation_tpu.data.text_data import _LOREM
            text = (_LOREM + "\n\n") * 64
        self._paragraphs = self._clean_article(text)

    def _clean_article(self, text: str) -> List[str]:
        # cut everything from the first references-style section header on
        for h in _SECTION_HEADERS:
            idx = text.find("\n" + h + "\n")
            if idx >= 0:
                text = text[:idx]
        keep = set(self.charset.chars)
        out = []
        for para in text.split("\n\n"):
            para = " ".join(para.split())
            para = "".join(c for c in para if c in keep)
            if len(para) >= self.min_paragraph:
                out.append(para)
        return out

    def __len__(self) -> int:
        return len(self._paragraphs)

    def __getitem__(self, i: int) -> str:
        return self._paragraphs[i % max(len(self._paragraphs), 1)]

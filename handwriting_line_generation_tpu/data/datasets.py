"""Host-side datasets and static-shape batching.

Replaces the reference's torch ``Dataset``/``DataLoader`` stack
(``datasets/hw_dataset.py``, ``datasets/author_hw_dataset.py``,
``data_loader/data_loaders.py``) with plain-numpy corpora and a
**width-bucketed** batcher: every batch is padded to the smallest configured
width bucket that fits it (pad value -1 = paper, the reference's
``PADDING_CONSTANT``, ``hw_dataset.py:22``), so XLA compiles a small fixed
set of shapes instead of one program per batch width (SURVEY.md §5.7).

Augmentation is **not** applied here — it runs on-device inside the train
step (``ops/augment.py``), which is the TPU-first split: host does file
decode + crop + resize only.

Batch contract (mirrors ``author_hw_dataset.py:91-111``; batch-major):
  image          [B, H, Wb, 1] float32
  label          [B, Lb]       int32
  label_lengths  [B]           int32
  width          [B]           int32 (true unpadded width)
  fg_mask        [B, H, Wb, 1] float32 (optional)
  gt             list[str], authors list[str], a_batch_size int
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
from collections import defaultdict
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from handwriting_line_generation_tpu.charset import (
    Charset, IAM_CHARSET, RIMES_CHARSET,
)
from handwriting_line_generation_tpu.config import DataConfig
from handwriting_line_generation_tpu.data.iam import (
    parse_form_words, parse_form_xml,
)
from handwriting_line_generation_tpu.data.rimes import parse_rimes_lines_xml
from handwriting_line_generation_tpu.data.synthetic import (
    SyntheticCorpus, normalize_image,
)

PAD_VALUE = -1.0


@dataclasses.dataclass
class LineRecord:
    author: str
    gt: str
    load: Callable[[], np.ndarray]        # -> normalized [H, W] float32
    rid: str = ""                         # stable record id (side caches)


@functools.lru_cache(maxsize=48)
def _imread_gray(img_path: str) -> np.ndarray:
    """Decoded-form LRU cache: every IAM form page holds ~9 line records,
    so per-line imread (the reference decodes per __getitem__,
    ``hw_dataset.py:120``) re-decodes each page ~9x.  48 grayscale pages
    ~= 100 MB, bounded."""
    img = cv2.imread(img_path, 0)
    if img is None:
        raise FileNotFoundError(img_path)
    img.setflags(write=False)
    return img


def load_crop_resize(img_path: str, bounds, img_height: int,
                     max_width: int) -> np.ndarray:
    """imread + line crop + height resize with width cap
    (``author_hw_dataset.py:374-397`` semantics), normalized 1 - px/128."""
    img = _imread_gray(img_path)
    y0, y1, x0, x1 = bounds
    y0, x0 = max(0, y0), max(0, x0)
    img = img[y0:y1, x0:x1]
    if img.shape[0] != img_height:
        pct = img_height / img.shape[0]
        if img.shape[1] * pct > max_width:
            pct = max_width / img.shape[1]
        img = cv2.resize(img, (0, 0), fx=pct, fy=pct,
                         interpolation=cv2.INTER_CUBIC)
        if img.shape[0] < img_height:
            d = img_height - img.shape[0]
            img = np.pad(img, ((d // 2, d - d // 2), (0, 0)),
                         constant_values=255)
    elif img.shape[1] > max_width:
        pct = max_width / img.shape[1]
        img = cv2.resize(img, (0, 0), fx=pct, fy=pct,
                         interpolation=cv2.INTER_CUBIC)
    return normalize_image(img)


def fg_mask_of(img_norm: np.ndarray) -> np.ndarray:
    """Otsu + 9x9 elliptic dilation foreground mask in {0,1}
    (``author_hw_dataset.py:216-221``)."""
    u8 = np.clip((1.0 - img_norm) * 128.0, 0, 255).astype(np.uint8)
    _, binarized = cv2.threshold(u8, 0, 255,
                                 cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    binarized = 255 - binarized
    ele = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (9, 9))
    return (cv2.dilate(binarized, ele) / 255.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Corpora
# ---------------------------------------------------------------------------


def iam_records(data_dir: str, split: str, img_height: int,
                max_width: int,
                sets_path: Optional[str] = None,
                words: bool = False) -> List[LineRecord]:
    """IAM line (or word, ``parseIAM.py:11-86`` lineage) records for a
    split, via a ``sets.json`` ({split: [form names]}) next to the data
    or given explicitly."""
    sets_path = sets_path or os.path.join(data_dir, "sets.json")
    with open(sets_path) as f:
        names = json.load(f)[split]
    parse = parse_form_words if words else parse_form_xml
    records: List[LineRecord] = []
    for name in names:
        xml = os.path.join(data_dir, "xmls", name + ".xml")
        lines, writer = parse(xml)
        img_path = os.path.join(data_dir, "forms", name + ".png")
        for j, line in enumerate(lines):
            records.append(LineRecord(
                author=writer, gt=line.text,
                load=(lambda p=img_path, b=line.bounds:
                      load_crop_resize(p, b, img_height, max_width)),
                rid=f"{name}-{j}"))
    return records


def rimes_records(data_dir: str, split: str, img_height: int,
                  max_width: int) -> List[LineRecord]:
    """RIMES line records; "authors" are pages
    (``author_rimeslines_dataset.py:119-124``)."""
    xml_name = ("lines_training_2011.xml" if split == "train"
                else "lines_eval_2011_annotated.xml")
    pages = parse_rimes_lines_xml(os.path.join(data_dir, xml_name))
    records: List[LineRecord] = []
    for image, lines in pages.items():
        img_path = os.path.join(data_dir, "images_gray", image)
        for j, line in enumerate(lines):
            records.append(LineRecord(
                author=image, gt=line.text,
                load=(lambda p=img_path, b=line.bounds:
                      load_crop_resize(p, b, img_height, max_width)),
                rid=f"{image}-{j}"))
    return records


def synthetic_records(split: str, img_height: int, charset: Charset,
                      n_authors: int = 8, lines_per_author: int = 24,
                      version: int = 2, **kw) -> List[LineRecord]:
    seed = {"train": 0, "valid": 1, "test": 2}.get(split, 3)
    # v3 ("hard") corpus: held-out splits use disjoint author ids so the
    # val reader score measures generalization to unseen writer styles,
    # not memorization of the train styles.
    offset = 0
    if version >= 3:
        offset = {"train": 0, "valid": 100_000, "test": 200_000}.get(
            split, 300_000)
    corpus = SyntheticCorpus(n_authors, lines_per_author, charset,
                             img_height, seed=seed, version=version,
                             author_offset=offset, **kw)
    # author string straight from the index — corpus.get() would render the
    # line (18 ms each on the v3 renderer), turning construction of a
    # 480-author corpus into minutes of eager rendering
    return [LineRecord(author=f"synth{corpus.records[i][0]:05d}",
                       gt=corpus.records[i][1],
                       load=(lambda c=corpus, j=i: c.get(j)[0]),
                       rid=f"syn-{split}-{i}")
            for i in range(len(corpus))]


# ---------------------------------------------------------------------------
# Batchers
# ---------------------------------------------------------------------------


def _bucket(value: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if value <= b:
            return b
    return buckets[-1]


def _assemble(records: List[LineRecord], charset: Charset,
              width_buckets, label_buckets, with_fg: bool,
              a_batch_size: int) -> Dict:
    imgs = [r.load() for r in records]
    H = imgs[0].shape[0]
    wb = _bucket(max(i.shape[1] for i in imgs), width_buckets)
    labels = [charset.encode(r.gt) for r in records]
    lb = _bucket(max(max(len(l) for l in labels), 1), label_buckets)

    B = len(records)
    image = np.full((B, H, wb, 1), PAD_VALUE, np.float32)
    label = np.zeros((B, lb), np.int32)
    lens = np.zeros(B, np.int32)
    widths = np.zeros(B, np.int32)
    fg = np.zeros((B, H, wb, 1), np.float32) if with_fg else None
    for i, (img, lab) in enumerate(zip(imgs, labels)):
        w = min(img.shape[1], wb)
        image[i, :, :w, 0] = img[:, :w]
        widths[i] = w
        n = min(len(lab), lb)
        label[i, :n] = lab[:n]
        lens[i] = n
        if with_fg:
            fg[i, :, :w, 0] = fg_mask_of(img[:, :w])
    out = {
        "image": image, "label": label, "label_lengths": lens,
        "width": widths, "gt": [r.gt for r in records],
        "author": [r.author for r in records],
        "rid": [r.rid for r in records],
        "a_batch_size": a_batch_size,
    }
    if with_fg:
        out["fg_mask"] = fg
    return out


# ---------------------------------------------------------------------------
# Precomputed side caches (reference ``author_hw_dataset.py:255-290``):
# ``spaced_loc`` — per-record cached alignments consumed by the trainer in
# place of on-the-fly Viterbi/DTW; ``style_loc`` — precomputed style banks
# attached per line (a random same-author style whose source group did NOT
# include the line, the reference's id-exclusion rule).
# ---------------------------------------------------------------------------


class SideCaches:
    def __init__(self, cfg: DataConfig):
        self.spaced = None
        self.styles = None
        self._leaky_authors: set = set()
        if cfg.spaced_loc:
            self.spaced = np.load(cfg.spaced_loc, allow_pickle=False)
        self.identity_spaced = cfg.identity_spaced
        if cfg.style_loc:
            import glob as _glob
            paths = sorted(_glob.glob(cfg.style_loc))
            if not paths and not cfg.style_loc.endswith("*"):
                # the reference appends '*' to non-glob style_loc paths
                # before globbing (author_hw_dataset.py:258-262) — a prefix
                # path must match its shard files, not be np.load'ed itself
                paths = sorted(_glob.glob(cfg.style_loc + "*"))
            paths = paths or [cfg.style_loc]
            by_author: Dict[str, List] = defaultdict(list)
            for p in paths:
                d = np.load(p, allow_pickle=True)
                ids = d["ids"] if "ids" in d else [""] * len(d["authors"])
                for s, a, i in zip(d["styles"], d["authors"], ids):
                    by_author[str(a)].append((s, set(str(i).split(";"))))
            self.styles = dict(by_author)

    @property
    def active(self) -> bool:
        return (self.spaced is not None or self.identity_spaced
                or self.styles is not None)

    def attach(self, batch: Dict, records: List[LineRecord],
               rng: np.random.Generator) -> None:
        B = len(records)
        if self.identity_spaced:
            # no_spacing_for_spaced: the label sequence itself is the
            # "alignment" (no blanks, one frame per char)
            batch["spaced_label"] = batch["label"].copy()
        elif self.spaced is not None:
            T = batch["image"].shape[2] // 4
            arr = np.zeros((B, T), np.int32)
            for i, r in enumerate(records):
                row = np.asarray(self.spaced[r.rid], np.int32).ravel()
                arr[i, :min(row.size, T)] = row[:T]
            batch["spaced_label"] = arr
        if self.styles is not None:
            rows = []
            for r in records:
                cand = self.styles.get(r.author)
                if not cand:
                    raise KeyError(f"style_loc bank has no styles for "
                                   f"author {r.author!r}")
                ok = [s for s, ids in cand if r.rid not in ids]
                if not ok:
                    # the reference *asserts* exclusion-viable banks
                    # (author_hw_dataset.py:265-279); we degrade to the full
                    # candidate set but loudly — silent identity leakage into
                    # style conditioning would skew every downstream metric
                    if r.author not in self._leaky_authors:
                        self._leaky_authors.add(r.author)
                        import warnings
                        warnings.warn(
                            f"style_loc: every bank row for author "
                            f"{r.author!r} was computed from a group "
                            f"containing record {r.rid!r}; falling back to "
                            f"ALL rows — identity may leak into style "
                            f"conditioning (rebuild the bank with more "
                            f"groups per author)", RuntimeWarning)
                    ok = [s for s, _ in cand]
                rows.append(ok[int(rng.integers(len(ok)))])
            batch["style"] = np.stack(rows).astype(np.float32)


class LineBatcher:
    """Flat line batches (HWR pretraining; ``datasets/hw_dataset.py``)."""

    def __init__(self, records: List[LineRecord], charset: Charset,
                 batch_size: int, cfg: DataConfig, with_fg: bool = False):
        self.records = records
        self.charset = charset
        self.batch_size = batch_size
        self.cfg = cfg
        self.with_fg = with_fg
        self.caches = SideCaches(cfg)

    def __len__(self):
        return max(1, len(self.records) // self.batch_size)

    def batches(self, rng: np.random.Generator,
                shuffle: bool = True) -> Iterator[Dict]:
        order = np.arange(len(self.records))
        if shuffle:
            rng.shuffle(order)
        for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
            recs = [self.records[j] for j in order[i:i + self.batch_size]]
            batch = _assemble(recs, self.charset, self.cfg.width_buckets,
                              self.cfg.label_buckets, self.with_fg, 1)
            if self.caches.active:
                self.caches.attach(batch, recs, rng)
            yield batch


class AuthorBatcher:
    """Author-grouped batches: ``batch_size`` authors x ``a_batch_size``
    lines, with the reference's leftover-fill grouping
    (``author_hw_dataset.py:166-189``)."""

    def __init__(self, records: List[LineRecord], charset: Charset,
                 batch_size: int, a_batch_size: int, cfg: DataConfig,
                 with_fg: bool = True, pair_combinations: bool = False):
        self.charset = charset
        self.batch_size = batch_size
        self.a = a_batch_size
        self.cfg = cfg
        self.with_fg = with_fg
        self.caches = SideCaches(cfg)
        by_author: Dict[str, List[LineRecord]] = defaultdict(list)
        for r in records:
            by_author[r.author].append(r)
        self.groups: List[List[LineRecord]] = []
        for author, lines in sorted(by_author.items()):
            if pair_combinations and self.a == 2:
                # RIMES pairs every combination of a page's lines when
                # a_batch_size == 2; single-line pages contribute nothing
                # (author_rimeslines_dataset.py:362)
                import itertools
                self.groups.extend(
                    [list(p) for p in itertools.combinations(lines, 2)])
                continue
            for i in range(len(lines) // self.a):
                self.groups.append(lines[i * self.a:(i + 1) * self.a])
            leftover = len(lines) % self.a
            if leftover:
                fill = self.a - leftover
                self.groups.append(lines[:fill] + lines[-leftover:])

    def __len__(self):
        return max(1, len(self.groups) // self.batch_size)

    def batches(self, rng: np.random.Generator,
                shuffle: bool = True) -> Iterator[Dict]:
        order = np.arange(len(self.groups))
        if shuffle:
            rng.shuffle(order)
        for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
            recs = [r for j in order[i:i + self.batch_size]
                    for r in self.groups[j]]
            batch = _assemble(recs, self.charset, self.cfg.width_buckets,
                              self.cfg.label_buckets, self.with_fg, self.a)
            if self.caches.active:
                self.caches.attach(batch, recs, rng)
            yield batch


def forever(batcher, seed: int = 0, shuffle: bool = True) -> Iterator[Dict]:
    """Infinite epoch-cycling iterator (the trainers are iteration-based)."""
    epoch = 0
    while True:
        rng = np.random.default_rng(seed + epoch)
        yield from batcher.batches(rng, shuffle)
        epoch += 1


def get_charset(cfg: DataConfig) -> Charset:
    if cfg.charset == "iam":
        return IAM_CHARSET
    if cfg.charset == "rimes":
        return RIMES_CHARSET
    return Charset.load(cfg.charset)


def make_batcher(cfg: DataConfig, split: str):
    """Dataset dispatch (replaces ``data_loader/data_loaders.py:11-42``)."""
    charset = get_charset(cfg)
    if cfg.dataset == "synthetic":
        records = synthetic_records(split, cfg.img_height, charset,
                                    n_authors=cfg.synthetic_authors,
                                    lines_per_author=cfg.synthetic_lines,
                                    version=cfg.synthetic_version)
    elif cfg.dataset in ("iam_author", "iam_lines", "iam_words"):
        records = iam_records(cfg.data_dir, split, cfg.img_height,
                              cfg.max_width,
                              words=cfg.dataset == "iam_words")
    elif cfg.dataset == "rimes_author":
        records = rimes_records(cfg.data_dir, split, cfg.img_height,
                                cfg.max_width)
    else:
        raise ValueError(f"unknown dataset {cfg.dataset!r}")
    # Multi-host SPMD (SURVEY.md §5.8): each process pipelines only its own
    # shard of the dataset and assembles 1/process_count of the global batch
    # (whole author groups stay process-local); ``place_global`` stitches
    # the per-host shards into one global batch-sharded array.
    import jax
    batch_size = cfg.batch_size
    if jax.process_count() > 1:
        from handwriting_line_generation_tpu.parallel.mesh import (
            local_batch_size, shard_records_for_host)
        line_level = cfg.dataset in ("iam_lines", "iam_words")
        if line_level:                # batch_size counts lines
            batch_size = local_batch_size(cfg.batch_size, 1)
        else:                         # batch_size counts author groups
            batch_size = local_batch_size(
                cfg.batch_size * cfg.a_batch_size,
                cfg.a_batch_size) // cfg.a_batch_size
        records = shard_records_for_host(
            records, by_author=None if line_level else (lambda r: r.author))
    if cfg.dataset in ("iam_lines", "iam_words"):
        return LineBatcher(records, charset, batch_size, cfg,
                           with_fg=False)
    return AuthorBatcher(records, charset, batch_size, cfg.a_batch_size,
                         cfg, with_fg=cfg.fg_masks,
                         pair_combinations=cfg.dataset == "rimes_author")


class Prefetcher:
    """Background-thread batch prefetch.

    The reference overlaps host work with compute via DataLoader worker
    processes (``data_loaders.py:28-31``); here a single daemon thread keeps
    a small queue of assembled batches ahead of the device step (cv2 decode +
    fg-mask Otsu cost ~30-60 ms/batch on one host core, a third of a GAN
    step).  Wrap any iterator: ``Prefetcher(forever(batcher))``.
    """

    def __init__(self, iterator: Iterator[Dict], depth: int = 4):
        import queue
        import threading
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err = None

        def worker():
            try:
                for item in iterator:
                    self._q.put(item)
            except BaseException as e:            # surface in the consumer
                self._err = e
                self._q.put(None)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            raise (self._err or StopIteration)
        return item


def quantize_image_u8(img_f32: np.ndarray) -> np.ndarray:
    """f32 normalized image -> raw u8 pixels for device transfer.

    Inverse of ``1 - px/128``; exact for any image whose pixels came from
    u8 sources (all of ours do — IAM/RIMES decode + synthetic renderer).
    Devices dequantize with :func:`ops.augment.dequantize_image`.
    """
    return np.clip(np.rint((1.0 - img_f32) * 128.0), 0, 255).astype(
        np.uint8)

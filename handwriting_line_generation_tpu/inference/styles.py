"""Batched style extraction over datasets.

Replaces ``get_styles.py``: iterate a dataset, run ``extract_style`` per
author group, and store ``{styles, authors, ids}`` to disk.  The reference
pickles torch tensors (``get_styles.py:41-45``); we store ``.npz`` (and can
read them back into the by-author dict ``generate.py:212-239`` builds).
"""

from __future__ import annotations

from collections import defaultdict
from functools import partial
from typing import Dict, List, Optional, Tuple

import os

import jax
import jax.numpy as jnp
import numpy as np

from handwriting_line_generation_tpu.models.hw_with_style import (
    HWWithStyle, pack_style,
)


class StyleExtractor:
    def __init__(self, model: HWWithStyle, params, tap=None):
        self.model = model
        self.params = params
        # ``tap(model, params, image, frames)``: optional extra computation
        # fused INTO the extraction jit — one compiled executable and one
        # device dispatch per batch instead of two.  Through a high-latency
        # device tunnel the dispatch count, not the FLOPs, dominates a
        # dataset sweep (the quality harness' FID feature pass uses this).
        self.tap = tap
        self._fns: Dict[int, object] = {}

    def _extract(self, image, frames, a_batch: int):
        # jit cache keyed by a_batch (a single closure would bake the first
        # call's group size into the trace and silently misgroup later
        # batchers with a different a_batch_size).  ``frames`` masks
        # recognizer frames past each sample's true ink width — the same
        # masking the training steps apply, so extracted styles match the
        # ones training computed.
        fn = self._fns.get(a_batch)
        if fn is None:
            def apply(p, im, fr, a=a_batch):
                style, pred = self.model.apply(
                    {"params": p}, im, a, frame_lengths=fr,
                    method="extract_style")
                extra = (self.tap(self.model, p, im, fr)
                         if self.tap is not None else ())
                # tuple styles are stored packed [g | spacing | char.flat] —
                # the generate flows unpack them (the reference pickles raw
                # tuples, get_styles.py:175-255; a flat matrix keeps npz +
                # distance-metric consumers uniform).  Identity for
                # single-style extractors.
                return pack_style(style), pred, extra

            fn = jax.jit(apply)
            self._fns[a_batch] = fn
        return fn(self.params, image, frames)

    def _apply_emb(self, style):
        """Pass raw styles through the generator's style-mapping MLP
        (the ``-S`` option of ``get_styles.py:184-186``)."""
        from handwriting_line_generation_tpu.models.generator import StyleMLP
        sub = self.params["generator"]["StyleMLP_0"]
        n_layers = sum(1 for k in sub if k.startswith("Dense_"))
        style_dim = int(np.asarray(sub["Dense_0"]["kernel"]).shape[1])
        mlp = StyleMLP(style_dim=style_dim, n_layers=n_layers)
        return mlp.apply({"params": sub}, style)

    def extract_dataset(self, batcher, max_batches: Optional[int] = None,
                        through_emb: bool = False,
                        on_batch=None, with_pred: bool = False) -> Dict:
        """-> {'styles': [N, D], 'authors': [N], 'ids': [N]} (one entry per
        author group, matching the per-instance loop of
        ``get_styles.py:175-255``).

        ``on_batch(batch)``: optional hook invoked on every consumed batch —
        lets callers piggyback host-side work on this single dataset sweep
        instead of re-iterating the pipeline.  Device-side extras belong in
        the constructor's ``tap`` (fused into the extraction dispatch);
        their per-batch outputs come back under ``'tap'``.

        ``with_pred``: also return the per-batch recognizer log-probs under
        ``'pred'`` (list of [B, T, C] arrays, frame-masked to blank past each
        line's true ink width).  These are computed inside extraction anyway
        (``extract_style`` conditions styles on them), so surfacing them adds
        zero device compute — the quality harness reads real-line CER from
        them on the same sweep.

        Host syncs are deferred to the end of the sweep: the loop only
        *dispatches*, so device compute and the next batch's host-side
        prep/transfer overlap (a sync per batch would serialize every
        round-trip through the device tunnel).
        """
        styles, authors, ids, taps, preds = [], [], [], [], []
        rng = np.random.default_rng(0)
        for i, batch in enumerate(batcher.batches(rng, shuffle=False)):
            if max_batches is not None and i >= max_batches:
                break
            if on_batch is not None:
                on_batch(batch)
            a = batch.get("a_batch_size", 1)
            image = jnp.asarray(batch["image"])
            frames = jnp.clip((jnp.asarray(batch["width"]) + 3) // 4, 1,
                              image.shape[2] // 4)
            style, pred, extra = self._extract(image, frames, a)
            if with_pred:
                preds.append(pred)
            if self.tap is not None:
                taps.append(extra)
            if through_emb:
                style = self._apply_emb(style)
            s = style[::a]                              # one per author group
            styles.append(s)
            authors.extend(batch["author"][::a])
            # per-group id = ";"-joined member record ids, so the dataset's
            # style_loc exclusion rule ("don't hand a line a style computed
            # from itself", author_hw_dataset.py:271-276) can apply
            rids = batch.get("rid")
            for j in range(0, len(batch["author"]), a):
                if rids and any(rids[j:j + a]):
                    ids.append(";".join(rids[j:j + a]))
                else:
                    ids.append(f"{batch['author'][j]}_{i}_{j}")
        out = {"styles": np.asarray(jnp.concatenate(styles, axis=0)),
               "authors": authors, "ids": ids}
        if self.tap is not None:
            out["tap"] = [np.asarray(t) for t in taps]
        if with_pred:
            out["pred"] = [np.asarray(p) for p in preds]
        return out


def save_styles(path: str, data: Dict) -> None:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    np.savez_compressed(path, styles=data["styles"],
                        authors=np.array(data["authors"]),
                        ids=np.array(data["ids"]))


def load_styles(path: str) -> Dict:
    z = np.load(path, allow_pickle=True)
    return {"styles": z["styles"], "authors": list(z["authors"]),
            "ids": list(z["ids"])}


def styles_by_author(data: Dict) -> Dict[str, np.ndarray]:
    """Author -> [n_i, D] stack (``generate.py:212-239``)."""
    by: Dict[str, List[np.ndarray]] = defaultdict(list)
    for s, a in zip(data["styles"], data["authors"]):
        by[str(a)].append(s)
    return {a: np.stack(v) for a, v in by.items()}


# --- style-space statistics (play_styles.py / eval_writer_id.py) ----------


def inter_intra_distances(data: Dict, metric: str = "l2") -> Dict[str, float]:
    """Mean/std of inter- vs intra-author style distances
    (``play_styles.py:25-39``; BASELINE.md rows 1-3)."""
    styles = np.asarray(data["styles"])
    authors = np.asarray(data["authors"])
    if metric == "l1":
        d = np.sum(np.abs(styles[:, None] - styles[None, :]), axis=-1)
    else:
        d = np.linalg.norm(styles[:, None] - styles[None, :], axis=-1)
    same = authors[:, None] == authors[None, :]
    triu = np.triu(np.ones_like(same, bool), 1)
    intra = d[same & triu]
    inter = d[~same & triu]
    return {"intra_mean": float(intra.mean()) if intra.size else 0.0,
            "intra_std": float(intra.std()) if intra.size else 0.0,
            "inter_mean": float(inter.mean()) if inter.size else 0.0,
            "inter_std": float(inter.std()) if inter.size else 0.0}


def writer_id_retrieval(data: Dict, metric: str = "l2",
                        ks: Tuple[int, ...] = (1, 5, 20)) -> Dict[str, float]:
    """Top-k same-author retrieval + mean rank (``eval_writer_id.py:15-91``)."""
    styles = np.asarray(data["styles"])
    authors = np.asarray(data["authors"])
    n = len(styles)
    if metric == "l1":
        d = np.sum(np.abs(styles[:, None] - styles[None, :]), axis=-1)
    else:
        d = np.linalg.norm(styles[:, None] - styles[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    order = np.argsort(d, axis=1)
    same = authors[order] == authors[:, None]
    out = {}
    for k in ks:
        out[f"top{k}"] = float(np.mean(same[:, :k].any(axis=1)))
    first_hit = np.argmax(same, axis=1)
    has_hit = same.any(axis=1)
    out["mean_rank"] = float(np.mean(np.where(has_hit, first_hit, n)))
    return out


def umap_embed(data: Dict, n_components: int = 2) -> np.ndarray:
    """2-D style embedding for plotting (``umap_styles.py:105-148``).

    Uses UMAP when available; falls back to PCA (numpy SVD) — the plot
    semantics (per-author coloring) are unchanged.
    """
    styles = np.asarray(data["styles"], np.float64)
    try:
        import umap                                     # pragma: no cover
        return umap.UMAP(n_components=n_components).fit_transform(styles)
    except ImportError:
        x = styles - styles.mean(0)
        _, _, vt = np.linalg.svd(x, full_matrices=False)
        return x @ vt[:n_components].T


def plot_style_map(data: Dict, path: str,
                   author_mean: bool = False,
                   thumbnail_dir: Optional[str] = None) -> None:
    """Scatter of the 2-D embedding, per-author colors
    (``umap_styles.py:56-88``); with ``thumbnail_dir``, place per-style
    line-image thumbnails named ``<id>.png`` at their embedding positions
    (the reference's image mode, ``umap_styles.py:105-148``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    if author_mean:
        by = styles_by_author(data)
        data = {"styles": np.stack([v.mean(0) for v in by.values()]),
                "authors": list(by.keys()),
                "ids": list(by.keys())}
    emb = umap_embed(data)
    authors = np.asarray(data["authors"])
    uniq = sorted(set(map(str, authors)))
    cmap = plt.get_cmap("tab20")
    fig, ax = plt.subplots(figsize=(8, 8))
    for i, a in enumerate(uniq):
        m = authors == a
        ax.scatter(emb[m, 0], emb[m, 1], s=12, color=cmap(i % 20), label=a)
    if thumbnail_dir:
        from matplotlib.offsetbox import AnnotationBbox, OffsetImage
        for j, sid in enumerate(map(str, data["ids"])):
            f = os.path.join(thumbnail_dir, f"{sid}.png")
            if not os.path.exists(f):
                continue
            img = plt.imread(f)
            ab = AnnotationBbox(OffsetImage(img, zoom=0.25, cmap="gray"),
                                (emb[j, 0], emb[j, 1]), frameon=False)
            ax.add_artist(ab)
    if len(uniq) <= 20:
        ax.legend(fontsize=6)
    fig.savefig(path, dpi=120)
    plt.close(fig)

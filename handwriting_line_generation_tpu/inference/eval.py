"""Evaluation harness and render helpers.

Replaces ``new_eval.py`` + ``evaluators/hwdataset_eval.py``: run the model
over a dataset split, aggregate CER/WER and reconstruction losses, dump
original-vs-reconstruction side-by-side images and generated-line images,
and side-channel style/spaced outputs (``new_eval.py:249-476``).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from handwriting_line_generation_tpu.charset import (
    Charset, ctc_greedy_decode_batch,
)
from handwriting_line_generation_tpu.models.hw_with_style import (
    HWWithStyle, pack_style,
)
from handwriting_line_generation_tpu.ops.ctc import mask_frames_to_blank
from handwriting_line_generation_tpu.utils.error_rates import (
    batch_cer_wer, cer as cer_fn,
)


def _to_u8(img: np.ndarray) -> np.ndarray:
    return ((1.0 - img[..., 0]) * 127.5).clip(0, 255).astype(np.uint8)


def side_by_side(orig: np.ndarray, recon: np.ndarray,
                 border: int = 2) -> np.ndarray:
    """Original above reconstruction with a divider, per sample
    (``hwdataset_eval.py:114-264`` layout)."""
    o, r = _to_u8(orig), _to_u8(recon)
    w = max(o.shape[1], r.shape[1])
    pad = lambda x: np.pad(x, ((0, 0), (0, w - x.shape[1])),
                           constant_values=255)
    div = np.zeros((border, w), np.uint8)
    return np.concatenate([pad(o), div, pad(r)], axis=0)


class Evaluator:
    """Generic split evaluator (replaces the ``<Dataset>_eval`` dispatch,
    ``new_eval.py:194``)."""

    def __init__(self, model: HWWithStyle, params: Dict, charset: Charset):
        self.model = model
        self.params = params
        self.charset = charset
        self._recog = jax.jit(lambda p, im, fr: mask_frames_to_blank(
            self.model.apply({"params": p}, im, method="recognize"), fr))
        self._auto: Dict[int, Any] = {}
        self._gen: Dict[int, Any] = {}

    def _autoencode(self, image, label, lens, frames, a_batch: int):
        # jit cache keyed by a_batch — a single cached closure would bake
        # the first call's a_batch into the trace and silently misgroup
        # author lines for batchers with a different a_batch_size.
        # ``frames`` masks recognizer frames past the true ink width, the
        # same masking the training steps apply — so eval reconstructions
        # (and the spaced_loc cache dumped from aux) see exactly the
        # alignments training would compute.
        fn = self._auto.get(a_batch)
        if fn is None:
            fn = jax.jit(
                lambda p, im, lb, ln, fr, a=a_batch: self.model.apply(
                    {"params": p}, im, lb, ln, a,
                    method="autoencode", frame_lengths=fr,
                    rngs={"noise": jax.random.PRNGKey(0)}))
            self._auto[a_batch] = fn
        return fn(self.params, image, label, lens, frames)

    def _generate(self, label, lens, style, spaced_len: int):
        fn = self._gen.get(spaced_len)
        if fn is None:
            fn = jax.jit(lambda p, lb, ln, st, k, s=spaced_len:
                         self.model.apply(
                             {"params": p}, lb, ln, st, k, spaced_len=s,
                             method="generate",
                             rngs={"noise": jax.random.PRNGKey(1)}))
            self._gen[spaced_len] = fn
        img, _ = fn(self.params, label, lens, style, jax.random.PRNGKey(0))
        return img

    def run(self, batcher, max_batches: Optional[int] = None,
            out_dir: Optional[str] = None,
            save_images: bool = False,
            save_styles: bool = False,
            save_spaced: bool = False,
            save_preds: bool = False,
            save_nns: bool = False,
            save_gen: bool = False) -> Dict:
        """Aggregate metrics over a split; optional side-channel dumps.

        ``save_preds`` writes a per-sample prediction CSV
        (``new_eval.py`` ``save_preds`` channel); ``save_nns`` writes each
        sample's nearest neighbors in style space with author labels (the
        memorization probe of ``new_eval.py`` ``save_nns``); ``save_gen``
        renders each sample's text in its own extracted style and dumps
        ``gen_*.png`` (the generated-line channel of
        ``hwdataset_eval.py:267-279``).
        """
        import cv2
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        totals: Dict[str, float] = {}
        styles_acc: List[np.ndarray] = []
        nn_styles: List[np.ndarray] = []
        nn_authors: List[str] = []
        spaced_acc: Dict[str, np.ndarray] = {}
        authors: List[str] = []
        pred_rows: List[str] = []
        n = 0
        rng = np.random.default_rng(0)
        for i, batch in enumerate(batcher.batches(rng, shuffle=False)):
            if max_batches is not None and i >= max_batches:
                break
            image = jnp.asarray(batch["image"])
            label = jnp.asarray(batch["label"])
            lens = jnp.asarray(batch["label_lengths"])
            # HWR metrics (frames past true ink width masked to blank)
            frames = jnp.clip((jnp.asarray(batch["width"]) + 3) // 4, 1,
                              image.shape[2] // 4)
            logp = self._recog(self.params, image, frames)
            preds = ctc_greedy_decode_batch(np.asarray(logp), self.charset)
            cer, wer = batch_cer_wer(batch["gt"], preds)
            totals["CER"] = totals.get("CER", 0) + cer
            totals["WER"] = totals.get("WER", 0) + wer
            if save_preds:
                for b, (gt, pr) in enumerate(zip(batch["gt"], preds)):
                    au = batch["author"][b] if "author" in batch else ""
                    pred_rows.append(
                        f'{n},{b},"{au}","{_csv(gt)}","{_csv(pr)}",'
                        f"{cer_fn(gt, pr):.4f}")
            # reconstruction
            if self.model.cfg.style.kind != "none" and \
                    self.model.cfg.generator.kind != "none":
                recon, aux = self._autoencode(
                    image, label, lens, frames, batch.get("a_batch_size", 1))
                if save_nns:
                    nn_styles.append(np.asarray(pack_style(aux["style"])))
                    nn_authors.extend(batch.get(
                        "author", [""] * image.shape[0]))
                auto = float(jnp.mean(jnp.abs(recon - image)))
                totals["autoLoss"] = totals.get("autoLoss", 0) + auto
                if save_styles:
                    a = batch.get("a_batch_size", 1)
                    styles_acc.append(
                        np.asarray(pack_style(aux["style"]))[::a])
                    authors.extend(batch["author"][::a])
                if save_spaced:
                    # keyed by record id: the dataset's spaced_loc cache
                    # (reference author_hw_dataset.py:283-290) reads these
                    # back per line
                    sl = np.asarray(aux["spaced_label"])
                    for b, rid in enumerate(batch.get(
                            "rid", [f"{i}-{b}" for b in range(len(sl))])):
                        spaced_acc[rid or f"{i}-{b}"] = sl[b]
                if save_images and out_dir:
                    for b in range(min(4, image.shape[0])):
                        img = side_by_side(np.asarray(image[b]),
                                           np.asarray(recon[b]))
                        cv2.imwrite(os.path.join(
                            out_dir, f"recon_{i}_{b}.png"), img)
                if save_gen and out_dir:
                    gen = self._generate(label, lens, aux["style"],
                                         image.shape[2] // 4)
                    for b in range(min(4, image.shape[0])):
                        cv2.imwrite(
                            os.path.join(out_dir, f"gen_{i}_{b}.png"),
                            _to_u8(np.asarray(gen[b])))
            n += 1
        out = {k: v / max(n, 1) for k, v in totals.items()}
        if save_styles and styles_acc:
            np.savez_compressed(
                os.path.join(out_dir or ".", "styles.npz"),
                styles=np.concatenate(styles_acc), authors=np.array(authors))
        if save_spaced and spaced_acc and out_dir:
            np.savez_compressed(os.path.join(out_dir, "spaced.npz"),
                                **spaced_acc)
        if save_preds and pred_rows:
            with open(os.path.join(out_dir or ".", "preds.csv"), "w") as f:
                f.write("batch,index,author,gt,pred,cer\n")
                f.write("\n".join(pred_rows) + "\n")
        if save_nns and nn_styles:
            s = np.concatenate(nn_styles)                  # [N, D]
            d = np.linalg.norm(s[:, None] - s[None, :], axis=-1)
            np.fill_diagonal(d, np.inf)
            order = np.argsort(d, axis=1)[:, :3]
            with open(os.path.join(out_dir or ".", "nns.csv"), "w") as f:
                f.write("index,author,nn1,nn1_author,nn1_dist,"
                        "nn2,nn2_author,nn2_dist,nn3,nn3_author,nn3_dist\n")
                for i in range(s.shape[0]):
                    cells = [str(i), f'"{nn_authors[i]}"']
                    for j in order[i]:
                        cells += [str(j), f'"{nn_authors[j]}"',
                                  f"{d[i, j]:.4f}"]
                    f.write(",".join(cells) + "\n")
        return out


def _csv(s: str) -> str:
    return s.replace('"', '""')

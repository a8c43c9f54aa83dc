"""Repeatable generation-quality evaluation.

One command -> one JSON dict with the BASELINE.md quality targets:

- **gen-CER**: a frozen recognizer reads lines the generator rendered from
  corpus text with interpolated dataset styles (the reference measures this
  ad hoc through its trainer valid loop, ``hw_with_style_trainer.py:894-914``;
  here it is a standalone harness so runs are comparable across checkpoints).
- **writer-ID retrieval** (top-1/5/20 + mean rank, ``eval_writer_id.py:15-91``)
  and **inter/intra style distances** (``play_styles.py:25-39``).
- **FID**: Frechet distance between frozen-HWR conv features of real and
  generated lines.  The reference repo ships no FID implementation; the
  BASELINE targets name one, so we use the domain-appropriate feature
  extractor (the handwriting recognizer's conv trunk, pooled over true ink
  frames) rather than an ImageNet Inception net.
"""

from __future__ import annotations

import sys
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_T0 = time.time()


def _mark(msg: str) -> None:
    """Stage-timing breadcrumb on stderr — the harness chains several
    multi-minute device phases, and when a driver timeout kills it the
    last mark says which phase ate the budget."""
    print(f"[quality +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)

from handwriting_line_generation_tpu.charset import (
    Charset, ctc_greedy_decode_batch,
)
from handwriting_line_generation_tpu.inference.generate import (
    GenerationSession,
)
from handwriting_line_generation_tpu.inference.styles import (
    StyleExtractor, inter_intra_distances, writer_id_retrieval,
)
from handwriting_line_generation_tpu.models.hw_with_style import HWWithStyle
from handwriting_line_generation_tpu.ops.ctc import mask_frames_to_blank
from handwriting_line_generation_tpu.utils.error_rates import batch_cer_wer


def frechet_distance(feat_a: np.ndarray, feat_b: np.ndarray) -> float:
    """FID formula ||mu_a - mu_b||^2 + tr(Sa + Sb - 2 sqrt(Sa Sb)).

    The trace of the matrix square root is computed from the eigenvalues of
    the (diagonalizable, similarity-symmetric) product ``Sa @ Sb`` — no
    scipy dependency.
    """
    mu_a, mu_b = feat_a.mean(0), feat_b.mean(0)
    sa = np.cov(feat_a, rowvar=False) + 1e-6 * np.eye(feat_a.shape[1])
    sb = np.cov(feat_b, rowvar=False) + 1e-6 * np.eye(feat_b.shape[1])
    eig = np.linalg.eigvals(sa @ sb)
    tr_sqrt = np.sqrt(np.clip(eig.real, 0.0, None)).sum()
    return float(((mu_a - mu_b) ** 2).sum() + np.trace(sa) + np.trace(sb)
                 - 2.0 * tr_sqrt)


class QualityEvaluator:
    """Checkpoint quality harness over a dataset split + text corpus."""

    def __init__(self, model: HWWithStyle, params: Dict, charset: Charset,
                 seed: int = 0):
        self.model = model
        self.params = params
        self.charset = charset
        self.seed = seed
        self._recog = jax.jit(lambda p, im, fr: mask_frames_to_blank(
            self.model.apply({"params": p}, im, method="recognize"), fr))
        # frozen-HWR conv features pooled over true ink frames (FID);
        # only the conv recognizer exposes features
        self.has_features = model.cfg.hwr.kind == "cnn_only"
        self._feats = jax.jit(self._feat_fn) if self.has_features else None

    def _feat_fn(self, params, image, frames):
        _, skip = self.model.apply(
            {"params": params}, image, True,
            method=lambda m, x, rf: m.hwr(x, return_features=rf))
        t = skip.shape[1]
        # pool in f32 even under compute_dtype=bfloat16: FID comparisons in
        # RESULTS.md are at ~1% granularity, the same order as bf16
        # feature-quantization noise
        skip = skip.astype(jnp.float32)
        mask = (jnp.arange(t)[None, :] < frames[:, None])[..., None]
        denom = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
        return jnp.sum(jnp.where(mask, skip, 0.0), axis=1) / denom

    # -- pieces ----------------------------------------------------------

    def style_metrics(self, batcher, max_batches: Optional[int] = None,
                      with_features: bool = False,
                      with_real_cer: bool = True) -> Dict:
        """Style-space metrics in ONE dataset sweep; with ``with_features``
        the FID real-feature pass is fused into the extraction dispatch
        (one compiled executable, one device round-trip per batch).

        ``with_real_cer`` decodes the recognizer log-probs the sweep already
        computes and scores them against the real lines' transcriptions —
        the *same* frozen reader + greedy-decode protocol ``generate_and_read``
        applies to generated lines, so ``gen_CER - real_CER`` (the realism
        gap) compares like with like.
        """
        ext = StyleExtractor(
            self.model, self.params,
            tap=(lambda m, p, im, fr: self._feat_fn(p, im, fr))
            if with_features else None)
        gts: List[str] = []
        _mark(f"style sweep start (max_batches={max_batches})")
        data = ext.extract_dataset(
            batcher, max_batches, with_pred=with_real_cer,
            on_batch=(lambda b: gts.extend(b["gt"])) if with_real_cer
            else None)
        feats = data.get("tap", [])
        _mark(f"style sweep done ({len(data['ids'])} groups)")
        out = {}
        out.update({f"style_{k}": v
                    for k, v in inter_intra_distances(data).items()})
        out.update({f"writer_id_{k}": v
                    for k, v in writer_id_retrieval(data).items()})
        if with_real_cer:
            preds: List[str] = []
            for logp in data["pred"]:
                preds.extend(ctc_greedy_decode_batch(logp, self.charset))
            cer, wer = batch_cer_wer(gts, preds)
            out["real_CER"], out["real_WER"] = cer, wer
        _mark("style metrics computed")
        self._style_bank = np.asarray(data["styles"])
        self._real_feats = (np.concatenate(feats, axis=0) if feats
                            else None)
        return out

    def generate_and_read(self, texts: Sequence[str], bank: np.ndarray,
                          batch: int = 32,
                          mix_range=(-0.5, 1.5),
                          out_dir: Optional[str] = None,
                          degrade: bool = False) -> Dict:
        """Render ``texts`` with interpolated bank styles; frozen HWR reads
        them back.  Returns gen-CER/WER, generated features, and preds.

        ``degrade``: additionally read back a copy run through the v3
        post-render degradation stack (:func:`data.synthetic.degrade_image`
        — elastic warp / brightness / blur / noise).  Real v3 lines carry
        those post-ops and raw generator output does not, so the *degraded*
        readback is the matched-domain comparison against ``real_CER``.
        """
        if not len(texts):
            raise ValueError(
                "generate_and_read: no texts to render — pass --texts, set "
                "data.text_data, or use a split with real transcriptions")
        if not len(bank):
            raise ValueError(
                "generate_and_read: empty style bank — the style-extraction "
                "pass produced no styles (empty split?)")
        session = GenerationSession(self.model, self.params, self.charset)
        rng = np.random.default_rng(self.seed)
        label_len = max(max(len(t) for t in texts), 1)
        preds: List[str] = []
        preds_deg: List[str] = []
        feats: List[np.ndarray] = []
        dumped = 0
        _mark(f"gen+readback start ({len(texts)} texts, batch={batch})")
        for s in range(0, len(texts), batch):
            chunk = list(texts[s:s + batch])
            pad = batch - len(chunk)
            chunk += [chunk[-1]] * pad
            idx = rng.integers(0, len(bank), size=(batch, 2))
            mix = rng.uniform(*mix_range, size=(batch, 1))
            styles = bank[idx[:, 0]] * mix + bank[idx[:, 1]] * (1 - mix)
            img = session.render(chunk, styles, seed=self.seed + s,
                                 label_len=label_len)
            image = jnp.asarray(img)
            frames = jnp.full((batch,), image.shape[2] // 4, jnp.int32)
            logp = self._recog(self.params, image, frames)
            p = ctc_greedy_decode_batch(np.asarray(logp), self.charset)
            if degrade:
                from handwriting_line_generation_tpu.data.datasets import (
                    quantize_image_u8,
                )
                from handwriting_line_generation_tpu.data.synthetic import (
                    degrade_image, normalize_image,
                )
                deg = np.stack([
                    normalize_image(degrade_image(
                        quantize_image_u8(np.asarray(img[b, ..., 0])),
                        np.random.default_rng(self.seed + s * batch + b)))
                    for b in range(batch)])[..., None]
                logp_d = self._recog(self.params, jnp.asarray(deg), frames)
                pd = ctc_greedy_decode_batch(np.asarray(logp_d),
                                             self.charset)
                preds_deg.extend(pd[:batch - pad] if pad else pd)
            if self.has_features:
                feats.append(np.asarray(
                    self._feats(self.params, image, frames)))
                if pad:
                    feats[-1] = feats[-1][:batch - pad]
            if pad:
                p = p[:batch - pad]
            preds.extend(p)
            if out_dir and dumped < 16:
                import os

                import cv2
                from handwriting_line_generation_tpu.inference.generate \
                    import to_uint8
                os.makedirs(out_dir, exist_ok=True)
                for b in range(min(len(chunk) - pad, 16 - dumped)):
                    cv2.imwrite(
                        os.path.join(out_dir, f"gen_{dumped:03d}.png"),
                        to_uint8(np.asarray(img[b])))
                    dumped += 1
        cer, wer = batch_cer_wer(list(texts), preds)
        _mark("gen+readback done")
        out = {"gen_CER": cer, "gen_WER": wer,
               "features": (np.concatenate(feats, axis=0)
                            if feats else None),
               "preds": preds}
        if degrade:
            cer_d, wer_d = batch_cer_wer(list(texts), preds_deg)
            out["gen_CER_degraded"] = cer_d
            out["gen_WER_degraded"] = wer_d
        return out

    # -- the one command -------------------------------------------------

    def run(self, batcher, texts: Sequence[str],
            max_batches: Optional[int] = None,
            gen_batch: int = 32,
            out_dir: Optional[str] = None,
            degrade: bool = True) -> Dict:
        """Full quality pass.  Headline metrics: **fid_hwr** and
        **writer_id_top1** (gen-CER saturates once the generator's lines
        read cleaner than the corpus — VERDICT r3 weak #2 — so CER-family
        numbers are reported as a *realism gap* against the same-protocol
        ``real_CER`` instead of as absolute rankings)."""
        out = self.style_metrics(batcher, max_batches,
                                 with_features=self.has_features)
        gen = self.generate_and_read(texts, self._style_bank,
                                     batch=gen_batch, out_dir=out_dir,
                                     degrade=degrade)
        for k in ("gen_CER", "gen_WER", "gen_CER_degraded",
                  "gen_WER_degraded"):
            if k in gen:
                out[k] = gen[k]
        if "real_CER" in out:
            out["realism_gap"] = out["gen_CER"] - out["real_CER"]
            if "gen_CER_degraded" in out:
                out["realism_gap_degraded"] = (out["gen_CER_degraded"]
                                               - out["real_CER"])
        if self.has_features and self._real_feats is not None:
            out["fid_hwr"] = frechet_distance(self._real_feats,
                                              gen["features"])
        return out


def load_texts(path: str, limit: Optional[int] = None) -> List[str]:
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f if ln.strip()]
    return lines[:limit] if limit else lines

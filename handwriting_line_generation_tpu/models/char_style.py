"""Character-aware style encoder.

Re-design of ``model/char_style.py:126-309``.  The reference crops a window
around every location where the recognizer's argmax predicts character ``n``
and runs a *class-specific* extractor on each crop, inside data-dependent
Python loops over classes, batches and locations
(``char_style.py:210-257``) — host-bound and unbatchable.

TPU design — treat it as a mixture-of-experts dispatch problem:
  1. per (sample, class) take the **top-K highest-score locations** whose
     argmax equals the class (static capacity ``K``; score = softmax prob as
     in the reference's ``exp(recog)`` weighting, ``char_style.py:228``);
  2. gather the ``±window`` feature patches for all ``(class, K)`` slots at
     once — one ``[B, n_class-1, K, 2w+1, C]`` gather;
  3. run all class-specific extractors as a single ``nn.vmap`` over the
     class axis (per-class parameters, shared compute graph) — batched MXU
     work instead of per-crop Python calls;
  4. score-weighted average back per sample (single-style path,
     ``char_style.py:232-235,286``).

Capacity gives exact parity with the reference whenever a class occurs at
most ``K`` times in a line (K=16 covers IAM lines comfortably); beyond that
the *lowest-scoring* crops are dropped, a strictly-better-than-random
truncation the reference never needed because it enumerated everything.

The paper config is the single-style path (``char_style_dim: 0`` =>
one ``style_dim`` vector).  The tuple-style path (separate g/spacing/per-char
styles with ``fill_pred``, ``char_style.py:259-309``) is exposed via
``char_style_dim > 0``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from handwriting_line_generation_tpu.models.layers import (
    ConvBlock, gn, max_pool,
)


class StyleTrunk(nn.Module):
    """Conv pyramid collapsing H 64 -> 1 (``char_style.py:147-159``).

    Heights follow the reference's VALID schedule (64-32-30-15-13-5-1);
    widths are SAME so the output length is exactly ``W/4``, matching our
    HWR's frame count — the reference needed replicate-padding to reconcile
    the two (``char_style.py:198-202``), we don't.
    """
    dim: int = 64
    norm: str = "group"
    act: str = "relu"
    pad_type: str = "replicate"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        d = self.dim
        x = ConvBlock(d, (5, 5), padding=(2, 2, 2, 2), norm=self.norm,
                      act=self.act, pad_type=self.pad_type,
                      dtype=self.dtype)(x)                           # 64
        for _ in range(2):
            x = ConvBlock(2 * d, (4, 4), stride=(2, 2),
                          padding=(1, 1, 1, 1), norm=self.norm,
                          act=self.act, pad_type=self.pad_type,
                          dtype=self.dtype)(x)                       # H/2, W/2
            d *= 2
            x = ConvBlock(d, (3, 3), padding=(0, 0, 1, 1), norm=self.norm,
                          act=self.act, pad_type=self.pad_type,
                          dtype=self.dtype)(x)                       # H-2
        x = ConvBlock(d, (4, 4), stride=(2, 1), padding=(0, 0, 1, 1),
                      norm=self.norm, act=self.act,
                      pad_type=self.pad_type, dtype=self.dtype)(x)   # 13 -> 5
        x = ConvBlock(d, (4, 4), stride=(2, 1), padding=(0, 0, 1, 1),
                      norm="none", act="none", pad_type=self.pad_type,
                      dtype=self.dtype)(x)                           # 1
        return x[:, 0, :, :]                                         # [B, T, 4d]


class CharExtractor(nn.Module):
    """Residual 1-D conv + pool + FC over a single char window
    (``char_style.py:84-124``); ``small`` = window < 3."""
    dim: int          # char_dim
    out_dim: int      # char style dim
    small: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):                       # [..., 2w+1, C]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        c_in = x.shape[-1]
        res = x
        h = nn.relu(x)
        h = nn.Conv(self.dim, (3,), padding="SAME", dtype=self.dtype)(h)
        h = nn.relu(gn(self.dim, self.dtype)(h))
        h = nn.Conv(c_in, (3,), padding="SAME", dtype=self.dtype)(h)
        h = nn.relu(h + res)
        if self.small:
            h = nn.Conv(2 * self.dim, (1,), dtype=self.dtype)(h)
        else:
            # large-window variant: halve then VALID conv (char_style.py:104-110)
            h = nn.avg_pool(h, (2,), strides=(2,))
            h = nn.Conv(2 * self.dim, (3,), padding="VALID",
                        dtype=self.dtype)(h)
        h = nn.relu(gn(2 * self.dim, self.dtype)(h))
        h = jnp.mean(h, axis=-2)                 # adaptive avg pool
        h = nn.relu(nn.Dense(2 * self.dim, dtype=self.dtype)(h))
        return nn.Dense(self.out_dim, dtype=self.dtype)(h)


class CharStyleEncoder(nn.Module):
    num_class: int
    style_dim: int = 128
    char_style_dim: int = 0          # 0 => single-style (paper)
    dim: int = 64                    # trunk base width
    char_dim: int = 128
    window: int = 2
    capacity: int = 16               # top-K crops per class
    norm: str = "group"
    act: str = "relu"
    pad_type: str = "replicate"
    average_found_char_style: float = 1.0
    vae: bool = False
    dtype: Any = None

    @property
    def single_style(self) -> bool:
        return self.char_style_dim == 0

    @nn.compact
    def __call__(self, image, recog):
        """image ``[B, 64, W, 1]``; recog ``[B, T, C]`` log-probs, T = W/4.

        Returns ``[B, style_dim]`` (single-style) or the tuple
        ``(g_style, spacing_style, char_styles [B, n_class, csd])``.
        """
        csd = self.style_dim if self.single_style else self.char_style_dim
        B = image.shape[0]
        # recog may be frame-masked with -1e30 char log-probs (ops.ctc.
        # mask_frames_to_blank); floor it before it feeds convs or the
        # activations overflow to NaN. -30 is below any real log-softmax.
        recog = jnp.maximum(recog, -30.0)
        x = StyleTrunk(dim=self.dim, norm=self.norm, act=self.act,
                       pad_type=self.pad_type,
                       dtype=self.dtype)(image)              # [B, T, 4d]
        T = x.shape[1]
        C4 = x.shape[-1]
        # reconcile lengths (equal by construction; guard for odd widths)
        Tr = recog.shape[1]
        if Tr != T:
            if Tr > T:
                recog = recog[:, :T]
            else:
                recog = jnp.pad(recog, ((0, 0), (0, T - Tr), (0, 0)),
                                mode="edge")

        pred = jnp.argmax(recog, axis=-1)                    # [B, T]
        probs = jnp.exp(recog)                               # scores

        # ---- MoE-style dispatch: top-K crops per (sample, class) ----
        K = self.capacity
        ncm1 = self.num_class - 1
        cls_ids = jnp.arange(1, self.num_class)              # skip blank
        # masked score per class: [B, ncm1, T]
        score = jnp.where(pred[:, None, :] == cls_ids[None, :, None],
                          jnp.take_along_axis(
                              jnp.swapaxes(probs, 1, 2),     # [B, C, T]
                              cls_ids[None, :, None].repeat(B, 0), axis=1),
                          0.0)
        top_scores, top_idx = jax.lax.top_k(score, K)        # [B, ncm1, K]
        present = top_scores > 0.0

        # gather ±window patches (zero-padded at edges, char_style.py:224-225)
        w = self.window
        offs = jnp.arange(-w, w + 1)                         # [2w+1]
        pos = top_idx[..., None] + offs                      # [B,ncm1,K,2w+1]
        valid = (pos >= 0) & (pos < T)
        pos_c = jnp.clip(pos, 0, T - 1)
        patches = jax.vmap(lambda xb, pb: xb[pb])(x, pos_c.reshape(B, -1))
        patches = patches.reshape(B, ncm1, K, 2 * w + 1, C4)
        patches = jnp.where(valid[..., None], patches, 0.0)

        # one vmapped per-class extractor bank
        VExtract = nn.vmap(
            CharExtractor, in_axes=1, out_axes=1,
            variable_axes={"params": 0}, split_rngs={"params": True})
        char_styles = VExtract(dim=self.char_dim, out_dim=csd,
                               small=self.window < 3,
                               dtype=self.dtype)(patches)    # [B,ncm1,K,csd]

        wgt = jnp.where(present, top_scores, 0.0)            # [B, ncm1, K]

        if self.single_style:
            total = jnp.einsum("bnk,bnkd->bd", wgt, char_styles)
            denom = jnp.sum(wgt, axis=(1, 2))[:, None]
            avg_char = jnp.where(denom > 0, total / jnp.maximum(denom, 1e-12),
                                 total)
        else:
            # per-class weighted average of found crops
            cls_total = jnp.einsum("bnk,bnkd->bnd", wgt, char_styles)
            cls_wsum = jnp.sum(wgt, axis=2)                  # [B, ncm1]
            found = cls_wsum > 0
            cls_avg = jnp.where(found[..., None],
                                cls_total / jnp.maximum(cls_wsum, 1e-12)[..., None],
                                0.0)
            # fill_pred: every found class predicts styles for all classes
            VFill = nn.vmap(FillPred, in_axes=1, out_axes=1,
                            variable_axes={"params": 0},
                            split_rngs={"params": True})
            fills = VFill(num_class=self.num_class, csd=csd,
                          dtype=self.dtype)(cls_avg)
            # average fill predictions over found classes  [B, nc, csd]
            nf = jnp.maximum(jnp.sum(found, axis=1), 1)[:, None, None]
            fill_avg = jnp.sum(
                jnp.where(found[:, :, None, None], fills, 0.0), axis=1) / nf
            # substitute found classes' own styles (mix per config,
            # char_style.py:270-281)
            mix = self.average_found_char_style
            own = jnp.pad(cls_avg, ((0, 0), (1, 0), (0, 0)))  # add blank row
            found_full = jnp.pad(found, ((0, 0), (1, 0)))
            all_char = jnp.where(
                found_full[..., None],
                own * (1.0 - mix) + fill_avg * mix,
                fill_avg)
            avg_char = jnp.sum(all_char, axis=1) / self.num_class

        # ---- global/spacing branch ----
        xr = jnp.concatenate([nn.relu(x), recog.astype(x.dtype)],
                             axis=-1)                        # [B, T, 4d+C]
        h = nn.Conv(C4, (5,), padding="SAME", dtype=self.dtype)(xr)
        h = nn.relu(h)
        h = max_pool(h[:, :, None, :], (2, 1))[:, :, 0, :]   # T/2
        h = nn.Conv(C4, (3,), padding="SAME", dtype=self.dtype)(h)
        h = nn.relu(gn(C4, self.dtype)(h))
        h = nn.Conv(C4, (3,), padding="SAME", dtype=self.dtype)(h)
        h = nn.relu(h)
        pooled = jnp.mean(h, axis=1)                         # [B, 4d]

        comb = jnp.concatenate([pooled, avg_char.astype(pooled.dtype)],
                               axis=-1)
        comb = nn.relu(nn.Dense(C4, dtype=self.dtype)(comb))
        # style vectors feed the bank / interpolation math: return float32
        if self.single_style:
            if self.vae:
                # VAE head: (mu, log_sigma) pairs (char_style.py:303-307)
                out = nn.Dense(2 * self.style_dim,
                               dtype=self.dtype)(comb).astype(jnp.float32)
                return out[:, : self.style_dim], out[:, self.style_dim:]
            return nn.Dense(self.style_dim,
                            dtype=self.dtype)(comb).astype(jnp.float32)
        out = nn.Dense(self.style_dim + csd,
                       dtype=self.dtype)(comb).astype(jnp.float32)
        spacing_style = out[:, :csd]
        g_style = out[:, csd:]
        return g_style, spacing_style, all_char.astype(jnp.float32)


class FillPred(nn.Module):
    """Predict all classes' styles from one class's style
    (``char_style.py:186-190``)."""
    num_class: int
    csd: int
    dtype: Any = None

    @nn.compact
    def __call__(self, s):
        h = nn.relu(nn.Dense(2 * self.csd, dtype=self.dtype)(s))
        out = nn.Dense(self.csd * self.num_class, dtype=self.dtype)(h)
        return out.reshape(s.shape[0], self.num_class, self.csd)

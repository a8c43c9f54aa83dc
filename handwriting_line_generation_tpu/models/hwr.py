"""Handwriting recognizers (CTC heads).

* :class:`CNNOnlyHWR` — the paper-path recognizer: 7-conv trunk collapsing
  H=64 to 1, then a dilated 1-D conv stack, log-softmax over classes
  (``model/cnn_only_hwr.py:7-107``; selected by ``"hwr": "CNNOnly batchnorm"``
  in the published configs).
* :class:`CRNN` — the Start-Follow-Read lineage CNN+BiLSTM variant
  (``model/cnn_lstm.py:28-103``), with the cuDNN LSTM replaced by a
  ``flax.linen.RNN``/``lax.scan`` bidirectional LSTM.

TPU deviation (deliberate): all convs/pools use SAME padding so the output
sequence length is exactly ``W/4`` (the reference's VALID tail convs give
``W/4 - 6``, which forces ad-hoc width fix-ups downstream, e.g.
``hw_with_style_trainer.py:769-785``).  With ``T = W/4`` the generator's
4x width upsampling reproduces the image width exactly and all width
bookkeeping disappears.  Outputs are batch-major ``[B, T, C]`` log-probs.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from handwriting_line_generation_tpu.models.layers import gn, max_pool


class _ConvTrunk(nn.Module):
    """Shared 7-conv trunk: 64-128-256-256-512-512-512, H/8 within, W/4.

    Norm placement mirrors the reference (layers 2, 4, 6 normalized,
    ``cnn_only_hwr.py:43-56``); "batch" is mapped to group-norm (batch stats
    don't shard over a data mesh).
    """
    norm: str = "group"
    small: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):                     # [B, H, W, 1]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        widths = (64, 128, 256, 256, 512, 512, 512)
        normed = (False, False, True, False, True, False, True)
        for i, (f, use_norm) in enumerate(zip(widths, normed)):
            x = nn.Conv(f, (3, 3), padding="SAME", dtype=self.dtype)(x)
            if use_norm and self.norm != "none":
                x = gn(f, self.dtype)(x)
            x = nn.relu(x)
            if i == 0 and not self.small:
                x = max_pool(x, (2, 2))                       # H/2, W/2
            elif i == 1:
                x = max_pool(x, (2, 2))                       # H/4, W/4
            elif i in (3, 5):
                x = max_pool(x, (2, 2), (2, 1), padding="SAME")  # H halves
        return x                                               # [B, H/32, W/4, 512]


class CNNOnlyHWR(nn.Module):
    """Conv trunk + height collapse + dilated 1-D stack -> log-probs.

    Dilations (2, 4, 1, 8, 1) as ``cnn_only_hwr.py:61-76``.  ``pad``
    horizontally zero-pads the input by one ("less") or two image heights
    per side before the trunk (``cnn_only_hwr.py:11-18``).
    """
    num_class: int
    norm: str = "group"
    small: bool = False
    pad: str = "none"      # none | pad | less
    dtype: Any = None

    @nn.compact
    def __call__(self, x, return_features: bool = False):
        x = _maybe_pad(x, self.pad, self.small)
        feats = _ConvTrunk(norm=self.norm, small=self.small,
                           dtype=self.dtype)(x)
        b, h, w, c = feats.shape
        # collapse remaining height (2 rows for H=64 input) by mean: the
        # reference ends at H=1 via VALID convs; mean-collapse is the
        # shape-stable equivalent
        seq = jnp.mean(feats, axis=1)                          # [B, T, 512]
        skip = seq
        for dil in (2, 4, 1, 8):
            seq = nn.Conv(512, (3,), kernel_dilation=(dil,), padding="SAME",
                          dtype=self.dtype)(seq)
            if self.norm != "none":
                seq = gn(512, self.dtype)(seq)
            seq = nn.relu(seq)
        logits = nn.Conv(self.num_class, (3,), padding="SAME",
                         dtype=self.dtype)(seq)
        # CTC consumes these log-probs: always normalize in float32
        out = nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if return_features:
            return out, skip
        return out


class CRNN(nn.Module):
    """Conv trunk + 2-layer bidirectional LSTM (``cnn_lstm.py:28-103``)."""
    num_class: int
    hidden: int = 512
    norm: str = "group"
    small: bool = False
    pad: str = "none"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = _maybe_pad(x, self.pad, self.small)
        feats = _ConvTrunk(norm=self.norm, small=self.small,
                           dtype=self.dtype)(x)
        # the scanned LSTM stays float32 (recurrent error compounds)
        seq = jnp.mean(feats, axis=1).astype(jnp.float32)      # [B, T, 512]
        for _ in range(2):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden))(seq)
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), reverse=True,
                         keep_order=True)(seq)
            seq = nn.Dense(self.hidden)(jnp.concatenate([fwd, bwd], -1))
        logits = nn.Dense(self.num_class)(seq)
        return nn.log_softmax(logits.astype(jnp.float32), axis=-1)


class SmallCRNN(nn.Module):
    """Compact CRNN for short (H=24) inputs (``cnn_lstm.py:117-192``):
    7 convs (128-128-256-256-512-512-512) with dropout on the deep layers,
    pools 2x2, 2x2, (2,2)/(2,1) collapsing H 24 -> 3, mean height collapse,
    single bidirectional LSTM head, log-softmax.  Inputs narrower than 12 px
    are symmetrically padded as the reference does (``:169-171``)."""
    num_class: int
    hidden: int = 512
    norm: str = "group"
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if x.shape[2] < 12:
            d = 12 - x.shape[2]
            x = jnp.pad(x, ((0, 0), (0, 0), (d // 2, d - d // 2), (0, 0)),
                        constant_values=-1.0)
        widths = (128, 128, 256, 256, 512, 512, 512)
        normed = (False, True, True, False, True, False, True)
        dropped = (False, False, True, True, True, True, True)
        for i, (f, use_norm, use_drop) in enumerate(
                zip(widths, normed, dropped)):
            x = nn.Conv(f, (3, 3), padding="SAME", dtype=self.dtype)(x)
            if use_norm and self.norm != "none":
                x = gn(f, self.dtype)(x)
            if use_drop and self.dropout:
                x = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                               deterministic=deterministic)(x)
            x = nn.relu(x)
            if i == 1:
                x = max_pool(x, (2, 2))                       # H/2, W/2
            elif i == 3:
                x = max_pool(x, (2, 2))                       # H/4, W/4
            elif i == 5:
                x = max_pool(x, (2, 2), (2, 1), padding="SAME")  # H/8
        # the scanned LSTM stays float32 (recurrent error compounds)
        seq = jnp.mean(x, axis=1).astype(jnp.float32)         # [B, W/4, 512]
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden))(seq)
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), reverse=True,
                     keep_order=True)(seq)
        logits = nn.Dense(self.num_class)(
            jnp.concatenate([fwd, bwd], -1))
        return nn.log_softmax(logits, axis=-1)


def _maybe_pad(x, pad: str, small: bool):
    """Horizontal zero-pad modes (``cnn_only_hwr.py:11-18``); pad value is
    the paper background (-1 in our normalization)."""
    if pad == "none" or not pad:
        return x
    h = 32 if small else 64
    w = h if pad == "less" else 2 * h
    import jax.numpy as jnp
    return jnp.pad(x, ((0, 0), (0, 0), (w, w), (0, 0)), constant_values=-1.0)


def build_hwr(kind: str, num_class: int, norm: str = "group",
              small: bool = False, pad: str = "none", dtype: Any = None):
    if kind == "cnn_only":
        return CNNOnlyHWR(num_class=num_class, norm=norm, small=small,
                          pad=pad, dtype=dtype)
    if kind == "crnn":
        return CRNN(num_class=num_class, norm=norm, small=small, pad=pad,
                    dtype=dtype)
    if kind == "small_crnn":
        return SmallCRNN(num_class=num_class, norm=norm, dtype=dtype)
    if kind == "none":
        return None
    raise ValueError(f"unknown hwr kind {kind!r}")

"""Perceptual autoencoder family.

Re-design of ``model/autoencoder.py``: the paper path is ``'2tight'`` =
``Encoder2(32)`` + ``DecoderNoSkip(32)`` + ``E_HWR`` CTC head
(``autoencoder.py:28-31,54-57``; config ``cf_IAM_auto_2tight_newCTC.json``).
The trained encoder is later frozen and used as the perceptual-loss feature
extractor (``hw_with_style_trainer.py:135-160``), which consumes *both* the
bottleneck and the mid features.

TPU deviations: widths are SAME-padded so the bottleneck length is exactly
``W/8`` (reference: ``W/8 - 4``) and the reconstruction width is exactly
``W``; heights collapse 64 -> 1 via the same VALID-height schedule as the
reference (8 -> 6 -> 1 through the (3,.) and (6,.) convs).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from handwriting_line_generation_tpu.models.layers import avg_pool, gn, max_pool


class Encoder2(nn.Module):
    """Three avg-pool stages with residual blocks -> ``[B, 1, W/8, out_dim]``.

    Returns ``(bottleneck, mid_features)``; mid is the 64-channel H/4 map
    (``autoencoder.py:398-410``).
    """
    out_dim: int = 32
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        conv = lambda *a, **kw: nn.Conv(*a, dtype=self.dtype, **kw)
        g = lambda ch: gn(ch, self.dtype)
        drop = lambda v: nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                                    deterministic=deterministic)(v)
        # stage 1: 1 -> 32, H/2
        x = conv(32, (5, 5), padding="SAME")(x)
        x = nn.relu(g(32)(x))
        x = avg_pool(x, (2, 2))
        x = conv(32, (1, 1))(x)
        res = x
        x = nn.relu(x)
        x = conv(32, (3, 3), padding="SAME")(x)
        x = nn.relu(drop(g(32)(x)))
        x = conv(32, (3, 3), padding="SAME")(x)
        x = x + res
        # stage 2: 32 -> 64, H/4
        x = nn.relu(g(32)(x))
        x = avg_pool(x, (2, 2))
        x = conv(64, (1, 1))(x)
        res = x
        x = nn.relu(drop(g(64)(x)))
        x = conv(64, (3, 3), padding="SAME")(x)
        x = nn.relu(drop(g(64)(x)))
        x = conv(64, (3, 3), padding="SAME")(x)
        x = x + res
        mid = x                                           # [B, H/4, W/4, 64]
        # stage 3: H/8 then collapse 8 -> 6 -> 1 (VALID heights, SAME widths)
        x = nn.relu(g(64)(x))
        x = avg_pool(x, (2, 2))
        x = conv(128, (3, 3), padding=((0, 0), (1, 1)))(x)   # H 8 -> 6
        x = nn.relu(drop(g(128)(x)))
        x = conv(self.out_dim, (6, 3), padding=((0, 0), (1, 1)))(x)  # H -> 1
        return x, mid


class DecoderNoSkip(nn.Module):
    """Bottleneck ``[B, 1, T, in]`` -> image ``[B, 64, 8T, 1]`` in tanh range
    (``autoencoder.py:302-339``)."""
    input_dim: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        convt = lambda *a, **kw: nn.ConvTranspose(*a, dtype=self.dtype, **kw)
        g = lambda ch: gn(ch, self.dtype)
        # lax.conv_transpose pads the dilated input: per-side pad k-1-p_torch
        x = nn.relu(x)
        x = convt(256, (6, 3), padding=((5, 5), (1, 1)))(x)  # H 1->6
        x = nn.relu(g(256)(x))
        x = convt(256, (3, 3), padding=((2, 2), (1, 1)))(x)  # H 6->8
        x = nn.relu(g(256)(x))
        for f in (128, 64, 32):
            x = convt(f, (4, 4), strides=(2, 2),
                      padding=((2, 2), (2, 2)))(x)   # H, W double
            x = nn.relu(g(f)(x))
            x = nn.Conv(f, (3, 3), padding="SAME", dtype=self.dtype)(x)
            x = nn.relu(g(f)(x))
        x = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


class EHWR(nn.Module):
    """Dilated 1-D conv CTC head on the bottleneck (``autoencoder.py:596-628``)."""
    num_class: int
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, bottleneck, deterministic: bool = True):
        x = bottleneck[:, 0, :, :]                         # [B, T, in]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for k, dil in ((3, 1), (3, 2), (3, 4), (5, 1)):
            x = nn.Conv(512, (k,), kernel_dilation=(dil,), padding="SAME",
                        dtype=self.dtype)(x)
            x = gn(512, self.dtype)(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
            x = nn.relu(x)
        x = nn.Conv(self.num_class, (1,), dtype=self.dtype)(x)
        # CTC consumes these log-probs: always normalize in float32
        return nn.log_softmax(x.astype(jnp.float32), axis=-1)


class PyramidEncoder(nn.Module):
    """Parametric 3-stage residual conv pyramid covering the reference's
    non-paper encoder variants with one module:

    =============  =========================  =====================
    reference       dims / out_dim             flags
    =============  =========================  =====================
    ``Encoder``     (32, 64, 128, 256) / 512   pool=max            (``autoencoder.py:68-134``)
    ``EncoderSm``   (32, 32, 64, 128) / 256    pool=max, trans=1x1 (``:185-250``)
    ``Encoder3``    (32, 64, 128, 256) / 512   pool=avg, drop=.1   (``:411-482``)
    ``EncoderSpace``(32, 32, 64, 128) / 4|8    pool=avg, tail=same (``:484-553``)
    ``Encoder32``   (32, 32, 64, 128) / 256    no first pool (H=32)(``:663-731``)
    =============  =========================  =====================

    Structure per stage: pool -> transition conv -> (conv3, conv3) residual.
    Tail ``"collapse"`` ends at H=1 (VALID heights, SAME widths — our W/8
    convention); ``"same"`` keeps H=H/8 with a SAME 3x3 (EncoderSpace).
    Returns ``(bottleneck, mid_features)`` like :class:`Encoder2`.
    """
    dims: Tuple[int, int, int, int] = (32, 64, 128, 256)
    out_dim: int = 512
    pool: str = "max"            # max | avg
    dropout: float = 0.0
    trans_kernel: int = 3        # transition conv kernel (1 for the Sm family)
    first_pool: bool = True      # False for H=32 inputs (Encoder32)
    tail: str = "collapse"       # collapse | same
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        conv = lambda *a, **kw: nn.Conv(*a, dtype=self.dtype, **kw)
        g = lambda ch: gn(ch, self.dtype)
        c0, c1, c2, c3 = self.dims
        pool = max_pool if self.pool == "max" else avg_pool
        drop = lambda v: (nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                                     deterministic=deterministic)(v)
                          if self.dropout else v)

        def res_block(v, ch):
            r = v
            v = nn.relu(drop(g(ch)(v)))
            v = conv(ch, (3, 3), padding="SAME")(v)
            v = nn.relu(drop(g(ch)(v)))
            v = conv(ch, (3, 3), padding="SAME")(v)
            return v + r

        # stem
        k = 5 if self.first_pool else 3
        x = conv(c0, (k, k), padding="SAME")(x)
        x = nn.relu(g(c0)(x))
        if self.first_pool:
            x = pool(x, (2, 2))
        x = conv(c1, (self.trans_kernel,) * 2, padding="SAME")(x)
        x = res_block(x, c1)
        # stage 2
        x = nn.relu(g(c1)(x))
        x = pool(x, (2, 2))
        x = conv(c2, (self.trans_kernel,) * 2, padding="SAME")(x)
        x = res_block(x, c2)
        mid = x                                         # [B, H/4, W/4, c2]
        # stage 3 tail
        x = nn.relu(g(c2)(x))
        x = pool(x, (2, 2))
        if self.tail == "same":
            x = conv(c3, (3, 3), padding="SAME")(x)
            x = nn.relu(drop(g(c3)(x)))
            x = conv(self.out_dim, (3, 3), padding="SAME")(x)
        else:
            x = conv(c3, (3, 3), padding=((0, 0), (1, 1)))(x)   # H 8 -> 6
            x = nn.relu(drop(g(c3)(x)))
            x = conv(self.out_dim, (6, 3),
                     padding=((0, 0), (1, 1)))(x)               # H -> 1
        return x, mid


class PyramidDecoder(nn.Module):
    """Parametric mirror of the reference decoder variants.

    =================  ==========================  ==================
    reference           up_widths                   flags
    =================  ==========================  ==================
    ``Decoder``         (256, 128, 64, 32)          skip (mid concat) (``autoencoder.py:137-180``)
    ``DecoderSm``       (128, 64, 32, 32)           skip              (``:253-298``)
    ``DecoderSpace``    (256, 128, 64, 32)          h_expand=False    (``:554-594``)
    ``Decoder32NoSkip`` (256, 128, 64, 32)          upsamples=2       (``:732-769``)
    =================  ==========================  ==================

    ``h_expand`` grows the H=1 bottleneck to H=8 via the (6,3)/(3,3)
    transposed convs before the stride-2 stages; ``upsamples`` counts the
    stride-2 stages (3 for 64-px lines, 2 for 32-px).  When ``skip`` is set
    the H/4 mid features are concatenated after the first upsample
    (``autoencoder.py:173-179``).
    """
    up_widths: Tuple[int, int, int, int] = (256, 128, 64, 32)
    skip: bool = False
    h_expand: bool = True
    upsamples: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mid_features=None):
        if self.dtype is not None:
            x = x.astype(self.dtype)
            if mid_features is not None:
                mid_features = mid_features.astype(self.dtype)
        convt = lambda *a, **kw: nn.ConvTranspose(*a, dtype=self.dtype, **kw)
        g = lambda ch: gn(ch, self.dtype)
        w0, w1, w2, w3 = self.up_widths
        x = nn.relu(x)
        if self.h_expand:
            x = convt(w0, (6, 3), padding=((5, 5), (1, 1)))(x)
            x = nn.relu(g(w0)(x))
            x = convt(w0, (3, 3), padding=((2, 2), (1, 1)))(x)
            x = nn.relu(g(w0)(x))
        else:
            x = convt(w0, (3, 3), padding=((1, 1), (1, 1)))(x)
            x = nn.relu(g(w0)(x))
        widths = (w1, w2, w3)
        for i, f in enumerate(widths):
            stride = 2 if i < self.upsamples else 1
            x = convt(f, (4, 4) if stride == 2 else (3, 3),
                      strides=(stride, stride),
                      padding=((2, 2), (2, 2)) if stride == 2
                      else ((1, 1), (1, 1)))(x)
            x = nn.relu(g(f)(x))
            if i == 0 and self.skip and mid_features is not None:
                x = jnp.concatenate([x, mid_features], axis=-1)
            x = nn.Conv(f, (3, 3), padding="SAME", dtype=self.dtype)(x)
            x = nn.relu(g(f)(x))
        x = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


# kind -> (encoder ctor, decoder ctor, bottleneck dim, decoder wants skip)
# mirroring the reference's type dispatch (autoencoder.py:8-52).
_AE_KINDS = {
    "skip":      (lambda dt=None: PyramidEncoder(dtype=dt),     # default (no type)
                  lambda dt=None: PyramidDecoder(skip=True, dtype=dt), 512),
    "small":     (lambda dt=None: PyramidEncoder(dims=(32, 32, 64, 128),
                                                 out_dim=256, trans_kernel=1,
                                                 dtype=dt),
                  lambda dt=None: PyramidDecoder(up_widths=(128, 64, 32, 32),
                                                 skip=True, dtype=dt), 256),
    "no_skip":   (lambda dt=None: PyramidEncoder(dtype=dt),
                  lambda dt=None: DecoderNoSkip(input_dim=512, dtype=dt), 512),
    "2":         (lambda dt=None: Encoder2(out_dim=256, dtype=dt),
                  lambda dt=None: DecoderNoSkip(input_dim=256, dtype=dt), 256),
    "3":         (lambda dt=None: PyramidEncoder(pool="avg", dropout=0.1,
                                                 dtype=dt),
                  lambda dt=None: DecoderNoSkip(input_dim=512, dtype=dt), 512),
    "2tight":    (lambda dt=None: Encoder2(out_dim=32, dtype=dt),
                  lambda dt=None: DecoderNoSkip(input_dim=32, dtype=dt), 32),
    "2tighter":  (lambda dt=None: Encoder2(out_dim=16, dtype=dt),
                  lambda dt=None: DecoderNoSkip(input_dim=16, dtype=dt), 16),
    "smallSpace": (lambda dt=None: PyramidEncoder(dims=(32, 32, 64, 128),
                                                  out_dim=4, pool="avg",
                                                  dropout=0.1, trans_kernel=1,
                                                  tail="same", dtype=dt),
                   lambda dt=None: PyramidDecoder(h_expand=False, dtype=dt), 4),
    "space":     (lambda dt=None: PyramidEncoder(dims=(32, 32, 64, 128),
                                                 out_dim=8, pool="avg",
                                                 dropout=0.1, trans_kernel=1,
                                                 tail="same", dtype=dt),
                  lambda dt=None: PyramidDecoder(h_expand=False, dtype=dt), 8),
    "32":        (lambda dt=None: PyramidEncoder(dims=(32, 32, 64, 128),
                                                 out_dim=256, pool="avg",
                                                 dropout=0.1, trans_kernel=1,
                                                 first_pool=False, dtype=dt),
                  lambda dt=None: PyramidDecoder(upsamples=2, dtype=dt), 256),
}


class Autoencoder(nn.Module):
    """Encoder + decoder (+ optional CTC head), type-dispatched
    (``autoencoder.py:8-66``).  The paper path is ``"2tight"``; the full
    reference family is available via :data:`_AE_KINDS`."""
    kind: str = "2tight"
    hwr_classes: int = 0
    dtype: Any = None

    def setup(self):
        if self.kind not in _AE_KINDS:
            raise ValueError(f"unknown autoencoder kind {self.kind!r}")
        enc, dec, self.out_dim = _AE_KINDS[self.kind]
        self.encoder = enc(self.dtype)
        self.decoder = dec(self.dtype)
        self.hwr = (EHWR(num_class=self.hwr_classes, dtype=self.dtype)
                    if self.hwr_classes else None)

    def __call__(self, x, deterministic: bool = True):
        enc, mid = self.encoder(x, deterministic)
        recon = (self.decoder(enc, mid)
                 if isinstance(self.decoder, PyramidDecoder)
                 else self.decoder(enc))
        if self.hwr is None:
            return recon, None
        # CTC head reads the H=1 bottleneck; "space"-family bottlenecks keep
        # H=8, collapse by mean first (the reference never combines the two).
        bott = enc if enc.shape[1] == 1 else jnp.mean(enc, 1, keepdims=True)
        return recon, self.hwr(bott, deterministic)

    def encode(self, x, deterministic: bool = True):
        return self.encoder(x, deterministic)


def build_encoder(kind: str, dtype: Any = None):
    """Frozen perceptual encoder factory (``encoder_type`` config)."""
    if kind in ("2tight", "2tighter", "2"):
        return Encoder2(out_dim={"2tight": 32, "2tighter": 16, "2": 256}[kind],
                        dtype=dtype)
    if kind in _AE_KINDS:
        return _AE_KINDS[kind][0](dtype)
    return Encoder2(out_dim=32, dtype=dtype)

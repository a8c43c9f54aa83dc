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

from typing import Optional, Tuple

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

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        drop = lambda v: nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                                    deterministic=deterministic)(v)
        # stage 1: 1 -> 32, H/2
        x = nn.Conv(32, (5, 5), padding="SAME")(x)
        x = nn.relu(gn(32)(x))
        x = avg_pool(x, (2, 2))
        x = nn.Conv(32, (1, 1))(x)
        res = x
        x = nn.relu(x)
        x = nn.Conv(32, (3, 3), padding="SAME")(x)
        x = nn.relu(drop(gn(32)(x)))
        x = nn.Conv(32, (3, 3), padding="SAME")(x)
        x = x + res
        # stage 2: 32 -> 64, H/4
        x = nn.relu(gn(32)(x))
        x = avg_pool(x, (2, 2))
        x = nn.Conv(64, (1, 1))(x)
        res = x
        x = nn.relu(drop(gn(64)(x)))
        x = nn.Conv(64, (3, 3), padding="SAME")(x)
        x = nn.relu(drop(gn(64)(x)))
        x = nn.Conv(64, (3, 3), padding="SAME")(x)
        x = x + res
        mid = x                                           # [B, H/4, W/4, 64]
        # stage 3: H/8 then collapse 8 -> 6 -> 1 (VALID heights, SAME widths)
        x = nn.relu(gn(64)(x))
        x = avg_pool(x, (2, 2))
        x = nn.Conv(128, (3, 3), padding=((0, 0), (1, 1)))(x)   # H 8 -> 6
        x = nn.relu(drop(gn(128)(x)))
        x = nn.Conv(self.out_dim, (6, 3), padding=((0, 0), (1, 1)))(x)  # H -> 1
        return x, mid


class DecoderNoSkip(nn.Module):
    """Bottleneck ``[B, 1, T, in]`` -> image ``[B, 64, 8T, 1]`` in tanh range
    (``autoencoder.py:302-339``)."""
    input_dim: int = 32

    @nn.compact
    def __call__(self, x):
        # lax.conv_transpose pads the dilated input: per-side pad k-1-p_torch
        x = nn.relu(x)
        x = nn.ConvTranspose(256, (6, 3), padding=((5, 5), (1, 1)))(x)  # H 1->6
        x = nn.relu(gn(256)(x))
        x = nn.ConvTranspose(256, (3, 3), padding=((2, 2), (1, 1)))(x)  # H 6->8
        x = nn.relu(gn(256)(x))
        for f in (128, 64, 32):
            x = nn.ConvTranspose(f, (4, 4), strides=(2, 2),
                                 padding=((2, 2), (2, 2)))(x)   # H, W double
            x = nn.relu(gn(f)(x))
            x = nn.Conv(f, (3, 3), padding="SAME")(x)
            x = nn.relu(gn(f)(x))
        x = nn.Conv(1, (3, 3), padding="SAME")(x)
        return jnp.tanh(x)


class EHWR(nn.Module):
    """Dilated 1-D conv CTC head on the bottleneck (``autoencoder.py:596-628``)."""
    num_class: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, bottleneck, deterministic: bool = True):
        x = bottleneck[:, 0, :, :]                         # [B, T, in]
        for k, dil in ((3, 1), (3, 2), (3, 4), (5, 1)):
            x = nn.Conv(512, (k,), kernel_dilation=(dil,), padding="SAME")(x)
            x = gn(512)(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
            x = nn.relu(x)
        x = nn.Conv(self.num_class, (1,))(x)
        return nn.log_softmax(x, axis=-1)


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

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c0, c1, c2, c3 = self.dims
        pool = max_pool if self.pool == "max" else avg_pool
        drop = lambda v: (nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                                     deterministic=deterministic)(v)
                          if self.dropout else v)

        def res_block(v, ch):
            r = v
            v = nn.relu(drop(gn(ch)(v)))
            v = nn.Conv(ch, (3, 3), padding="SAME")(v)
            v = nn.relu(drop(gn(ch)(v)))
            v = nn.Conv(ch, (3, 3), padding="SAME")(v)
            return v + r

        # stem
        k = 5 if self.first_pool else 3
        x = nn.Conv(c0, (k, k), padding="SAME")(x)
        x = nn.relu(gn(c0)(x))
        if self.first_pool:
            x = pool(x, (2, 2))
        x = nn.Conv(c1, (self.trans_kernel,) * 2, padding="SAME")(x)
        x = res_block(x, c1)
        # stage 2
        x = nn.relu(gn(c1)(x))
        x = pool(x, (2, 2))
        x = nn.Conv(c2, (self.trans_kernel,) * 2, padding="SAME")(x)
        x = res_block(x, c2)
        mid = x                                         # [B, H/4, W/4, c2]
        # stage 3 tail
        x = nn.relu(gn(c2)(x))
        x = pool(x, (2, 2))
        if self.tail == "same":
            x = nn.Conv(c3, (3, 3), padding="SAME")(x)
            x = nn.relu(drop(gn(c3)(x)))
            x = nn.Conv(self.out_dim, (3, 3), padding="SAME")(x)
        else:
            x = nn.Conv(c3, (3, 3), padding=((0, 0), (1, 1)))(x)   # H 8 -> 6
            x = nn.relu(drop(gn(c3)(x)))
            x = nn.Conv(self.out_dim, (6, 3),
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

    @nn.compact
    def __call__(self, x, mid_features=None):
        w0, w1, w2, w3 = self.up_widths
        x = nn.relu(x)
        if self.h_expand:
            x = nn.ConvTranspose(w0, (6, 3), padding=((5, 5), (1, 1)))(x)
            x = nn.relu(gn(w0)(x))
            x = nn.ConvTranspose(w0, (3, 3), padding=((2, 2), (1, 1)))(x)
            x = nn.relu(gn(w0)(x))
        else:
            x = nn.ConvTranspose(w0, (3, 3), padding=((1, 1), (1, 1)))(x)
            x = nn.relu(gn(w0)(x))
        widths = (w1, w2, w3)
        for i, f in enumerate(widths):
            stride = 2 if i < self.upsamples else 1
            x = nn.ConvTranspose(f, (4, 4) if stride == 2 else (3, 3),
                                 strides=(stride, stride),
                                 padding=((2, 2), (2, 2)) if stride == 2
                                 else ((1, 1), (1, 1)))(x)
            x = nn.relu(gn(f)(x))
            if i == 0 and self.skip and mid_features is not None:
                x = jnp.concatenate([x, mid_features], axis=-1)
            x = nn.Conv(f, (3, 3), padding="SAME")(x)
            x = nn.relu(gn(f)(x))
        x = nn.Conv(1, (3, 3), padding="SAME")(x)
        return jnp.tanh(x)


# kind -> (encoder ctor, decoder ctor, bottleneck dim, decoder wants skip)
# mirroring the reference's type dispatch (autoencoder.py:8-52).
_AE_KINDS = {
    "skip":      (lambda: PyramidEncoder(),                     # default (no type)
                  lambda: PyramidDecoder(skip=True), 512),
    "small":     (lambda: PyramidEncoder(dims=(32, 32, 64, 128), out_dim=256,
                                         trans_kernel=1),
                  lambda: PyramidDecoder(up_widths=(128, 64, 32, 32),
                                         skip=True), 256),
    "no_skip":   (lambda: PyramidEncoder(),
                  lambda: DecoderNoSkip(input_dim=512), 512),
    "2":         (lambda: Encoder2(out_dim=256),
                  lambda: DecoderNoSkip(input_dim=256), 256),
    "3":         (lambda: PyramidEncoder(pool="avg", dropout=0.1),
                  lambda: DecoderNoSkip(input_dim=512), 512),
    "2tight":    (lambda: Encoder2(out_dim=32),
                  lambda: DecoderNoSkip(input_dim=32), 32),
    "2tighter":  (lambda: Encoder2(out_dim=16),
                  lambda: DecoderNoSkip(input_dim=16), 16),
    "smallSpace": (lambda: PyramidEncoder(dims=(32, 32, 64, 128), out_dim=4,
                                          pool="avg", dropout=0.1,
                                          trans_kernel=1, tail="same"),
                   lambda: PyramidDecoder(h_expand=False), 4),
    "space":     (lambda: PyramidEncoder(dims=(32, 32, 64, 128), out_dim=8,
                                         pool="avg", dropout=0.1,
                                         trans_kernel=1, tail="same"),
                  lambda: PyramidDecoder(h_expand=False), 8),
    "32":        (lambda: PyramidEncoder(dims=(32, 32, 64, 128), out_dim=256,
                                         pool="avg", dropout=0.1,
                                         trans_kernel=1, first_pool=False),
                  lambda: PyramidDecoder(upsamples=2), 256),
}


class Autoencoder(nn.Module):
    """Encoder + decoder (+ optional CTC head), type-dispatched
    (``autoencoder.py:8-66``).  The paper path is ``"2tight"``; the full
    reference family is available via :data:`_AE_KINDS`."""
    kind: str = "2tight"
    hwr_classes: int = 0

    def setup(self):
        if self.kind not in _AE_KINDS:
            raise ValueError(f"unknown autoencoder kind {self.kind!r}")
        enc, dec, self.out_dim = _AE_KINDS[self.kind]
        self.encoder = enc()
        self.decoder = dec()
        self.hwr = (EHWR(num_class=self.hwr_classes)
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


def build_encoder(kind: str):
    """Frozen perceptual encoder factory (``encoder_type`` config)."""
    if kind in ("2tight", "2tighter", "2"):
        return Encoder2(out_dim={"2tight": 32, "2tighter": 16, "2": 256}[kind])
    if kind in _AE_KINDS:
        return _AE_KINDS[kind][0]()
    return Encoder2(out_dim=32)

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

from handwriting_line_generation_tpu.models.layers import avg_pool, gn


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


class Autoencoder(nn.Module):
    """Encoder + decoder (+ optional CTC head), type-dispatched
    (``autoencoder.py:8-66``)."""
    kind: str = "2tight"
    hwr_classes: int = 0

    def setup(self):
        dims = {"2tight": 32, "2tighter": 16, "2": 256, "no_skip": 256}
        if self.kind not in dims:
            raise ValueError(f"unknown autoencoder kind {self.kind!r}")
        self.out_dim = dims[self.kind]
        self.encoder = Encoder2(out_dim=self.out_dim)
        self.decoder = DecoderNoSkip(input_dim=self.out_dim)
        self.hwr = (EHWR(num_class=self.hwr_classes)
                    if self.hwr_classes else None)

    def __call__(self, x, deterministic: bool = True):
        enc, mid = self.encoder(x, deterministic)
        recon = self.decoder(enc)
        if self.hwr is None:
            return recon, None
        return recon, self.hwr(enc, deterministic)

    def encode(self, x, deterministic: bool = True):
        return self.encoder(x, deterministic)


def build_encoder(kind: str):
    """Frozen perceptual encoder factory (``encoder_type`` config)."""
    dims = {"2tight": 32, "2tighter": 16, "2": 256, "normal": 256}
    return Encoder2(out_dim=dims.get(kind, 32))

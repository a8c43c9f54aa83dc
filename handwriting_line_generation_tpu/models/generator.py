"""Spaced-text conditioned StyleGAN-style generator.

Re-design of ``model/pure_gen.py:12-50`` (rosinality StyleGAN lineage): the
content is the spaced one-hot text laid on a ``[B, 1, T, C]`` canvas; five
styled conv blocks grow it to ``[B, 64, 4T, 1]`` — two vertical-only x2
upsamples then two full x2 upsamples (``pure_gen.py:21-27``), each block
being conv -> noise injection -> leaky-relu -> AdaIN twice
(``pure_gen.py:202-216``).  The style vector is first passed through a
6-layer PixelNorm MLP (``style_emb``, ``pure_gen.py:31-39``) and optionally
appended to the content channels (``gen_append_style``, the paper config).

Noise is injected via the ``noise`` PRNG stream; pass
``rngs={'noise': key}`` at apply time.  Output height is 64 and width is
exactly ``4 * T``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from handwriting_line_generation_tpu.models.layers import (
    AdaIN, EqualConv, FusedUpsample, NoiseInjection, PixelNorm,
    _instance_stats, blur3x3, upsample_nearest,
)


class _PhaseUpConv(nn.Module):
    """Vertical nearest-x2 upsample + 3x3 SAME conv, phase-decomposed.

    ``conv3x3(repeat_rows(x, 2))`` reads each input row twice; per output
    phase the three H taps collapse onto a 2-row window of the *source*:
    ``y[2a]   = w0 x[a-1] + (w1+w2) x[a]``,
    ``y[2a+1] = (w0+w1) x[a] + w2 x[a+1]`` (zero pads coincide).  One dense
    ``[2,3,Cin,2C]`` VALID conv on the 1-padded source computes both
    phases — 2/3 of the FLOPs and no materialized upsampled tensor.

    Param-compatible with the sequential branch's ``nn.Conv`` (same
    ``kernel``/``bias`` shapes and init; instantiated as ``Conv_0``)."""
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        B, H, W, Cin = x.shape
        C = self.features
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, Cin, C))
        b = self.param("bias", nn.initializers.zeros, (C,))
        cd = self.dtype or x.dtype
        wf = w.astype(jnp.float32)
        k_even = jnp.stack([wf[0], wf[1] + wf[2]], axis=0)   # [2,3,Cin,C]
        k_odd = jnp.stack([wf[0] + wf[1], wf[2]], axis=0)
        wk = jnp.stack([k_even, k_odd], axis=3)              # [2,3,Cin,2?,C]
        wk = wk.reshape(2, 3, Cin, 2 * C).astype(cd)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(cd)
        full = jax.lax.conv_general_dilated(
            xp, wk, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))      # [B,H+1,W,2C]
        even = full[:, 0:H, :, :C]
        odd = full[:, 1:H + 1, :, C:]
        y = jnp.stack([even, odd], axis=2).reshape(B, 2 * H, W, C)
        return y + b.astype(cd)


class _NoiseWeight(nn.Module):
    """Declares NoiseInjection's ``weight`` param (same name/shape/init)
    without applying it — the fused epilogue consumes the value directly.
    Instantiated with ``name='NoiseInjection_k'`` so checkpoints are
    identical across the sequential and fused paths."""
    features: int

    @nn.compact
    def __call__(self):
        return self.param("weight", nn.initializers.constant(0.01),
                          (1, 1, 1, self.features))


class StyledConvBlock(nn.Module):
    """conv1 -> noise -> lrelu -> AdaIN -> conv2 -> noise -> lrelu -> AdaIN.

    ``noise`` (optional pair of ``[B, H_out, W_out, 1]`` arrays) replaces the
    internally drawn noise — used by tests to compare against the fused
    Pallas inference path (:mod:`ops.gen_epilogue`) with identical samples.
    """
    features: int
    initial: bool = False
    upsample: bool = False
    only_vertical: bool = False
    fused: bool = False
    defer_final_adain: bool = False   # return (x, gamma, beta) pre-norm
    fused_epilogue: bool = False      # Pallas blur+noise+lrelu+AdaIN pass
    phase_upsample: bool = False      # dense phase-decomposed upsample convs
    dtype: Any = None

    def _epilogue(self, x, style, nz, apply_blur, ada_name, noi_name):
        """One-HBM-pass ``[blur] -> noise -> lrelu -> AdaIN`` via
        :func:`ops.gen_epilogue.block_epilogue` (inference path).

        Declares the same param names as the sequential branch
        (NoiseInjection_k/weight, AdaIN_k/Dense_0) so checkpoints are
        interchangeable between the two paths."""
        from handwriting_line_generation_tpu.ops.gen_epilogue import \
            block_epilogue
        nw = _NoiseWeight(self.features, name=noi_name)()
        _, gamma, beta = AdaIN(self.features, dtype=self.dtype,
                               name=ada_name)(x, style, normalize=False)
        if nz is None:
            n = jax.random.normal(self.make_rng("noise"),
                                  x.shape[:3], x.dtype)
        else:
            n = nz[:, :, :, 0] if nz.ndim == 4 else nz
        return block_epilogue(x, n, nw[0, 0, 0], gamma, beta,
                              apply_blur=apply_blur)

    @nn.compact
    def __call__(self, x, style, noise=None):
        # Mosaic only lowers the kernel's [H, W*C] -> [H, W, C] shape cast
        # when C fills whole 128-lane registers; narrower blocks (C = 64/32/
        # 16 in the paper generator) keep the sequential path on TPU.  Off
        # TPU the kernel runs in the Pallas interpreter, which has no lane
        # restriction — the CPU parity test covers every C.  Param names are
        # identical either way, so checkpoints are unaffected.
        use_fused = self.fused_epilogue and (
            self.features % 128 == 0 or jax.default_backend() != "tpu")
        blur_in_epilogue = use_fused and self.upsample
        if self.initial:
            # ConvT (4,3), torch padding (0,1): H 1->4, W preserved
            # (pure_gen.py:161-163).  lax.conv_transpose pads the dilated
            # input, so the torch-equivalent padding is k-1-p per side.
            x = nn.ConvTranspose(self.features, (4, 3),
                                 padding=((3, 3), (1, 1)),
                                 dtype=self.dtype)(x)
        elif self.upsample:
            if self.fused:
                x = FusedUpsample(self.features,
                                  only_vertical=self.only_vertical,
                                  phase=self.phase_upsample,
                                  name="FusedUpsample_0")(x)
            elif self.phase_upsample and self.only_vertical:
                x = _PhaseUpConv(self.features, dtype=self.dtype,
                                 name="Conv_0")(x)
            else:
                scale = (2, 1) if self.only_vertical else (2, 2)
                x = upsample_nearest(x, scale)
                x = nn.Conv(self.features, (3, 3), padding="SAME",
                            dtype=self.dtype, name="Conv_0")(x)
            if not blur_in_epilogue:
                x = blur3x3(x)
        else:
            x = nn.Conv(self.features, (3, 3), padding="SAME",
                        dtype=self.dtype)(x)

        if use_fused:
            x = self._epilogue(x, style,
                               None if noise is None else noise[0],
                               blur_in_epilogue,
                               "AdaIN_0", "NoiseInjection_0")
        else:
            x = NoiseInjection()(
                x, self.make_rng("noise") if noise is None else None,
                noise=None if noise is None else noise[0])
            x = nn.leaky_relu(x, 0.2)
            x = AdaIN(self.features, dtype=self.dtype)(x, style)

        conv2_name = "Conv_1" if (self.upsample and not self.fused) \
            else "Conv_0"
        x = nn.Conv(self.features, (3, 3), padding="SAME",
                    dtype=self.dtype, name=conv2_name)(x)
        if use_fused and not self.defer_final_adain:
            return self._epilogue(x, style,
                                  None if noise is None else noise[1],
                                  False, "AdaIN_1", "NoiseInjection_1")
        x = NoiseInjection(name="NoiseInjection_1")(
            x, self.make_rng("noise") if noise is None else None,
            noise=None if noise is None else noise[1])
        x = nn.leaky_relu(x, 0.2)
        return AdaIN(self.features, dtype=self.dtype, name="AdaIN_1")(
            x, style, normalize=not self.defer_final_adain)


class StyleMLP(nn.Module):
    """PixelNorm + n x (Dense + LeakyReLU) style mapping (pure_gen.py:31-39)."""
    style_dim: int
    n_layers: int = 6
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, style, deterministic: bool = True):
        h = PixelNorm()(style)
        for i in range(self.n_layers):
            h = nn.Dense(self.style_dim, dtype=self.dtype)(h)
            if self.dropout > 0 and i < self.n_layers - 1:
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = nn.leaky_relu(h, 0.2)
        return h


class SpacedGenerator(nn.Module):
    """Spaced one-hot ``[B, T, C]`` + style ``[B, S]`` -> image ``[B, 64, 4T, 1]``.

    ``char_style_dim > 0`` additionally takes a per-position style map
    ``spaced_style [B, T, char_style_dim]`` (the output of
    ``HWWithStyle.space_style``, the TPU realization of the reference's
    per-character style placement, ``hw_with_style.py:341-361``) and
    appends it to the content channels — char-specific vectors land at
    their character positions while AdaIN stays driven by the global style.
    """
    num_class: int
    style_dim: int
    dim: int = 256
    n_style_trans: int = 6
    append_style: bool = True
    emb_dropout: float = 0.0
    small: bool = False
    char_style_dim: int = 0       # per-position spaced-style channels
    fused_epilogue: bool = False  # Pallas one-pass block epilogues (inference)
    phase_upsample: bool = False  # dense phase-decomposed upsample convs
    dtype: Any = jnp.float32      # compute dtype; bfloat16 for the MXU path

    @nn.compact
    def __call__(self, spaced_onehot, style, deterministic: bool = True,
                 noise=None, spaced_style=None):
        """``noise``: optional list of 10 ``[B, H, W, 1]`` arrays (2 per
        block, at each block's output resolution) overriding the internal
        ``noise`` rng stream — for parity tests against the fused path."""
        style = style.astype(self.dtype)
        spaced_onehot = spaced_onehot.astype(self.dtype)
        style = StyleMLP(self.style_dim, self.n_style_trans,
                         self.emb_dropout, dtype=self.dtype)(
                             style, deterministic)
        x = spaced_onehot[:, None, :, :]                     # [B, 1, T, C]
        if self.append_style:
            s = jnp.broadcast_to(style[:, None, None, :],
                                 x.shape[:3] + (self.style_dim,))
            x = jnp.concatenate([x, s], axis=-1)
        if self.char_style_dim > 0:
            if spaced_style is None:
                raise ValueError("char_style_dim > 0 requires spaced_style")
            x = jnp.concatenate(
                [x, spaced_style[:, None, :, :].astype(self.dtype)], axis=-1)

        d = self.dim
        nz = lambda i: None if noise is None else noise[2 * i:2 * i + 2]
        blk = lambda *a, **kw: StyledConvBlock(
            *a, dtype=self.dtype, fused_epilogue=self.fused_epilogue,
            phase_upsample=self.phase_upsample, **kw)
        x = blk(d, initial=True)(x, style, nz(0))                         # H4
        x = blk(d // 2, upsample=True, only_vertical=True)(x, style, nz(1))  # H8
        x = blk(d // 4, upsample=True, only_vertical=True)(x, style, nz(2))  # H16
        x = blk(d // 8, upsample=True, fused=True)(x, style, nz(3))       # H32 W2T
        # final block defers its AdaIN: the per-channel affine folds exactly
        # into the 1x1 equal-conv (no padding at 1x1), so the normalized
        # H64 tensor — the largest in the network — is never materialized
        x, gamma, beta = blk(d // 16, upsample=not self.small, fused=True,
                             defer_final_adain=True)(x, style, nz(4))     # H64 W4T
        mean, rstd = _instance_stats(x)
        mean, rstd = mean[:, 0, 0], rstd[:, 0, 0]                 # [B, C]
        g32 = gamma.astype(jnp.float32) * rstd
        x = EqualConv(1, kernel=(1, 1))(
            x, in_scale=g32,
            in_shift=beta.astype(jnp.float32) - mean * g32)
        return jnp.tanh(x.astype(jnp.float32))

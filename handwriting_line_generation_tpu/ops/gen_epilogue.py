"""Fused Pallas epilogue for the generator's styled conv blocks.

Between two convolutions, each StyledConvBlock half runs
``[blur] -> +noise -> leaky_relu -> AdaIN`` (``models/generator.py``,
re-designed from ``/root/reference/model/pure_gen.py:202-216``).  XLA
cannot fuse across its conv custom-calls, so this sequence costs 5 HBM
passes over the activation (blur read+write, stats read, normalize
read+write).  This kernel does it in ONE read + ONE write: the whole
``[H, W, C]`` extent of one sample fits in VMEM (<= 1.6 MB at bench
shapes), so the instance-norm statistics are computed in-register between
the load and the store.

Layout: the activation is passed **flattened to** ``[B, H, W*C]`` (a free
XLA bitcast — C is minor) so the kernel's vector lanes are fully used even
for C = 16; the per-pixel noise plane stays ``[B, H, W]`` and is lane-
replicated in VMEM.

Exact math (same primitive order as the flax path): blur is the zero-padded
3x3 binomial; noise weight is pre-scaled by sqrt(2); stats are one-pass
f32 ``E[x^2]-mu^2`` like :func:`models.layers._instance_norm`.

Inference-path only (no custom VJP); enabled via
``GeneratorConfig.fused_epilogue`` and used by ``bench.py`` /
``GenerationSession``.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(z_ref, n_ref, nw_ref, g_ref, b_ref, o_ref, *, H, W, C,
            apply_blur, eps):
    # Mosaic restricts non-no-op relayouts (minor-dim insert/split) to 32-bit
    # types, so all in-kernel math runs in f32 regardless of the stored dtype
    # (the [H, W, C] extent in f32 is <= 3 MB at bench shapes).  Same math as
    # the sequential path: bf16 runs there keep f32 accumulation for blur
    # sums and stats too, and the final affine rounds to the compute dtype.
    dt = z_ref.dtype
    z = z_ref[0].astype(jnp.float32).reshape(H, W, C)
    if apply_blur:
        # separable zero-padded binomial: rows (1,2,1)/4 then cols (1,2,1)/4
        zp = jnp.pad(z, ((1, 1), (0, 0), (0, 0)))
        z = (zp[:-2] + 2.0 * zp[1:-1] + zp[2:]) * 0.25
        zp = jnp.pad(z, ((0, 0), (1, 1), (0, 0)))
        z = (zp[:, :-2] + 2.0 * zp[:, 1:-1] + zp[:, 2:]) * 0.25
        if dt != jnp.float32:
            z = z.astype(dt).astype(jnp.float32)     # round like the flax path
    noise = n_ref[0].astype(jnp.float32)             # [H, W]
    nw = nw_ref[0, 0].astype(jnp.float32)            # [C]
    nz = noise[:, :, None] * nw[None, None, :]
    if dt != jnp.float32:
        nz = nz.astype(dt).astype(jnp.float32)
    z = z + nz
    z = jnp.maximum(z, 0.2 * z)                      # leaky_relu(0.2)
    if dt != jnp.float32:
        z = z.astype(dt).astype(jnp.float32)
    n_el = float(H * W)
    s1 = jnp.sum(z, axis=(0, 1)) / n_el              # [C] mean
    s2 = jnp.sum(z * z, axis=(0, 1)) / n_el
    var = jnp.maximum(s2 - s1 * s1, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    gamma = g_ref[0, 0].astype(jnp.float32)          # [C]
    beta = b_ref[0, 0].astype(jnp.float32)
    # literal flax op order: normalize in f32, cast to the compute dtype,
    # then the affine in the compute dtype (AdaIN in models/layers.py)
    zn = (z - s1[None, None, :]) * rstd[None, None, :]
    if dt != jnp.float32:
        zn = zn.astype(dt).astype(jnp.float32)
    out = gamma[None, None, :] * zn + beta[None, None, :]
    o_ref[0] = out.astype(dt).reshape(H, W * C)


def block_epilogue(z: jnp.ndarray, noise: jnp.ndarray, nweight: jnp.ndarray,
                   gamma: jnp.ndarray, beta: jnp.ndarray, *,
                   apply_blur: bool, eps: float = 1e-5,
                   interpret: bool = False) -> jnp.ndarray:
    """``[blur] -> x + sqrt2*w*noise -> lrelu -> AdaIN`` in one HBM pass.

    Args:
      z: ``[B, H, W, C]`` conv output (pre-noise).
      noise: ``[B, H, W]`` standard-normal plane (shared across channels,
        like the reference's ``[B, 1, H, W]``).
      nweight: ``[C]`` NoiseInjection weight (NOT yet sqrt(2)-scaled).
      gamma, beta: ``[B, C]`` AdaIN affine from the style vector.
    Returns ``[B, H, W, C]`` in z's dtype.
    """
    B, H, W, C = z.shape
    if interpret is False and jax.default_backend() != "tpu":
        interpret = True                    # CPU tests run the interpreter
    zf = z.reshape(B, H, W * C)                       # free bitcast, C minor
    # vector inputs go in as [*, 1, C]: Mosaic requires each block's last two
    # dims be (8,128)-divisible OR equal to the array dims, so a (1, C) block
    # of a [B, C] array is rejected — an explicit singleton row dim makes
    # every block dim array-equal
    nw = (nweight.reshape(-1) * math.sqrt(2.0)).astype(z.dtype)[None, None, :]
    gamma3 = gamma.reshape(B, 1, C)
    beta3 = beta.reshape(B, 1, C)
    kern = functools.partial(_kernel, H=H, W=W, C=C,
                             apply_blur=apply_blur, eps=eps)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W * C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b: (0, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W * C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W * C), z.dtype),
        interpret=interpret,
    )(zf, noise.astype(z.dtype), nw, gamma3, beta3)
    return out.reshape(B, H, W, C)

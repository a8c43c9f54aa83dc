"""Shared flax building blocks.

TPU conventions used throughout the model zoo:
  * images are NHWC ``[B, H, W, C]`` (the reference is NCHW torch);
  * 1-D feature sequences are ``[B, T, C]``;
  * compute in float32 by default with optional bfloat16 activativation dtype
    (``dtype`` attr) — params stay float32.

Pieces re-designed from the reference:
  * group-norm group count rule (``utils/util.py:391-404`` ``getGroupSize`` —
    despite its name it returns the *number of groups*: 8 when divisible for
    >=32 channels, else 4, else the nearest prime factor);
  * StyleGAN infra of ``model/pure_gen.py``: equal-LR scaling, PixelNorm,
    AdaIN, noise injection, binomial blur, fused upsample (``pure_gen.py:
    52-311``).  The reference's custom ``Blur`` autograd Function exists only
    to reuse the (symmetric) kernel in backward — a plain depthwise conv has
    the identical gradient, so that is what we use;
  * spectral-norm conv with explicit ``u`` state (``discriminator_ap.py:
    11-65`` does power iteration inside forward; here the vector lives in a
    ``spectral`` variable collection updated once per step, stop-gradded).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def group_count(channels: int) -> int:
    """Number of GroupNorm groups per the reference's rule."""
    if channels <= 1:
        return 1        # degenerate case (reference crashes here)
    goal = 8 if channels >= 32 else 4
    if channels % goal == 0:
        return goal
    # nearest prime factor, favoring larger on ties
    n, factors = channels, []
    d = 2
    while d * d <= n:
        while n % d == 0:
            factors.append(d)
            n //= d
        d += 1
    if n > 1:
        factors.append(n)
    best = min(factors, key=lambda f: (abs(f - goal), -f))
    return int(best)


def gn(channels: int, dtype: Any = None) -> nn.GroupNorm:
    # flax GroupNorm computes mean/var in float32 regardless of ``dtype``
    # (linen.normalization._compute_stats upcasts), so a bfloat16 ``dtype``
    # only affects the (cheap) scale/shift — safe under mixed precision.
    return nn.GroupNorm(num_groups=group_count(channels), dtype=dtype)


def _pad2d(x: jnp.ndarray, pad: Tuple[int, int, int, int], mode: str) -> jnp.ndarray:
    """Pad NHWC by (top, bottom, left, right)."""
    t, b, l, r = pad
    cfg = ((0, 0), (t, b), (l, r), (0, 0))
    if mode == "zero":
        return jnp.pad(x, cfg)
    if mode == "replicate":
        return jnp.pad(x, cfg, mode="edge")
    if mode == "reflect":
        return jnp.pad(x, cfg, mode="reflect")
    raise ValueError(f"unknown pad mode {mode}")


def activation(name: str) -> Optional[Callable]:
    return {
        "relu": nn.relu,
        "lrelu": lambda x: nn.leaky_relu(x, 0.2),
        "lrelu01": lambda x: nn.leaky_relu(x, 0.1),
        "tanh": jnp.tanh,
        "selu": jax.nn.selu,
        "logsoftmax": lambda x: jax.nn.log_softmax(x, axis=-1),
        "none": None,
    }[name]


class ConvBlock(nn.Module):
    """conv + optional norm + optional activation with pad-type control.

    Generalizes the reference's ``Conv2dBlock`` (``model/char_style.py:9-82``).
    """
    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int, int, int] = (0, 0, 0, 0)  # t, b, l, r
    norm: str = "none"           # none | group | batch(->group) | instance
    act: str = "relu"
    pad_type: str = "zero"
    use_bias: bool = True
    dtype: Any = None            # compute dtype (None = promote with params)

    @nn.compact
    def __call__(self, x):
        x = _pad2d(x, self.padding, self.pad_type)
        x = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding="VALID", use_bias=self.use_bias,
                    dtype=self.dtype)(x)
        if self.norm == "group" or self.norm == "batch":
            # batch-norm is deliberately mapped to group-norm: batch stats
            # don't shard cleanly across a data mesh and the reference's own
            # "group" variants exist for exactly this reason
            x = gn(self.features, self.dtype)(x)
        elif self.norm == "instance":
            x = _instance_norm(x)
        if (a := activation(self.act)) is not None:
            x = a(x)
        return x


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-sample, per-channel normalization over H, W (no affine).

    Statistics always in float32 — bfloat16 mean/var cancellation would
    dominate the normalized signal; output keeps the input dtype.

    Uses the one-pass E[x^2] - E[x]^2 form rather than ``jnp.var`` (which
    reduces (x - mean)^2 and forces XLA into a second full read of the
    tensor after the mean is known).  Both reductions here share one fused
    sweep — on the generator's H64 activations that is a full HBM pass
    saved per AdaIN.  Post-activation values are O(1) so f32 cancellation
    error is ~1e-7 relative, far below bf16 resolution."""
    mean, rstd = _instance_stats(x, eps)
    return ((x.astype(jnp.float32) - mean) * rstd).astype(x.dtype)


def _instance_stats(x: jnp.ndarray, eps: float = 1e-5
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-sweep f32 (mean, rstd) over H, W — ``[B, 1, 1, C]`` each."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    mean_sq = jnp.mean(xf * xf, axis=(1, 2), keepdims=True)
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    return mean, jax.lax.rsqrt(var + eps)


# ---------------------------------------------------------------------------
# StyleGAN infrastructure (pure_gen.py lineage)
# ---------------------------------------------------------------------------


class PixelNorm(nn.Module):
    """x / sqrt(mean(x^2) + eps) over channels (``pure_gen.py:306-311``)."""

    @nn.compact
    def __call__(self, x):
        xf = x.astype(jnp.float32)
        return (xf * jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-8)).astype(x.dtype)


class EqualDense(nn.Module):
    """Dense with runtime equal-LR scale sqrt(2/fan_in), N(0,1) init
    (``pure_gen.py:218-247,293-304``)."""
    features: int

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        w = self.param("kernel", nn.initializers.normal(1.0), (in_f, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        scale = math.sqrt(2.0 / in_f)
        return x @ (w * scale).astype(x.dtype) + b.astype(x.dtype)


class EqualConv(nn.Module):
    """NHWC conv with equal-LR runtime scaling (``pure_gen.py:281-291``).

    For 1x1 kernels an optional per-sample channel affine ``(in_scale,
    in_shift)`` (each ``[B, C_in]``) can be folded into the contraction:
    ``conv(x * s + t) == contract(x, w*s) + contract(t, w) + b`` exactly
    (no padding exists at 1x1), so the affine never materializes —
    one full HBM pass saved on the generator's largest tensor."""
    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"

    @nn.compact
    def __call__(self, x, in_scale=None, in_shift=None):
        in_f = x.shape[-1]
        kh, kw = self.kernel
        w = self.param("kernel", nn.initializers.normal(1.0),
                       (kh, kw, in_f, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        scale = math.sqrt(2.0 / (in_f * kh * kw))
        if in_scale is not None:
            if (kh, kw) != (1, 1) or self.stride != (1, 1):
                raise ValueError(
                    "EqualConv affine folding is only exact for unpadded "
                    f"1x1 stride-1 convs, got kernel {(kh, kw)} stride "
                    f"{self.stride}")
            if in_shift is None:
                raise ValueError("in_scale requires in_shift (pass zeros "
                                 "for a pure scale)")
            w2d = (w * scale)[0, 0].astype(jnp.float32)       # [C_in, F]
            # per-sample folded kernel, bf16 so x streams at its own width.
            # Broadcast-multiply + reduce (not einsum): a batched dot with
            # per-sample weights can lower to B tiny matmuls; this form is
            # one fused elementwise+reduce sweep over x.
            wk = (in_scale.astype(jnp.float32)[:, :, None]
                  * w2d[None]).astype(x.dtype)                # [B, C_in, F]
            y = jnp.sum(x[..., :, None].astype(jnp.float32)
                        * wk[:, None, None, :, :], axis=-2)   # [B, H, W, F]
            bias = in_shift.astype(jnp.float32) @ w2d + b.astype(jnp.float32)
            return y + bias[:, None, None, :]
        y = jax.lax.conv_general_dilated(
            x, (w * scale).astype(x.dtype), window_strides=self.stride,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b.astype(x.dtype)


class AdaIN(nn.Module):
    """Adaptive instance norm: IN then per-channel affine from style
    (``pure_gen.py:52-69``; bias init gamma=1, beta=0).

    ``normalize=False`` skips the normalization and returns
    ``(x, gamma, beta)`` instead — callers that can fold the affine into a
    following linear op (the generator's final 1x1 EqualConv) use this to
    avoid materializing the normalized tensor."""
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, style, normalize: bool = True):
        h = nn.Dense(2 * self.features, dtype=self.dtype,
                     bias_init=lambda k, s, d=jnp.float32: jnp.concatenate(
                         [jnp.ones(self.features, d), jnp.zeros(self.features, d)])
                     )(style)
        gamma, beta = h[:, : self.features], h[:, self.features:]
        if not normalize:
            return x, gamma, beta
        y = _instance_norm(x)
        return gamma[:, None, None, :] * y + beta[:, None, None, :]


class NoiseInjection(nn.Module):
    """x + w * noise with per-channel weight init 0.01, equal-LR scaled
    (``pure_gen.py:72-79,193``)."""

    @nn.compact
    def __call__(self, x, rng, noise=None):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.constant(0.01), (1, 1, 1, c))
        # reference wraps NoiseInjection in equal_lr: effective weight is
        # w * sqrt(2 / fan_in) with fan_in = 1*1*1 = 1 -> sqrt(2)
        if noise is None:
            noise = jax.random.normal(rng, x.shape[:3] + (1,), x.dtype)
        else:
            noise = noise.astype(x.dtype)
        return x + (w * math.sqrt(2.0)).astype(x.dtype) * noise


_BLUR_KERNEL = jnp.array([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]])
_BLUR_KERNEL = _BLUR_KERNEL / _BLUR_KERNEL.sum()


def blur3x3(x: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3 binomial blur (``pure_gen.py:123-137``). The kernel is
    symmetric so forward and backward convs coincide — no custom vjp needed."""
    c = x.shape[-1]
    k = jnp.tile(_BLUR_KERNEL[:, :, None, None], (1, 1, 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


class FusedUpsample(nn.Module):
    """Stride-2 transposed conv whose kernel is the 4-tap average of the
    padded weight — StyleGAN's fused upsample (``pure_gen.py:250-279``).

    ``phase=True`` computes the identical transposed conv by phase
    decomposition: a stride-2 convT evaluates the dilated input at 4
    output phases, and with a 4x4 kernel each phase touches exactly a
    2x2 window of the *undilated* input — so one dense 2x2 VALID conv on
    the 1-padded input yields every phase by slicing, and the phases
    interleave back with reshapes.  Same math (float-assoc level), but the
    MXU runs a dense conv instead of a 3/4-zeros dilated one.
    """
    features: int
    kernel: int = 3
    only_vertical: bool = False
    phase: bool = False

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        k = self.kernel
        # torch layout (in, out, kh, kw) -> keep HWIO here
        w = self.param("kernel", nn.initializers.normal(1.0),
                       (k, k, in_f, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        mult = math.sqrt(2.0 / (in_f * k * k))
        wp = jnp.pad(w * mult, ((1, 1), (1, 1), (0, 0), (0, 0)))
        w4 = (wp[1:, 1:] + wp[:-1, 1:] + wp[1:, :-1] + wp[:-1, :-1]) / 4.0
        if self.phase:
            return self._phase_apply(x, w4, b)
        stride = (2, 1) if self.only_vertical else (2, 2)
        # torch conv_transpose2d(k=4, stride=2, padding=1) doubles the dim.
        # lax.conv_transpose pads the stride-dilated input, so per-side
        # padding k-1-p = 2 reproduces it; the stride-1 (vertical-only) width
        # needs pl+ph = k-1 = 3 to preserve the width exactly.
        pad = ((2, 2), (1, 2)) if self.only_vertical else ((2, 2), (2, 2))
        y = jax.lax.conv_transpose(
            x, w4.astype(x.dtype), strides=stride, padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b.astype(x.dtype)

    def _phase_apply(self, x, w4, b):
        """Dense-conv phase decomposition of the stride-2 convT.

        Derivation (H side; W identical): with convT padding 2, output row
        ``2a+ph`` reads dilated rows ``2a+ph+kh-2`` which are nonzero only
        for ``kh = ph (mod 2)``, giving input rows ``a-1`` (kh=ph) and
        ``a`` / ``a+1`` (kh=ph+2).  On the 1-padded input a single VALID
        2x2 conv evaluates every (row-pair, col-pair) window once; phase
        (ph, pw) is its ``[ph : H+ph, pw : W+pw]`` slice with kernel taps
        ``w4[[ph, ph+2], [pw, pw+2]]``."""
        B, H, W, Cin = x.shape
        Cout = self.features
        ov = self.only_vertical
        ph_list = [(ph, pw) for ph in (0, 1)
                   for pw in ((0,) if ov else (0, 1))]
        if ov:
            # W has stride 1: keep all 4 W taps of w4 with the original
            # (1, 2) W padding; only H is phase-decomposed
            wk = jnp.stack([w4[jnp.array([ph, ph + 2])] for ph, _ in ph_list],
                           axis=3)          # [2, 4, Cin, P, Cout]
            wk = wk.reshape(2, 4, Cin, len(ph_list) * Cout)
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 2), (0, 0)))
        else:
            wk = jnp.stack(
                [w4[jnp.array([ph, ph + 2])][:, jnp.array([pw, pw + 2])]
                 for ph, pw in ph_list],
                axis=3)                     # [2, 2, Cin, P, Cout]
            wk = wk.reshape(2, 2, Cin, len(ph_list) * Cout)
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        full = jax.lax.conv_general_dilated(
            xp, wk.astype(x.dtype), window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # full: [B, H+1, W+1 (or W), P*Cout]
        outs = []
        for i, (ph, pw) in enumerate(ph_list):
            sl = full[:, ph:H + ph]
            if not ov:
                sl = sl[:, :, pw:W + pw]
            outs.append(sl[..., i * Cout:(i + 1) * Cout])
        if ov:
            y = jnp.stack(outs, axis=2)                # [B, H, 2, W, C]
            y = y.reshape(B, 2 * H, W, Cout)
        else:
            e = jnp.stack([outs[0], outs[1]], axis=3)  # ph=0: [B,H,W,2,C]
            o = jnp.stack([outs[2], outs[3]], axis=3)  # ph=1
            e = e.reshape(B, H, 2 * W, Cout)
            o = o.reshape(B, H, 2 * W, Cout)
            y = jnp.stack([e, o], axis=2).reshape(B, 2 * H, 2 * W, Cout)
        return y + b.astype(x.dtype)


def upsample_nearest(x: jnp.ndarray, scale: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor upsample of NHWC by (sh, sw)."""
    sh, sw = scale
    x = jnp.repeat(x, sh, axis=1)
    return jnp.repeat(x, sw, axis=2)


# ---------------------------------------------------------------------------
# Spectral norm
# ---------------------------------------------------------------------------


class SNConv(nn.Module):
    """Conv with spectral normalization via explicit power-iteration state.

    The reference runs one power iteration inside every forward and divides
    the weight by sigma (``discriminator_ap.py:20-32``).  Here ``u`` lives in
    the ``spectral`` variable collection; callers thread it through train
    steps with ``mutable=['spectral']`` and the iteration is stop-gradded.
    """
    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int, int, int] = (0, 0, 0, 0)
    update_stats: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kh, kw = self.kernel
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (kh, kw, in_f, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        # power iteration + sigma stay float32 (params are float32);
        # only the conv itself runs in the compute dtype
        # torch reshapes (out, in*kh*kw); mirror with out = last axis here
        wm = w.reshape(-1, self.features)                 # [in*kh*kw, out]
        u_var = self.variable(
            "spectral", "u",
            lambda: _l2normalize(jax.random.normal(
                self.make_rng("params") if self.has_rng("params")
                else jax.random.PRNGKey(0), (self.features,))))
        u = u_var.value
        v = _l2normalize(jax.lax.stop_gradient(wm) @ u)
        u_new = _l2normalize(jax.lax.stop_gradient(wm).T @ v)
        if self.update_stats and not self.is_initializing():
            u_var.value = u_new
        sigma = jnp.einsum("i,io,o->", v, wm, u_new)
        w_sn = w / (sigma + 1e-12)
        cd = self.dtype or jnp.promote_types(x.dtype, w_sn.dtype)
        y = jax.lax.conv_general_dilated(
            _pad2d(x.astype(cd), self.padding, "zero"), w_sn.astype(cd),
            window_strides=self.stride, padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b.astype(cd)


def _l2normalize(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


def avg_pool(x: jnp.ndarray, window: Tuple[int, int],
             stride: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    return nn.avg_pool(x, window, strides=stride or window)


def max_pool(x: jnp.ndarray, window: Tuple[int, int],
             stride: Optional[Tuple[int, int]] = None,
             padding="VALID") -> jnp.ndarray:
    return nn.max_pool(x, window, strides=stride or window, padding=padding)


class Conv1DBlock(nn.Module):
    """1-D conv (+ optional dilation/norm/act) over ``[B, T, C]``."""
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    norm: str = "none"
    act: str = "relu"
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Conv(self.features, (self.kernel,), strides=(self.stride,),
                    padding=((self.padding, self.padding),),
                    kernel_dilation=(self.dilation,), dtype=self.dtype)(x)
        if self.norm == "group":
            x = gn(self.features, self.dtype)(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        if (a := activation(self.act)) is not None:
            x = a(x)
        return x

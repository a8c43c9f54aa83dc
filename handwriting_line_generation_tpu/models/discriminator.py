"""Multi-scale spectral-norm patch discriminator.

Re-design of ``model/discriminator_ap.py:68-161``: a shared trunk (GroupNorm
in-conv then spectral-norm convs with avg-pools) feeding a medium-resolution
patch head (``finalMed``) and a low/global head (``convs4``, 1-D convs on the
height-collapsed map).  Heights use VALID padding so a 64-px input collapses
to exactly 1 at the heads (58 -> 26 -> 12 -> 3 -> 1); widths are SAME-padded
and shrink only via the pools, keeping width bookkeeping trivial.

Returns a list of per-scale patch score maps flattened to ``[B, N_i]`` —
the trainer averages hinge losses over scales
(``hw_with_style_trainer.py:797-806``).
"""

from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

from handwriting_line_generation_tpu.models.layers import SNConv, avg_pool, gn


class DiscriminatorAP(nn.Module):
    """``cond``/``use_global`` cover the dev-era variants the paper config
    names but turns off (``"condAP wide, no style, no global, use low, no
    cond"`` in ``cf_IAMslant_..._sMG.json``; the shipped dispatch
    ``hw_with_style.py:193-198`` parses only use-low/no-med/small, so those
    tokens are vestigial there).  ``use_global`` adds a pooled whole-line
    score head; ``cond`` adds a projection-conditioned score
    ``<embed(style), pooled features>`` so the discriminator can judge
    style consistency, not just realism."""
    dim: int = 64
    use_low: bool = True
    use_med: bool = True
    small: bool = False
    cond: bool = False
    use_global: bool = False
    leak: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 return_features: bool = False, style=None):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        d = self.dim
        lrelu = lambda v: nn.leaky_relu(v, self.leak)
        drop = lambda v, p: nn.Dropout(p, broadcast_dims=(1, 2),
                                       deterministic=deterministic)(v)
        sn = lambda *a, **kw: SNConv(*a, dtype=self.dtype, **kw)
        # hinge-loss margins are O(1): scores return float32
        f32 = lambda v: v.astype(jnp.float32)

        # in_conv: 7x7 VALID-height conv, group-norm (no SN on first layer)
        x = nn.Conv(d, (7, 7), padding=((0, 0), (3, 3)),
                    dtype=self.dtype)(x)                      # H 64 -> 58
        x = lrelu(gn(d, self.dtype)(x))

        pv = (1, 1, 1, 1) if self.small else (0, 0, 1, 1)     # t,b,l,r
        m = sn(d, (3, 3), padding=pv)(x)                      # 58 -> 56
        m = lrelu(m)
        if not self.small:
            m = avg_pool(m, (2, 2))                           # -> 28
        m = sn(2 * d, (3, 3), padding=pv)(m)                  # -> 26
        m = lrelu(drop(m, 0.05))

        mL = sn(2 * d, (3, 3), padding=(0, 0, 1, 1))(m)       # -> 24
        mL = avg_pool(lrelu(mL), (2, 2))                      # -> 12
        mL = nn.Conv(2 * d, (3, 3), padding=((0, 0), (1, 1)),
                     dtype=self.dtype)(mL)                    # -> 10
        mL = avg_pool(lrelu(gn(2 * d, self.dtype)(mL)), (2, 2))   # -> 5
        mL = sn(4 * d, (3, 3), padding=(0, 0, 1, 1))(mL)      # -> 3
        mL = lrelu(drop(mL, 0.05))

        out: List[jnp.ndarray] = []
        pM = pL = None
        if self.use_med:
            pM = sn(1, (3, 3), padding=(0, 0, 1, 1))(mL)      # H -> 1
            out.append(f32(pM.reshape(pM.shape[0], -1)))
        if self.use_low:
            y = sn(2 * d, (3, 3), padding=(0, 0, 1, 1))(mL)   # H -> 1
            y = lrelu(drop(y, 0.025))
            y = avg_pool(y, (1, 2))
            y = sn(4 * d, (1, 3), padding=(0, 0, 1, 1))(y)
            y = lrelu(drop(y, 0.025))
            y = sn(4 * d, (1, 3), padding=(0, 0, 1, 1))(y)
            y = lrelu(drop(y, 0.025))
            y = avg_pool(y, (1, 2))
            y = sn(4 * d, (1, 3), padding=(0, 0, 1, 1))(y)
            y = lrelu(drop(y, 0.025))
            pL = sn(1, (1, 1))(y)
            out.append(f32(pL.reshape(pL.shape[0], -1)))
        if self.use_global or self.cond:
            pooled = jnp.mean(mL, axis=(1, 2))                # [B, 4d]
            if self.use_global:
                g = lrelu(nn.Dense(4 * d, name="global_fc",
                                   dtype=self.dtype)(pooled))
                out.append(f32(nn.Dense(1, name="global_out",
                                        dtype=self.dtype)(g)))
            if self.cond:
                if style is None:
                    raise ValueError(
                        "cond discriminator needs the conditioning style")
                proj = nn.Dense(4 * d, use_bias=False, name="cond_proj",
                                dtype=self.dtype)(
                                    style.astype(pooled.dtype))  # [B, 4d]
                out.append(f32(jnp.sum(pooled * proj, axis=-1,
                                       keepdims=True)))
        if return_features:
            return mL, pL
        return out

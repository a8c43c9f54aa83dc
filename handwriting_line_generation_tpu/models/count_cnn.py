"""Spacing predictor ("spacer").

Re-design of ``model/count_cnn.py:7-44``: the label one-hot sequence is
concatenated with the broadcast style vector and pushed through a small 1-D
conv stack predicting per-character ``(blanks_before, duplicates)``.  The
output is scaled by learned per-channel ``std``/``mean`` initialized to the
reference's educated guesses (mean (2.0, 0.0), std (1.5, 0.5),
``count_cnn.py:30-31``) so training starts near plausible spacing.

Batch-major: ``label_onehot [B, L, C]``, ``style [B, S]`` -> ``[B, L, n_out]``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from handwriting_line_generation_tpu.models.layers import gn


class CountCNN(nn.Module):
    hidden: int = 128
    n_out: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, label_onehot, style, deterministic: bool = True):
        B, L, _ = label_onehot.shape
        s = jnp.broadcast_to(style[:, None, :], (B, L, style.shape[-1]))
        x = jnp.concatenate([label_onehot, s.astype(label_onehot.dtype)],
                            axis=-1)
        if self.dtype is not None:
            x = x.astype(self.dtype)

        h = self.hidden
        for f, drop in ((h, 0.1), (h // 2, 0.1), (h // 4, 0.0)):
            x = nn.Conv(f, (3,), padding="SAME", dtype=self.dtype)(x)
            x = gn(f, self.dtype)(x)
            if drop:
                x = nn.Dropout(drop, broadcast_dims=(1,),
                               deterministic=deterministic)(x)
            x = nn.relu(x)
        # counts feed spacing GT math: predict in float32
        x = nn.Conv(self.n_out, (1,))(x.astype(jnp.float32))

        if self.n_out == 2:
            mean_init = jnp.array([2.0, 0.0])
            std_init = jnp.array([1.5, 0.5])
        else:
            mean_init = jnp.full((self.n_out,), 2.0)
            std_init = jnp.ones((self.n_out,))
        mean = self.param("mean", lambda k: mean_init)
        std = self.param("std", lambda k: std_init)
        return x * std + mean

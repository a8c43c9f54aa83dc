"""Blob masks and line-geometry extraction.

Replaces ``utils/util.py:59-314`` (``makeMask`` / ``getCenterValue``): the
reference max-pools the ink image, fills it with cumulative maxima from all
four directions (so the blob hull between strokes is covered), then applies
conv-based morphology post-ops selected by config
(``mask_post: ["thresh","dilateCircle","errodeCircle"]`` in the paper GAN
config).  Host numpy loops become ``lax.cummax`` + ``reduce_window`` here
and run batched on device.

Deviation: the reference's ``dilate``/``errode`` convs change the spatial
size (no padding / transpose); ours are SAME-padded so masks keep the image
shape — downstream consumers (fg-masked L1, eval renders) expect that
anyway.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp


def _disk(radius: int) -> jnp.ndarray:
    d = 2 * radius + 1
    yy, xx = jnp.mgrid[:d, :d]
    return (((yy - radius) ** 2 + (xx - radius) ** 2) <= radius ** 2
            ).astype(jnp.float32)


def _conv_same(x: jnp.ndarray, k2d: jnp.ndarray) -> jnp.ndarray:
    k = k2d[:, :, None, None]
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def make_mask(image: jnp.ndarray, post: Optional[List[str]] = None,
              v_kernel: int = 7, h_kernel: int = 31,
              morph_kernel: int = 25) -> jnp.ndarray:
    """Blob mask of the written line, ``[B, H, W, 1]`` in {0, 1}."""
    post = post or ["thresh", "dilateCircle", "errodeCircle"]
    x = jax.lax.reduce_window(
        image, -jnp.inf, jax.lax.max,
        (1, v_kernel, h_kernel, 1), (1, 1, 1, 1), "SAME")
    down = jax.lax.cummax(x, axis=1)
    up = jnp.flip(jax.lax.cummax(jnp.flip(x, 1), axis=1), 1)
    right = jax.lax.cummax(x, axis=2)
    left = jnp.flip(jax.lax.cummax(jnp.flip(x, 2), axis=2), 2)
    out = jnp.minimum(jnp.minimum(down, up), jnp.minimum(right, left))

    radius = morph_kernel // 2
    for task in post:
        if task == "thresh":
            out = (out > 0.1).astype(jnp.float32)
        elif task == "smaller":
            radius = radius // 2
        elif task in ("dilate", "dilateCircle"):
            k = (_disk(radius) if "Circle" in task
                 else jnp.ones((2 * radius + 1, 2 * radius + 1)))
            out = (_conv_same(out, k) > 0.1).astype(jnp.float32)
        elif task in ("errode", "errodeCircle"):
            k = (_disk(radius) if "Circle" in task
                 else jnp.ones((2 * radius + 1, 2 * radius + 1)))
            out = (_conv_same(out, k) >= k.sum() - 0.5).astype(jnp.float32)
        else:
            raise ValueError(f"unknown mask post-op {task!r}")
    return out


def line_geometry(image: jnp.ndarray, mask: Optional[jnp.ndarray] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-column (top, bottom) extents and center line.

    Replaces the extent/center extraction of ``util.py:150-243,246-314``:
    ``top_and_bottom [B, 2, W]`` and ``center_line [B, W]`` (center =
    ink-mass-weighted mean row, smoothed; defaults to H/2 on empty columns).
    """
    if mask is None:
        mask = (image > 0.1).astype(jnp.float32)
    m = mask[..., 0]                                   # [B, H, W]
    B, H, W = m.shape
    rows = jnp.arange(H)[None, :, None]
    any_col = jnp.sum(m, axis=1) > 0                   # [B, W]
    top = jnp.min(jnp.where(m > 0, rows, H), axis=1)
    bottom = jnp.max(jnp.where(m > 0, rows, -1), axis=1)
    top = jnp.where(any_col, top, 0)
    bottom = jnp.where(any_col, bottom, 0)

    ink = jnp.clip(image[..., 0], 0.0, None)
    mass = jnp.sum(ink, axis=1)
    center = jnp.sum(ink * rows, axis=1) / jnp.maximum(mass, 1e-6)
    center = jnp.where(mass > 1e-3, center, H / 2.0)
    # light smoothing (the reference takes windowed medians, util.py:246-314)
    k = jnp.ones((1, 9, 1, 1)) / 9.0
    center = jax.lax.conv_general_dilated(
        center[:, :, None, None], k.transpose(1, 0, 2, 3), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[:, :, 0, 0]
    top_and_bottom = jnp.stack([top, bottom], axis=1).astype(jnp.float32)
    return top_and_bottom, center

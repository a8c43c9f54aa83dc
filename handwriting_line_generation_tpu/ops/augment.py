"""Device-side augmentation.

The reference augments on the host with OpenCV inside DataLoader workers
(``utils/augmentation.py``, ``utils/grid_distortion.py``,
``utils/normalize_line.py``); here the same transforms are vectorized jax
ops applied inside the (jitted) train step, keeping shapes static and the
host pipeline to decode+crop only:

* :func:`tensmeyer_brightness` — Otsu split (device histogram) then separate
  fg/bg brightness shifts (``augmentation.py:5-31``);
* :func:`affine_slant_stretch` — horizontal shear + stretch via inverse
  bilinear sampling (``augmentation.py:61-71`` ``affine_trans``);
* :func:`grid_warp` — Wigington mesh warp: a coarse control grid of normal
  offsets (std 1.5, ~12 px spacing) upsampled to a dense flow
  (``grid_distortion.py:11-66``);
* :func:`change_thickness` — min/max-pool erode/dilate + shade + blur +
  noise stroke augmentation (``augmentation.py:74-101``);
* :func:`deskew` — projection-profile-variance slant search
  (``normalize_line.py:9-63``) done as a vectorized argmax over candidate
  shears instead of a two-pass loop.

All functions take normalized images (``1 - px/128``: bg -1, ink ~ +1) of
shape ``[B, H, W, 1]`` and are pure (PRNG keys in, arrays out).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _to_u8_scale(img: jnp.ndarray) -> jnp.ndarray:
    """normalized -> [0, 255] float (paper 255, ink 0)."""
    return jnp.clip((1.0 - img) * 128.0, 0.0, 255.0)


def _from_u8_scale(u8: jnp.ndarray) -> jnp.ndarray:
    return 1.0 - u8 / 128.0


def otsu_threshold(img_u8: jnp.ndarray, nbins: int = 64) -> jnp.ndarray:
    """Per-image Otsu threshold over a [0,255]-scaled image ``[H, W, 1]``."""
    flat = img_u8.reshape(-1)
    edges = jnp.linspace(0.0, 255.0, nbins + 1)
    centers = (edges[:-1] + edges[1:]) / 2
    idx = jnp.clip((flat / (256.0 / nbins)).astype(jnp.int32), 0, nbins - 1)
    hist = jnp.zeros(nbins).at[idx].add(1.0)
    w0 = jnp.cumsum(hist)
    w1 = w0[-1] - w0
    s0 = jnp.cumsum(hist * centers)
    mu0 = s0 / jnp.maximum(w0, 1e-6)
    mu1 = (s0[-1] - s0) / jnp.maximum(w1, 1e-6)
    between = w0 * w1 * (mu0 - mu1) ** 2
    return centers[jnp.argmax(between)]


def tensmeyer_brightness(img: jnp.ndarray, rng: jax.Array,
                         sigma: float = 30.0) -> jnp.ndarray:
    """Random fg/bg brightness shifts split at the Otsu threshold."""
    def one(im, key):
        u8 = _to_u8_scale(im)
        th = otsu_threshold(u8)
        is_bg = (u8 > th).astype(im.dtype)
        k1, k2 = jax.random.split(key)
        fg_shift = sigma * jax.random.normal(k1)
        bg_shift = sigma * jax.random.normal(k2)
        out = u8 + (1.0 - is_bg) * fg_shift + is_bg * bg_shift
        return _from_u8_scale(jnp.clip(out, 0.0, 255.0))

    keys = jax.random.split(rng, img.shape[0])
    return jax.vmap(one)(img, keys)


def _bilinear_sample(im: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray,
                     fill: float) -> jnp.ndarray:
    """Sample ``im [H, W]`` at float coords (out-of-bounds -> fill)."""
    H, W = im.shape
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    dy = ys - y0
    dx = xs - x0

    def get(yy, xx):
        ok = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        v = im[jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]
        return jnp.where(ok, v, fill)

    return ((1 - dy) * (1 - dx) * get(y0, x0)
            + (1 - dy) * dx * get(y0, x0 + 1)
            + dy * (1 - dx) * get(y0 + 1, x0)
            + dy * dx * get(y0 + 1, x0 + 1))


def affine_slant_stretch(img: jnp.ndarray, skew: jnp.ndarray,
                         stretch: jnp.ndarray,
                         fill: float = -1.0) -> jnp.ndarray:
    """Shear (slant around the vertical center) + horizontal stretch.

    ``skew`` / ``stretch`` are per-sample ``[B]``; the canvas stays fixed
    (static shape) so a >1 stretch can run off the right edge — the host
    batcher leaves pad headroom in the width bucket for exactly this.
    """
    B, H, W, _ = img.shape
    ys = jnp.arange(H)[:, None] * jnp.ones((1, W))
    xs = jnp.ones((H, 1)) * jnp.arange(W)[None, :]

    def one(im, sk, st):
        # inverse map: src_x = (x - m*(H/2 - y)) / st, shear about mid-height
        m = jnp.tan(sk)
        src_x = (xs - m * (H / 2 - ys)) / st
        return _bilinear_sample(im[:, :, 0], ys, src_x, fill)[..., None]

    return jax.vmap(one)(img, skew, stretch)


def grid_warp(img: jnp.ndarray, rng: jax.Array, std: float = 1.5,
              spacing: int = 12, fill: float = -1.0,
              flow: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mesh-distortion warp: coarse normal offsets -> dense bilinear flow.

    ``flow``: optional precomputed dense ``[B, H, W, 2]`` (dy, dx) source
    displacements replacing the random mesh — lets the parity suite drive
    the sampling core with the reference's exact ``cv2.remap`` maps
    (``grid_distortion.py:58-64``)."""
    B, H, W, _ = img.shape
    if flow is None:
        gh = H // spacing + 2
        gw = W // spacing + 2
        offs = std * jax.random.normal(rng, (B, gh, gw, 2))
        flow = jax.image.resize(offs, (B, H, W, 2), method="bilinear")
    ys = jnp.arange(H)[:, None] + flow[:, :, :, 0]
    xs = jnp.arange(W)[None, :] + flow[:, :, :, 1]

    def one(im, yy, xx):
        return _bilinear_sample(im[:, :, 0], yy, xx, fill)[..., None]

    return jax.vmap(one)(img, ys, xs)


def change_thickness(img: jnp.ndarray, size: jnp.ndarray, fg_shade: jnp.ndarray,
                     bg_shade: jnp.ndarray, rng: jax.Array,
                     blur_size: int = 3,
                     noise_sigma: float = 0.02) -> jnp.ndarray:
    """Stroke thickness/shade augmentation (``augmentation.py:74-101``).

    ``size`` per-sample int in [-4, 4]: >0 dilates ink, <0 erodes.
    Returns images in [-1, 1] like the reference's ``new_img*2 - 1``.
    """
    B, H, W, _ = img.shape

    def one(im, sz, fg, bg, key):
        u8 = _to_u8_scale(im)
        th = otsu_threshold(u8)
        ink = (u8 <= th).astype(jnp.float32)           # 1 = ink
        r = jnp.abs(sz)
        # static unrolled radii with select (sz is traced)
        grown = ink
        for radius in (1, 2, 3, 4):
            cand = jax.lax.reduce_window(
                ink, -jnp.inf, jax.lax.max,
                (2 * radius + 1, 2 * radius + 1, 1), (1, 1, 1), "SAME")
            grown = jnp.where((sz > 0) & (r >= radius), cand, grown)
        shrunk = ink
        for radius in (1, 2, 3, 4):
            cand = -jax.lax.reduce_window(
                -ink, -jnp.inf, jax.lax.max,
                (2 * radius + 1, 2 * radius + 1, 1), (1, 1, 1), "SAME")
            shrunk = jnp.where((sz < 0) & (r >= radius), cand, shrunk)
        out = jnp.where(sz > 0, grown, jnp.where(sz < 0, shrunk, ink))
        out = out * (fg - bg) + bg
        k = jnp.ones((blur_size, blur_size, 1, 1)) / (blur_size ** 2)
        out = jax.lax.conv_general_dilated(
            out[None], k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        out = out + noise_sigma * jax.random.normal(key, out.shape)
        return jnp.clip(out, 0.0, 1.0) * 2.0 - 1.0

    keys = jax.random.split(rng, B)
    return jax.vmap(one)(img, size, fg_shade, bg_shade, keys)


def deskew(img: jnp.ndarray, n_angles: int = 31,
           max_slant: float = 1.0, fill: float = -1.0) -> jnp.ndarray:
    """Remove slant by maximizing vertical projection-profile variance.

    The reference searches shear angles in two refinement passes on the host
    (``normalize_line.py:9-63``); here all candidate shears are evaluated in
    one batched pass and the argmax applied.
    """
    B, H, W, _ = img.shape
    slants = jnp.linspace(-max_slant, max_slant, n_angles)
    ink = jnp.clip(img[..., 0], 0.0, None)             # ink mass >= 0

    ys = jnp.arange(H)[:, None] * jnp.ones((1, W))
    xs = jnp.ones((H, 1)) * jnp.arange(W)[None, :]

    def profile_var(im, m):
        sheared = _bilinear_sample(im, ys, xs - m * (H / 2 - ys), 0.0)
        prof = jnp.sum(sheared, axis=0)
        return jnp.var(prof)

    def one(im, im_full):
        variances = jax.vmap(lambda m: profile_var(im, m))(slants)
        best = slants[jnp.argmax(variances)]
        out = _bilinear_sample(im_full[:, :, 0], ys,
                               xs - best * (H / 2 - ys), fill)
        return out[..., None]

    return jax.vmap(one)(ink, img)


def _shift2d(m: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Zero-border shift of [B, H, W] by static (dy, dx)."""
    B, H, W = m.shape
    p = jnp.pad(m, ((0, 0), (1, 1), (1, 1)))
    return p[:, 1 + dy:1 + dy + H, 1 + dx:1 + dx + W]


def skeletonize(ink: jnp.ndarray, iters: int = 16) -> jnp.ndarray:
    """Zhang-Suen thinning, fully vectorized (replaces the host-side
    ``skimage.skeletonize`` call in ``normalize_line.py:66-70``).

    ``ink`` is a [B, H, W] {0,1} int map; each iteration applies both
    sub-passes via 8-neighborhood shifts — pure elementwise ops, so XLA
    fuses the whole pass.  16 iterations thin strokes up to ~32 px wide.
    """
    ink = ink.astype(jnp.int32)

    def sub(im, phase):
        # neighbors clockwise from north: P2..P9 (Zhang-Suen numbering)
        P = [_shift2d(im, -1, 0), _shift2d(im, -1, 1), _shift2d(im, 0, 1),
             _shift2d(im, 1, 1), _shift2d(im, 1, 0), _shift2d(im, 1, -1),
             _shift2d(im, 0, -1), _shift2d(im, -1, -1)]
        Bn = sum(P)
        seq = P + [P[0]]
        A = sum(((seq[i] == 0) & (seq[i + 1] == 1)).astype(jnp.int32)
                for i in range(8))
        cond = (im == 1) & (Bn >= 2) & (Bn <= 6) & (A == 1)
        if phase == 0:
            cond &= (P[0] * P[2] * P[4] == 0) & (P[2] * P[4] * P[6] == 0)
        else:
            cond &= (P[0] * P[2] * P[6] == 0) & (P[0] * P[4] * P[6] == 0)
        return im * (1 - cond.astype(jnp.int32))

    def body(_, im):
        return sub(sub(im, 0), 1)

    return jax.lax.fori_loop(0, iters, body, ink)


def normalize_line(img: jnp.ndarray) -> jnp.ndarray:
    """'normalization' augmentation: deskew, then reduce strokes to a
    uniform-thickness skeleton (Otsu -> thinning -> circular dilate ->
    3x3 box blur), as ``normalize_line.py:66-84`` / ``hw_dataset.py:138-140``.

    The reference caches normalized images on disk because its host pipeline
    is slow; this version runs on-device per batch so no cache is needed.
    Input/output in [-1, 1] with ink positive.
    """
    u8 = _to_u8_scale(img)
    th = jax.vmap(otsu_threshold)(u8)            # per-sample Otsu
    ink = (u8[..., 0] <= th[:, None, None]).astype(jnp.int32)
    sk = skeletonize(ink).astype(jnp.float32)[..., None]
    # circular dilate r=1 (3x3 cross) then 3x3 box blur
    cross = jnp.array([[0., 1., 0.], [1., 1., 1.], [0., 1., 0.]])
    k = cross[:, :, None, None]
    d = jax.lax.conv_general_dilated(
        sk, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    d = jnp.clip(d, 0.0, 1.0)
    blur = jnp.ones((3, 3, 1, 1)) / 9.0
    out = jax.lax.conv_general_dilated(
        d, blur, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out * 2.0 - 1.0


def apply_augmentation(kind: Optional[str], img: jnp.ndarray,
                       fg_mask: Optional[jnp.ndarray], rng: jax.Array,
                       max_stretch: float = 0.4,
                       max_rot_rad: float = 45 / 180 * 3.14159265
                       ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray],
                                  jnp.ndarray]:
    """Dispatch per the config string (``author_hw_dataset.py:299-308,427-433``).

    'affine' shares one (skew, stretch) draw across the whole author batch
    like the reference (drawn per __getitem__, i.e. per author group —
    here per batch, the same sharing granularity our batcher uses).

    Returns ``(image, fg_mask, width_scale)``; callers scale each sample's
    true ink width by ``width_scale`` when masking recognizer frames
    (a >1 stretch widens the ink region).
    """
    one = jnp.ones(())
    if not kind:
        return img, fg_mask, one
    B = img.shape[0]
    # "augmentation": true in reference configs means brightness+warp
    # (hw_dataset.py:143-152); strings select specific pipelines
    if isinstance(kind, str) and "normalization" in kind:
        # deskew + skeleton normalization (hw_dataset.py:138-140)
        return normalize_line(deskew(img)), fg_mask, one
    if isinstance(kind, str) and "affine" in kind:
        k1, k2 = jax.random.split(rng)
        stretch = jax.random.uniform(k1, (), minval=1 - max_stretch,
                                     maxval=1 + max_stretch)
        skew = jax.random.uniform(k2, (), minval=-max_rot_rad,
                                  maxval=max_rot_rad)
        stretch_b = jnp.full((B,), stretch)
        skew_b = jnp.full((B,), skew)
        out = affine_slant_stretch(img, skew_b, stretch_b)
        if fg_mask is not None:
            fg_mask = affine_slant_stretch(fg_mask, skew_b, stretch_b,
                                           fill=0.0)
        return out, fg_mask, stretch
    # default: brightness + warp (hw_dataset.py:143-152)
    k1, k2 = jax.random.split(rng)
    out = tensmeyer_brightness(img, k1)
    out = grid_warp(out, k2)
    return out, fg_mask, one


# ---------------------------------------------------------------------------
# uint8 device transfer (host<->device bandwidth; "minimise host-device
# transfers" is the TPU design rule — images ship as raw u8 pixels, 4x
# fewer bytes over PCIe/tunnel, and the linear 1 - px/128 normalization
# (hw_dataset.py:156-157) runs on device, bit-exact to the f32 host path
# because every source pixel is an integer)
# ---------------------------------------------------------------------------


def dequantize_image(img, width=None):
    """u8 pixels -> reference-normalized f32 on device; float passthrough.

    ``width``: per-sample ink widths — columns past them are restored to
    the exact PAD_VALUE (-1, "whiter than white"), preserving the
    load-bearing pad semantics (DESIGN.md; ``author_hw_dataset.py:22``)
    that u8 cannot represent (255 -> -0.9921875, true paper white).
    """
    if img.dtype != jnp.uint8:
        return img
    x = 1.0 - img.astype(jnp.float32) / 128.0
    if width is not None:
        col = jnp.arange(x.shape[2])
        x = jnp.where(col[None, None, :, None] < width[:, None, None, None],
                      x, -1.0)
    return x


def fg_to_float(fg):
    """bool foreground mask -> f32 on device; float passthrough."""
    if fg is not None and fg.dtype == jnp.bool_:
        return fg.astype(jnp.float32)
    return fg

"""Geometric transforms: crop/flip/roll/extent/... (transform.c family).

Re-implements /root/reference/MagickCore/transform.c (2,514 LoC, 11 OMP
loops): every op there is a row-copy loop; on TPU each is a static slice,
reverse, pad, or concatenate that XLA folds into neighboring work.
Trim is the only data-dependent one: the bounding box is computed on device
and the (dynamic) slice is taken host-side by the caller.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def crop(img: jnp.ndarray, x: int, y: int, width: int, height: int,
         background: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """CropImage (transform.c): extract a WxH region at +X+Y.

    Regions extending past the canvas are filled with the background
    (the reference clips the region; we honor the full requested geometry
    to keep shapes static — matching `-crop` followed by `+repage`).
    """
    h, w, c = img.shape[-3:]
    x0, y0 = int(x), int(y)
    sx0, sy0 = max(x0, 0), max(y0, 0)
    sx1, sy1 = min(x0 + width, w), min(y0 + height, h)
    if sx0 >= sx1 or sy0 >= sy1:
        fill = (jnp.zeros((c,), img.dtype) if background is None
                else jnp.asarray(list(background)[:c], img.dtype))
        return jnp.broadcast_to(fill, img.shape[:-3] + (height, width, c))
    region = img[..., sy0:sy1, sx0:sx1, :]
    py0, px0 = sy0 - y0, sx0 - x0
    py1 = height - (sy1 - y0)
    px1 = width - (sx1 - x0)
    if py0 or px0 or py1 or px1:
        pad = [(0, 0)] * (img.ndim - 3) + [(py0, py1), (px0, px1), (0, 0)]
        region = jnp.pad(region, pad, mode="edge" if background is None else "constant")
    return region


def chop(img: jnp.ndarray, x: int, y: int, width: int, height: int) -> jnp.ndarray:
    """ChopImage: remove a row/column band at the given offset."""
    h, w, _ = img.shape[-3:]
    x0, x1 = max(x, 0), min(x + width, w)
    y0, y1 = max(y, 0), min(y + height, h)
    out = jnp.concatenate([img[..., :y0, :, :], img[..., y1:, :, :]], axis=-3)
    out = jnp.concatenate([out[..., :, :x0, :], out[..., :, x1:, :]], axis=-2)
    return out


def excerpt(img: jnp.ndarray, x: int, y: int, width: int, height: int) -> jnp.ndarray:
    """ExcerptImage: raw subregion (no virtual-pixel handling)."""
    return img[..., y:y + height, x:x + width, :]


def extent(img: jnp.ndarray, x: int, y: int, width: int, height: int,
           background: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """ExtentImage: place the canvas inside a WxH field at -X-Y offset."""
    c = img.shape[-1]
    fill = (jnp.zeros((c,), img.dtype) if background is None
            else jnp.asarray(list(background)[:c], img.dtype))
    out = jnp.broadcast_to(fill, img.shape[:-3] + (height, width, c)).astype(img.dtype)
    h, w = img.shape[-3], img.shape[-2]
    # destination offsets (extent uses -x,-y semantics: crop from (x, y))
    sy0, sx0 = max(-y, 0), max(-x, 0)
    iy0, ix0 = max(y, 0), max(x, 0)
    cy = min(h - iy0, height - sy0)
    cx = min(w - ix0, width - sx0)
    if cy <= 0 or cx <= 0:
        return out
    return out.at[..., sy0:sy0 + cy, sx0:sx0 + cx, :].set(
        img[..., iy0:iy0 + cy, ix0:ix0 + cx, :])


def flip(img: jnp.ndarray) -> jnp.ndarray:
    """FlipImage: vertical reflection."""
    return img[..., ::-1, :, :]


def flop(img: jnp.ndarray) -> jnp.ndarray:
    """FlopImage: horizontal reflection."""
    return img[..., :, ::-1, :]


def roll(img: jnp.ndarray, x: int, y: int) -> jnp.ndarray:
    """RollImage: circular shift."""
    return jnp.roll(img, (y, x), axis=(-3, -2))


def shave(img: jnp.ndarray, x: int, y: int) -> jnp.ndarray:
    """ShaveImage: trim x columns / y rows from every side."""
    h, w = img.shape[-3], img.shape[-2]
    return img[..., y:h - y, x:w - x, :]


def splice(img: jnp.ndarray, x: int, y: int, width: int, height: int,
           background: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """SpliceImage: insert a band of background at the offset."""
    c = img.shape[-1]
    fill = (jnp.zeros((c,), img.dtype) if background is None
            else jnp.asarray(list(background)[:c], img.dtype))
    h, w = img.shape[-3], img.shape[-2]
    rowband = jnp.broadcast_to(fill, img.shape[:-3] + (height, w, c)).astype(img.dtype)
    out = jnp.concatenate([img[..., :y, :, :], rowband, img[..., y:, :, :]], axis=-3)
    colband = jnp.broadcast_to(fill, out.shape[:-3] + (out.shape[-3], width, c)).astype(img.dtype)
    out = jnp.concatenate([out[..., :, :x, :], colband, out[..., :, x:, :]], axis=-2)
    return out


def transpose(img: jnp.ndarray) -> jnp.ndarray:
    """TransposeImage: flip + rotate270 == mirror across top-left diagonal."""
    return jnp.swapaxes(img, -3, -2)


def transverse(img: jnp.ndarray) -> jnp.ndarray:
    """TransverseImage: mirror across bottom-right diagonal."""
    return jnp.swapaxes(img[..., ::-1, ::-1, :], -3, -2)


def rotate90(img: jnp.ndarray) -> jnp.ndarray:
    """IntegralRotateImage(1) — 90° clockwise (shear.c:700)."""
    return jnp.swapaxes(img, -3, -2)[..., :, ::-1, :]


def rotate180(img: jnp.ndarray) -> jnp.ndarray:
    return img[..., ::-1, ::-1, :]


def rotate270(img: jnp.ndarray) -> jnp.ndarray:
    return jnp.swapaxes(img, -3, -2)[..., ::-1, :, :]


def trim_bounds(img: jnp.ndarray, fuzz: float = 0.0) -> Tuple[int, int, int, int]:
    """GetImageBoundingBox (attribute.c:391-565) for TrimImage.

    Each edge compares against ITS corner pixel (left/top vs top-left,
    right vs top-right, bottom vs bottom-left) with
    IsFuzzyEquivalencePixelInfo (pixel.c:6028): fuzz floored at √½
    quanta, alpha distance gated first, color distances scaled by the
    alpha product (both-transparent pixels compare equal).  Returns
    (x, y, width, height) as Python ints — shape-changing, so host-side.
    """
    import math

    arr = np.asarray(img, np.float64)
    if arr.ndim == 4:
        arr = arr[0]
    H, W, C = arr.shape
    QR = 65535.0
    q = arr * QR
    has_alpha = C in (2, 4)
    fz = max(float(fuzz) * QR, math.sqrt(0.5)) ** 2

    def differs(target):
        # vectorized IsFuzzyEquivalencePixelInfo == MagickFalse
        if has_alpha:
            ap, at = q[..., -1], float(target[-1])
            d0 = (ap - at) ** 2
            neq = d0 > fz
            scale = (ap / QR) * (at / QR)
            trans_eq = scale <= 1e-12          # both ~transparent: equal
            dist = d0 * 3.0
            col = q[..., :-1]
            tc = target[:-1]
        else:
            neq = np.zeros((H, W), bool)
            trans_eq = np.zeros((H, W), bool)
            scale = 1.0
            dist = np.zeros((H, W))
            col = q
            tc = target
        acc = dist + ((col - tc) ** 2 * (np.asarray(scale)[..., None]
                                         if has_alpha else 1.0)).sum(-1)
        return neq | (~trans_eq & (acc > fz * 3.0))

    t0 = q[0, 0]
    t1 = q[0, W - 1]
    t2 = q[H - 1, 0]
    n0 = differs(t0)
    n1 = differs(t1)
    n2 = differs(t2)
    xs = np.arange(W)
    ys = np.arange(H)
    x0 = int(xs[n0.any(0)].min()) if n0.any() else W
    y0 = int(ys[n0.any(1)].min()) if n0.any() else H
    x1 = int(xs[n1.any(0)].max()) if n1.any() else 0
    y1 = int(ys[n2.any(1)].max()) if n2.any() else 0
    if x1 == 0 and not n1.any() and y1 == 0 and not n2.any():
        return 0, 0, W, H
    w = x1 - (x0 - 1)
    h = y1 - (y0 - 1)
    if w <= 0 or h <= 0:
        return 0, 0, W, H
    return x0, y0, w, h


def trim(img: jnp.ndarray, fuzz: float = 0.0) -> jnp.ndarray:
    """TrimImage: crop away constant borders (host-side bounds)."""
    x, y, w, h = trim_bounds(img, fuzz)
    return img[..., y:y + h, x:x + w, :]


def auto_orient(img: jnp.ndarray, orientation: int) -> jnp.ndarray:
    """AutoOrientImage (transform.c): apply EXIF orientation 1-8."""
    ops = {
        1: lambda x: x,
        2: flop,
        3: rotate180,
        4: flip,
        5: transpose,
        6: rotate90,
        7: transverse,
        8: rotate270,
    }
    return ops.get(int(orientation), lambda x: x)(img)

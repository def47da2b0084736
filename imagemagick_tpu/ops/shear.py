"""Shear / deskew (shear.c).

Re-implements /root/reference/MagickCore/shear.c (1,819 LoC, 8 OMP loops):
XShearImage/YShearImage, ShearImage, DeskewImage (:~1000), and the 3-shear
RotateImage (paper ref at shear.c:36; 90° multiples take the transpose path
in transform.py's rotate90/180/270).

On TPU a shear is an inverse-mapped warp with a fixed shift per row/column —
one gather instead of a row-copy loop.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .distort import sample_bilinear, _grid


def x_shear(img: jnp.ndarray, degrees: float,
            background: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """XShearImage: shift rows horizontally by tan(angle)*(y - cy)."""
    h, w = img.shape[-3], img.shape[-2]
    shear = math.tan(math.radians(degrees))
    extra = int(abs(shear) * h + 0.5)
    nw = w + extra
    yy, xx = _grid(h, nw, img.dtype)
    cy = (h - 1) / 2.0
    u = xx - extra / 2.0 - shear * (yy - cy)
    return sample_bilinear(img, u, yy, background)


def y_shear(img: jnp.ndarray, degrees: float,
            background: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """YShearImage: shift columns vertically."""
    h, w = img.shape[-3], img.shape[-2]
    shear = math.tan(math.radians(degrees))
    extra = int(abs(shear) * w + 0.5)
    nh = h + extra
    yy, xx = _grid(nh, w, img.dtype)
    cx = (w - 1) / 2.0
    v = yy - extra / 2.0 - shear * (xx - cx)
    return sample_bilinear(img, xx, v, background)


def _frac_shift(img: jnp.ndarray, d: jnp.ndarray, axis: int,
                bg: jnp.ndarray, active: jnp.ndarray) -> jnp.ndarray:
    """Paeth fractional shift: resample lines of `img` along `axis` at
    (index - d), linear blend (XShearImage's area-blend transfer,
    shear.c:1228), background outside; `active` masks which lines move.

    d is per-line (shape matches the OTHER spatial axis)."""
    h, w = img.shape[-3], img.shape[-2]
    if axis == -2:  # horizontal shift, d per row: d shape (h, 1)
        pos = jnp.arange(w, dtype=img.dtype)[None, :] - d  # (h, w)
    else:           # vertical shift, d per column: d shape (1, w)
        pos = jnp.arange(h, dtype=img.dtype)[:, None] - d  # (h, w)
    lo = jnp.floor(pos)
    frac = (pos - lo)[..., None]
    loi = lo.astype(jnp.int32)
    size = w if axis == -2 else h
    flat = img.reshape(img.shape[:-3] + (h * w, img.shape[-1]))

    def at(i):
        ic = jnp.clip(i, 0, size - 1)
        yy, xx = jnp.mgrid[0:h, 0:w]
        idx = (yy * w + jnp.clip(ic, 0, w - 1)) if axis == -2 else \
              (jnp.clip(ic, 0, h - 1) * w + xx)
        px = jnp.take(flat, idx.reshape(-1), axis=-2).reshape(img.shape)
        ok = ((i >= 0) & (i < size))[..., None]
        return jnp.where(ok, px, bg)

    out = at(loi) * (1.0 - frac) + at(loi + 1) * frac
    return jnp.where(active[..., None], out, img)


def shear(img: jnp.ndarray, x_degrees: float, y_degrees: float,
          background: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """ShearImage (shear.c:1569): bordered canvas + X then Y Paeth
    fractional shear passes + CropToFitImage.

    Bounds (shear.c:1614): bounds.width = w + round(|shx|·h), border
    bx = ceil(w + (|shx|·h − w)/2 − 0.5), by = ceil(h + (|shy|·bw − h)/2
    − 0.5); X pass shifts rows y∈[0,h) by shx·(y − h/2), Y pass shifts
    columns x∈[0,bw) by shy·(x − bw/2); final crop from the sheared
    source corners (CropToFitImage, shear.c:136-169)."""
    shx = -math.tan(math.radians(math.fmod(x_degrees, 360.0)))
    shy = math.tan(math.radians(math.fmod(y_degrees, 360.0)))
    if shx == 0.0 and shy == 0.0:
        return img
    h, w, c = img.shape[-3:]
    bw = w + int(math.floor(abs(shx) * h + 0.5))
    bx = int(math.ceil(w + (abs(shx) * h - w) / 2.0 - 0.5))
    by = int(math.ceil(h + (abs(shy) * bw - h) / 2.0 - 0.5))
    bg = jnp.asarray(tuple(background or (1.0,) * c)[:c], img.dtype)
    canvas = jnp.broadcast_to(
        bg, img.shape[:-3] + (h + 2 * by, w + 2 * bx, c))
    canvas = canvas.at[..., by:by + h, bx:bx + w, :].set(img)
    H, W = h + 2 * by, w + 2 * bx
    # X pass: active rows [by, by+h), relative y
    yy = jnp.arange(H, dtype=img.dtype)
    dx_row = (shx * (yy - by - h / 2.0))[:, None]
    active_rows = jnp.broadcast_to(
        ((yy >= by) & (yy < by + h))[:, None], (H, W))
    canvas = _frac_shift(canvas, dx_row, -2, bg, active_rows)
    # Y pass: active columns [cx, cx+bw), relative x
    cx = (W - bw) // 2
    xx = jnp.arange(W, dtype=img.dtype)
    dy_col = (shy * (xx - cx - bw / 2.0))[None, :]
    active_cols = jnp.broadcast_to(
        ((xx >= cx) & (xx < cx + bw))[None, :], (H, W))
    canvas = _frac_shift(canvas, dy_col, -3, bg, active_cols)
    # CropToFitImage
    xs, ys = [], []
    for ex, ey in ((-w / 2.0, -h / 2.0), (w / 2.0, -h / 2.0),
                   (-w / 2.0, h / 2.0), (w / 2.0, h / 2.0)):
        ex2 = ex + shx * ey
        ey2 = ey + shy * ex2
        xs.append(ex2 + W / 2.0)
        ys.append(ey2 + H / 2.0)
    gx = int(math.ceil(min(xs) - 0.5))
    gy = int(math.ceil(min(ys) - 0.5))
    gw = int(math.floor(max(xs) - min(xs) + 0.5))
    gh = int(math.floor(max(ys) - min(ys) + 0.5))
    return canvas[..., gy:gy + gh, gx:gx + gw, :]


def _projection_variance(binary: np.ndarray, angle: float) -> float:
    """Radon-style row-projection sharpness for one skew angle."""
    h, w = binary.shape
    shear_px = math.tan(math.radians(angle))
    rows = np.arange(h)
    proj = np.zeros(h + int(abs(shear_px) * w) + 2)
    # accumulate per-column shifted row sums
    col_sums = binary  # (h, w)
    for x in range(0, w, max(w // 64, 1)):  # subsample columns for speed
        shift = shear_px * x
        base = rows + shift
        idx = np.clip(base.astype(np.int64), 0, len(proj) - 1)
        np.add.at(proj, idx, col_sums[:, x])
    d = np.diff(proj)
    return float((d * d).sum())


def deskew_angle(img: jnp.ndarray, threshold: float = 0.4,
                 max_angle: float = 10.0) -> float:
    """DeskewImage angle detection: maximize projection-profile sharpness."""
    from .enhance import grayscale

    arr = np.asarray(grayscale(img)[..., 0] if img.shape[-1] >= 3 else img[..., 0])
    binary = (arr < threshold).astype(np.float64)  # text = dark
    best_a, best_v = 0.0, -1.0
    for a in np.linspace(-max_angle, max_angle, 41):
        v = _projection_variance(binary, a)
        if v > best_v:
            best_v, best_a = v, float(a)
    # refine around the coarse winner
    for a in np.linspace(best_a - 0.5, best_a + 0.5, 11):
        v = _projection_variance(binary, a)
        if v > best_v:
            best_v, best_a = v, float(a)
    return best_a


def _radon_projection(mat: np.ndarray, sign: int,
                      projection: np.ndarray) -> None:
    """RadonProjection (shear.c): Götz-Druckmüller butterfly discrete
    Radon over the popcount matrix; accumulates squared row-derivative
    energy per column into projection[width + sign*x - 1]."""
    rows, width = mat.shape
    p = mat.astype(np.int64).copy()
    q = np.zeros_like(p)
    step = 1
    while step < width:
        for x in range(0, width, 2 * step):
            for i in range(step):
                el = p[:, x + i]
                nb = p[:, x + i + step]
                n1 = np.roll(nb, -i)           # nb[y+i]
                n2 = np.roll(nb, -(i + 1))     # nb[y+i+1]
                even = el.copy()
                odd = el.copy()
                r1 = rows - i - 1              # y < r1: both neighbors
                even[:max(r1, 0)] += n1[:max(r1, 0)]
                odd[:max(r1, 0)] += n2[:max(r1, 0)]
                r2 = rows - i                  # r1 <= y < r2: even only
                if r1 >= 0 and r2 > r1:
                    even[r1:r2] += n1[r1:r2]
                q[:, x + 2 * i] = even
                q[:, x + 2 * i + 1] = odd
        p, q = q, p
        step *= 2
    d = np.diff(p.astype(np.int64), axis=0)
    sums = (d * d).sum(axis=0)
    for x in range(width):
        projection[width + sign * x - 1] = sums[x]


def deskew_angle_reference(img: jnp.ndarray, threshold: float = 0.4) -> float:
    """DeskewImage's Radon skew detection (shear.c:557): bilevel bits
    (any of r,g,b below threshold), byte-packed popcounts, two Radon
    passes (mirrored byte order, signs -1/+1), first-strict-max bin;
    degrees = -atan(skew/width/8)."""
    arr = np.asarray(img[..., :3] if img.shape[-1] >= 3 else
                     jnp.repeat(img[..., :1], 3, -1), np.float64)
    h, w = arr.shape[-3], arr.shape[-2]
    bitsmap = (arr < threshold).any(axis=-1)
    nbytes = (w + 7) // 8
    width = 1
    while width < nbytes:
        width <<= 1
    # pack bits into bytes (last byte left-aligned) and popcount
    padded = np.zeros((h, nbytes * 8), bool)
    padded[:, :w] = bitsmap
    byte_bits = padded.reshape(h, nbytes, 8)
    counts = byte_bits.sum(axis=-1).astype(np.int64)   # (h, nbytes)
    projection = np.zeros(2 * width - 1, np.int64)
    m1 = np.zeros((h, width), np.int64)
    m1[:, :nbytes] = counts[:, ::-1]                   # reversed: --i order
    _radon_projection(m1, -1, projection)
    m2 = np.zeros((h, width), np.int64)
    m2[:, :nbytes] = counts                            # forward: i++ order
    _radon_projection(m2, 1, projection)
    best = 0
    skew = 0
    for i in range(2 * width - 1):
        if projection[i] > best:
            skew = i - width + 1
            best = int(projection[i])
    return math.degrees(-math.atan(skew / width / 8.0))


def deskew(img: jnp.ndarray, threshold: float = 0.4,
           background: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """DeskewImage (shear.c:557): Radon skew detection + bestfit affine
    rotation correction (AffineTransformImage with background VP)."""
    from .distort import affine_projection_bestfit

    angle = deskew_angle_reference(img, threshold)
    a = math.radians(math.fmod(angle, 360.0))
    matrix = (math.cos(a), math.sin(a), -math.sin(a), math.cos(a), 0.0, 0.0)
    return affine_projection_bestfit(
        img, matrix, background=background or [1.0] * img.shape[-1])

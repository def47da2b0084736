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


def shear(img: jnp.ndarray, x_degrees: float, y_degrees: float,
          background: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """ShearImage: combined X then Y shear."""
    out = img
    if x_degrees:
        out = x_shear(out, x_degrees, background)
    if y_degrees:
        out = y_shear(out, y_degrees, background)
    return out


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


def deskew(img: jnp.ndarray, threshold: float = 0.4,
           background: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """DeskewImage: detect the text skew angle and rotate to correct it."""
    from .distort import rotate

    angle = deskew_angle(img, threshold)
    if abs(angle) < 0.05:
        return img
    return rotate(img, -angle, background=background or [1.0] * img.shape[-1],
                  expand=False)

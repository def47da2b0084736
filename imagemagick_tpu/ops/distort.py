"""Distortions: inverse-mapped warps (distort.c / resample.c).

Re-implements DistortImage (/root/reference/MagickCore/distort.c:1754, 20
methods in distort.h:34-57) TPU-first: every distortion is an inverse map
from output (i,j) to source (u,v), evaluated as a dense vectorized grid, and
a gather with bilinear or EWA sampling.  The reference walks output pixels
with OpenMP and calls scalar resamplers (resample.c) — here the whole warp is
one fused gather + weighted-sum program.

Sampling: bilinear (4-tap) by default; `ewa` gives the reference's
elliptical-weighted-average resampling (resample.c:71-77) with the footprint
clamped to a static window, which is how the reference bounds it too.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _grid(h, w, dtype=jnp.float32):
    yy = jnp.arange(h, dtype=dtype)[:, None]
    xx = jnp.arange(w, dtype=dtype)[None, :]
    return jnp.broadcast_to(yy, (h, w)), jnp.broadcast_to(xx, (h, w))


def sample_bilinear(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                    background: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """Bilinear lookup of (..., H, W, C) at fractional coords (u=x, v=y).

    Out-of-canvas samples take the background color (the reference's default
    -virtual-pixel for distorts).
    """
    h, w, c = img.shape[-3:]
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0)[..., None]
    fy = (v - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def at(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        flat = yc * w + xc
        img2 = img.reshape(img.shape[:-3] + (h * w, c))
        return jnp.take(img2, flat, axis=-2)

    p00 = at(y0i, x0i)
    p01 = at(y0i, x0i + 1)
    p10 = at(y0i + 1, x0i)
    p11 = at(y0i + 1, x0i + 1)
    top = p00 * (1.0 - fx) + p01 * fx
    bot = p10 * (1.0 - fx) + p11 * fx
    out = top * (1.0 - fy) + bot * fy
    inside = ((u >= -0.5) & (u <= w - 0.5) & (v >= -0.5) & (v <= h - 0.5))[..., None]
    if background is None:
        bg = jnp.zeros((c,), img.dtype)
    else:
        bg = jnp.asarray(background, img.dtype)[:c]
    return jnp.where(inside, out, bg)


def warp(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
         background: Optional[Sequence[float]] = None,
         sampler: str = "bilinear") -> jnp.ndarray:
    if sampler == "ewa":
        return sample_ewa(img, u, v, background)
    return sample_bilinear(img, u, v, background)


def sample_ewa(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
               background: Optional[Sequence[float]] = None,
               window: int = 4) -> jnp.ndarray:
    """Elliptical-weighted-average resampling with a clamped footprint.

    The reference clamps EWA ellipses to bound work (resample.c:77, per
    N. Robidoux); we use a static (2*window)² Gaussian-weighted footprint
    around the mapped point, the vectorized equivalent.
    """
    h, w, c = img.shape[-3:]
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    acc = None
    den = None
    sigma2 = 0.5  # unit-scale EWA Gaussian
    img2 = img.reshape(img.shape[:-3] + (h * w, c))
    for dy in range(-window // 2 + 1, window // 2 + 1):
        for dx in range(-window // 2 + 1, window // 2 + 1):
            yi = jnp.clip(y0 + dy, 0, h - 1)
            xi = jnp.clip(x0 + dx, 0, w - 1)
            d2 = ((x0 + dx).astype(u.dtype) - u) ** 2 + ((y0 + dy).astype(v.dtype) - v) ** 2
            wgt = jnp.exp(-d2 / (2.0 * sigma2))[..., None]
            px = jnp.take(img2, yi * w + xi, axis=-2)
            acc = px * wgt if acc is None else acc + px * wgt
            den = wgt if den is None else den + wgt
    out = acc / jnp.maximum(den, 1e-12)
    inside = ((u >= -0.5) & (u <= w - 0.5) & (v >= -0.5) & (v <= h - 0.5))[..., None]
    bg = jnp.zeros((c,), img.dtype) if background is None else jnp.asarray(background, img.dtype)[:c]
    return jnp.where(inside, out, bg)


def rotate_bilinear(img: jnp.ndarray, theta: float,
                    background: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """Rotate about the center by theta radians, same canvas (helper)."""
    h, w = img.shape[-3], img.shape[-2]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = _grid(h, w, img.dtype)
    ct, st = math.cos(theta), math.sin(theta)
    u = ct * (xx - cx) + st * (yy - cy) + cx
    v = -st * (xx - cx) + ct * (yy - cy) + cy
    return sample_bilinear(img, u, v, background)


def rotate(img: jnp.ndarray, degrees: float,
           background: Optional[Sequence[float]] = None,
           expand: bool = True, sampler: str = "bilinear") -> jnp.ndarray:
    """RotateImage (shear.c:~1400): arbitrary-angle rotation.

    The reference uses the 3-shear method (paper cited at shear.c:36) for
    quality; an inverse-mapped rotation with high-quality sampling is the
    TPU-native equivalent (one gather instead of three passes).  90-degree
    multiples take the exact transpose path (IntegralRotateImage,
    shear.c:700).
    """
    from .transform import rotate90, rotate180, rotate270

    deg = degrees % 360.0
    if deg == 0.0:
        return img
    if deg == 90.0:
        return rotate90(img)
    if deg == 180.0:
        return rotate180(img)
    if deg == 270.0:
        return rotate270(img)
    theta = math.radians(deg)
    h, w = img.shape[-3], img.shape[-2]
    if expand:
        nh = int(abs(w * math.sin(theta)) + abs(h * math.cos(theta)) + 0.5)
        nw = int(abs(w * math.cos(theta)) + abs(h * math.sin(theta)) + 0.5)
    else:
        nh, nw = h, w
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ncy, ncx = (nh - 1) / 2.0, (nw - 1) / 2.0
    yy, xx = _grid(nh, nw, img.dtype)
    ct, st = math.cos(theta), math.sin(theta)
    u = ct * (xx - ncx) + st * (yy - ncy) + cx
    v = -st * (xx - ncx) + ct * (yy - ncy) + cy
    return warp(img, u, v, background, sampler)


def affine_transform(img: jnp.ndarray, matrix: Sequence[float],
                     out_shape: Optional[Tuple[int, int]] = None,
                     background: Optional[Sequence[float]] = None,
                     sampler: str = "bilinear") -> jnp.ndarray:
    """AffineTransformImage / DistortImage AffineDistortion.

    matrix = (sx, rx, ry, sy, tx, ty) as in the reference's AffineMatrix:
    x' = sx*x + ry*y + tx ; y' = rx*x + sy*y + ty.  We invert it and sample.
    """
    sx, rx, ry, sy, tx, ty = [float(m) for m in matrix]
    det = sx * sy - rx * ry
    if abs(det) < 1e-12:
        raise ValueError("singular affine matrix")
    isx, iry = sy / det, -ry / det
    irx, isy = -rx / det, sx / det
    itx = -(isx * tx + iry * ty)
    ity = -(irx * tx + isy * ty)
    h, w = img.shape[-3], img.shape[-2]
    oh, ow = out_shape if out_shape else (h, w)
    yy, xx = _grid(oh, ow, img.dtype)
    u = isx * xx + iry * yy + itx
    v = irx * xx + isy * yy + ity
    return warp(img, u, v, background, sampler)


def _solve_perspective(src_pts, dst_pts):
    """8-dof homography from 4 point pairs (distort.c PerspectiveDistortion)."""
    A = []
    bvec = []
    for (x, y), (X, Y) in zip(src_pts, dst_pts):
        A.append([x, y, 1, 0, 0, 0, -X * x, -X * y])
        bvec.append(X)
        A.append([0, 0, 0, x, y, 1, -Y * x, -Y * y])
        bvec.append(Y)
    coeff = np.linalg.solve(np.asarray(A, np.float64), np.asarray(bvec, np.float64))
    return coeff  # a b c d e f g h


def distort(img: jnp.ndarray, method: str, args: Sequence[float],
            background: Optional[Sequence[float]] = None,
            sampler: str = "ewa") -> jnp.ndarray:
    """DistortImage (distort.c:1754) — core methods.

    Supported: affine (3+ point pairs), perspective (4 pairs), srt
    (scale-rotate-translate), arc, polar, depolar, barrel, barrelinverse,
    swirl, implode.  Control-point methods solve their coefficient systems
    host-side (numpy least squares — the reference's Gauss-Jordan in
    matrix.c), then evaluate the inverse map on device.
    """
    method = method.lower()
    h, w = img.shape[-3], img.shape[-2]
    yy, xx = _grid(h, w, img.dtype)
    cy, cx = h / 2.0, w / 2.0

    if method == "srt":
        # args variants (distort.c ScaleRotateTranslate): [angle] |
        # [scale, angle] | [cx,cy, scale, angle] | [cx,cy,scale,angle,nx,ny]
        a = list(args)
        if len(a) == 1:
            pcx, pcy, scale_, angle, nx, ny = cx, cy, 1.0, a[0], cx, cy
        elif len(a) == 2:
            pcx, pcy, scale_, angle, nx, ny = cx, cy, a[0], a[1], cx, cy
        elif len(a) == 4:
            pcx, pcy, scale_, angle, nx, ny = a[0], a[1], a[2], a[3], a[0], a[1]
        else:
            pcx, pcy, scale_, angle, nx, ny = a[0], a[1], a[2], a[3], a[4], a[5]
        t = math.radians(angle)
        ct, st = math.cos(t) / scale_, math.sin(t) / scale_
        u = ct * (xx - nx) + st * (yy - ny) + pcx
        v = -st * (xx - nx) + ct * (yy - ny) + pcy
        return warp(img, u, v, background, sampler)

    if method == "affine":
        pts = np.asarray(args, np.float64).reshape(-1, 4)
        src = pts[:, :2]
        dst = pts[:, 2:]
        # least-squares fit: dst = M @ src (reference fits forward, then inverts)
        A = np.concatenate([src, np.ones((len(src), 1))], axis=1)
        mx, *_ = np.linalg.lstsq(A, dst[:, 0], rcond=None)
        my, *_ = np.linalg.lstsq(A, dst[:, 1], rcond=None)
        fwd = np.array([[mx[0], mx[1], mx[2]], [my[0], my[1], my[2]], [0, 0, 1]])
        inv = np.linalg.inv(fwd)
        u = inv[0, 0] * xx + inv[0, 1] * yy + inv[0, 2]
        v = inv[1, 0] * xx + inv[1, 1] * yy + inv[1, 2]
        return warp(img, u, v, background, sampler)

    if method == "perspective":
        pts = np.asarray(args, np.float64).reshape(-1, 4)
        coeff = _solve_perspective(pts[:, 2:], pts[:, :2])  # dst->src
        a, b, c, d, e, f, g, hh = coeff
        den = g * xx + hh * yy + 1.0
        u = (a * xx + b * yy + c) / den
        v = (d * xx + e * yy + f) / den
        return warp(img, u, v, background, sampler)

    if method in ("barrel", "barrelinverse"):
        a, b, c, *rest = list(args) + [0.0] * 4
        d = rest[0] if rest else 1.0 - a - b - c
        r_scale = 2.0 / min(h, w)
        dx = (xx - cx) * r_scale
        dy = (yy - cy) * r_scale
        r = jnp.sqrt(dx * dx + dy * dy)
        if method == "barrel":
            f = a * r ** 3 + b * r ** 2 + c * r + d
        else:
            f = 1.0 / (a * r ** 3 + b * r ** 2 + c * r + d)
        u = cx + dx * f / r_scale
        v = cy + dy * f / r_scale
        return warp(img, u, v, background, sampler)

    if method == "arc":
        arc_angle = math.radians(args[0] if args else 360.0)
        rotate_ = math.radians(args[1]) if len(args) > 1 else 0.0
        top_r = args[2] if len(args) > 2 else min(cx, cy)
        bot_r = args[3] if len(args) > 3 else 0.0
        ang = jnp.arctan2(yy - cy, xx - cx) + math.pi / 2.0 - rotate_
        ang = jnp.mod(ang + math.pi, 2.0 * math.pi) - math.pi
        rad = jnp.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
        u = (ang / arc_angle + 0.5) * w
        v = (top_r - rad) / jnp.maximum(top_r - bot_r, 1e-6) * h
        return warp(img, u, v, background, sampler)

    if method == "polar":
        rad = jnp.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
        ang = jnp.arctan2(yy - cy, xx - cx)
        u = (ang / (2.0 * math.pi) + 0.5) * w
        v = rad / (min(cx, cy)) * h
        return warp(img, u, v, background, sampler)

    if method == "depolar":
        ang = (xx / w - 0.5) * 2.0 * math.pi
        rad = yy / h * min(cx, cy)
        u = cx + rad * jnp.cos(ang)
        v = cy + rad * jnp.sin(ang)
        return warp(img, u, v, background, sampler)

    raise ValueError(f"unsupported distort method {method!r}")


def swirl(img: jnp.ndarray, degrees: float,
          background: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """SwirlImage (visual-effects.c): rotate by angle scaled with radius."""
    h, w = img.shape[-3], img.shape[-2]
    cy, cx = h / 2.0, w / 2.0
    yy, xx = _grid(h, w, img.dtype)
    dx = (xx - cx) / cx
    dy = (yy - cy) / cy
    r = jnp.sqrt(dx * dx + dy * dy)
    factor = jnp.where(r < 1.0, (1.0 - r) ** 2, 0.0)
    t = math.radians(degrees) * factor
    ct, st = jnp.cos(t), jnp.sin(t)
    u = (ct * dx - st * dy) * cx + cx
    v = (st * dx + ct * dy) * cy + cy
    return sample_bilinear(img, u, v, background)


def implode(img: jnp.ndarray, amount: float,
            background: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """ImplodeImage (visual-effects.c): radial pull toward the center."""
    h, w = img.shape[-3], img.shape[-2]
    cy, cx = h / 2.0, w / 2.0
    yy, xx = _grid(h, w, img.dtype)
    dx = (xx - cx) / cx
    dy = (yy - cy) / cy
    r = jnp.sqrt(dx * dx + dy * dy)
    factor = jnp.where(r < 1.0, jnp.power(jnp.maximum(r, 1e-12), amount * (1.0 - r)), 1.0)
    u = factor * dx * cx + cx
    v = factor * dy * cy + cy
    return sample_bilinear(img, u, v, background)


def wave(img: jnp.ndarray, amplitude: float = 25.0, wavelength: float = 150.0,
         background: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """WaveImage (visual-effects.c): sinusoidal vertical displacement."""
    h, w = img.shape[-3], img.shape[-2]
    yy, xx = _grid(h, w, img.dtype)
    v = yy - amplitude * jnp.sin(2.0 * math.pi * xx / wavelength)
    return sample_bilinear(img, xx, v, background)

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

    if background is None:
        # virtual-pixel EDGE (clamp) — the reference's default for
        # distorts (cache.c EdgeX policy); rotate/wave pass an explicit
        # background instead
        tap = at
    else:
        bg = jnp.asarray(background, img.dtype)[:c]

        def tap(yi, xi):
            # per-tap virtual pixel: off-canvas taps contribute the
            # background color INSIDE the bilinear blend, like the
            # reference's InterpolatePixelChannels over a background
            # virtual-pixel view (no hard inside/outside edge)
            valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))[..., None]
            return jnp.where(valid, at(yi, xi), bg)

    p00 = tap(y0i, x0i)
    p01 = tap(y0i, x0i + 1)
    p10 = tap(y0i + 1, x0i)
    p11 = tap(y0i + 1, x0i + 1)
    top = p00 * (1.0 - fx) + p01 * fx
    bot = p10 * (1.0 - fx) + p11 * fx
    return top * (1.0 - fy) + bot * fy


def warp(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
         background: Optional[Sequence[float]] = None,
         sampler: str = "bilinear",
         jac: Optional[Tuple[float, float, float, float]] = None) -> jnp.ndarray:
    if sampler == "ewa":
        if jac is not None:
            return sample_ewa_reference(img, u, v, jac, background)
        return sample_ewa(img, u, v, background)
    return sample_bilinear(img, u, v, background)


_ROBIDOUX_LUT = None


def _robidoux_lut() -> jnp.ndarray:
    """resample.c:1289 filter LUT: 1024 weights of the default cylindrical
    filter (Robidoux Keys cubic, resample.c:1262) sampled at
    r = support*sqrt(Q/1024), support 2."""
    global _ROBIDOUX_LUT
    if _ROBIDOUX_LUT is None:
        b = 12.0 / (19.0 + 9.0 * math.sqrt(2.0))
        c = 113.0 / (58.0 + 216.0 * math.sqrt(2.0))
        # CubicBC coefficients (resize.c CubicBC)
        p0 = (6.0 - 2.0 * b) / 6.0
        p2 = (-18.0 + 12.0 * b + 6.0 * c) / 6.0
        p3 = (12.0 - 9.0 * b - 6.0 * c) / 6.0
        q0 = (8.0 * b + 24.0 * c) / 6.0
        q1 = (-12.0 * b - 48.0 * c) / 6.0
        q2 = (6.0 * b + 30.0 * c) / 6.0
        q3 = (-b - 6.0 * c) / 6.0
        r = 2.0 * np.sqrt(np.arange(1024, dtype=np.float64) / 1024.0)
        w = np.where(r < 1.0, p0 + r * r * (p2 + r * p3),
                     np.where(r < 2.0, q0 + r * (q1 + r * (q2 + r * q3)), 0.0))
        _ROBIDOUX_LUT = jnp.asarray(w, jnp.float32)
    return _ROBIDOUX_LUT


def sample_ewa_reference(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                         jac: Tuple[float, float, float, float],
                         background: Optional[Sequence[float]] = None
                         ) -> jnp.ndarray:
    """Reference-exact EWA resampling for a CONSTANT Jacobian.

    Replicates resample.c: ClampUpAxes (clamped-EWA per Robidoux,
    resample.c:1100) on jac = (du/dx, du/dy, dv/dx, dv/dy), ellipse
    Q = A·U²+B·UV+C·V² < F with F scaled by support², weights from the
    1024-entry Robidoux LUT via (int)Q indexing (resample.c:600), taps on
    the scanline parallelogram v∈[ceil(v0-Vlimit), floor(v0+Vlimit)],
    u from ceil(u0+(v-v0)·slope−Uwidth), uw = (int)(2·Uwidth)+1.
    Off-canvas taps read background virtual pixels (or edge-clamp when
    background is None); an empty hit set falls back to bilinear."""
    h, w, c = img.shape[-3:]
    J = np.asarray(jac, np.float64).reshape(2, 2)
    # ClampUpAxes: singular values of J clamped up to 1 (unit circle min)
    U_, s, Vt = np.linalg.svd(J)
    major_mag = max(float(s[0]), 1.0)
    minor_mag = max(float(s[1]), 1.0)
    # major/minor axis direction vectors (in source space) × magnitudes
    major = U_[:, 0] * major_mag
    minor = U_[:, 1] * minor_mag
    A = major[1] ** 2 + minor[1] ** 2
    B = -2.0 * (major[0] * major[1] + minor[0] * minor[1])
    C = major[0] ** 2 + minor[0] ** 2
    F = (major_mag * minor_mag) ** 2  # resample.c:1098 "F *= F"
    support = 2.0
    F *= support * support
    det = A * C - 0.25 * B * B
    Ulimit = math.sqrt(C * F / det)
    Vlimit = math.sqrt(A * F / det)
    Uwidth = math.sqrt(F / A)
    slope = -B / (2.0 * A)
    scale = 1024.0 / F
    As, Bs, Cs = A * scale, B * scale, C * scale

    nv = int(2.0 * Vlimit) + 1 + 1   # max scan lines (v2-v1+1 <= 2V+1)
    uw = int(2.0 * Uwidth) + 1
    lut = _robidoux_lut()
    img2 = img.reshape(img.shape[:-3] + (h * w, c))
    if background is not None:
        bg = jnp.asarray(tuple(background)[:c], img.dtype)

    v1 = jnp.ceil(v0 := v - Vlimit)
    v2 = jnp.floor(v + Vlimit)
    acc = jnp.zeros(u.shape + (c,), img.dtype)
    den = jnp.zeros(u.shape + (1,), img.dtype)
    for k in range(nv):
        vv = v1 + k
        vmask = vv <= v2
        u1 = u + (vv - v) * slope - Uwidth
        ustart = jnp.ceil(u1)
        V = vv - v
        for j in range(uw):
            uu = ustart + j
            U = uu - u
            Q = (As * U + Bs * V) * U + Cs * V * V
            qi = Q.astype(jnp.int32)
            wgt = jnp.where(vmask & (qi >= 0) & (qi < 1024),
                            jnp.take(lut, jnp.clip(qi, 0, 1023)), 0.0)
            xi = uu.astype(jnp.int32)
            yi = vv.astype(jnp.int32)
            xc = jnp.clip(xi, 0, w - 1)
            yc = jnp.clip(yi, 0, h - 1)
            px = jnp.take(img2, yc * w + xc, axis=-2)
            if background is not None:
                inside = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))[..., None]
                px = jnp.where(inside, px, bg)
            acc = acc + wgt[..., None] * px
            den = den + wgt[..., None]
    out = acc / jnp.where(den == 0.0, 1.0, den)
    fallback = sample_bilinear(img, u, v, background)
    return jnp.where(den == 0.0, fallback, out)


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
    if background is None:
        return out          # virtual-pixel edge (clamped taps)
    inside = ((u >= -0.5) & (u <= w - 0.5) & (v >= -0.5) & (v <= h - 0.5))[..., None]
    bg = jnp.asarray(background, img.dtype)[:c]
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
           expand: bool = True, sampler: str = "ewa") -> jnp.ndarray:
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
    # RotateImage (distort.c:2954) = DistortImage(SRT, bestfit) about
    # center (columns/2, rows/2) with Background virtual pixels.
    # Forward affine dest->src (distort.c:818-824):
    cx, cy = w / 2.0, h / 2.0
    ct, st = math.cos(theta), math.sin(theta)
    c0, c1, c3, c4 = ct, st, -st, ct
    c2 = cx - cx * c0 - cy * c1
    c5 = cy - cx * c3 - cy * c4
    if expand:
        # bestfit viewport: source corners through the INVERSE affine
        # (distort.c:1856-1878), floor/ceil with the 0.5 margins (:2021)
        det = c0 * c4 - c1 * c3
        i0, i1, i2 = c4 / det, -c1 / det, (c1 * c5 - c4 * c2) / det
        i3, i4, i5 = -c3 / det, c0 / det, (c3 * c2 - c0 * c5) / det
        xs, ys = [], []
        for sx_, sy_ in ((0, 0), (w, 0), (0, h), (w, h)):
            xs.append(i0 * sx_ + i1 * sy_ + i2)
            ys.append(i3 * sx_ + i4 * sy_ + i5)
        gx = math.floor(min(xs) - 0.5)
        gy = math.floor(min(ys) - 0.5)
        nw = int(math.ceil(max(xs) - gx + 0.5))
        nh = int(math.ceil(max(ys) - gy + 0.5))
    else:
        gx = gy = 0
        nh, nw = h, w
    yy, xx = _grid(nh, nw, img.dtype)
    dx = xx + (gx + 0.5)
    dy = yy + (gy + 0.5)
    u = c0 * dx + c1 * dy + c2 - 0.5
    v = c3 * dx + c4 * dy + c5 - 0.5
    if sampler == "bilinear":
        return warp(img, u, v, background, "bilinear")
    return sample_ewa_reference(img, u, v, (c0, c1, c3, c4), background)


def affine_projection_bestfit(img: jnp.ndarray, matrix: Sequence[float],
                              background: Optional[Sequence[float]] = None
                              ) -> jnp.ndarray:
    """AffineTransformImage (distort.c): DistortImage(AffineProjection,
    bestfit) — forward matrix (sx, rx, ry, sy, tx, ty) in the AffineMatrix
    convention x' = sx·x + ry·y + tx ; y' = rx·x + sy·y + ty, background
    virtual pixels, reference EWA resampling."""
    sx, rx, ry, sy, tx, ty = [float(m) for m in matrix]
    h, w = img.shape[-3], img.shape[-2]
    fwd = np.array([[sx, ry, tx], [rx, sy, ty], [0, 0, 1]], np.float64)
    inv = np.linalg.inv(fwd)                     # dest -> src coefficients
    c0, c1, c2 = inv[0]
    c3, c4, c5 = inv[1]
    xs, ys = [], []
    for sxc, syc in ((0, 0), (w, 0), (0, h), (w, h)):
        xs.append(sx * sxc + ry * syc + tx)
        ys.append(rx * sxc + sy * syc + ty)
    gx = math.floor(min(xs) - 0.5)
    gy = math.floor(min(ys) - 0.5)
    nw = int(math.ceil(max(xs) - gx + 0.5))
    nh = int(math.ceil(max(ys) - gy + 0.5))
    yy, xx = _grid(nh, nw, img.dtype)
    dx = xx + (gx + 0.5)
    dy = yy + (gy + 0.5)
    u = c0 * dx + c1 * dy + c2 - 0.5
    v = c3 * dx + c4 * dy + c5 - 0.5
    return sample_ewa_reference(img, u, v, (c0, c1, c3, c4), background)


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
        # args variants (distort.c:723 ScaleRotateTranslate): converted to
        # the forward dest->src affine (distort.c:818) and sampled at
        # d=(i+0.5, j+0.5), s-0.5 (distort.c:2531,:2858) like the reference
        a = list(args)
        sx_ = sy_ = 1.0
        if len(a) == 1:
            pcx, pcy, angle, nx, ny = cx, cy, a[0], cx, cy
        elif len(a) == 2:
            pcx, pcy, angle, nx, ny = cx, cy, a[1], cx, cy
            sx_ = sy_ = a[0]
        elif len(a) == 3:
            pcx, pcy, angle, nx, ny = a[0], a[1], a[2], a[0], a[1]
        elif len(a) == 4:
            pcx, pcy, angle, nx, ny = a[0], a[1], a[3], a[0], a[1]
            sx_ = sy_ = a[2]
        elif len(a) == 5:
            pcx, pcy, angle, nx, ny = a[0], a[1], a[4], a[0], a[1]
            sx_, sy_ = a[2], a[3]
        elif len(a) == 6:
            pcx, pcy, angle, nx, ny = a[0], a[1], a[3], a[4], a[5]
            sx_ = sy_ = a[2]
        else:
            pcx, pcy, angle, nx, ny = a[0], a[1], a[4], a[5], a[6]
            sx_, sy_ = a[2], a[3]
        t = math.radians(angle)
        ct, st = math.cos(t), math.sin(t)
        c0, c1 = ct / sx_, st / sx_
        c3, c4 = -st / sy_, ct / sy_
        c2 = pcx - nx * c0 - ny * c1
        c5 = pcy - nx * c3 - ny * c4
        dx = xx + 0.5
        dy = yy + 0.5
        u = c0 * dx + c1 * dy + c2 - 0.5
        v = c3 * dx + c4 * dy + c5 - 0.5
        if sampler == "ewa":
            return sample_ewa_reference(img, u, v, (c0, c1, c3, c4),
                                        background)
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
        u = inv[0, 0] * (xx + 0.5) + inv[0, 1] * (yy + 0.5) + inv[0, 2] - 0.5
        v = inv[1, 0] * (xx + 0.5) + inv[1, 1] * (yy + 0.5) + inv[1, 2] - 0.5
        if sampler == "ewa":
            return sample_ewa_reference(
                img, u, v, (inv[0, 0], inv[0, 1], inv[1, 0], inv[1, 1]),
                background)
        return warp(img, u, v, background, sampler)

    if method == "perspective":
        pts = np.asarray(args, np.float64).reshape(-1, 4)
        coeff = _solve_perspective(pts[:, 2:], pts[:, :2])  # dst->src
        a, b, c, d, e, f, g, hh = coeff
        den = g * xx + hh * yy + 1.0
        u = (a * xx + b * yy + c) / den
        v = (d * xx + e * yy + f) / den
        return warp(img, u, v, background, sampler)

    if method == "affineprojection":
        # 6 raw forward coefficients sx,rx,ry,sy,tx,ty (distort.h)
        sx, rx, ry, sy, tx, ty = (list(args) + [0.0] * 6)[:6]
        fwd = np.array([[sx, ry, tx], [rx, sy, ty], [0, 0, 1]], np.float64)
        inv = np.linalg.inv(fwd)
        u = inv[0, 0] * (xx + 0.5) + inv[0, 1] * (yy + 0.5) + inv[0, 2] - 0.5
        v = inv[1, 0] * (xx + 0.5) + inv[1, 1] * (yy + 0.5) + inv[1, 2] - 0.5
        if sampler == "ewa":
            return sample_ewa_reference(
                img, u, v, (inv[0, 0], inv[0, 1], inv[1, 0], inv[1, 1]),
                background)
        return warp(img, u, v, background, sampler)

    if method == "perspectiveprojection":
        # 8 raw forward coefficients (distort.c PerspectiveProjection)
        a, b, c, d, e, f, g, hh = (list(args) + [0.0] * 8)[:8]
        fwd = np.array([[a, b, c], [d, e, f], [g, hh, 1.0]], np.float64)
        inv = np.linalg.inv(fwd)
        den = inv[2, 0] * xx + inv[2, 1] * yy + inv[2, 2]
        u = (inv[0, 0] * xx + inv[0, 1] * yy + inv[0, 2]) / den
        v = (inv[1, 0] * xx + inv[1, 1] * yy + inv[1, 2]) / den
        return warp(img, u, v, background, sampler)

    if method == "rigidaffine":
        # similarity transform: rotation + uniform scale + translation
        # fitted from point pairs (distort.c RigidAffine)
        pts = np.asarray(args, np.float64).reshape(-1, 4)
        src, dst = pts[:, :2], pts[:, 2:]
        sc, dc = src.mean(0), dst.mean(0)
        s0, d0 = src - sc, dst - dc
        num = (d0[:, 0] * s0[:, 0] + d0[:, 1] * s0[:, 1]).sum()
        cross = (d0[:, 1] * s0[:, 0] - d0[:, 0] * s0[:, 1]).sum()
        denom = (s0 ** 2).sum()
        a_, b_ = num / denom, cross / denom
        fwd = np.array([[a_, -b_, dc[0] - a_ * sc[0] + b_ * sc[1]],
                        [b_, a_, dc[1] - b_ * sc[0] - a_ * sc[1]],
                        [0, 0, 1]], np.float64)
        inv = np.linalg.inv(fwd)
        u = inv[0, 0] * (xx + 0.5) + inv[0, 1] * (yy + 0.5) + inv[0, 2] - 0.5
        v = inv[1, 0] * (xx + 0.5) + inv[1, 1] * (yy + 0.5) + inv[1, 2] - 0.5
        if sampler == "ewa":
            return sample_ewa_reference(
                img, u, v, (inv[0, 0], inv[0, 1], inv[1, 0], inv[1, 1]),
                background)
        return warp(img, u, v, background, sampler)

    if method == "bilinearforward":
        # forward-fitted bilinear; invert per pixel via the standard
        # inverse-bilinear quadratic (distort.c BilinearForward)
        pts = np.asarray(args, np.float64).reshape(-1, 4)
        A = np.stack([np.ones(4), pts[:, 0], pts[:, 1],
                      pts[:, 0] * pts[:, 1]], 1)
        ca = np.linalg.solve(A, pts[:, 2])   # X = ca . [1,u,v,uv]
        cb = np.linalg.solve(A, pts[:, 3])   # Y = cb . [1,u,v,uv]
        X = xx - ca[0]
        Y = yy - cb[0]
        # solve X = ca1 u + ca2 v + ca3 uv ; Y = cb1 u + cb2 v + cb3 uv
        # eliminating v gives: aq u^2 + bq u + cq = 0 with
        aq = cb[1] * ca[3] - cb[3] * ca[1]
        bq = cb[1] * ca[2] - cb[2] * ca[1] + cb[3] * X - ca[3] * Y
        cq = cb[2] * X - ca[2] * Y
        disc = jnp.sqrt(jnp.maximum(bq * bq - 4.0 * aq * cq, 0.0))
        if abs(aq) < 1e-12:
            u_ = -cq / jnp.where(jnp.abs(bq) < 1e-12, 1e-12, bq)
        else:
            u_ = (-bq + disc) / (2.0 * aq)
        # recover v from whichever equation is better conditioned at u_
        den_a = ca[2] + ca[3] * u_
        den_b = cb[2] + cb[3] * u_
        use_a = jnp.abs(den_a) > jnp.abs(den_b)
        num = jnp.where(use_a, X - ca[1] * u_, Y - cb[1] * u_)
        den = jnp.where(use_a, den_a, den_b)
        v_ = num / jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        return warp(img, u_, v_, background, sampler)

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

    if method == "polynomial":
        # args: order, then x,y,X,Y control points (distort.c Polynomial)
        order = int(args[0])
        pts = np.asarray(args[1:], np.float64).reshape(-1, 4)
        src = pts[:, :2]
        dst = pts[:, 2:]
        terms = [(i, j) for i in range(order + 1) for j in range(order + 1 - i)]

        def basis(p):
            return np.stack([p[:, 0] ** i * p[:, 1] ** j for i, j in terms], 1)

        A = basis(dst)  # inverse fit: dst -> src
        cu, *_ = np.linalg.lstsq(A, src[:, 0], rcond=None)
        cv, *_ = np.linalg.lstsq(A, src[:, 1], rcond=None)
        u = sum(c * xx ** i * yy ** j for c, (i, j) in zip(cu, terms))
        v = sum(c * xx ** i * yy ** j for c, (i, j) in zip(cv, terms))
        return warp(img, u, v, background, sampler)

    if method in ("shepards", "shepard"):
        pts = np.asarray(args, np.float64).reshape(-1, 4)
        src = jnp.asarray(pts[:, :2], img.dtype)   # (N, 2)
        dst = jnp.asarray(pts[:, 2:], img.dtype)
        # inverse Shepard's: displacement interpolated by 1/d² from dst points
        disp = src - dst                            # (N, 2) source-dest deltas
        dx2 = (xx[..., None] - dst[None, None, :, 0]) ** 2 + \
              (yy[..., None] - dst[None, None, :, 1]) ** 2
        wgt = 1.0 / jnp.maximum(dx2, 1.0)
        wsum = jnp.sum(wgt, axis=-1)
        u = xx + jnp.sum(wgt * disp[None, None, :, 0], -1) / wsum
        v = yy + jnp.sum(wgt * disp[None, None, :, 1], -1) / wsum
        return warp(img, u, v, background, sampler)

    if method in ("bilineardistortion", "bilinear", "bilinearreverse"):
        pts = np.asarray(args, np.float64).reshape(-1, 4)
        # fit inverse u = a + b x + c y + d x y over 4 points
        A = np.stack([np.ones(4), pts[:, 2], pts[:, 3],
                      pts[:, 2] * pts[:, 3]], 1)
        cu = np.linalg.solve(A, pts[:, 0])
        cv = np.linalg.solve(A, pts[:, 1])
        u = cu[0] + cu[1] * xx + cu[2] * yy + cu[3] * xx * yy
        v = cv[0] + cv[1] * xx + cv[2] * yy + cv[3] * xx * yy
        return warp(img, u, v, background, sampler)

    if method in ("resize", "resizedistortion"):
        from .resize import resize as rz_resize

        nw, nh = int(args[0]), int(args[1] if len(args) > 1 else args[0])
        return rz_resize(img, nh, nw, "robidoux")

    if method == "cylinder2plane":
        fov = math.radians(args[0]) if args else math.radians(90.0)
        f = w / fov
        ang = (xx - cx) / f
        u = cx + f * jnp.tan(ang)
        v = cy + (yy - cy) / jnp.cos(ang)
        return warp(img, u, v, background, sampler)

    if method == "plane2cylinder":
        fov = math.radians(args[0]) if args else math.radians(90.0)
        f = w / fov
        u = cx + f * jnp.arctan((xx - cx) / f)
        r = jnp.sqrt((xx - cx) ** 2 + f * f)
        v = cy + (yy - cy) * f / r
        return warp(img, u, v, background, sampler)

    raise ValueError(f"unsupported distort method {method!r}")


def sparse_color(img: jnp.ndarray, method: str,
                 points: Sequence[Tuple[float, float, Sequence[float]]],
                 ) -> jnp.ndarray:
    """SparseColorImage (distort.c SparseColorImage): interpolate scattered
    color samples over the canvas.

    methods: shepards (inverse-distance²), voronoi (nearest point),
    inverse (1/d), barycentric (least-squares plane per channel),
    bilinear (plane + xy term).
    """
    h, w = img.shape[-3], img.shape[-2]
    yy, xx = _grid(h, w, img.dtype)
    c = img.shape[-1]
    px = jnp.asarray([p[0] for p in points], img.dtype)
    py = jnp.asarray([p[1] for p in points], img.dtype)
    pc = jnp.asarray([list(p[2])[:c] + [1.0] * max(0, c - len(p[2]))
                      for p in points], img.dtype)  # (N, C)
    m = method.lower()
    if m in ("barycentric", "bilinear"):
        n = len(points)
        cols = [np.ones(n), np.asarray(px), np.asarray(py)]
        if m == "bilinear":
            cols.append(np.asarray(px) * np.asarray(py))
        A = np.stack(cols, 1)
        outs = []
        for ch in range(c):
            coef, *_ = np.linalg.lstsq(A, np.asarray(pc[:, ch]), rcond=None)
            val = coef[0] + coef[1] * xx + coef[2] * yy
            if m == "bilinear":
                val = val + coef[3] * xx * yy
            outs.append(val)
        return jnp.clip(jnp.stack(outs, -1), 0.0, 1.0)
    d2 = (xx[..., None] - px) ** 2 + (yy[..., None] - py) ** 2  # (H, W, N)
    if m == "voronoi":
        idx = jnp.argmin(d2, axis=-1)
        return pc[idx]
    if m in ("shepards", "shepard"):
        wgt = 1.0 / jnp.maximum(d2, 1e-6)
    elif m == "inverse":
        wgt = 1.0 / jnp.maximum(jnp.sqrt(d2), 1e-6)
    else:
        raise ValueError(f"unknown sparse-color method {method!r}")
    wsum = jnp.sum(wgt, axis=-1, keepdims=True)
    out = jnp.einsum("hwn,nc->hwc", wgt / wsum, pc, precision="highest")
    return jnp.clip(out, 0.0, 1.0)


def liquid_rescale(img: jnp.ndarray, width: int, height: int,
                   delta_x: float = 1.0, rigidity: float = 0.0) -> jnp.ndarray:
    """LiquidRescaleImage (resize.c via liblqr): content-aware seam carving.

    Vertical seams are removed one at a time; per seam, the minimal-energy
    path is a lax.scan DP over rows and removal is a vectorized gather.
    Width reduction only carves columns; expansion falls back to resize
    (as does height, matching common usage; liblqr does the same transposed).
    """
    from .blur import _depthwise_conv
    from .resize import resize as rz_resize
    import jax

    h, w = img.shape[-3], img.shape[-2]
    n_remove = w - width
    if n_remove <= 0 or width <= 2:
        return rz_resize(img, height, width)

    sobel = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)

    def energy(x):
        gray = jnp.mean(x, axis=-1, keepdims=True)
        gx = _depthwise_conv(gray, jnp.asarray(sobel), "edge")
        gy = _depthwise_conv(gray, jnp.asarray(sobel.T), "edge")
        return jnp.abs(gx[..., 0]) + jnp.abs(gy[..., 0])

    def carve_one(x, cur_w):
        e = energy(x)  # (h, w)
        big = 1e9
        col_idx = jnp.arange(w)
        valid = col_idx < cur_w
        e = jnp.where(valid, e, big)

        def dp_row(prev, row):
            left = jnp.concatenate([jnp.full((1,), big), prev[:-1]])
            right = jnp.concatenate([prev[1:], jnp.full((1,), big)])
            best = jnp.minimum(prev, jnp.minimum(left, right))
            cum = row + best
            return cum, cum

        _, cums = jax.lax.scan(dp_row, e[0], e[1:])
        cums = jnp.concatenate([e[:1], cums], axis=0)  # (h, w)

        # backtrack from the bottom
        def back_row(j, cum_row):
            lo = jnp.maximum(j - 1, 0)
            cand = jnp.stack([cum_row[lo], cum_row[j],
                              cum_row[jnp.minimum(j + 1, w - 1)]])
            off = jnp.argmin(cand) - 1 + (j == 0)
            return jnp.clip(j + off, 0, w - 1)

        j_bot = jnp.argmin(cums[-1])

        def scan_back(j, cum_row):
            nj = back_row(j, cum_row)
            return nj, j

        _, seam_rev = jax.lax.scan(scan_back, j_bot, cums[:-1][::-1])
        seam = jnp.concatenate([seam_rev[::-1], jnp.asarray([j_bot])])

        # remove seam: for each row, gather indices skipping seam[y]
        idx = jnp.arange(w)
        take = idx[None, :] + (idx[None, :] >= seam[:, None])
        take = jnp.clip(take, 0, w - 1)
        newx = jnp.take_along_axis(x, take[..., None], axis=-2)
        return newx

    out = img
    cur = w
    for _ in range(n_remove):
        out = carve_one(out, cur)
        cur -= 1
    out = out[..., :width, :]
    if height != h:
        out = rz_resize(out, height, width)
    return out


def _radial_setup(h, w, dtype):
    """Shared swirl/implode geometry (visual-effects.c): elliptical
    aspect correction via per-axis scale, radius = the LARGER half-dim,
    deltas in scaled pixel units around center = 0.5*(W, H)."""
    cy, cx = 0.5 * h, 0.5 * w
    scale_x = scale_y = 1.0
    if w > h:
        scale_y = w / h
    elif w < h:
        scale_x = h / w
    radius = max(cx, cy)
    yy, xx = _grid(h, w, dtype)
    dx = scale_x * (xx - cx)
    dy = scale_y * (yy - cy)
    dist = dx * dx + dy * dy
    return cx, cy, scale_x, scale_y, radius, xx, yy, dx, dy, dist


def swirl(img: jnp.ndarray, degrees: float,
          background: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """SwirlImage (visual-effects.c): rotate by angle scaled with radius.

    factor = 1 - sqrt(dist)/radius inside the ellipse (dist < radius^2),
    rotation angle = radians(degrees) * factor^2; pixels outside copy."""
    h, w = img.shape[-3], img.shape[-2]
    cx, cy, sx, sy, radius, xx, yy, dx, dy, dist = _radial_setup(
        h, w, img.dtype)
    inside = dist < radius * radius
    factor = 1.0 - jnp.sqrt(dist) / radius
    t = math.radians(degrees) * factor * factor
    ct, st = jnp.cos(t), jnp.sin(t)
    u = jnp.where(inside, (ct * dx - st * dy) / sx + cx, xx)
    v = jnp.where(inside, (st * dx + ct * dy) / sy + cy, yy)
    return sample_bilinear(img, u, v, background)


def implode(img: jnp.ndarray, amount: float,
            background: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """ImplodeImage (visual-effects.c): radial pull toward the center.

    factor = sin(pi * sqrt(dist)/radius / 2)^(-amount) for 0 < dist <
    radius^2 (1 at the exact center); pixels outside the ellipse copy."""
    h, w = img.shape[-3], img.shape[-2]
    cx, cy, sx, sy, radius, xx, yy, dx, dy, dist = _radial_setup(
        h, w, img.dtype)
    inside = dist < radius * radius
    r = jnp.sqrt(jnp.maximum(dist, 0.0)) / radius
    s = jnp.sin(0.5 * math.pi * r)
    factor = jnp.where(dist > 0.0,
                       jnp.power(jnp.maximum(s, 1e-30), -amount), 1.0)
    u = jnp.where(inside, factor * dx / sx + cx, xx)
    v = jnp.where(inside, factor * dy / sy + cy, yy)
    return sample_bilinear(img, u, v, background)


def wave(img: jnp.ndarray, amplitude: float = 25.0, wavelength: float = 150.0,
         background: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """WaveImage (visual-effects.c): sinusoidal vertical displacement.

    The canvas GROWS to H + 2|A| rows and output (x, y) samples the
    source at (x, y - (|A| + A sin(2pi x / lambda))) — oracle-checked
    canvas semantics."""
    h, w = img.shape[-3], img.shape[-2]
    out_h = int(h + 2.0 * abs(amplitude))
    yy, xx = _grid(out_h, w, img.dtype)
    sine = abs(amplitude) + amplitude * jnp.sin(
        2.0 * math.pi * xx / max(wavelength, 1e-6))
    v = yy - sine
    return sample_bilinear(img, xx, v, background)

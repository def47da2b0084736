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


def _premult_sample(img: jnp.ndarray, background, run):
    """Alpha-premultiplied resampling wrapper (resample.c alpha blend):
    colors are weighted by alpha during interpolation and un-premultiplied
    by the interpolated alpha.  `run(pm_img, pm_background)` does the
    actual sampling; no-op for images without alpha."""
    c = img.shape[-1]
    if c not in (2, 4):
        return run(img, background)
    a = img[..., -1:]
    pm = jnp.concatenate([img[..., :-1] * a, a], -1)
    bg = None
    if background is not None:
        bl = list(background)[:c]
        while len(bl) < c:
            bl.append(1.0)
        bg = tuple(x * bl[-1] for x in bl[:-1]) + (bl[-1],)
    out = run(pm, bg)
    al = out[..., -1:]
    col = out[..., :-1] / jnp.where(jnp.abs(al) < 1e-12, 1.0, al)
    return jnp.concatenate([col, al], -1)


def _make_tap(img: jnp.ndarray,
              background: Optional[Sequence[float]] = None,
              vp: str = "edge"):
    """Build a tap(yi, xi) gather honoring the virtual-pixel policy.

    vp='edge' with a background keeps the legacy behavior (constant fill
    outside the canvas); any other vp routes through core.virtual_pixel's
    coordinate remapping (cache.c:2928-3066), with vp_constant supplying
    the fill for constant/tile-fill methods."""
    from ..core.virtual_pixel import vp_constant, vp_tap

    h, w, c = img.shape[-3:]
    img2 = img.reshape(img.shape[:-3] + (h * w, c))
    m = (vp or "edge").lower()
    if m in ("edge", "undefined", ""):
        if background is None:
            def tap(yi, xi):
                return jnp.take(img2, jnp.clip(yi, 0, h - 1) * w +
                                jnp.clip(xi, 0, w - 1), axis=-2)
            return tap
        bg = jnp.asarray(tuple(background)[:c], img.dtype)

        def tap(yi, xi):
            px = jnp.take(img2, jnp.clip(yi, 0, h - 1) * w +
                          jnp.clip(xi, 0, w - 1), axis=-2)
            valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))[..., None]
            return jnp.where(valid, px, bg)
        return tap
    const = vp_constant(m, background, c)
    bg = None if const is None else jnp.asarray(const, img.dtype)

    def tap(yi, xi):
        yc, xc, mask = vp_tap(yi, xi, h, w, m)
        px = jnp.take(img2, yc * w + xc, axis=-2)
        if mask is not None and bg is not None:
            px = jnp.where(mask[..., None], bg, px)
        return px
    return tap


def sample_bilinear(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                    background: Optional[Sequence[float]] = None,
                    vp: str = "edge") -> jnp.ndarray:
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

    # per-tap virtual pixel: off-canvas taps contribute the policy color
    # INSIDE the bilinear blend, like the reference's
    # InterpolatePixelChannels over a virtual-pixel cache view
    tap = _make_tap(img, background, vp)
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
         jac: Optional[Tuple[float, float, float, float]] = None,
         vp: str = "edge") -> jnp.ndarray:
    if sampler == "ewa":
        if jac is not None:
            return sample_ewa_reference(img, u, v, jac, background, vp)
        return sample_ewa(img, u, v, background)
    return sample_bilinear(img, u, v, background, vp)


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
                         background: Optional[Sequence[float]] = None,
                         vp: str = "edge") -> jnp.ndarray:
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
    tap = _make_tap(img, background, vp)

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
            px = tap(vv.astype(jnp.int32), uu.astype(jnp.int32))
            acc = acc + wgt[..., None] * px
            den = den + wgt[..., None]
    out = acc / jnp.where(den == 0.0, 1.0, den)
    fallback = sample_bilinear(img, u, v, background, vp)
    return jnp.where(den == 0.0, fallback, out)


def _clamped_ellipse_np(a, b, c, d):
    """Per-pixel ClampUpAxes (resample.c:1100) in closed form, numpy f64.

    Jacobian J = [[a, b], [c, d]] per dest pixel; eigendecompose S = J·Jᵀ,
    clamp eigenvalues up to 1 (unit-circle minimum footprint), and return
    the ellipse quadratic A·U² + B·UV + C·V² < F exactly as the constant-
    Jacobian path derives it from the SVD (singular values = √eigenvalues,
    left singular vectors = eigenvectors of S).
    """
    p = a * a + b * b
    q = a * c + b * d
    r = c * c + d * d
    tr2 = 0.5 * (p + r)
    disc = np.sqrt(np.maximum(0.25 * (p - r) ** 2 + q * q, 0.0))
    l0 = tr2 + disc
    l1 = np.maximum(tr2 - disc, 0.0)
    c0 = np.maximum(l0, 1.0)
    c1 = np.maximum(l1, 1.0)
    # unit eigenvector for l0: pick the better-conditioned candidate
    v1x, v1y = q, l0 - p
    v2x, v2y = l0 - r, q
    n1 = v1x * v1x + v1y * v1y
    n2 = v2x * v2x + v2y * v2y
    use2 = n2 > n1
    ux = np.where(use2, v2x, v1x)
    uy = np.where(use2, v2y, v1y)
    nn = np.sqrt(np.maximum(ux * ux + uy * uy, 1e-300))
    degen = np.maximum(n1, n2) < 1e-300   # S ∝ identity: any axis
    ux = np.where(degen, 1.0, ux / nn)
    uy = np.where(degen, 0.0, uy / nn)
    # S' = c0·u uᵀ + c1·u⊥ u⊥ᵀ  (u⊥ = (-uy, ux))
    Sp = c0 * ux * ux + c1 * uy * uy
    Sq = (c0 - c1) * ux * uy
    Sr = c0 * uy * uy + c1 * ux * ux
    A = Sr
    B = -2.0 * Sq
    C = Sp
    F = c0 * c1
    return A, B, C, F


def _pow2_bucket(n, lo=4):
    b = lo
    while b < n:
        b *= 2
    return b


def sample_ewa_reference_var(img: jnp.ndarray, u, v, jac,
                             background: Optional[Sequence[float]] = None,
                             vp: str = "edge") -> jnp.ndarray:
    """Reference EWA resampling with a PER-PIXEL Jacobian (resample.c
    ResamplePixelColor driven by per-pixel ScaleFilter calls, as the
    Arc/Polar/Barrel/Cylinder distorts do — distort.c:2655-2817).

    u, v, and the 4 jac arrays are HOST numpy f64 maps over the output
    grid (u, v in index space = reference s − 0.5).  The ellipse setup,
    scan bounds, and limit tests run host-side in f64; the device work is
    a size-class-compacted tap scan: output pixels are bucketed by their
    (scanlines, taps-per-line) requirements, each bucket runs a static-
    shape gather/accumulate, and results scatter into the output.  This
    keeps XLA shapes static while bounding work by the actual ellipse
    areas instead of the global worst case.

    limit_reached pixels (parallelogram area > 4×image area,
    resample.c:1197) use the 4-neighbour average interpolation the
    reference falls back to under edge virtual pixels (resample.c:427);
    zero-hit pixels fall back to bilinear interpolation (resample.c:657).
    """
    h, w, c = img.shape[-3:]
    out_shape = u.shape
    support = 2.0
    A, B, C, F = _clamped_ellipse_np(*[np.asarray(j, np.float64) for j in jac])
    F = F * (support * support)
    det = A * C - 0.25 * B * B
    det = np.maximum(det, 1e-300)
    Vlimit = np.sqrt(A * F / det)
    Uwidth = np.sqrt(F / np.maximum(A, 1e-300))
    slope = -B / (2.0 * np.maximum(A, 1e-300))
    limit = (Uwidth * Vlimit) > 4.0 * (h * w)
    scale = 1024.0 / F
    As, Bs, Cs = A * scale, B * scale, C * scale

    nv = (2.0 * Vlimit).astype(np.int64) + 2
    uw = (2.0 * Uwidth).astype(np.int64) + 1

    uf = np.asarray(u, np.float64).ravel()
    vf = np.asarray(v, np.float64).ravel()
    flat = {k: val.ravel() for k, val in
            dict(As=As, Bs=Bs, Cs=Cs, slope=slope, Uwidth=Uwidth,
                 Vlimit=Vlimit, nv=nv, uw=uw).items()}
    limit_f = limit.ravel()

    lut = _robidoux_lut()
    _gather = _make_tap(img, background, vp)

    # fallback plane: reference bilinear at the shifted s (the -0.5 is
    # already applied before ResamplePixelColor, distort.c:2856;
    # InterpolatePixelChannel BilinearInterpolatePixel, pixel.c:4769)
    out = sample_bilinear(
        img, jnp.asarray(uf.reshape(out_shape), img.dtype),
        jnp.asarray(vf.reshape(out_shape), img.dtype), background, vp)
    out = out.reshape(img.shape[:-3] + (uf.size, c))

    # limit-reached pixels: 4-neighbour average at floor(s)
    lim_idx = np.nonzero(limit_f)[0]
    if lim_idx.size:
        li = jnp.asarray(lim_idx)
        x0 = jnp.asarray(np.floor(uf[lim_idx]).astype(np.int32))
        y0 = jnp.asarray(np.floor(vf[lim_idx]).astype(np.int32))
        avg = (_gather(y0, x0) + _gather(y0, x0 + 1) +
               _gather(y0 + 1, x0) + _gather(y0 + 1, x0 + 1)) * 0.25
        out = out.at[..., li, :].set(avg)

    # normal pixels: bucket by (pow2(nv), pow2(uw))
    norm = ~limit_f
    keys = {}
    for i in np.nonzero(norm)[0]:
        k = (_pow2_bucket(int(flat["nv"][i])), _pow2_bucket(int(flat["uw"][i])))
        keys.setdefault(k, []).append(i)
    for (nvb, uwb), idx_list in sorted(keys.items()):
        idx = np.asarray(idx_list, np.int64)
        cu = jnp.asarray(uf[idx], img.dtype)
        cv = jnp.asarray(vf[idx], img.dtype)
        cAs = jnp.asarray(flat["As"][idx], img.dtype)
        cBs = jnp.asarray(flat["Bs"][idx], img.dtype)
        cCs = jnp.asarray(flat["Cs"][idx], img.dtype)
        csl = jnp.asarray(flat["slope"][idx], img.dtype)
        cUw = jnp.asarray(flat["Uwidth"][idx], img.dtype)
        v1 = jnp.asarray(np.ceil(vf[idx] - flat["Vlimit"][idx]), img.dtype)
        v2 = jnp.asarray(np.floor(vf[idx] + flat["Vlimit"][idx]), img.dtype)
        acc = jnp.zeros(img.shape[:-3] + (idx.size, c), img.dtype)
        den = jnp.zeros((idx.size, 1), img.dtype)
        for k in range(nvb):
            vv = v1 + k
            vmask = vv <= v2
            ustart = jnp.ceil(cu + (vv - cv) * csl - cUw)
            V = vv - cv
            for j in range(uwb):
                uu = ustart + j
                U = uu - cu
                Q = (cAs * U + cBs * V) * U + cCs * V * V
                qi = Q.astype(jnp.int32)
                wgt = jnp.where(vmask & (qi >= 0) & (qi < 1024),
                                jnp.take(lut, jnp.clip(qi, 0, 1023)), 0.0)
                px = _gather(vv.astype(jnp.int32), uu.astype(jnp.int32))
                acc = acc + wgt[..., None] * px
                den = den + wgt[..., None]
        good = den > 0.0
        res = acc / jnp.where(good, den, 1.0)
        li = jnp.asarray(idx)
        prev = jnp.take(out, li, axis=-2)
        out = out.at[..., li, :].set(jnp.where(good, res, prev))
    return out.reshape(img.shape[:-3] + out_shape + (c,))


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
    return sample_bilinear(img, u, v, background, vp)


def rotate(img: jnp.ndarray, degrees: float,
           background: Optional[Sequence[float]] = None,
           expand: bool = True, sampler: str = "ewa",
           vp: str = "edge", _pm: bool = True) -> jnp.ndarray:
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
    if _pm and img.shape[-1] in (2, 4):
        # alpha images resample premultiplied (resample.c alpha blend)
        return _premult_sample(
            img, background,
            lambda i, b: rotate(i, degrees, b, expand, sampler, vp,
                                _pm=False))
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
    return sample_ewa_reference(img, u, v, (c0, c1, c3, c4), background, vp)


def affine_projection_bestfit(img: jnp.ndarray, matrix: Sequence[float],
                              background: Optional[Sequence[float]] = None,
                              vp: str = "edge") -> jnp.ndarray:
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
    return sample_ewa_reference(img, u, v, (c0, c1, c3, c4), background, vp)


def affine_transform(img: jnp.ndarray, matrix: Sequence[float],
                     out_shape: Optional[Tuple[int, int]] = None,
                     background: Optional[Sequence[float]] = None,
                     sampler: str = "bilinear",
                     vp: str = "edge") -> jnp.ndarray:
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
    return warp(img, u, v, background, sampler, vp=vp)


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


def _bestfit_geometry(corners):
    """distort.c:1997 fix_bounds: output viewport from mapped dest corners."""
    minx = min(p[0] for p in corners)
    maxx = max(p[0] for p in corners)
    miny = min(p[1] for p in corners)
    maxy = max(p[1] for p in corners)
    gx = math.floor(minx - 0.5)
    gy = math.floor(miny - 0.5)
    ow = int(math.ceil(maxx - gx + 0.5))
    oh = int(math.ceil(maxy - gy + 0.5))
    return gx, gy, ow, oh


def _affine_bestfit_grid(c, h, w, img_dtype):
    """Map source corners through the inverted dest->src affine
    (distort.c:1853 InvertAffineCoefficients + ExpandBounds) and return
    the shifted dest-coordinate grid + viewport."""
    c0, c1, c2, c3, c4, c5 = c
    M = np.array([[c0, c1, c2], [c3, c4, c5], [0.0, 0.0, 1.0]], np.float64)
    inv = np.linalg.inv(M)
    pts = []
    for sx_, sy_ in ((0, 0), (w, 0), (0, h), (w, h)):
        pts.append((inv[0, 0] * sx_ + inv[0, 1] * sy_ + inv[0, 2],
                    inv[1, 0] * sx_ + inv[1, 1] * sy_ + inv[1, 2]))
    gx, gy, ow, oh = _bestfit_geometry(pts)
    yy, xx = _grid(oh, ow, img_dtype)
    return xx + (gx + 0.5), yy + (gy + 0.5)


def distort(img: jnp.ndarray, method: str, args: Sequence[float],
            background: Optional[Sequence[float]] = None,
            sampler: str = "ewa", bestfit: bool = False,
            vp: str = "edge", _pm: bool = True) -> jnp.ndarray:
    """DistortImage (distort.c:1754) — core methods.

    Supported: affine (3+ point pairs), perspective (4 pairs), srt
    (scale-rotate-translate), arc, polar, depolar, barrel, barrelinverse,
    swirl, implode.  Control-point methods solve their coefficient systems
    host-side (numpy least squares — the reference's Gauss-Jordan in
    matrix.c), then evaluate the inverse map on device.  bestfit=True
    (the CLI's +distort) resizes the output canvas to the mapped source
    bounds (distort.c:1822-2030).
    """
    method = method.lower()
    if (vp or "").lower() == "transparent":
        # transparent virtual pixels: promote to alpha and sample with a
        # (0,0,0,0) background fill (SetImageVirtualPixelMethod path)
        if img.shape[-1] in (1, 3):
            a = jnp.ones(img.shape[:-1] + (1,), img.dtype)
            img = jnp.concatenate([img, a], -1)
        background = (0.0,) * img.shape[-1]
        vp = "background"
    if _pm and img.shape[-1] in (2, 4):
        # resample.c blends alpha-weighted for images carrying alpha
        return _premult_sample(
            img, background,
            lambda i, b: distort(i, method, args, background=b,
                                 sampler=sampler, bestfit=bestfit, vp=vp,
                                 _pm=False))

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
        if bestfit:
            dx, dy = _affine_bestfit_grid((c0, c1, c2, c3, c4, c5), h, w,
                                          img.dtype)
        else:
            dx = xx + 0.5
            dy = yy + 0.5
        u = c0 * dx + c1 * dy + c2 - 0.5
        v = c3 * dx + c4 * dy + c5 - 0.5
        if sampler == "ewa":
            return sample_ewa_reference(img, u, v, (c0, c1, c3, c4),
                                        background, vp)
        return warp(img, u, v, background, sampler, vp=vp)

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
        ic = (inv[0, 0], inv[0, 1], inv[0, 2], inv[1, 0], inv[1, 1], inv[1, 2])
        if bestfit:
            dx, dy = _affine_bestfit_grid(ic, h, w, img.dtype)
        else:
            dx, dy = xx + 0.5, yy + 0.5
        u = ic[0] * dx + ic[1] * dy + ic[2] - 0.5
        v = ic[3] * dx + ic[4] * dy + ic[5] - 0.5
        if sampler == "ewa":
            return sample_ewa_reference(
                img, u, v, (ic[0], ic[1], ic[3], ic[4]), background, vp)
        return warp(img, u, v, background, sampler, vp=vp)

    if method == "perspective":
        pts = np.asarray(args, np.float64).reshape(-1, 4)
        coeff = _solve_perspective(pts[:, 2:], pts[:, :2])  # dst->src
        # ground-sky sign from the first dest control point (distort.c:929)
        c8 = coeff[6] * pts[0, 2] + coeff[7] * pts[0, 3] + 1.0
        c8 = -1.0 if c8 < 0.0 else 1.0
        return _perspective_eval(img, coeff, c8, background, bestfit,
                                 sampler, vp)

    if method == "affineprojection":
        # 6 raw forward coefficients sx,rx,ry,sy,tx,ty (distort.h)
        sx, rx, ry, sy, tx, ty = (list(args) + [0.0] * 6)[:6]
        fwd = np.array([[sx, ry, tx], [rx, sy, ty], [0, 0, 1]], np.float64)
        inv = np.linalg.inv(fwd)
        ic = (inv[0, 0], inv[0, 1], inv[0, 2], inv[1, 0], inv[1, 1], inv[1, 2])
        if bestfit:
            dx, dy = _affine_bestfit_grid(ic, h, w, img.dtype)
        else:
            dx, dy = xx + 0.5, yy + 0.5
        u = ic[0] * dx + ic[1] * dy + ic[2] - 0.5
        v = ic[3] * dx + ic[4] * dy + ic[5] - 0.5
        if sampler == "ewa":
            return sample_ewa_reference(
                img, u, v, (ic[0], ic[1], ic[3], ic[4]), background, vp)
        return warp(img, u, v, background, sampler, vp=vp)

    if method == "perspectiveprojection":
        # 8 raw forward coefficients inverted (distort.c:948
        # InvertPerspectiveCoefficients), then the normal perspective path
        a, b, c, d, e, f, g, hh = (list(args) + [0.0] * 8)[:8]
        fwd = np.array([[a, b, c], [d, e, f], [g, hh, 1.0]], np.float64)
        inv = np.linalg.inv(fwd)
        inv = inv / inv[2, 2]
        coeff = [inv[0, 0], inv[0, 1], inv[0, 2], inv[1, 0], inv[1, 1],
                 inv[1, 2], inv[2, 0], inv[2, 1]]
        # forward maps source (0,0) to (c, f): sign of r there (distort.c:956)
        c8 = coeff[6] * c + coeff[7] * f + 1.0
        c8 = -1.0 if c8 < 0.0 else 1.0
        return _perspective_eval(img, coeff, c8, background, bestfit,
                                 sampler, vp)

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
        ic = (inv[0, 0], inv[0, 1], inv[0, 2], inv[1, 0], inv[1, 1], inv[1, 2])
        if bestfit:
            dx, dy = _affine_bestfit_grid(ic, h, w, img.dtype)
        else:
            dx, dy = xx + 0.5, yy + 0.5
        u = ic[0] * dx + ic[1] * dy + ic[2] - 0.5
        v = ic[3] * dx + ic[4] * dy + ic[5] - 0.5
        if sampler == "ewa":
            return sample_ewa_reference(
                img, u, v, (ic[0], ic[1], ic[3], ic[4]), background, vp)
        return warp(img, u, v, background, sampler, vp=vp)

    if method == "bilinearforward":
        # forward-fitted bilinear i = c0·x+c1·y+c2·xy+c3 (source x,y ->
        # dest i,j), inverted per pixel via the reference quadratic
        # (distort.c:1032 coefficient fit, :2596 reverse mapping)
        pts = np.asarray(args, np.float64).reshape(-1, 4)
        T = np.stack([pts[:, 0], pts[:, 1], pts[:, 0] * pts[:, 1],
                      np.ones(len(pts))], 1)
        ci, *_ = np.linalg.lstsq(T, pts[:, 2], rcond=None)
        cj, *_ = np.linalg.lstsq(T, pts[:, 3], rcond=None)
        c0, c1, c2, c3 = ci
        c4, c5, c6, c7 = cj
        c8 = c0 * c5 - c1 * c4
        c9 = 2.0 * (c2 * c5 - c1 * c6)
        jj2, ii2 = np.mgrid[0:h, 0:w].astype(np.float64)
        dx = ii2 + 0.5 - c3
        dy = jj2 + 0.5 - c7
        b = c6 * dx - c2 * dy + c8
        cc = c4 * dx - c0 * dy
        if abs(c9) < 1e-12:
            validity = np.ones_like(dx)
            sy = -cc / np.where(np.abs(b) < 1e-15, 1e-15, b)
        else:
            disc = b * b - 2.0 * c9 * cc
            validity = np.where(disc < 0.0, 0.0, 1.0)
            sy = (-b + np.sqrt(np.maximum(disc, 0.0))) / c9
        den = c0 + c2 * sy
        sx = (dx - c1 * sy) / np.where(np.abs(den) < 1e-15, 1e-15, den)
        # no ScaleFilter call here (distort.c:2621 FUTURE note): samples
        # with the unit-circle EWA from filter init (resample.c:1316)
        one = np.ones_like(sx)
        zero = np.zeros_like(sx)
        out = sample_ewa_reference_var(img, sx - 0.5, sy - 0.5,
                                       (one, zero, zero, one), background, vp)
        if np.all(validity >= 1.0):
            return out
        return _blend_invalid(out, validity, img.shape[-1], img.dtype)

    if method in ("barrel", "barrelinverse", "arc", "polar", "depolar",
                  "cylinder2plane", "plane2cylinder"):
        return _polar_family(img, method, args, background, bestfit, vp)

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
        return warp(img, u, v, background, sampler, vp=vp)

    if method in ("shepards", "shepard"):
        # inverse-distance-weighted displacement about the DEST control
        # points (distort.c:2817); weight = min(1, d^-2·power), power
        # defaults to 1 (inverse squared, distort.c:1498); sampled with
        # the unit-circle EWA (no ScaleFilter call)
        pts = np.asarray(args, np.float64).reshape(-1, 4)
        power = 1.0
        jj2, ii2 = np.mgrid[0:h, 0:w].astype(np.float64)
        dx = ii2 + 0.5
        dy = jj2 + 0.5
        num_x = np.zeros_like(dx)
        num_y = np.zeros_like(dx)
        den = np.zeros_like(dx)
        for su, sv, px, py in pts:
            d2 = (dx - px) ** 2 + (dy - py) ** 2
            wgt = d2 ** power
            wgt = np.where(wgt < 1.0, 1.0, 1.0 / np.maximum(wgt, 1e-300))
            num_x += (su - px) * wgt
            num_y += (sv - py) * wgt
            den += wgt
        u = num_x / den + dx
        v = num_y / den + dy
        one = np.ones_like(u)
        zero = np.zeros_like(u)
        return sample_ewa_reference_var(img, u - 0.5, v - 0.5,
                                        (one, zero, zero, one), background, vp)

    if method in ("bilineardistortion", "bilinear", "bilinearreverse"):
        # reverse-fitted bilinear s = c0·x+c1·y+c2·xy+c3 over dest control
        # points (distort.c:1013), per-pixel EWA with the bilinear partial
        # derivatives (distort.c:2581-2594)
        pts = np.asarray(args, np.float64).reshape(-1, 4)
        T = np.stack([pts[:, 2], pts[:, 3], pts[:, 2] * pts[:, 3],
                      np.ones(len(pts))], 1)
        cu, *_ = np.linalg.lstsq(T, pts[:, 0], rcond=None)
        cv, *_ = np.linalg.lstsq(T, pts[:, 1], rcond=None)
        jj2, ii2 = np.mgrid[0:h, 0:w].astype(np.float64)
        dx = ii2 + 0.5
        dy = jj2 + 0.5
        u = cu[0] * dx + cu[1] * dy + cu[2] * dx * dy + cu[3]
        v = cv[0] * dx + cv[1] * dy + cv[2] * dx * dy + cv[3]
        jac = (cu[0] + cu[2] * dy, cu[1] + cu[2] * dx,
               cv[0] + cv[2] * dy, cv[1] + cv[2] * dx)
        return sample_ewa_reference_var(img, u - 0.5, v - 0.5, jac,
                                        background, vp)

    if method in ("resize", "resizedistortion"):
        from .resize import resize as rz_resize

        nw, nh = int(args[0]), int(args[1] if len(args) > 1 else args[0])
        return rz_resize(img, nh, nw, "robidoux")

    raise ValueError(f"unsupported distort method {method!r}")


_MATTE_GRAY = 189.0 / 255.0  # DefaultMatteColor "#BDBDBD" (image.h)


def _blend_invalid(out, validity, img_channels, dtype):
    """Mix the resampled color with the matte 'invalid' pixel by validity
    (distort.c:2860-2880 CompositePixelInfoBlend)."""
    c = img_channels
    invalid = jnp.asarray(([_MATTE_GRAY] * 3 + [1.0])[:c] if c != 2
                          else [_MATTE_GRAY, 1.0], dtype)
    vmask = jnp.asarray(np.clip(validity, 0.0, 1.0), dtype)[..., None]
    return out * vmask + invalid * (1.0 - vmask)


def _perspective_eval(img: jnp.ndarray, coeff, c8: float,
                      background: Optional[Sequence[float]],
                      bestfit: bool, sampler: str = "ewa",
                      vp: str = "edge") -> jnp.ndarray:
    """PerspectiveDistortion evaluation (distort.c:2548-2580): ratio of
    affines with sky/ground validity, horizon anti-alias band, and the
    per-pixel EWA derivative matrix; matte-color blend for invalid."""
    h, w = img.shape[-3], img.shape[-2]
    c0, c1, c2, c3, c4, c5, c6, c7 = [float(x) for x in coeff]
    if bestfit:
        # distort.c:1880: map source corners through the inverted
        # (i.e. forward, src->dest) perspective
        M = np.array([[c0, c1, c2], [c3, c4, c5], [c6, c7, 1.0]], np.float64)
        inv = np.linalg.inv(M)
        inv = inv / inv[2, 2]
        pts = []
        for sx_, sy_ in ((0, 0), (w, 0), (0, h), (w, h)):
            sc = inv[2, 0] * sx_ + inv[2, 1] * sy_ + 1.0
            sc = 1.0 / sc if abs(sc) > 1e-15 else 1e15
            pts.append((sc * (inv[0, 0] * sx_ + inv[0, 1] * sy_ + inv[0, 2]),
                        sc * (inv[1, 0] * sx_ + inv[1, 1] * sy_ + inv[1, 2])))
        gx, gy, ow, oh = _bestfit_geometry(pts)
    else:
        gx = gy = 0
        ow, oh = w, h
    jj, ii = np.mgrid[0:oh, 0:ow].astype(np.float64)
    dx = gx + ii + 0.5
    dy = gy + jj + 0.5
    p = c0 * dx + c1 * dy + c2
    n = c3 * dx + c4 * dy + c5
    r = c6 * dx + c7 * dy + 1.0
    validity = np.where(r * c8 < 0.0, 0.0, 1.0)
    abs_r = np.abs(r) * 2.0
    if abs(c6) > abs(c7):
        validity = np.where(abs_r < abs(c6), 0.5 - c8 * r / c6, validity)
    elif abs(c7) > 0:
        validity = np.where(abs_r < abs(c7), 0.5 - c8 * r / c7, validity)
    rs = np.where(np.abs(r) < 1e-15, 1e-15, r)
    scale = 1.0 / rs
    u = p * scale
    v = n * scale
    s2 = scale * scale
    jac = ((r * c0 - p * c6) * s2, (r * c1 - p * c7) * s2,
           (r * c3 - n * c6) * s2, (r * c4 - n * c7) * s2)
    if sampler == "ewa":
        out = sample_ewa_reference_var(img, u - 0.5, v - 0.5, jac, background, vp)
    else:
        # -filter point / interpolated resampling: plain warp, no EWA
        out = warp(img, jnp.asarray(u - 0.5, img.dtype),
                   jnp.asarray(v - 0.5, img.dtype), background, sampler,
                   vp=vp)
    if np.all(validity >= 1.0):
        return out
    return _blend_invalid(out, validity, img.shape[-1], img.dtype)


def _polar_family(img: jnp.ndarray, method: str, args: Sequence[float],
                  background: Optional[Sequence[float]],
                  bestfit: bool = False, vp: str = "edge") -> jnp.ndarray:
    """Arc/Polar/DePolar/Barrel/Cylinder distorts, reference-exact.

    Coefficient generation mirrors distort.c GenerateCoefficients
    (Arc distort.c:1177, Polar/DePolar :1250, Cylinder :1342, Barrel
    :1391); per-pixel evaluation and ScaleFilter Jacobians mirror the
    DistortImage mapping switch (distort.c:2655-2817).  All map math runs
    host-side in f64 (it depends only on geometry, not pixels); sampling
    is the per-pixel-Jacobian EWA scan on device.  Arc always computes a
    best-fit output canvas (distort.c:1822); the other methods keep the
    input size under plain -distort.
    """
    h, w = img.shape[-3], img.shape[-2]
    a = list(args)
    na = len(a)
    two_pi = 2.0 * math.pi

    def grid(oh, ow, gx=0.0, gy=0.0):
        jj, ii = np.mgrid[0:oh, 0:ow].astype(np.float64)
        return gx + ii + 0.5, gy + jj + 0.5   # d.x, d.y (distort.c:2531)

    if method == "arc":
        if na >= 1 and a[0] < 1e-10:
            raise ValueError("Arc Angle Too Small")
        if na >= 3 and a[2] < 1e-10:
            raise ValueError("Outer Radius Too Small")
        c0 = -math.pi / 2.0
        c1 = math.radians(a[0]) if na >= 1 else math.pi / 2.0
        if na >= 2:
            c0 += math.radians(a[1])
        c0 /= two_pi
        c0 -= _round_half_even(c0)
        c0 *= two_pi
        c3 = float(h - 1)
        c2 = w / c1 + c3 / 2.0
        if na >= 3:
            if na >= 4:
                c3 = a[2] - a[3]
            else:
                c3 *= a[2] / c2
            c2 = a[2]
        c4 = (w - 1.0) / 2.0
        # best-fit bbox: arc corners + orthogonal extremes (distort.c:1913)
        pts = []
        for ang in (c0 - c1 / 2.0, c0 + c1 / 2.0):
            ca, sa = math.cos(ang), math.sin(ang)
            pts += [(c2 * ca, c2 * sa), ((c2 - c3) * ca, (c2 - c3) * sa)]
        ang = math.ceil((c0 - c1 / 2.0) / (math.pi / 2)) * (math.pi / 2)
        while ang < c0 + c1 / 2.0:
            pts.append((c2 * math.cos(ang), c2 * math.sin(ang)))
            ang += math.pi / 2
        minx = min(p[0] for p in pts); maxx = max(p[0] for p in pts)
        miny = min(p[1] for p in pts); maxy = max(p[1] for p in pts)
        gx = math.floor(minx - 0.5); gy = math.floor(miny - 0.5)
        ow = int(math.ceil(maxx - gx + 0.5)); oh = int(math.ceil(maxy - gy + 0.5))
        c1s = two_pi * w / c1       # angle->column scale (distort.c:1943)
        c3s = h / c3                # radius->row scale
        dx, dy = grid(oh, ow, gx, gy)
        sx = (np.arctan2(dy, dx) - c0) / two_pi
        sx -= _round_half_away_np(sx)
        r = np.hypot(dx, dy)
        jux = np.where(r > 1e-10, c1s / (two_pi * np.maximum(r, 1e-10)),
                       float(ow) * 2.0)
        jac = (jux, np.zeros_like(jux), np.zeros_like(jux),
               np.full_like(jux, c3s))
        u = sx * c1s + c4 + 0.5
        v = (c2 - r) * c3s
        return sample_ewa_reference_var(img, u - 0.5, v - 0.5, jac,
                                        background, vp)

    if method in ("polar", "depolar"):
        if na == 3 or (na > 6 and method == "polar") or na > 8:
            raise ValueError("invalid number of Polar arguments")
        c0 = a[0] if na >= 1 else 0.0
        c1 = a[1] if na >= 2 else 0.0
        if na >= 4:
            c2, c3 = a[2], a[3]
        else:
            c2, c3 = w / 2.0, h / 2.0
        c4 = math.radians(a[4]) if na >= 5 else -math.pi
        c5 = math.radians(a[5]) if na >= 6 else c4
        if abs(c4 - c5) < 1e-10:
            c5 += two_pi
        if c0 < 1e-10:
            if abs(c0) < 1e-10:       # radius 0: closest edge
                c0 = min(abs(c2), abs(c3), abs(c2 - w), abs(c3 - h))
            if abs(-1.0 - c0) < 1e-10:  # radius -1: furthest corner
                c0 = math.sqrt(max(
                    c2 * c2 + c3 * c3, c2 * c2 + (c3 - h) ** 2,
                    (c2 - w) ** 2 + c3 * c3, (c2 - w) ** 2 + (c3 - h) ** 2))
        if c0 < 1e-10 or c1 < -1e-10 or (c0 - c1) < 1e-10:
            raise ValueError("Invalid Radius")
        if method == "polar":
            c6 = w / (c5 - c4)
            c7 = h / (c0 - c1)
            if bestfit:
                # +distort Polar: viewport spans center±Rmax; an implicit
                # center is treated as the origin (distort.c:1947-1956)
                if na < 2:
                    c2 = c3 = 0.0
                gx, gy, ow, oh = _bestfit_geometry(
                    [(c2 - c0, c3 - c0), (c2 + c0, c3 + c0)])
                dx, dy = grid(oh, ow, gx, gy)
            else:
                dx, dy = grid(h, w)
            dx = dx - c2
            dy = dy - c3
            sx = np.arctan2(dx, dy) - (c4 + c5) / 2.0   # 0 is downward
            sx /= two_pi
            sx -= _round_half_away_np(sx)
            sx *= two_pi
            r = np.hypot(dx, dy)
            out_w = dx.shape[1]
            jux = np.where(r > 1e-10, c6 / (two_pi * np.maximum(r, 1e-10)),
                           float(out_w) * 2.0)
            jac = (jux, np.zeros_like(jux), np.zeros_like(jux),
                   np.full_like(jux, c7))
            u = sx * c6 + w / 2.0
            v = (r - c1) * c7
            return sample_ewa_reference_var(img, u - 0.5, v - 0.5, jac,
                                            background, vp)
        # depolar: direct polar->cartesian lookup; the reference never
        # rescales the resample filter here, so every pixel samples with
        # the default UNIT-circle EWA set at filter init (distort.c:2705,
        # resample.c:1316 ScaleResampleFilter(...,1,0,0,1))
        if bestfit:
            # +distort DePolar: exact tileable size (distort.c:1959)
            oh = int(math.ceil(c0 - c1))
            ow = int(math.ceil((c0 - c1) * (c5 - c4) * 0.5))
            c6 = (c5 - c4) / max(ow, 1)
            c7 = (c0 - c1) / max(oh, 1)
            dx, dy = grid(oh, ow)
        else:
            c6 = (c5 - c4) / w
            c7 = (c0 - c1) / h
            dx, dy = grid(h, w)
        ang = dx * c6 + c4
        rad = dy * c7 + c1
        u = rad * np.sin(ang) + c2
        v = rad * np.cos(ang) + c3
        one = np.ones_like(u)
        zero = np.zeros_like(u)
        return sample_ewa_reference_var(img, u - 0.5, v - 0.5,
                                        (one, zero, zero, one), background, vp)

    if method in ("barrel", "barrelinverse"):
        if na < 3 or na in (7, 9) or na > 10:
            raise ValueError("invalid number of Barrel arguments")
        rscale = 2.0 / min(w, h)
        cA, cB, cC = a[0], a[1], a[2]
        cD = 1.0 - cA - cB - cC if na in (3, 5) else a[3]
        cA *= rscale ** 3; cB *= rscale * rscale; cC *= rscale
        if na >= 8:
            yA, yB, yC, yD = (a[4] * rscale ** 3, a[5] * rscale * rscale,
                              a[6] * rscale, a[7])
        else:
            yA, yB, yC, yD = cA, cB, cC, cD
        if na == 5:
            cx_, cy_ = a[3], a[4]
        elif na == 6:
            cx_, cy_ = a[4], a[5]
        elif na == 10:
            cx_, cy_ = a[8], a[9]
        else:
            cx_, cy_ = w / 2.0, h / 2.0
        dx, dy = grid(h, w)
        dx = dx - cx_
        dy = dy - cy_
        r = np.hypot(dx, dy)
        rs = np.maximum(r, 1e-10)
        fx = ((cA * rs + cB) * rs + cC) * rs + cD
        fy = ((yA * rs + yB) * rs + yC) * rs + yD
        gx = ((3 * cA * rs + 2 * cB) * rs + cC) / rs
        gy = ((3 * yA * rs + 2 * yB) * rs + yC) / rs
        if method == "barrelinverse":
            fx = 1.0 / fx
            fy = 1.0 / fy
            gx = -gx * fx * fx
            gy = -gy * fy * fy
        u = np.where(r > 1e-10, dx * fx + cx_, dx + cx_)
        v = np.where(r > 1e-10, dy * fy + cy_, dy + cy_)
        ctr_x = cD if method == "barrel" else 1.0 / cD
        ctr_y = yD if method == "barrel" else 1.0 / yD
        jac = (np.where(r > 1e-10, gx * dx * dx + fx, ctr_x),
               np.where(r > 1e-10, gx * dx * dy, 0.0),
               np.where(r > 1e-10, gy * dx * dy, 0.0),
               np.where(r > 1e-10, gy * dy * dy + fy, ctr_y))
        return sample_ewa_reference_var(img, u - 0.5, v - 0.5, jac,
                                        background, vp)

    # cylinder2plane / plane2cylinder (distort.c:1342, :2715-2770)
    fov = math.radians(a[0]) if a else math.radians(90.0)
    if fov < 1e-10 or fov > math.radians(160.0):
        raise ValueError("Invalid FOV Angle")
    if method == "cylinder2plane":
        radius = w / fov
    else:
        radius = w / (2.0 * math.tan(fov / 2.0))
    c2, c3 = w / 2.0, h / 2.0   # input center
    if bestfit:
        # direct reversible viewport + recentered distortion (distort.c:1977)
        if method == "cylinder2plane":
            ow = int(math.ceil(2.0 * radius * math.tan(fov / 2.0)))
            oh = int(math.ceil(2.0 * c3 / math.cos(fov / 2.0)))
        else:
            ow = int(math.ceil(fov * radius))
            oh = int(2 * c3)
        c4, c5 = ow / 2.0, oh / 2.0
        dx, dy = grid(oh, ow)
    else:
        c4, c5 = c2, c3         # dest center = input center
        dx, dy = grid(h, w)
    dx = dx - c4
    dy = dy - c5
    if method == "cylinder2plane":
        dxr = dx / radius
        ax = np.arctan(dxr)
        cxs = np.cos(ax)
        sy = dy * cxs
        u = radius * ax + c2
        v = sy + c3
        # s.y/d.y == cos(ax) analytically; the literal division is 0/0 at
        # the exact center row (odd heights) — use the limit value
        jac = (1.0 / (1.0 + dxr * dxr), np.zeros_like(dx),
               -dxr * sy * cxs * cxs / radius,
               np.where(np.abs(dy) < 1e-10, cxs, sy /
                        np.where(np.abs(dy) < 1e-10, 1.0, dy)))
        return sample_ewa_reference_var(img, u - 0.5, v - 0.5, jac,
                                        background, vp)
    # plane2cylinder with horizon validity blend (distort.c:2746)
    validity = (radius * math.pi / 2.0 - np.abs(dx)) / 1.0 + 0.5
    dxr = dx / radius
    cos_r = np.cos(dxr)
    cxs = 1.0 / np.where(np.abs(cos_r) < 1e-12, 1e-12, cos_r)
    u = radius * np.tan(dxr) + c2
    v = dy * cxs + c3
    jac = (cxs * cxs, np.zeros_like(dx),
           dy * cxs * cxs / radius, cxs)
    out = sample_ewa_reference_var(img, u - 0.5, v - 0.5, jac, background, vp)
    return _blend_invalid(out, validity, img.shape[-1], img.dtype)


def _round_half_even(x: float) -> float:
    """MagickRound rounds half away from zero (magick-type.h)."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _round_half_away_np(x):
    """Vectorized MagickRound: half rounds away from zero (not to even)."""
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


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

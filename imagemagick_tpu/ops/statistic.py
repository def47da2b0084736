"""Statistics, evaluate/function ops, windowed rank filters (statistic.c).

Re-implements /root/reference/MagickCore/statistic.c (3,159 LoC):
  * GetImageStatistics — per-channel min/max/mean/σ/skewness/kurtosis/entropy
  * GetImageMoments — Hu invariant moments + ellipse params
  * GetImagePerceptualHash — phash over the Hu moments in two colorspaces
  * EvaluateImage — 30+ scalar ops applied per pixel
  * FunctionImage — polynomial/sinusoid/arcsin/arctan
  * StatisticImage (:2918) — windowed min/max/mean/median/mode/gradient/
    nonpeak/rms/stddev rank filters

Reductions are single fused jnp programs; rank filters unroll the (static)
window into shifted views — VPU-friendly and fusable, replacing the
reference's per-pixel neighborhood lists.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.virtual_pixel import pad_spatial


# ---------------------------------------------------------------------------
# Global statistics
# ---------------------------------------------------------------------------

def get_statistics(img: jnp.ndarray, bins: int = 1024) -> Dict[str, jnp.ndarray]:
    """GetImageStatistics: per-channel stats dict (statistic.c)."""
    axes = tuple(range(img.ndim - 1))
    mean = jnp.mean(img, axis=axes)
    mn = jnp.min(img, axis=axes)
    mx = jnp.max(img, axis=axes)
    centered = img - mean
    var = jnp.mean(centered ** 2, axis=axes)
    std = jnp.sqrt(var)
    safe = jnp.where(std < 1e-12, 1.0, std)
    # constant channels report 0 skewness/kurtosis (statistic.c:2581
    # guards the standard_deviation==0 division; oracle prints 0, not -3)
    skew = jnp.where(std < 1e-12, 0.0,
                     jnp.mean(centered ** 3, axis=axes) / safe ** 3)
    kurt = jnp.where(std < 1e-12, 0.0,
                     jnp.mean(centered ** 4, axis=axes) / safe ** 4 - 3.0)
    # entropy (statistic.c:2248-2266): per-channel histogram over
    # MaxMap+1 = 65536 quantum bins, normalized by log(count of NONZERO
    # bins) for that channel — not by log(total bins).
    ents = []
    n = img[..., 0].size
    for c in range(img.shape[-1]):
        from .histogram import _histogram_fixed

        hist = _histogram_fixed(img[..., c], 65536)  # MXU path, no scatter
        p = hist / n
        nbins = jnp.sum((hist > 0).astype(jnp.float32))
        log_nbins = jnp.log(jnp.maximum(nbins, 1.0))
        ents.append(-jnp.sum(jnp.where(p > 0,
                                       p * jnp.log(jnp.maximum(p, 1e-30)),
                                       0.0))
                    / jnp.maximum(log_nbins, 1e-30))
    return {
        "min": mn, "max": mx, "mean": mean, "std": std,
        "variance": var, "skewness": skew, "kurtosis": kurt,
        "entropy": jnp.stack(ents),
        "sum": jnp.sum(img, axis=axes),
    }


def get_moments(img: jnp.ndarray, xp=jnp) -> Dict[str, jnp.ndarray]:
    """GetImageMoments: centroid, ellipse params, Hu invariants I1..I8.

    Pass ``xp=numpy`` (with a host ndarray) for float64 moments — the
    reference accumulates in double, and the higher invariants lose
    ~2 decimals in f32 (visible in perceptual-hash distortions)."""
    h, w = img.shape[-3], img.shape[-2]
    ftype = jnp.float32 if xp is jnp else np.float64
    yy = xp.arange(h, dtype=ftype)[:, None, None]
    xx = xp.arange(w, dtype=ftype)[None, :, None]
    m00 = xp.sum(img, axis=(-3, -2))
    safe = xp.where(m00 < 1e-12, 1.0, m00)
    cx = xp.sum(img * xx, axis=(-3, -2)) / safe
    cy = xp.sum(img * yy, axis=(-3, -2)) / safe

    def mu(p, q):
        dx = xx - cx[..., None, None, :] if cx.ndim > 1 else xx - cx
        dy = yy - cy[..., None, None, :] if cy.ndim > 1 else yy - cy
        return xp.sum(img * dx ** p * dy ** q, axis=(-3, -2))

    mu00 = m00
    n = lambda p, q: mu(p, q) / xp.power(safe, (p + q) / 2.0 + 1.0)
    n20, n02, n11 = n(2, 0), n(0, 2), n(1, 1)
    n30, n03, n21, n12 = n(3, 0), n(0, 3), n(2, 1), n(1, 2)
    i1 = n20 + n02
    i2 = (n20 - n02) ** 2 + 4 * n11 ** 2
    i3 = (n30 - 3 * n12) ** 2 + (3 * n21 - n03) ** 2
    i4 = (n30 + n12) ** 2 + (n21 + n03) ** 2
    i5 = ((n30 - 3 * n12) * (n30 + n12) *
          ((n30 + n12) ** 2 - 3 * (n21 + n03) ** 2) +
          (3 * n21 - n03) * (n21 + n03) *
          (3 * (n30 + n12) ** 2 - (n21 + n03) ** 2))
    i6 = ((n20 - n02) * ((n30 + n12) ** 2 - (n21 + n03) ** 2) +
          4 * n11 * (n30 + n12) * (n21 + n03))
    i7 = ((3 * n21 - n03) * (n30 + n12) *
          ((n30 + n12) ** 2 - 3 * (n21 + n03) ** 2) -
          (n30 - 3 * n12) * (n21 + n03) *
          (3 * (n30 + n12) ** 2 - (n21 + n03) ** 2))
    i8 = (n11 * ((n30 + n12) ** 2 - (n03 + n21) ** 2) -
          (n20 - n02) * (n30 + n12) * (n03 + n21))
    return {
        "centroid": (cx, cy),
        "invariants": xp.stack([i1, i2, i3, i4, i5, i6, i7, i8]),
        "m00": m00,
    }


def perceptual_hash(img: jnp.ndarray) -> jnp.ndarray:
    """GetImagePerceptualHash (statistic.c:1745): per colorspace in
    {xyY, HSB}, BlurImage(sigma=1) -> colorspace transform -> Hu
    invariants per channel -> -MagickLog10 = -log10(max(|I|, 1e-12))."""
    rgb = np.asarray(img[..., :3], np.float64)
    out = _phash_host(rgb)
    return jnp.asarray(out)  # (2, 8, C)


def _phash_host(rgb: np.ndarray) -> np.ndarray:
    """Float64 host pipeline for the perceptual hash: rank-3 gaussian
    blur (sigma 1, edge virtual pixels) -> xyY / HSB -> Hu moments.
    The reference runs this whole chain in doubles; in f32 the
    higher-order HSB invariants (hue is chaotic on near-gray pixels)
    lose enough precision to triple the PHASH compare distortion."""
    from .blur import gaussian_kernel_1d

    k = gaussian_kernel_1d(0.0, 1.0).astype(np.float64)
    k /= k.sum()
    w = len(k) // 2
    x = np.pad(rgb, [(w, w), (0, 0), (0, 0)], mode="edge")
    x = np.einsum("t,thwc->hwc", k,
                  np.stack([x[i:i + rgb.shape[0]] for i in range(len(k))]))
    x = np.pad(x, [(0, 0), (w, w), (0, 0)], mode="edge")
    x = np.einsum("t,htwc->hwc", k,
                  np.stack([x[:, i:i + rgb.shape[1]] for i in range(len(k))],
                           axis=1))
    r, g, b = x[..., 0], x[..., 1], x[..., 2]

    def prec(v):
        s = np.where(v < 0, -1.0, 1.0)
        return s / np.maximum(np.abs(v), 1e-12)

    # xyY (colorspace.c xyYColorspace: sRGB decompand -> XYZ -> chromaticity)
    lin = np.where(x <= 0.0404482362771076, x / 12.92,
                   ((x + 0.055) / 1.055) ** 2.4)
    m = np.array([[0.4123955889674142161, 0.3575834307637148171,
                   0.1804926473817015735],
                  [0.2125862307855955516, 0.7151703037034108499,
                   0.07220049864333622685],
                  [0.01929721549174694484, 0.1191838645808485318,
                   0.9504971251315797660]])
    xyz = lin @ m.T
    s = prec(xyz.sum(-1))
    xyy = np.stack([s * xyz[..., 0], s * xyz[..., 1], xyz[..., 1]], -1)
    # HSB (gem.c ConvertRGBToHSB semantics, mirrored from ops.colorspace)
    mx = x.max(-1)
    c = mx - x.min(-1)
    cr = prec(c)
    h = np.where(mx == r, (g - b) * cr % 6.0,
                 np.where(mx == g, (b - r) * cr + 2.0, (r - g) * cr + 4.0))
    h = np.where(c <= 0.0, 0.0, h / 6.0)
    sat = np.where(c <= 0.0, 0.0, c * prec(mx))
    hsb = np.stack([h, sat, mx], -1)
    out = []
    for conv in (xyy, hsb):
        mom = get_moments(conv, xp=np)["invariants"]  # (8, C) f64
        out.append(-np.log10(np.maximum(np.abs(mom), 1e-12)))
    return np.stack(out)


def phash_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    ha, hb = perceptual_hash(a), perceptual_hash(b)
    return jnp.sum((ha - hb) ** 2)


# ---------------------------------------------------------------------------
# EvaluateImage / FunctionImage
# ---------------------------------------------------------------------------

def evaluate(img: jnp.ndarray, operator: str, value: float = 0.0,
             key=None) -> jnp.ndarray:
    """EvaluateImage (statistic.c:255-447 ApplyEvaluateOperator).

    The reference evaluates in quantum units (Q16: 0..65535) with the
    operator constant parsed by StringToDoubleInterval(QuantumRange+1) —
    raw numbers are quantum counts, percents are fractions of 65536.
    ``value`` IS that quantum-domain constant (the MagickEvaluateImage C
    signature); pixels stay normalized here, so additive constants are
    divided by QuantumRange while scale-like uses stay raw.  HDRI means
    no post-op clamp (statistic.c:918 ClampToQuantum is identity).
    """
    op = operator.lower().replace("-", "").replace("_", "")
    QR = 65535.0
    vq = float(value)    # reference quantum-domain constant
    v = vq / QR          # normalized equivalent
    if op == "abs":
        return jnp.abs(img + v)
    if op in ("add", "sum"):
        return img + v
    if op == "addmodulus":
        # floored modulus over QuantumRange+1 (statistic.c:264)
        r = img * QR + vq
        r = r - 65536.0 * jnp.floor(r / 65536.0)
        return r / QR
    if op in ("and", "or", "xor"):
        # (ssize_t)pixel OP (ssize_t)(value+0.5) in quantum units
        p = jnp.trunc(img * QR).astype(jnp.int32)
        c = int(vq + 0.5)
        q = (p & c) if op == "and" else (p | c) if op == "or" else (p ^ c)
        return q.astype(img.dtype) / QR
    if op == "cosine" or op == "cos":
        return 0.5 + 0.5 * jnp.cos(2.0 * math.pi * img * vq)
    if op == "divide":
        return img / (vq if vq != 0 else 1.0)
    if op == "exponential" or op == "exp":
        # QuantumRange*exp(value*QuantumScale*pixel) (statistic.c:293)
        return jnp.exp(vq * img)
    if op == "gaussiannoise":
        return img + vq * 0.1 * jax.random.normal(key or jax.random.PRNGKey(0), img.shape)
    if op == "impulsenoise":
        k = key or jax.random.PRNGKey(0)
        u = jax.random.uniform(k, img.shape)
        salt = u > 1.0 - 0.5 * vq * 0.05
        pepper = u < 0.5 * vq * 0.05
        return jnp.where(salt, 1.0, jnp.where(pepper, 0.0, img))
    if op == "uniformnoise":
        return img + vq * 0.1 * (jax.random.uniform(key or jax.random.PRNGKey(0), img.shape) - 0.5)
    if op == "laplaciannoise":
        k = key or jax.random.PRNGKey(0)
        u = jax.random.uniform(k, img.shape, minval=-0.5, maxval=0.5)
        return img + vq * 0.1 * (-jnp.sign(u) * jnp.log(1.0 - 2.0 * jnp.abs(u)) / 2.0)
    if op == "poissonnoise":
        k = key or jax.random.PRNGKey(0)
        lam = jnp.maximum(img * 50.0 * max(vq, 1e-3), 1e-6)
        return jax.random.poisson(k, lam).astype(img.dtype) / (50.0 * max(vq, 1e-3))
    if op == "multiplicativenoise":
        k = key or jax.random.PRNGKey(0)
        return img * (1.0 + vq * 0.1 * jax.random.normal(k, img.shape))
    if op == "leftshift":
        return img * (2.0 ** int(vq))
    if op == "rightshift":
        return img / (2.0 ** int(vq))
    if op == "log":
        # QR*log(QuantumScale*value*pixel+1)/log(value+1), gated on
        # pixel >= MagickEpsilon (statistic.c:329); below the gate the
        # pixel is left unchanged
        if vq <= -1.0 or vq == 0.0:
            return img
        r = jnp.log(vq * img + 1.0) / math.log(vq + 1.0)
        return jnp.where(img >= 1e-12, r, 0.0)  # result init 0 (:249)
    if op == "max":
        return jnp.maximum(img, v)
    if op == "min":
        return jnp.minimum(img, v)
    if op == "mean":
        # single-image form: (pixel+value)/2 (statistic.c:917-918)
        return (img + v) / 2.0
    if op == "median":
        return img + v
    if op == "multiply":
        return img * vq
    if op == "pow":
        # sign-preserving for negative HDRI pixels with fractional
        # exponents (statistic.c:376-384)
        if abs(vq) <= 1e-12:
            return jnp.zeros_like(img)  # early break leaves result=0
        mag = jnp.power(jnp.abs(img), vq)
        if abs(vq - round(vq)) > 1e-12:
            return jnp.where(img < 0.0, -mag, mag)
        sgn = -1.0 if int(round(vq)) % 2 else 1.0
        return jnp.where(img < 0.0, sgn * mag, mag)
    if op in ("rootmeansquare", "rms"):
        # literally pixel^2+value in quantum units (statistic.c:396) —
        # saturates to white for all but near-black pixels
        p = img * QR
        return (p * p + vq) / QR
    if op == "sine" or op == "sin":
        return 0.5 + 0.5 * jnp.sin(2.0 * math.pi * img * vq)
    if op == "subtract":
        return img - v
    if op == "set":
        return jnp.full_like(img, v)
    if op == "thresholdblack":
        return jnp.where(img <= v, 0.0, img)
    if op == "thresholdwhite":
        return jnp.where(img > v, 1.0, img)
    if op == "threshold":
        return (img > v).astype(img.dtype)
    if op == "inverselog":
        # QR*pow(value+1, QuantumScale*pixel-1)*PerceptibleReciprocal(value)
        # (statistic.c:310)
        recip = (1.0 / vq if abs(vq) >= 1e-12
                 else (1e12 if vq >= 0 else -1e12))
        return jnp.power(vq + 1.0, img - 1.0) * recip
    raise ValueError(f"unknown evaluate operator {operator!r}")


def evaluate_images(imgs: jnp.ndarray, operator: str) -> jnp.ndarray:
    """EvaluateImages: reduce an (N, H, W, C) stack (statistic.c)."""
    op = operator.lower()
    if op == "mean":
        return jnp.mean(imgs, axis=0)
    if op == "max":
        return jnp.max(imgs, axis=0)
    if op == "min":
        return jnp.min(imgs, axis=0)
    if op == "sum" or op == "add":
        return jnp.sum(imgs, axis=0)
    if op == "median":
        return jnp.median(imgs, axis=0)
    if op == "multiply":
        return jnp.prod(imgs, axis=0)
    if op == "and":
        q = (imgs * 65535).astype(jnp.int32)
        out = q[0]
        for i in range(1, q.shape[0]):
            out = out & q[i]
        return out.astype(imgs.dtype) / 65535.0
    if op == "or":
        q = (imgs * 65535).astype(jnp.int32)
        out = q[0]
        for i in range(1, q.shape[0]):
            out = out | q[i]
        return out.astype(imgs.dtype) / 65535.0
    if op == "xor":
        q = (imgs * 65535).astype(jnp.int32)
        out = q[0]
        for i in range(1, q.shape[0]):
            out = out ^ q[i]
        return out.astype(imgs.dtype) / 65535.0
    if op == "rms":
        return jnp.sqrt(jnp.mean(imgs ** 2, axis=0))
    raise ValueError(f"unknown evaluate-sequence operator {operator!r}")


def function(img: jnp.ndarray, func: str, params: Sequence[float]) -> jnp.ndarray:
    """FunctionImage (statistic.c FunctionOptions)."""
    f = func.lower()
    p = list(params)
    if f == "polynomial":
        out = jnp.zeros_like(img)
        n = len(p)
        for i, coeff in enumerate(p):
            out = out + coeff * jnp.power(img, n - 1 - i)
        return out
    if f == "sinusoid":
        freq = p[0] if len(p) > 0 else 1.0
        phase = p[1] if len(p) > 1 else 0.0
        amp = p[2] if len(p) > 2 else 0.5
        bias = p[3] if len(p) > 3 else 0.5
        return amp * jnp.sin(2.0 * math.pi * (freq * img + phase / 360.0)) + bias
    if f == "arcsin":
        width = p[0] if len(p) > 0 else 1.0
        center = p[1] if len(p) > 1 else 0.5
        rng = p[2] if len(p) > 2 else 1.0
        bias = p[3] if len(p) > 3 else 0.5
        arg = jnp.clip(2.0 / width * (img - center), -1.0, 1.0)
        return rng / math.pi * jnp.arcsin(arg) + bias
    if f == "arctan":
        slope = p[0] if len(p) > 0 else 1.0
        center = p[1] if len(p) > 1 else 0.5
        rng = p[2] if len(p) > 2 else 1.0
        bias = p[3] if len(p) > 3 else 0.5
        # result = range/π · atan(π·slope·(x-center)) + bias (statistic.c)
        return rng / math.pi * jnp.arctan(math.pi * slope * (img - center)) + bias
    raise ValueError(f"unknown function {func!r}")


def polynomial_images(imgs: Sequence[jnp.ndarray],
                      terms: Sequence[Tuple[float, float]]) -> jnp.ndarray:
    """PolynomialImage: sum_i w_i * img_i ^ e_i (statistic.c)."""
    out = None
    for img, (wgt, expo) in zip(imgs, terms):
        term = wgt * jnp.power(img, expo)
        out = term if out is None else out + term
    return jnp.clip(out, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Windowed statistic (rank) filters — StatisticImage (statistic.c:2918)
# ---------------------------------------------------------------------------

def _window_stack(img: jnp.ndarray, width: int, height: int,
                  virtual_pixel: str = "edge") -> jnp.ndarray:
    """Stack all window shifts: returns (k, ..., H, W, C) with k = w*h."""
    rh, rw = height // 2, width // 2
    lead = img.shape[:-3]
    h, w, c = img.shape[-3:]
    x = img.reshape((-1, h, w, c))
    xp = pad_spatial(x, (rh, height - 1 - rh), (rw, width - 1 - rw), virtual_pixel)
    views = []
    for dy in range(height):
        for dx in range(width):
            views.append(lax.dynamic_slice(xp, (0, dy, dx, 0), x.shape))
    return jnp.stack(views, axis=0).reshape((height * width,) + lead + (h, w, c))


def statistic(img: jnp.ndarray, stat: str, width: int = 3, height: int = 3,
              virtual_pixel: str = "edge") -> jnp.ndarray:
    """StatisticImage: windowed rank/statistic filter."""
    s = stat.lower()
    if s == "mean":
        from .blur import _depthwise_conv

        box = np.ones((height, width), np.float32) / float(width * height)
        return _depthwise_conv(img, jnp.asarray(box), virtual_pixel)
    stack = _window_stack(img, width, height, virtual_pixel)
    if s == "minimum" or s == "min":
        return jnp.min(stack, axis=0)
    if s == "maximum" or s == "max":
        return jnp.max(stack, axis=0)
    if s == "median":
        return jnp.median(stack, axis=0)
    if s == "gradient":
        return jnp.max(stack, axis=0) - jnp.min(stack, axis=0)
    if s == "rootmeansquare" or s == "rms":
        return jnp.sqrt(jnp.mean(stack ** 2, axis=0))
    if s == "standarddeviation" or s == "stddev":
        return jnp.std(stack, axis=0)
    if s == "nonpeak":
        srt = jnp.sort(stack, axis=0)
        lo, mid, hi = srt[0], srt[srt.shape[0] // 2], srt[-1]
        center = img
        return jnp.where((center == lo) | (center == hi), mid, center)
    if s == "mode":
        # approximate mode: quantize to 64 levels, pick the densest
        q = jnp.clip((stack * 63 + 0.5).astype(jnp.int32), 0, 63)
        one_hot = jax.nn.one_hot(q, 64, dtype=jnp.float32)
        counts = jnp.sum(one_hot, axis=0)
        return jnp.argmax(counts, axis=-1).astype(img.dtype) / 63.0
    if s == "contrast":
        mx = jnp.max(stack, axis=0)
        mn = jnp.min(stack, axis=0)
        return (mx - mn) / jnp.maximum(mx + mn, 1e-12)
    raise ValueError(f"unknown statistic {stat!r}")


def median_filter(img: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    w = 2 * radius + 1
    return statistic(img, "median", w, w)

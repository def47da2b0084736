"""Blur / sharpen / convolution effects (the effect.c op family).

TPU-native re-implementation of /root/reference/MagickCore/effect.c (4,391
LoC, 14 OpenMP row loops).  Each effect is a pure function over an
(..., H, W, C) float array; neighborhood work lowers to
``lax.conv_general_dilated`` (which XLA maps onto the MXU/VPU with fusion)
after an explicit virtual-pixel pad, replacing the reference's per-row cache
views.

Kernel construction matches the reference:
  * 1-D Gaussian blur kernel + GetOptimalKernelWidth1D
    (/root/reference/MagickCore/gem.c:262-300; BlurImage effect.c:765)
  * 2-D sharpen kernel: negated Gaussian with center = -2*sum, normalized
    (SharpenImage, effect.c:4070-4140)
  * UnsharpMask threshold/gain update (effect.c:4256-4330)
  * Edge/Emboss (effect.c EdgeImage/EmbossImage)
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.virtual_pixel import pad_spatial

_EPSILON = 1.0e-15
_QUANTUM_SCALE = 1.0 / 65535.0  # Q16 QuantumScale; bounds kernel support


def _sigma_safe(sigma: float) -> float:
    return abs(sigma) if abs(sigma) >= _EPSILON else _EPSILON


@lru_cache(maxsize=256)
def optimal_kernel_width_1d(radius: float, sigma: float) -> int:
    """GetOptimalKernelWidth1D (/root/reference/MagickCore/gem.c:262)."""
    if radius > _EPSILON:
        return int(2.0 * math.ceil(radius) + 1.0)
    gamma = abs(sigma)
    if gamma <= _EPSILON:
        return 3
    alpha = 1.0 / (2.0 * gamma * gamma)
    beta = 1.0 / (math.sqrt(2.0 * math.pi) * gamma)
    width = 5
    while True:
        j = (width - 1) // 2
        xs = np.arange(-j, j + 1, dtype=np.float64)
        normalize = float(np.sum(np.exp(-xs * xs * alpha) * beta))
        value = math.exp(-float(j * j) * alpha) * beta / normalize
        if value < _QUANTUM_SCALE or value < _EPSILON:
            break
        width += 2
    return width - 2


@lru_cache(maxsize=256)
def optimal_kernel_width_2d(radius: float, sigma: float) -> int:
    """GetOptimalKernelWidth2D (/root/reference/MagickCore/gem.c:302)."""
    if radius > _EPSILON:
        return int(2.0 * math.ceil(radius) + 1.0)
    gamma = abs(sigma)
    if gamma <= _EPSILON:
        return 3
    alpha = 1.0 / (2.0 * gamma * gamma)
    beta = 1.0 / (2.0 * math.pi * gamma * gamma)
    width = 5
    while True:
        j = (width - 1) // 2
        us = np.arange(-j, j + 1, dtype=np.float64)
        r2 = us[:, None] ** 2 + us[None, :] ** 2
        normalize = float(np.sum(np.exp(-r2 * alpha) * beta))
        value = math.exp(-float(j * j) * alpha) * beta / normalize
        if value < _QUANTUM_SCALE or value < _EPSILON:
            break
        width += 2
    return width - 2


@lru_cache(maxsize=256)
def gaussian_kernel_1d(radius: float, sigma: float) -> np.ndarray:
    """The reference's "blur:" builtin 1-D kernel
    (/root/reference/MagickCore/morphology.c:1140 BlurKernel): the
    Gaussian is evaluated at KernelRank=3 supersampling (sigma*3, 3x the
    taps) and binned into the output taps, then sum-normalized — NOT a
    directly sampled Gaussian.  Width: radius>=1 truncates (2*int(r)+1);
    otherwise GetOptimalKernelWidth1D."""
    if radius >= 1.0:
        width = 2 * int(radius) + 1
    else:
        width = optimal_kernel_width_1d(radius, sigma)
    s = abs(sigma)
    k = np.zeros(width, np.float64)
    if s > 1e-12:
        rank = 3
        v = (width * rank - 1) // 2
        s3 = s * rank
        u = np.arange(-v, v + 1, dtype=np.float64)
        samples = np.exp(-(u * u) / (2.0 * s3 * s3)) / (math.sqrt(2.0 * math.pi) * s3)
        np.add.at(k, ((u + v) // rank).astype(np.int64), samples)
    else:
        k[(width - 1) // 2] = 1.0
    k /= k.sum()
    return k.astype(np.float32)


# ---------------------------------------------------------------------------
# Generic convolution
# ---------------------------------------------------------------------------

def _depthwise_conv(img: jnp.ndarray, kernel: jnp.ndarray,
                    virtual_pixel: str = "edge") -> jnp.ndarray:
    """Depthwise 2-D correlation with virtual-pixel padding.

    img: (..., H, W, C); kernel: (kh, kw) applied to every channel.
    The reference's ConvolveImage flips nothing (MorphologyPrimitive convolve
    correlates with the kernel reflected; ConvolveImage pre-reflects) — we
    apply straight correlation, matching -convolve semantics.
    """
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    lead = img.shape[:-3]
    h, w, c = img.shape[-3:]
    x = img.reshape((-1, h, w, c))
    x = pad_spatial(x, (ph, kh - 1 - ph), (pw, kw - 1 - pw), virtual_pixel)
    import jax as _jax

    static_kernel = not isinstance(kernel, _jax.core.Tracer)
    knp = np.asarray(kernel, np.float64) if static_kernel else None
    if static_kernel and kh * kw <= 49:
        # Small kernels: shift-and-add on the VPU.  TPU depthwise conv
        # (feature_group_count=C) runs off the MXU fast path and measured
        # ~17ms for a 3x3 over 14MP where 9 shifted FMAs take ~1ms.
        # The barrier materializes the padded input once — without it XLA
        # fuses the producer chain into every tap and recomputes it
        # kh*kw times (measured 8x blowup after a morphology chain).
        x = lax.optimization_barrier(x)
        out = None
        for dy in range(kh):
            for dx in range(kw):
                wgt = float(knp[dy, dx])
                if wgt == 0.0:
                    continue
                sl = x[:, dy:dy + h, dx:dx + w, :]
                term = wgt * sl
                out = term if out is None else out + term
        if out is None:
            out = jnp.zeros_like(x[:, :h, :w, :])
        return out.reshape(lead + out.shape[1:])
    k = jnp.asarray(kernel, img.dtype)
    k = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO, depthwise
    out = lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(lead + out.shape[1:])


def _separable_conv(img: jnp.ndarray, k1d: jnp.ndarray,
                    virtual_pixel: str = "edge") -> jnp.ndarray:
    """Two-pass separable depthwise convolution (rows then columns).

    On TPU with edge padding this dispatches to the fused Pallas kernel
    (ops/pallas_kernels.py): both passes VMEM-resident, ~3.7x the XLA conv
    path at 1080p and exactly f32 (XLA's conv defaults to bf16 inputs).
    """
    k = np.asarray(k1d, dtype=np.float32)
    if virtual_pixel == "edge" and len(k) % 2 == 1:
        from . import pallas_kernels as pk

        x4 = img if img.ndim == 4 else img[None] if img.ndim == 3 else None
        if x4 is not None and x4.dtype == jnp.float32:
            out = pk.fused_separable_blur(x4, k)
            if out is not None:
                return out if img.ndim == 4 else out[0]
    out = _depthwise_conv(img, k.reshape(1, -1), virtual_pixel)
    out = _depthwise_conv(out, k.reshape(-1, 1), virtual_pixel)
    return out


def convolve(img: jnp.ndarray, kernel, bias: float = 0.0,
             normalize: bool = False, virtual_pixel: str = "edge") -> jnp.ndarray:
    """ConvolveImage (effect.c): correlate with an arbitrary 2-D kernel."""
    k = np.asarray(kernel, dtype=np.float32)
    if normalize:
        s = k.sum()
        if abs(s) > 1e-12:
            k = k / s
    out = _depthwise_conv(img, k, virtual_pixel) + bias
    return jnp.clip(out, 0.0, 1.0)


# ---------------------------------------------------------------------------
# The effect family
# ---------------------------------------------------------------------------

def blur(img: jnp.ndarray, radius: float = 0.0, sigma: float = 1.0,
         virtual_pixel: str = "edge") -> jnp.ndarray:
    """BlurImage (/root/reference/MagickCore/effect.c:765): separable Gaussian."""
    if abs(sigma) < _EPSILON:
        return img
    k = gaussian_kernel_1d(radius, sigma)
    return jnp.clip(_separable_conv(img, k, virtual_pixel), 0.0, 1.0)


def gaussian_blur(img: jnp.ndarray, radius: float = 0.0, sigma: float = 1.0,
                  virtual_pixel: str = "edge") -> jnp.ndarray:
    """GaussianBlurImage (effect.c:1709).

    The reference builds a full 2-D "gaussian:" kernel; a Gaussian is
    separable so under edge-replicating pads the two-pass form is identical,
    and it is what the TPU wants (two skinny convs instead of a k^2 window).
    """
    if abs(sigma) < _EPSILON:
        return img
    width = optimal_kernel_width_2d(radius, sigma)
    s = _sigma_safe(sigma)
    j = (width - 1) // 2
    xs = np.arange(-j, j + 1, dtype=np.float64)
    k = np.exp(-(xs * xs) / (2.0 * s * s))
    k /= k.sum()
    return jnp.clip(_separable_conv(img, k.astype(np.float32), virtual_pixel), 0.0, 1.0)


@lru_cache(maxsize=128)
def _sharpen_kernel(radius: float, sigma: float) -> np.ndarray:
    """SharpenImage kernel (effect.c:4070-4140): -Gaussian, center=-2*sum."""
    width = optimal_kernel_width_2d(radius, sigma)
    s = _sigma_safe(sigma)
    j = (width - 1) // 2
    us = np.arange(-j, j + 1, dtype=np.float64)
    r2 = us[None, :] ** 2 + us[:, None] ** 2
    k = -np.exp(-r2 / (2.0 * s * s)) / (2.0 * math.pi * s * s)
    total = k.sum()
    k[j, j] = -2.0 * total
    k /= k.sum()
    return k.astype(np.float32)


def sharpen(img: jnp.ndarray, radius: float = 0.0, sigma: float = 1.0,
            virtual_pixel: str = "edge") -> jnp.ndarray:
    """SharpenImage (effect.c:4070)."""
    return jnp.clip(_depthwise_conv(img, jnp.asarray(_sharpen_kernel(radius, sigma)),
                                    virtual_pixel), 0.0, 1.0)


def unsharp_mask(img: jnp.ndarray, radius: float = 0.0, sigma: float = 1.0,
                 gain: float = 1.0, threshold: float = 0.05,
                 virtual_pixel: str = "edge") -> jnp.ndarray:
    """UnsharpMaskImage (effect.c:4256)."""
    blurred = blur(img, radius, sigma, virtual_pixel)
    diff = img - blurred
    out = jnp.where(jnp.abs(2.0 * diff) < threshold, img, img + gain * diff)
    return jnp.clip(out, 0.0, 1.0)


def _adaptive_apply(img: jnp.ndarray, radius: float, sigma: float,
                    virtual_pixel: str, sharp: bool) -> jnp.ndarray:
    """Shared AdaptiveBlur/AdaptiveSharpen machinery (effect.c:118/400).

    edge = AutoLevel(Blur(AutoLevel(EdgeImage(img, radius)))); per pixel
    j = ceil(width*(1 - Rec709luma(edge)) - 0.5) clamped to [0, width]
    and rounded down to even, selecting the (width-j)^2 kernel from a
    stack built at every even truncation; each kernel is normalized by
    its own sum at apply time (gamma=PerceptibleReciprocal(sum k)).
    Blur kernels are Gaussians with the residual 1-sum added to the
    center (effect.c:232); sharpen kernels are negated Gaussians with
    the center REPLACED by -2*sum (effect.c:551)."""
    if abs(sigma) < _EPSILON:
        return img
    width = optimal_kernel_width_2d(radius, sigma)
    # The reference build is HDRI: ClampToQuantum is a no-op cast
    # (quantum.h:86), so the edge image carries NEGATIVE convolution
    # values into AutoLevelImage — the stretch minimum is negative and
    # every channel shifts.  No clipping anywhere in this pipeline.
    ewidth = optimal_kernel_width_1d(radius, 0.5)
    ek = -np.ones((ewidth, ewidth), np.float32)
    ek[(ewidth - 1) // 2, (ewidth - 1) // 2] = float(ewidth * ewidth) - 1.0
    edge = _depthwise_conv(img, jnp.asarray(ek), virtual_pixel)

    def _auto_level(x):
        lo, hi = jnp.min(x), jnp.max(x)
        return (x - lo) / jnp.maximum(hi - lo, 1e-30)

    edge = _auto_level(edge)
    edge = _separable_conv(edge, gaussian_kernel_1d(radius, sigma),
                           virtual_pixel)
    edge = _auto_level(edge)
    i = (0.212656 * edge[..., 0] + 0.715158 * edge[..., 1] +
         0.072186 * edge[..., 2]) if edge.shape[-1] >= 3 else edge[..., 0]
    j = jnp.ceil(width * (1.0 - i) - 0.5).astype(jnp.int32)
    j = jnp.clip(j, 0, width)
    j = j - (j & 1)                       # round down to even
    level = j // 2                        # kernel stack index
    s = _sigma_safe(sigma)
    stack = []
    for w in range(0, width, 2):
        n = width - w
        half = (n - 1) // 2
        u = np.arange(-half, half + 1, dtype=np.float64)
        g = np.exp(-(u[:, None] ** 2 + u[None, :] ** 2) / (2.0 * s * s)) \
            / (2.0 * np.pi * s * s)
        if sharp:
            k = -g
            k[half, half] = -2.0 * k.sum()
        else:
            k = g.copy()
            k[half, half] += 1.0 - k.sum()
        ksum = k.sum()
        gamma = 1.0 / ksum if abs(ksum) >= _EPSILON else 1.0
        out = _depthwise_conv(img, jnp.asarray(gamma * k, jnp.float32),
                              virtual_pixel)
        stack.append(out)
    stacked = jnp.stack(stack, axis=0)
    out = jnp.take_along_axis(
        stacked, level[None, ..., None].astype(jnp.int32), axis=0)[0]
    return out


def adaptive_blur(img: jnp.ndarray, radius: float = 0.0, sigma: float = 1.0,
                  virtual_pixel: str = "edge") -> jnp.ndarray:
    """AdaptiveBlurImage (effect.c:118): per-pixel kernel width selected
    by the (auto-leveled, blurred) edge intensity — edges get the widest
    Gaussian, flat regions the 1x1 identity."""
    return _adaptive_apply(img, radius, sigma, virtual_pixel, sharp=False)


def adaptive_sharpen(img: jnp.ndarray, radius: float = 0.0, sigma: float = 1.0,
                     virtual_pixel: str = "edge") -> jnp.ndarray:
    """AdaptiveSharpenImage (effect.c:400): same selection machinery with
    negated-Gaussian (unsharp) kernels."""
    return _adaptive_apply(img, radius, sigma, virtual_pixel, sharp=True)


def edge_image(img: jnp.ndarray, radius: float = 0.0,
               virtual_pixel: str = "edge") -> jnp.ndarray:
    """EdgeImage (effect.c): convolve with flat -1 kernel, center = w*h-1."""
    width = optimal_kernel_width_1d(radius, 0.5)
    k = -np.ones((width, width), dtype=np.float32)
    k[(width - 1) // 2, (width - 1) // 2] = float(width * width) - 1.0
    return jnp.clip(_depthwise_conv(img, jnp.asarray(k), virtual_pixel), 0.0, 1.0)


def emboss(img: jnp.ndarray, radius: float = 0.0, sigma: float = 1.0,
           virtual_pixel: str = "edge") -> jnp.ndarray:
    """EmbossImage (effect.c): anti-diagonal signed-Gaussian convolution
    followed by histogram equalization.

    The reference's kernel zeroes everything off the u == -v diagonal
    (the `if (u != k)` walk), keeps +8g at the center and -8g along the
    rest of the diagonal, normalizes by the kernel sum, convolves, and
    then runs EqualizeImage — verified against the built reference
    binary (oracle test)."""
    width = optimal_kernel_width_1d(radius, sigma)
    s = _sigma_safe(sigma)
    j = (width - 1) // 2
    k = np.zeros((width, width), dtype=np.float64)
    for v in range(-j, j + 1):
        u = -v
        g = math.exp(-(u * u + v * v) / (2.0 * s * s)) / \
            (2.0 * math.pi * s * s)
        k[v + j, u + j] = (-8.0 if (u < 0 or v < 0) else 8.0) * g
    total = k.sum()
    if abs(total) > 1e-15:
        k /= total
    out = _depthwise_conv(img, jnp.asarray(k.astype(np.float32)),
                          virtual_pixel)
    # HDRI: ConvolveImage writes unclamped (quantum.h:86 ClampToQuantum
    # is a cast); EqualizeImage bins the UNCLAMPED intensity through
    # ScaleQuantumToMap's index clamp — so negatives must reach equalize
    from .enhance import equalize

    return equalize(out)


def motion_blur(img: jnp.ndarray, radius: float = 0.0, sigma: float = 1.0,
                angle: float = 0.0, virtual_pixel: str = "edge") -> jnp.ndarray:
    """MotionBlurImage (effect.c:2100 region): 1-sided Gaussian streak.

    kernel[i] = exp(-i²/(2σ²))/(sqrt(2π)σ) along direction `angle`,
    sampled at unit steps from the pixel outward.
    """
    width = optimal_kernel_width_1d(radius, sigma)
    s = _sigma_safe(sigma)
    xs = np.arange(width, dtype=np.float64)
    k = np.exp(-(xs * xs) / (2.0 * s * s)) / (math.sqrt(2.0 * math.pi) * s)
    k /= k.sum()
    theta = math.radians(angle)
    dx, dy = math.cos(theta), math.sin(theta)
    # Build a sparse 2-D kernel holding the streak (offsets rounded to grid).
    offs = [(int(round(i * dy)), int(round(i * dx))) for i in range(width)]
    max_y = max(abs(o[0]) for o in offs)
    max_x = max(abs(o[1]) for o in offs)
    kh, kw = 2 * max_y + 1, 2 * max_x + 1
    k2 = np.zeros((kh, kw), dtype=np.float32)
    for w_, (oy, ox) in zip(k, offs):
        k2[max_y + oy, max_x + ox] += w_
    return jnp.clip(_depthwise_conv(img, jnp.asarray(k2), virtual_pixel), 0.0, 1.0)


def rotational_blur(img: jnp.ndarray, angle: float) -> jnp.ndarray:
    """RotationalBlurImage (effect.c:3129): per pixel, average NEAREST
    samples along the arc about the image center.

    Reference geometry: center = ((cols-1)/2, (rows-1)/2), blur_radius =
    hypot(center), n = trunc(|4*angle_rad*sqrt(blur_radius) + 2|), angles
    theta*j - offset spanning [-angle/2, +angle/2].  Each pixel strides the
    n angles by step = trunc(blur_radius/radius) clamped to [1, n-1]
    (effect.c:3258-3270), sampling nearest pixels at trunc(coord + 0.5)
    with edge-clamped virtual pixels.  Vectorized as n dense gathers with a
    per-pixel j%%step==0 inclusion mask."""
    h, w = img.shape[-3], img.shape[-2]
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    blur_radius = math.hypot(cx, cy)
    rad = math.radians(angle)
    n = max(int(abs(4.0 * rad * math.sqrt(blur_radius) + 2.0)), 2)
    theta = rad / (n - 1)
    offset = theta * (n - 1) / 2.0

    yy, xx = jnp.mgrid[0:h, 0:w]
    dx = xx.astype(jnp.float32) - cx
    dy = yy.astype(jnp.float32) - cy
    radius = jnp.hypot(dx, dy)
    step = jnp.where(radius == 0, 1.0, jnp.trunc(
        blur_radius / jnp.maximum(radius, 1e-30)))
    step = jnp.clip(step, 1.0, float(n - 1))

    flat = img.reshape(img.shape[:-3] + (h * w, img.shape[-1]))
    acc = jnp.zeros_like(img)
    cnt = jnp.zeros((h, w, 1), jnp.float32)
    for j in range(n):
        a = theta * j - offset
        c, s = math.cos(a), math.sin(a)
        sx = jnp.clip(jnp.trunc(cx + dx * c - dy * s + 0.5), 0, w - 1)
        sy = jnp.clip(jnp.trunc(cy + dx * s + dy * c + 0.5), 0, h - 1)
        idx = (sy * w + sx).astype(jnp.int32)
        samp = jnp.take(flat, idx.reshape(-1), axis=-2).reshape(img.shape)
        incl = (jnp.round(jnp.mod(float(j), step)) == 0).astype(jnp.float32)[..., None]
        acc = acc + incl * samp
        cnt = cnt + incl
    return jnp.clip(acc / jnp.maximum(cnt, 1.0), 0.0, 1.0)


def selective_blur(img: jnp.ndarray, radius: float = 0.0, sigma: float = 1.0,
                   threshold: float = 0.1, virtual_pixel: str = "edge") -> jnp.ndarray:
    """SelectiveBlurImage (effect.c:3323-3544): an UNNORMALIZED 2-D
    Gaussian window where each tap joins the average only if the
    luminance contrast |luma(tap) − intensity(center)| < threshold; the
    per-pixel included-weight sum renormalizes, and pixels whose gate
    admits ~nothing keep their original value.  The tap gate uses a
    GRAY-transformed clone (Rec709Luma) for tap luminance and
    GetPixelIntensity for the center — identical quantities for sRGB."""
    from ..core.virtual_pixel import pad_spatial
    from .enhance import grayscale

    width = optimal_kernel_width_1d(radius, _sigma_safe(sigma))
    j = (width - 1) // 2
    s = _sigma_safe(sigma)
    vs = np.arange(-j, j + 1, dtype=np.float64)
    k2 = np.exp(-(vs[:, None] ** 2 + vs[None, :] ** 2) / (2.0 * s * s)) \
        / (2.0 * math.pi * s * s)
    c = img.shape[-1]
    ncol = 3 if c >= 3 else 1
    luma = grayscale(img[..., :ncol]) if ncol == 3 else img[..., :1]
    center = luma
    pad = pad_spatial(img, (j, j), (j, j), virtual_pixel)
    padl = pad_spatial(luma, (j, j), (j, j), virtual_pixel)
    h, w = img.shape[-3], img.shape[-2]
    acc = jnp.zeros_like(img)
    gamma = jnp.zeros(img.shape[:-1] + (1,), img.dtype)
    for dv in range(width):
        for du in range(width):
            tap = pad[..., dv:dv + h, du:du + w, :]
            tl = padl[..., dv:dv + h, du:du + w, :]
            inc = (jnp.abs(tl - center) < threshold).astype(img.dtype)
            kw = float(k2[dv, du])
            acc = acc + kw * inc * tap
            gamma = gamma + kw * inc
    good = jnp.abs(gamma) >= 1e-12
    out = acc / jnp.where(good, gamma, 1.0)
    return jnp.where(good, out, img)


def despeckle(img: jnp.ndarray) -> jnp.ndarray:
    """DespeckleImage (effect.c:1211 Hull, :1308 driver).

    Each Hull(xoff, yoff, polarity) is two half-steps over a ZERO-padded
    1-px border buffer: (A) v += 1q when the (+off) neighbor >= v + 2q;
    (B) on the result, v += 1q when the (-off) neighbor >= v + 2q AND the
    (+off) neighbor > v (strict).  Negative polarity mirrors both.  The
    driver runs +off/-off/-off/+off with polarities +/+/-/- for each of
    the four directions; increments are ScaleCharToQuantum units
    (1q = 257/65535 == 1/255)."""
    # work in 255-scaled units: 8-bit-derived quanta are exact f32
    # integers there, so the +-2q compares are exact (no half-LSB flips)
    one = 1.0
    two = 2.0
    img = img * 255.0
    h, w = img.shape[-3], img.shape[-2]

    def nb(x, oy, ox):
        # neighbor value at (+oy,+ox), zero beyond the image border
        pad = jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(1, 1), (1, 1), (0, 0)])
        return jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(pad, 1 + oy, h, axis=-3),
            1 + ox, w, axis=-2)

    def hull(f, ox, oy, polarity):
        r = nb(f, oy, ox)
        if polarity > 0:
            g = jnp.where(r >= f + two, f + one, f)
        else:
            g = jnp.where(r <= f - two, f - one, f)
        r2 = nb(g, oy, ox)
        s2 = nb(g, -oy, -ox)
        if polarity > 0:
            return jnp.where((s2 >= g + two) & (r2 > g), g + one, g)
        return jnp.where((s2 <= g - two) & (r2 < g), g - one, g)

    X = [0, 1, 1, -1]
    Y = [1, 0, 1, 1]
    out = img
    for k in range(4):
        out = hull(out, X[k], Y[k], 1)
        out = hull(out, -X[k], -Y[k], 1)
        out = hull(out, -X[k], -Y[k], -1)
        out = hull(out, X[k], Y[k], -1)
    return out / 255.0


def spread(img: jnp.ndarray, radius: float, key=None,
           virtual_pixel: str = "edge") -> jnp.ndarray:
    """SpreadImage (effect.c): displace each pixel by uniform random offset."""
    if key is None:
        key = jax.random.PRNGKey(0)
    h, w = img.shape[-3], img.shape[-2]
    kx, ky = jax.random.split(key)
    oy = jax.random.uniform(ky, img.shape[:-1], minval=-radius, maxval=radius)
    ox = jax.random.uniform(kx, img.shape[:-1], minval=-radius, maxval=radius)
    yy = jnp.arange(h)[:, None] + oy
    xx = jnp.arange(w)[None, :] + ox
    yi = jnp.clip(jnp.round(yy).astype(jnp.int32), 0, h - 1)
    xi = jnp.clip(jnp.round(xx).astype(jnp.int32), 0, w - 1)
    flat = yi * w + xi
    lead = img.shape[:-3]
    x2 = img.reshape(lead + (h * w, img.shape[-1]))
    out = jnp.take_along_axis(x2, flat.reshape(lead + (h * w,))[..., None], axis=-2)
    return out.reshape(img.shape)


def shade(img: jnp.ndarray, azimuth: float = 30.0, elevation: float = 30.0,
          gray: bool = True, virtual_pixel: str = "edge") -> jnp.ndarray:
    """ShadeImage (effect.c:3746): Lambertian shading from box-3 normals.

    normal.x = sum of the 3 left-neighbor intensities minus the 3 right,
    normal.y = bottom row minus top row, normal.z = 2 (in normalized
    units), light = (cos az cos el, sin az cos el, sin el); shade =
    light.z on flat pixels, else max(0, n.l)/|n|.  Intensity is the
    clamped Rec709 luma.  Oracle-verified against the reference binary."""
    az = math.radians(azimuth)
    el = math.radians(elevation)
    lx, ly, lz = (math.cos(az) * math.cos(el),
                  math.sin(az) * math.cos(el), math.sin(el))
    if img.shape[-1] >= 3:
        lum = (0.212656 * img[..., 0] + 0.715158 * img[..., 1] +
               0.072186 * img[..., 2])[..., None]
    else:
        lum = img[..., :1]
    lum = jnp.clip(lum, 0.0, 1.0)
    kx = np.asarray([[1, 0, -1]] * 3, np.float32)     # left - right
    ky = np.asarray([[-1], [0], [1]], np.float32) * \
        np.ones((1, 3), np.float32)                   # bottom - top
    nx = _depthwise_conv(lum, jnp.asarray(kx), virtual_pixel)
    ny = _depthwise_conv(lum, jnp.asarray(ky), virtual_pixel)
    nz = 2.0
    eps = 1e-12
    dot = nx * lx + ny * ly + nz * lz
    mag = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    shading = jnp.where((jnp.abs(nx) <= eps) & (jnp.abs(ny) <= eps),
                        lz, jnp.where(dot > eps, dot / mag, 0.0))
    if gray:
        return jnp.clip(jnp.broadcast_to(shading, img.shape), 0.0, 1.0)
    return jnp.clip(img * shading, 0.0, 1.0)


def kuwahara(img: jnp.ndarray, radius: float = 1.0, sigma: float = None,
             virtual_pixel: str = "edge") -> jnp.ndarray:
    """KuwaharaImage (effect.c:1914) — oracle-matched semantics.

    The reference pre-smooths with BlurImage(radius, sigma), ranks the
    four (radius+1)^2 quadrants anchored NW/NE/SW/SE of each pixel by
    LUMA variance, and outputs the smoothed image INTERPOLATED AT THE
    WINNING QUADRANT'S CENTER (origin + width/2) — not the quadrant
    mean.  Vectorized as origin-anchored box filters over an edge-padded
    canvas + four bilinear samples selected per pixel.
    """
    from .distort import sample_bilinear

    if sigma is None:
        sigma = max(radius - 0.5, 0.1)
    g = blur(img, radius, sigma, virtual_pixel)
    w = int(radius) + 1
    pad = w - 1
    h_, w_ = g.shape[-3], g.shape[-2]
    if g.shape[-1] >= 3:
        luma = (0.212656 * g[..., :1] + 0.715158 * g[..., 1:2] +
                0.072186 * g[..., 2:3])
    else:
        luma = g[..., :1]
    lp = jnp.pad(luma, [(0, 0)] * (luma.ndim - 3) +
                 [(pad, pad), (pad, pad), (0, 0)], mode="edge")
    box = jnp.asarray(np.ones((w, w), np.float32) / (w * w))

    def valid_box(x):
        from jax import lax

        k = box[:, :, None, None] * jnp.eye(x.shape[-1])[None, None]
        return lax.conv_general_dilated(
            x.reshape((-1,) + x.shape[-3:]), k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=1).reshape(
                x.shape[:-3] + (x.shape[-3] - pad, x.shape[-2] - pad,
                                x.shape[-1]))

    m1 = valid_box(lp)            # (H+pad, W+pad, 1) origin-anchored means
    m2 = valid_box(lp * lp)
    var = m2 - m1 * m1
    # quadrant i origin offset d in {-(w-1), 0} per axis; var at (y, x)
    # for origin (y+dy, x+dx) lives at var[y+dy+pad, x+dx+pad]
    offs = [(-pad, -pad), (-pad, 0), (0, -pad), (0, 0)]
    vstack = jnp.stack([var[..., dy + pad:dy + pad + h_,
                            dx + pad:dx + pad + w_, 0]
                        for dy, dx in offs], 0)
    best = jnp.argmin(vstack, axis=0)
    # sampled value at each quadrant center: origin + w/2
    yy = jnp.arange(h_, dtype=g.dtype)[:, None]
    xx = jnp.arange(w_, dtype=g.dtype)[None, :]
    yy = jnp.broadcast_to(yy, (h_, w_))
    xx = jnp.broadcast_to(xx, (h_, w_))
    samples = jnp.stack(
        [sample_bilinear(g, xx + dx + w / 2.0, yy + dy + w / 2.0)
         for dy, dx in offs], 0)
    out = jnp.take_along_axis(
        samples, best[(None,) + (Ellipsis,) + (None,)], axis=0)[0]
    return jnp.clip(out, 0.0, 1.0)


def bilateral_blur(img: jnp.ndarray, width: int = 5, height: int = 5,
                   intensity_sigma: float = None, spatial_sigma: float = None,
                   virtual_pixel: str = "edge") -> jnp.ndarray:
    """BilateralBlurImage (effect.c:894-1120), reference-exact.

    The window is width x height EXACTLY, taps at offsets
    (mid.x-u, mid.y-v) for u,v over the window (asymmetric for even
    sizes).  Each tap weight is
      BlurGaussian(charI(tap)-charI(center), intensity_sigma)
      * BlurGaussian(sqrt(dx^2+dy^2), spatial_sigma)
    where charI = ScaleQuantumToChar(GetPixelIntensity) — the INTEGER
    0..255 rounding of the Rec709Luma intensity (quantum.h:113) — and
    BlurGaussian(x, s) = exp(-x^2/(2 s^2))/(2 pi s^2) with
    PerceptibleReciprocal guards (effect.c:846-856).  Defaults follow
    operation.c:1856-1861: xi = sqrt(w^2+h^2), psi = xi/4.
    """
    from .enhance import grayscale

    width = max(int(width), 1)
    height = max(int(height), 1)
    if intensity_sigma is None:
        intensity_sigma = math.sqrt(width * width + height * height)
    if spatial_sigma is None:
        spatial_sigma = 0.25 * math.sqrt(width * width + height * height)

    def pr(v):
        return 1.0 / v if abs(v) >= 1e-12 else (1e12 if v >= 0 else -1e12)

    def blur_gaussian(x, sigma):
        a = pr(2.0 * sigma * sigma)
        b = pr(2.0 * math.pi * sigma * sigma)
        return np.exp(-np.asarray(x, np.float64) ** 2 * a) * b

    midx, midy = width // 2, height // 2
    lead = img.shape[:-3]
    h, w, c = img.shape[-3:]
    x = img.reshape((-1, h, w, c))
    ncol = 3 if c >= 3 else 1
    luma = grayscale(x[..., :ncol]) if ncol == 3 else x[..., :1]
    # ScaleQuantumToChar: round-half-up of q/257 == round(x*255), [0,255]
    chari = jnp.clip(jnp.floor(luma * 255.0 + 0.5), 0.0, 255.0)
    pady = (height - 1 - midy, midy)     # offsets midy-(H-1) .. midy
    padx = (width - 1 - midx, midx)
    xp = pad_spatial(x, pady, padx, virtual_pixel)
    cp = pad_spatial(chari, pady, padx, virtual_pixel)
    num = jnp.zeros_like(x)
    den = jnp.zeros((x.shape[0], h, w, 1), x.dtype)
    # precompute the 511-entry intensity gaussian as a device LUT
    ilut = jnp.asarray(blur_gaussian(np.arange(-255, 256), intensity_sigma),
                       x.dtype)
    for v in range(height):
        for u in range(width):
            oy, ox = midy - v, midx - u
            sw = float(blur_gaussian(math.sqrt((u - midx) ** 2 +
                                               (v - midy) ** 2),
                                     spatial_sigma))
            ys, xs = oy + pady[0], ox + padx[0]
            nb = lax.dynamic_slice(xp, (0, ys, xs, 0), x.shape)
            nc = lax.dynamic_slice(cp, (0, ys, xs, 0), chari.shape)
            d = (nc - chari).astype(jnp.int32) + 255
            wgt = sw * jnp.take(ilut, jnp.clip(d, 0, 510))
            num = num + wgt * nb
            den = den + wgt
    out = num * jnp.where(jnp.abs(den) >= 1e-12, 1.0 / den, 1e12)
    return out.reshape(img.shape)


def local_contrast(img: jnp.ndarray, radius: float = 10.0,
                   strength: float = 12.5, virtual_pixel: str = "edge") -> jnp.ndarray:
    """LocalContrastImage (effect.c:1977): unsharp on luminance with big radius."""
    sigma = max(abs(radius), 1.0) / 2.0
    blurred = blur(img, 0.0, sigma, virtual_pixel)
    out = img + (img - blurred) * (strength / 100.0) * 10.0
    return jnp.clip(out, 0.0, 1.0)

"""Image comparison metrics (compare.c) — the framework's own gating harness.

Re-implements GetImageDistortion (/root/reference/MagickCore/compare.c:1571)
and its 15 metrics (compare.h:27-45) as jit-friendly reductions over
(..., H, W, C) arrays in [0,1].  The reference accumulates per-channel
partial sums under ``omp critical``; here every metric is a single fused
reduction.

Metric semantics follow the reference:
  * ae     — count of pixels differing beyond the fuzz (AbsoluteErrorMetric)
  * mae/mse/rmse/pae — per-channel means/maxima of |d| and d²
  * psnr   — 10*log10(1/MSE) (compare.c PSNR path), in dB
  * ncc    — normalized cross correlation
  * ssim/dssim — Gaussian-window SSIM, radius 5 sigma 1.5, K1=.01 K2=.03
    (compare.c:1319-1382)
  * fuzz   — mean squared error with alpha-aware fuzz semantics
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .blur import _depthwise_conv


def _reduce(x):
    """Mean over all but channel axis."""
    axes = tuple(range(x.ndim - 1))
    return jnp.mean(x, axis=axes)


def absolute_error(a, b, fuzz: float = 0.0):
    """AE: number of pixels whose any-channel difference exceeds fuzz."""
    diff = jnp.abs(a - b)
    bad = jnp.any(diff > fuzz, axis=-1)
    return jnp.sum(bad.astype(jnp.float32))


def mean_absolute_error(a, b):
    return jnp.mean(jnp.abs(a - b))


def mean_squared_error(a, b):
    return jnp.mean((a - b) ** 2)


def root_mean_squared_error(a, b):
    return jnp.sqrt(mean_squared_error(a, b))


def peak_absolute_error(a, b):
    return jnp.max(jnp.abs(a - b))


def mean_error_per_pixel(a, b):
    """MEPP triple (compare.c:712 GetMeanErrorPerPixel): the metric value
    is the RAW quantum-unit absolute-error sum over all samples (the
    distortion array is never divided); image->error carries
    normalized_mean = mean over samples of d² (== pooled MSE, since the
    reference's ``area`` counter increments per CHANNEL sample,
    compare.c:800) and normalized_max = max |d|."""
    diff = jnp.abs(a - b)
    return (jnp.sum(diff) * 65535.0, jnp.mean(diff * diff), jnp.max(diff))


def mepp(a, b):
    """MEPP scalar: the reference CLI's headline figure — the raw
    quantum-domain |d| sum (compare.c GetImageDistortion returns the
    undivided composite accumulator for this metric)."""
    return jnp.sum(jnp.abs(a - b)) * 65535.0


def phash_metric(a, b):
    """PHASH (compare.c GetPerceptualHashDistortion): sum of squared
    differences of the perceptual-hash moment vectors (statistic.c
    GetImagePerceptualHash over xyY + HSB)."""
    from .statistic import phash_distance

    return phash_distance(a, b)


def psnr(a, b):
    """PSNR as the reference's normalized fraction (compare.c:1201
    GetPeakSignalToNoiseRatio): per-channel -10*log10(mse_c)/48.1647,
    averaged over channels (channels with mse below MagickEpsilon are
    skipped from the sum but still counted in the divisor).  Multiply by
    48.1647 for dB."""
    axes = tuple(range(a.ndim - 1))
    mse_c = jnp.mean((a - b) ** 2, axis=axes)
    eps = 1.0e-12  # MagickEpsilon
    per = jnp.where(mse_c >= eps,
                    (-10.0 * jnp.log10(jnp.maximum(mse_c, eps))) / 48.1647,
                    0.0)
    return jnp.mean(per)


def psnr_db(a, b):
    """Pooled-MSE PSNR in dB — the local fidelity-gate helper (NOT the
    reference metric; use :func:`psnr` for compare.c:1201 semantics)."""
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-30))


def normalized_cross_correlation(a, b):
    """NCC (compare.c:933): per-channel correlation of mean-centered
    samples, averaged over channels.  (The compare CLI prints
    1.0 - this value as the distortion.)"""
    axes = tuple(range(a.ndim - 1))
    am = a - jnp.mean(a, axis=axes, keepdims=True)
    bm = b - jnp.mean(b, axis=axes, keepdims=True)
    num = jnp.sum(am * bm, axis=axes)
    den = jnp.sqrt(jnp.sum(am * am, axis=axes) * jnp.sum(bm * bm, axes))
    return jnp.mean(num / jnp.maximum(den, 1e-30))


def _ssim_maps(a, b, radius: float = 5.0, sigma: float = 1.5,
               k1: float = 0.01, k2: float = 0.03):
    # The SSIM window is AcquireKernelInfo("gaussian:5x1.5") — morphology.c's
    # SAMPLED 2-D gaussian (morphology.c:1074-1088), NOT the rank-3
    # supersampled blur: kernel (gaussian_kernel_1d).  Width 2*radius+1.
    u = np.arange(-int(radius), int(radius) + 1, dtype=np.float64)
    k = np.exp(-(u * u) / (2.0 * sigma * sigma))
    k /= k.sum()
    k2d = np.outer(k, k).astype(np.float32)

    def win(x):
        return _depthwise_conv(x, jnp.asarray(k2d), "edge")

    c1 = (k1 * 1.0) ** 2
    c2 = (k2 * 1.0) ** 2
    mu_a = win(a)
    mu_b = win(b)
    var_a = win(a * a) - mu_a * mu_a
    var_b = win(b * b) - mu_b * mu_b
    cov = win(a * b) - mu_a * mu_b
    num = (2.0 * mu_a * mu_b + c1) * (2.0 * cov + c2)
    den = (mu_a * mu_a + mu_b * mu_b + c1) * (var_a + var_b + c2)
    return num / jnp.maximum(den, 1e-30)


def ssim(a, b, radius: float = 5.0, sigma: float = 1.5):
    """Structural similarity (compare.c:1319 constants)."""
    return jnp.mean(_ssim_maps(a, b, radius, sigma))


def dssim(a, b):
    return (1.0 - ssim(a, b)) / 2.0


def fuzz_error(a, b):
    """FUZZ metric: sqrt of channel-mean squared error (compare.c Fuzz)."""
    return jnp.sqrt(jnp.mean((a - b) ** 2))


def dot_product_correlation(a, b):
    """DPC: for whole-image comparison the reference's GetImageDistortion
    dispatches DotProductCorrelationErrorMetric into the NCC default case
    (compare.c:1634-1640) — DPC-proper exists only in the FFT similarity
    search path."""
    return normalized_cross_correlation(a, b)


def phase_correlation(a, b):
    """Peak of the normalized cross-power spectrum (compare.c PhaseCorrelation)."""
    fa = jnp.fft.rfft2(jnp.mean(a, axis=-1))
    fb = jnp.fft.rfft2(jnp.mean(b, axis=-1))
    cross = fa * jnp.conj(fb)
    cross = cross / jnp.maximum(jnp.abs(cross), 1e-30)
    corr = jnp.fft.irfft2(cross, s=a.shape[-3:-1])
    return jnp.max(corr)


_METRICS = {
    "ae": absolute_error,
    "mae": mean_absolute_error,
    "mse": mean_squared_error,
    "rmse": root_mean_squared_error,
    "pae": peak_absolute_error,
    "psnr": psnr,
    "ncc": normalized_cross_correlation,
    "ssim": ssim,
    "dssim": dssim,
    "fuzz": fuzz_error,
    "dpc": dot_product_correlation,
    "phase": phase_correlation,
    "mepp": mepp,
    "phash": phash_metric,
}


def get_distortion(a: jnp.ndarray, b: jnp.ndarray, metric: str = "rmse") -> jnp.ndarray:
    """GetImageDistortion analog (compare.c:1571)."""
    m = metric.lower().strip()
    if m not in _METRICS:
        raise ValueError(f"unknown metric {metric!r}; have {sorted(_METRICS)}")
    return _METRICS[m](a, b)


def compare_images(a: jnp.ndarray, b: jnp.ndarray, metric: str = "rmse",
                   highlight=(1.0, 0.0, 0.0), lowlight=None, fuzz: float = 0.0
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CompareImages (compare.c:114): difference visualization + distortion.

    Returns (difference_image, distortion).  Differing pixels are painted
    with the highlight color over a faded copy of the first image.
    """
    distortion = get_distortion(a, b, metric)
    diff_mask = jnp.any(jnp.abs(a - b) > fuzz, axis=-1, keepdims=True)
    faded = 1.0 - (1.0 - a) * 0.1  # reference fades via lowlight tint
    hl = jnp.asarray(highlight, a.dtype)
    hl = jnp.broadcast_to(hl, a.shape[:-1] + (len(highlight),))[..., : a.shape[-1]]
    vis = jnp.where(diff_mask, hl, faded)
    return vis, distortion


def similarity_image(image: jnp.ndarray, template: jnp.ndarray,
                     metric: str = "ncc") -> Tuple[Tuple[int, int], jnp.ndarray]:
    """SimilarityImage (compare.c): subimage search via FFT cross-correlation.

    Returns ((y, x) best offset, correlation surface).  Uses the NCC-via-FFT
    formulation — the reference's phase-correlation fast path.
    """
    ig = jnp.mean(image, axis=-1)
    tg = jnp.mean(template, axis=-1)
    ih, iw = ig.shape[-2:]
    th, tw = tg.shape[-2:]
    tg = tg - jnp.mean(tg)
    pad_t = jnp.zeros_like(ig).at[..., :th, :tw].set(tg)
    fi = jnp.fft.rfft2(ig)
    ft = jnp.fft.rfft2(pad_t)
    corr = jnp.fft.irfft2(fi * jnp.conj(ft), s=(ih, iw))
    # normalize by local energy (approximate; exact NCC needs integral images)
    idx = jnp.argmax(corr)
    y, x = jnp.unravel_index(idx, corr.shape[-2:])
    return (y, x), corr

"""Thresholding ops (threshold.c family).

Re-implements /root/reference/MagickCore/threshold.c (2,648 LoC, 10 OMP
loops): global auto-thresholds (Otsu threshold.c:491, Kapur :392, Triangle
:570) as histogram reductions, adaptive mean-offset thresholding as a box
filter, ordered dither with the threshold maps shipped in
/root/reference/config/thresholds.xml, plus the bilevel/black/white/range/
random/clamp/perceptible point ops.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .enhance import grayscale

_NBINS = 256  # reference histograms auto-thresholds at 256 bins (threshold.c)


def _intensity_histogram(img: jnp.ndarray, bins: int = _NBINS) -> jnp.ndarray:
    from .histogram import _histogram_fixed

    inten = grayscale(img)[..., 0] if img.shape[-1] >= 3 else img[..., 0]
    return _histogram_fixed(inten, bins)


def otsu_threshold_value(img: jnp.ndarray) -> jnp.ndarray:
    """OTSUThreshold (threshold.c:491): maximize between-class variance."""
    hist = _intensity_histogram(img)
    p = hist / jnp.maximum(jnp.sum(hist), 1.0)
    omega = jnp.cumsum(p)
    levels = jnp.arange(_NBINS, dtype=jnp.float32)
    mu = jnp.cumsum(p * levels)
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    sigma_b = jnp.where(denom > 1e-12, (mu_t * omega - mu) ** 2 / jnp.maximum(denom, 1e-12), 0.0)
    return jnp.argmax(sigma_b).astype(jnp.float32) / (_NBINS - 1)


def kapur_threshold_value(img: jnp.ndarray) -> jnp.ndarray:
    """KapurThreshold (threshold.c:392): maximize entropy sum."""
    hist = _intensity_histogram(img)
    p = hist / jnp.maximum(jnp.sum(hist), 1.0)
    cum = jnp.cumsum(p)
    eps = 1e-12
    plogp = jnp.where(p > eps, p * jnp.log(jnp.maximum(p, eps)), 0.0)
    cum_plogp = jnp.cumsum(plogp)
    total_plogp = cum_plogp[-1]
    black = cum
    white = 1.0 - cum
    h_black = jnp.where(black > eps,
                        jnp.log(jnp.maximum(black, eps)) - cum_plogp / jnp.maximum(black, eps),
                        0.0)
    h_white = jnp.where(white > eps,
                        jnp.log(jnp.maximum(white, eps)) -
                        (total_plogp - cum_plogp) / jnp.maximum(white, eps),
                        0.0)
    return jnp.argmax(h_black + h_white).astype(jnp.float32) / (_NBINS - 1)


def triangle_threshold_value(img: jnp.ndarray) -> jnp.ndarray:
    """TriangleThreshold (threshold.c:570) — exact reference algorithm:
    normalized histogram, chord from (peak, p[peak]) down to (start|end,
    0) on the LONGER tail, signed distance with the quirky
    1/sqrt(a^2+b^2+c^2) normalization, sign-gated scan direction."""
    hist = _intensity_histogram(img)
    p = hist / jnp.maximum(jnp.sum(hist), 1.0)
    nz = p > 0
    levels = jnp.arange(_NBINS)
    start = jnp.argmax(nz)
    end = _NBINS - 1 - jnp.argmax(nz[::-1])
    peak = jnp.argmax(p)
    x1 = peak.astype(jnp.float32)
    y1 = p[peak]
    use_start = (peak - start) >= (end - peak)
    x2 = jnp.where(use_start, start, end).astype(jnp.float32)
    a = y1                       # y1 - y2 with y2 = 0
    b = x2 - x1
    c = -(a * x1 + b * y1)
    ir = 1.0 / jnp.maximum(jnp.sqrt(a * a + b * b + c * c), 1e-30)
    xs = levels.astype(jnp.float32)
    seg = ir * (a * xs + b * p + c)
    # left branch scans [start, peak) keeping seg > 0; right branch
    # scans (peak, end] keeping seg < 0
    left_ok = (levels >= start) & (levels < peak) & (seg > 0.0)
    right_ok = (levels > peak) & (levels <= end) & (seg < 0.0)
    ok = jnp.where(use_start, left_ok, right_ok)
    dist = jnp.where(ok, jnp.abs(seg), -1.0)
    best = jnp.argmax(dist)
    found = jnp.max(dist) > 0.0
    return jnp.where(found, best, 0).astype(jnp.float32) / (_NBINS - 1)


def auto_threshold(img: jnp.ndarray, method: str = "otsu") -> jnp.ndarray:
    """AutoThresholdImage (threshold.c:660): global bilevel by method.

    PER IMAGE: a batched (N, H, W, C) input gets N independent thresholds
    (the reference processes one image at a time; a shared batch histogram
    would let one bright image shift every threshold).
    """
    method = method.lower()
    fn = {"otsu": otsu_threshold_value, "kapur": kapur_threshold_value,
          "triangle": triangle_threshold_value}.get(method)
    if fn is None:
        raise ValueError(f"unknown auto-threshold method {method!r}")
    if img.ndim > 3:
        lead = img.shape[:-3]
        flat = img.reshape((-1,) + img.shape[-3:])
        # lax.map, not vmap: the body stays unbatched so the histogram's
        # Pallas fast path (ANY-memspace operands) applies per image
        t = jax.lax.map(fn, flat).reshape(lead + (1, 1, 1))
    else:
        t = fn(img)
    inten = grayscale(img)[..., 0:1] if img.shape[-1] >= 3 else img
    # the reference compares the UNQUANTIZED intensity against the bin
    # threshold j/255 (AutoThresholdImage -> BilevelImage(Q*t/100)):
    # pixels above the bin EDGE go white even inside the threshold bin
    out = (inten > t).astype(img.dtype)
    return jnp.broadcast_to(out, img.shape[:-1] + (1,))


def bilevel(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """BilevelImage (threshold.c:805): thresholds the PIXEL INTENSITY
    (Rec709 luma on encoded values, GetPixelIntensity default) and sets
    every color channel to 0/1 from that one comparison; alpha passes
    through.  Single-channel images threshold the channel directly."""
    c = img.shape[-1]
    if c < 3:
        return (img > threshold).astype(img.dtype)
    luma = (0.212656 * img[..., 0] + 0.715158 * img[..., 1] +
            0.072186 * img[..., 2])
    bit = (luma > threshold).astype(img.dtype)[..., None]
    color = jnp.broadcast_to(bit, img[..., :3].shape)
    return jnp.concatenate([color, img[..., 3:]], axis=-1) \
        if c > 3 else color


def _intensity(img: jnp.ndarray) -> jnp.ndarray:
    """GetPixelIntensity default (Rec709 luma on encoded values)."""
    if img.shape[-1] < 3:
        return img[..., 0]
    return (0.212656 * img[..., 0] + 0.715158 * img[..., 1] +
            0.072186 * img[..., 2])


def _set_color(img, mask, value):
    """Set all color channels where mask, preserving alpha."""
    c = img.shape[-1]
    nc = min(c, 3)
    m = mask[..., None]
    color = jnp.where(m, value, img[..., :nc])
    return jnp.concatenate([color, img[..., nc:]], axis=-1) \
        if c > nc else color


def black_threshold(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """BlackThresholdImage (threshold.c): the pixel INTENSITY is compared
    and all color channels zeroed together — oracle-verified."""
    return _set_color(img, _intensity(img) < threshold, 0.0)


def white_threshold(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """WhiteThresholdImage: intensity above the threshold forces the
    whole pixel white — oracle-verified."""
    return _set_color(img, _intensity(img) > threshold, 1.0)


def range_threshold(img: jnp.ndarray, low_black: float, low_white: float,
                    high_white: float, high_black: float) -> jnp.ndarray:
    """RangeThresholdImage (threshold.c:1160-1230): soft trapezoid over
    the pixel INTENSITY — every updated channel is set from the same
    intensity ramp (the result is gray), not thresholded per-channel."""
    y = _intensity(img)[..., None]
    ramp = jnp.where(y < low_black, 0.0,
           jnp.where(y < low_white, (y - low_black) /
                     max(low_white - low_black, 1e-12),
           jnp.where(y <= high_white, 1.0,
           jnp.where(y <= high_black, (high_black - y) /
                     max(high_black - high_white, 1e-12), 0.0))))
    ncol = 3 if img.shape[-1] >= 3 else 1
    out = jnp.broadcast_to(ramp, img.shape[:-1] + (ncol,))
    if img.shape[-1] > ncol:
        out = jnp.concatenate([out, img[..., ncol:]], -1)
    return out.astype(img.dtype)


def clamp(img: jnp.ndarray) -> jnp.ndarray:
    """ClampImage: clamp to [0, 1] (HDRI values back into quantum range)."""
    return jnp.clip(img, 0.0, 1.0)


def perceptible(img: jnp.ndarray, epsilon: float = 1e-7) -> jnp.ndarray:
    """PerceptibleImage: raise tiny values to epsilon."""
    return jnp.where(jnp.abs(img) < epsilon, jnp.sign(img) * epsilon + (img == 0) * epsilon, img)


def adaptive_threshold(img: jnp.ndarray, width: int = 3, height: int = 3,
                       bias: float = 0.0) -> jnp.ndarray:
    """AdaptiveThresholdImage: local mean minus bias (threshold.c)."""
    from .blur import _depthwise_conv

    box = np.ones((height, width), np.float32) / float(width * height)
    mean = _depthwise_conv(img, jnp.asarray(box), "edge")
    # reference: pixel <= (local mean + bias) -> black (threshold.c
    # AdaptiveThresholdImage `mean=sum/n+bias`) — bias ADDS to the mean
    return (img > mean + bias).astype(img.dtype)


def random_threshold(img: jnp.ndarray, low: float = 0.0, high: float = 1.0,
                     key=None) -> jnp.ndarray:
    """RandomThresholdImage: per-pixel uniform threshold in [low, high]."""
    if key is None:
        key = jax.random.PRNGKey(0)
    t = jax.random.uniform(key, img.shape, minval=low, maxval=high)
    return (img > t).astype(img.dtype)


# Ordered-dither threshold maps (/root/reference/config/thresholds.xml).
_THRESHOLD_MAPS = {
    "threshold": (2, [[1]]),
    "checks": (3, [[1, 2], [2, 1]]),
    "o2x2": (5, [[1, 3], [4, 2]]),
    "o3x3": (10, [[3, 7, 4], [6, 1, 9], [2, 8, 5]]),
    "o4x4": (17, [[1, 9, 3, 11], [13, 5, 15, 7], [4, 12, 2, 10], [16, 8, 14, 6]]),
    "o8x8": (65, [
        [1, 49, 13, 61, 4, 52, 16, 64], [33, 17, 45, 29, 36, 20, 48, 32],
        [9, 57, 5, 53, 12, 60, 8, 56], [41, 25, 37, 21, 44, 28, 40, 24],
        [3, 51, 15, 63, 2, 50, 14, 62], [35, 19, 47, 31, 34, 18, 46, 30],
        [11, 59, 7, 55, 10, 58, 6, 54], [43, 27, 39, 23, 42, 26, 38, 22]]),
    "h4x4a": (9, [[4, 2, 7, 5], [3, 1, 8, 6], [7, 5, 4, 2], [8, 6, 3, 1]]),
    "h6x6a": (19, [
        [14, 13, 10, 8, 2, 3], [16, 18, 12, 7, 1, 4], [15, 17, 11, 9, 6, 5],
        [8, 2, 3, 14, 13, 10], [7, 1, 4, 16, 18, 12], [9, 6, 5, 15, 17, 11]]),
    "h8x8a": (33, [
        [13, 7, 8, 14, 17, 21, 22, 18], [6, 1, 3, 9, 28, 31, 29, 23],
        [5, 2, 4, 10, 27, 32, 30, 24], [16, 12, 11, 15, 20, 26, 25, 19],
        [17, 21, 22, 18, 13, 7, 8, 14], [28, 31, 29, 23, 6, 1, 3, 9],
        [27, 32, 30, 24, 5, 2, 4, 10], [20, 26, 25, 19, 16, 12, 11, 15]]),
    "c5x5b": (26, [
        [1, 21, 16, 15, 4], [5, 17, 20, 19, 14], [6, 21, 25, 24, 12],
        [7, 18, 22, 23, 11], [2, 8, 9, 10, 3]]),
    "c6x6b": (37, [
        [1, 5, 14, 13, 12, 4], [6, 22, 28, 27, 21, 11], [15, 29, 35, 34, 26, 20],
        [16, 30, 36, 33, 25, 19], [7, 23, 31, 32, 24, 10], [2, 8, 17, 18, 9, 3]]),
    "c7x7b": (50, [
        [3, 9, 18, 28, 17, 8, 2], [10, 24, 33, 39, 32, 23, 7],
        [19, 34, 44, 48, 43, 31, 16], [25, 40, 45, 49, 47, 38, 27],
        [20, 35, 41, 46, 42, 29, 15], [11, 21, 36, 37, 28, 22, 6],
        [4, 12, 13, 26, 14, 5, 1]]),
}
_THRESHOLD_MAPS["1x1"] = _THRESHOLD_MAPS["threshold"]
_THRESHOLD_MAPS["2x1"] = _THRESHOLD_MAPS["checks"]
_THRESHOLD_MAPS["2x2"] = _THRESHOLD_MAPS["o2x2"]
_THRESHOLD_MAPS["3x3"] = _THRESHOLD_MAPS["o3x3"]
_THRESHOLD_MAPS["4x4"] = _THRESHOLD_MAPS["o4x4"]
_THRESHOLD_MAPS["8x8"] = _THRESHOLD_MAPS["o8x8"]
_THRESHOLD_MAPS["4x1"] = _THRESHOLD_MAPS["h4x4a"]
_THRESHOLD_MAPS["6x1"] = _THRESHOLD_MAPS["h6x6a"]
_THRESHOLD_MAPS["8x1"] = _THRESHOLD_MAPS["h8x8a"]
_THRESHOLD_MAPS["c5x5"] = _THRESHOLD_MAPS["c5x5b"]
_THRESHOLD_MAPS["c6x6"] = _THRESHOLD_MAPS["c6x6b"]
_THRESHOLD_MAPS["c7x7"] = _THRESHOLD_MAPS["c7x7b"]


def threshold_map_names():
    return sorted(_THRESHOLD_MAPS)


def ordered_dither(img: jnp.ndarray, map_name: str = "o8x8",
                   levels: int = 2) -> jnp.ndarray:
    """OrderedDitherImage (threshold.c): posterize with a tiled threshold map.

    With N levels and map thresholds t in (0,1):  out = (floor(v*(N-1)) +
    (frac > t)) / (N-1) — the reference's multi-level ordered dither.
    """
    map_name = map_name.lower()
    if map_name not in _THRESHOLD_MAPS:
        raise ValueError(f"unknown threshold map {map_name!r}")
    divisor, rows = _THRESHOLD_MAPS[map_name]
    m = np.asarray(rows, np.float32)
    mh, mw = m.shape
    h, w = img.shape[-3], img.shape[-2]
    reps = (-(-h // mh), -(-w // mw))
    tiled = np.tile(m, reps)[:h, :w]
    t = jnp.asarray(tiled)[..., None]
    # threshold.c:1774 integer ladder: i = trunc(v*(L*(D-1)+1)),
    # level = i // (D-1), out = (level + (i mod (D-1) >= map)) / L
    lv = float(levels)
    if abs(lv) >= 1.0:
        lv -= 1.0
    if abs(lv) < 1e-12:
        return img
    d1 = float(divisor - 1)
    ti = jnp.floor(jnp.clip(img, 0.0, 1.0) * (lv * d1 + 1.0))
    level = jnp.floor(ti / d1)
    rem = ti - level * d1
    out = (level + (rem >= t).astype(img.dtype)) / lv
    return jnp.clip(out, 0.0, 1.0)


def color_threshold(img: jnp.ndarray, start: Sequence[float],
                    stop: Sequence[float]) -> jnp.ndarray:
    """ColorThresholdImage: white where start <= pixel <= stop, else black."""
    lo = jnp.asarray(start, img.dtype)
    hi = jnp.asarray(stop, img.dtype)
    inside = jnp.all((img[..., :lo.shape[0]] >= lo) & (img[..., :hi.shape[0]] <= hi),
                     axis=-1, keepdims=True)
    return inside.astype(img.dtype)

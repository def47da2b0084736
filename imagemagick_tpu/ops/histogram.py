"""Histogram ops (histogram.c).

Re-implements /root/reference/MagickCore/histogram.c (1,246 LoC):
GetImageHistogram (:555), UniqueImageColors, IdentifyPaletteImage,
GetNumberColors.  The reference builds a hash cube of exact colors; on TPU
the exact-color census is a sort-based reduction over packed color keys,
and fixed-bin histograms (what CLAHE/equalize/threshold consume) are
scatter-adds.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def channel_histogram(img: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """Fixed-bin per-channel histogram: returns (bins, C)."""
    c = img.shape[-1]
    outs = [_histogram_fixed(img[..., ch], bins) for ch in range(c)]
    return jnp.stack(outs, axis=-1)

def _histogram_fixed(values: jnp.ndarray, bins: int) -> jnp.ndarray:
    """TPU-friendly fixed-bin histogram.

    Scatter-adds serialize on TPU; a broadcasted compare + sum streams on
    the VPU and XLA fuses the (N, bins) intermediate away.  values in [0,1].
    """
    idx = jnp.clip((values.reshape(-1) * (bins - 1) + 0.5).astype(jnp.int32),
                   0, bins - 1)
    n = idx.shape[0]
    # chunk the pixel axis so the fused compare tile stays small
    chunk = 1 << 16
    pad = (-n) % chunk
    idx = jnp.pad(idx, (0, pad), constant_values=-1)
    idx = idx.reshape(-1, chunk)
    bins_iota = jnp.arange(bins, dtype=jnp.int32)

    def body(carry, row):
        eq = (row[:, None] == bins_iota[None, :]).astype(jnp.float32)
        return carry + jnp.sum(eq, axis=0), None

    hist, _ = jax.lax.scan(body, jnp.zeros((bins,), jnp.float32), idx)
    return hist



def _pack_colors(img: jnp.ndarray, bits: int = 8) -> jnp.ndarray:
    q = jnp.clip((img * ((1 << bits) - 1) + 0.5).astype(jnp.uint32), 0, (1 << bits) - 1)
    key = jnp.zeros(img.shape[:-1], jnp.uint32)
    for i in range(min(img.shape[-1], 4)):
        key = key * (1 << bits) + q[..., i]
    return key.reshape(-1)


def number_colors(img: jnp.ndarray, bits: int = 8) -> jnp.ndarray:
    """GetNumberColors: count of distinct (quantized) colors."""
    flat = jnp.sort(_pack_colors(img, bits))
    return 1 + jnp.sum(flat[1:] != flat[:-1])


def unique_colors(img: jnp.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """UniqueImageColors: (colors, counts) — host-returning (dynamic size)."""
    arr = np.asarray(img).reshape(-1, img.shape[-1])
    q = np.round(arr * 255.0).astype(np.uint8)
    colors, counts = np.unique(q, axis=0, return_counts=True)
    return colors.astype(np.float32) / 255.0, counts


def get_histogram(img: jnp.ndarray, max_colors: int = 1024
                  ) -> Dict[tuple, int]:
    """GetImageHistogram: exact color -> count map (host-side dict)."""
    colors, counts = unique_colors(img)
    order = np.argsort(-counts)
    out = {}
    for i in order[:max_colors]:
        out[tuple(np.round(colors[i], 6))] = int(counts[i])
    return out


def is_palette_image(img: jnp.ndarray, max_colors: int = 256) -> bool:
    """IdentifyPaletteImage: true if <= 256 unique colors."""
    return int(number_colors(img)) <= max_colors


def histogram_image(img: jnp.ndarray, height: int = 200,
                    bins: int = 256) -> jnp.ndarray:
    """histogram: pseudo-format — render the channel histogram as bars."""
    hist = channel_histogram(img, bins)  # (bins, C)
    hist = hist / jnp.maximum(jnp.max(hist, axis=0, keepdims=True), 1.0)
    rows = jnp.arange(height, dtype=jnp.float32)[::-1][:, None] / height  # 1 at top
    c = min(img.shape[-1], 3)
    chans = []
    for ch in range(3):
        src = hist[:, min(ch, img.shape[-1] - 1)]
        chans.append((rows < src[None, :]).astype(jnp.float32))
    return jnp.stack(chans, axis=-1)

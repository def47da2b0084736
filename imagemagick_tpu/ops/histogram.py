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
    """TPU-friendly fixed-bin histogram via factored one-hots on the MXU.

    Scatter-adds serialize on TPU, and a direct (N, bins) compare+sum is
    VPU-compare-bound (measured 8.4 ms for 14MP x 256 bins).  Split the bin
    index into hi/lo halves instead: two (N, B1)/(N, B2) one-hots cost
    B1+B2 compares per pixel (32 vs 256 for 256 bins), and their
    cross-product contraction  hist[hi, lo] = sum_p H[p, hi] * L[p, lo]
    is a tall-K matmul the MXU streams.  Counts accumulate in f32 (exact
    for < 2^24 pixels).  Measured 8.4 -> 1.1 ms on 14MP (7.6x).
    """
    if bins == 256 and values.dtype == jnp.float32:
        # large 256-bin histograms: VMEM-resident one-hot kernel (the XLA
        # path below materializes the (P, 16) one-hots in HBM)
        from . import pallas_kernels as pk

        out = pk.pallas_histogram256(values)
        if out is not None:
            return out
    idx = jnp.clip((values.reshape(-1) * (bins - 1) + 0.5).astype(jnp.int32),
                   0, bins - 1)
    if bins < 16 or (bins & (bins - 1)) != 0:
        # non-power-of-two / tiny: direct compare is fine at this size
        iota = jnp.arange(bins, dtype=jnp.int32)
        return jnp.sum((idx[:, None] == iota[None, :]).astype(jnp.float32),
                       axis=0)
    b1 = 1 << (bins.bit_length() // 2)   # hi factor
    b2 = bins // b1                      # lo factor
    # Large bin counts (entropy's 65536 = 256x256) would materialize two
    # (N, 256) bf16 one-hots — ~7.3 GB each at 14MP.  Chunk the pixel axis
    # with lax.map, summing partial 2-D contractions: exact counts (f32
    # accum, < 2^24 px per chunk), bounded ~128 MB of one-hot at a time.
    budget = 64 * 1024 * 1024  # bytes per one-hot operand
    if idx.size * (b1 + b2) * 2 > 2 * budget:
        chunk = max(8192, budget // ((b1 + b2) * 2) // 128 * 128)
        nchunks = -(-idx.size // chunk)
        pad = nchunks * chunk - idx.size
        idxp = jnp.pad(idx, (0, pad), constant_values=0).reshape(nchunks, chunk)

        def _partial(row):
            hi_r = row // b2
            lo_r = row - hi_r * b2
            oh = (hi_r[:, None] == jnp.arange(b1, dtype=jnp.int32)[None, :]
                  ).astype(jnp.bfloat16)
            ol = (lo_r[:, None] == jnp.arange(b2, dtype=jnp.int32)[None, :]
                  ).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                oh, ol, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        hist2d = jnp.sum(jax.lax.map(_partial, idxp), axis=0)
        hist2d = hist2d.at[0, 0].add(-float(pad))  # undo bin-0 pad counts
        return hist2d.reshape(bins)
    hi = idx // b2
    lo = idx - hi * b2
    onehot_hi = (hi[:, None] == jnp.arange(b1, dtype=jnp.int32)[None, :]
                 ).astype(jnp.bfloat16)
    onehot_lo = (lo[:, None] == jnp.arange(b2, dtype=jnp.int32)[None, :]
                 ).astype(jnp.bfloat16)
    hist2d = jax.lax.dot_general(
        onehot_hi, onehot_lo, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return hist2d.reshape(bins)


def _histogram_fixed_batched(idx: jnp.ndarray, bins: int) -> jnp.ndarray:
    """Factored-one-hot histogram over a batch: (T, P) int32 -> (T, bins).

    Same hi/lo nibble decomposition as _histogram_fixed, contracted as a
    batched tall-K matmul (one MXU pass for every tile at once) — replaces
    per-tile scatter-adds, which serialize on TPU (CLAHE measured 1,183 ms
    for 64 tiles x 219K pixels via .at[].add; this path runs in ~2 ms).
    """
    b1 = 1 << (bins.bit_length() // 2)
    b2 = bins // b1
    if b1 * b2 != bins:  # non-power-of-two: single-level compare
        iota = jnp.arange(bins, dtype=jnp.int32)
        return jnp.sum((idx[..., None] == iota).astype(jnp.float32), axis=1)
    def one_tile(row):
        hi = row // b2
        lo = row - hi * b2
        onehot_hi = (hi[:, None] == jnp.arange(b1, dtype=jnp.int32)[None, :]
                     ).astype(jnp.bfloat16)
        onehot_lo = (lo[:, None] == jnp.arange(b2, dtype=jnp.int32)[None, :]
                     ).astype(jnp.bfloat16)
        h2 = jax.lax.dot_general(
            onehot_hi, onehot_lo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return h2.reshape(bins)

    # lax.map (sequential) rather than a batched dot: XLA strength-reduces
    # a batched dot with tiny (b1, b2) output dims into a materialized
    # (T, P, b1*b2) outer product — 7 GB for CLAHE's 64 x 219K tiles —
    # while the plain 2-D tall-K dot stays a real MXU matmul.
    return jax.lax.map(one_tile, idx)



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
    """UniqueImageColors (histogram.c:1138): (colors, counts) in the
    reference's HCube traversal order — an octree walk whose node id per
    level is (r_bit | g_bit<<1 | b_bit<<2 [| a_bit<<3]) over 8-bit channel
    bits 7..1 MSB-first (ColorToNodeId, histogram.c:163); colors sharing
    all seven levels (leaf lists) stay in first-appearance order."""
    c = img.shape[-1]
    arr = np.asarray(img).reshape(-1, c)
    q = np.clip(np.round(arr * 255.0), 0, 255).astype(np.uint8)
    colors, first, counts = np.unique(q, axis=0, return_index=True,
                                      return_counts=True)
    nb = 4 if c in (2, 4) else 3
    if c == 1:
        r = g = b = colors[:, 0].astype(np.uint64)
        a = None
    elif c == 2:
        r = g = b = colors[:, 0].astype(np.uint64)
        a = colors[:, 1].astype(np.uint64)
    else:
        r = colors[:, 0].astype(np.uint64)
        g = colors[:, 1].astype(np.uint64)
        b = colors[:, 2].astype(np.uint64)
        a = colors[:, 3].astype(np.uint64) if c >= 4 else None
    key = np.zeros(len(colors), np.uint64)
    for idx in range(7, 0, -1):        # levels consume bits 7..1
        digit = ((r >> idx) & 1) | (((g >> idx) & 1) << 1) \
            | (((b >> idx) & 1) << 2)
        if a is not None:
            digit = digit | (((a >> idx) & 1) << 3)
        key = (key << np.uint64(nb)) | digit
    order = np.lexsort((first, key))
    return (colors[order].astype(np.float32) / 255.0, counts[order])


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

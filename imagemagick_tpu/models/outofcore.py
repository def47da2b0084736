"""Out-of-core tile executor: the disk-backed pixel cache, TPU-style.

The reference processes images larger than RAM through a virtualized
pixel cache spilled to mmap/disk (/root/reference/MagickCore/cache.c:3479
OpenPixelCacheOnDisk) with per-op row windows.  The TPU analog: the image
lives host-side (numpy array, np.memmap over a disk file, or any
row-band loader callable) and a jitted device function streams over
OVERLAPPING row bands — each band is uploaded once, processed where the
FLOPs are, trimmed of its halo, and written back.  Shape-preserving
neighborhood ops of radius <= halo are exact in the interior (bands see
real neighbor rows); the global top/bottom edges are edge-replicated
(the 'edge' virtual-pixel policy, cache.c:2627 EdgeY).

Combine with parallel/spatial.py when a *mesh* (not one chip) holds the
image; this module is the single-chip / beyond-HBM tier.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import numpy as np

Loader = Union[np.ndarray, Callable[[int, int], np.ndarray]]


def _get_rows(src: Loader, y0: int, y1: int) -> np.ndarray:
    if callable(src):
        return np.asarray(src(y0, y1))
    return np.asarray(src[y0:y1])


def process_tiled(src: Loader, height: int, fn: Callable,
                  halo: int = 0, band_rows: int = 512,
                  out: Optional[np.ndarray] = None,
                  jit: bool = True) -> np.ndarray:
    """Apply a shape-preserving device op over row bands with halo overlap.

    src: (H, W, C) numpy array / np.memmap, or loader(y0, y1) -> rows.
    fn: device function (h, W, C) -> (h, W', C'); must be shape-preserving
        along H (rows in = rows out) and tolerate halo rows.
    halo: neighborhood radius the op needs (e.g. blur kernel radius).
    out: optional preallocated output (np.memmap for on-disk results).

    Every band compiles once (fixed band shape; the last band is padded
    up), so the whole sweep reuses a single XLA executable.
    """
    import jax
    import jax.numpy as jnp

    probe = _get_rows(src, 0, min(band_rows, height))
    dev_fn = jax.jit(fn) if jit else fn

    y = 0
    while y < height:
        y1 = min(y + band_rows, height)
        lo = max(y - halo, 0)
        hi = min(y1 + halo, height)
        band = _get_rows(src, lo, hi)
        # pad to the fixed band extent so one executable serves all bands
        full = band_rows + 2 * halo
        pad_top = halo - (y - lo)
        pad_bot = full - band.shape[0] - pad_top
        if pad_top or pad_bot:
            band = np.pad(band, [(pad_top, max(pad_bot, 0))] +
                          [(0, 0)] * (band.ndim - 1), mode="edge")
        res = np.asarray(dev_fn(jnp.asarray(band)))
        res = res[halo:halo + (y1 - y)]
        if out is None:
            out = np.empty((height,) + res.shape[1:], res.dtype)
        out[y:y1] = res
        y = y1
    return out


def reduce_tiled(src: Loader, height: int, map_fn: Callable,
                 combine: Callable, init, band_rows: int = 512):
    """Streaming global reduction (histogram/statistics) over row bands.

    map_fn: device fn band -> partial; combine(acc, partial) -> acc.
    The GetImageStatistics-over-disk-cache analog.
    """
    import jax
    import jax.numpy as jnp

    dev = jax.jit(map_fn)
    acc = init
    y = 0
    while y < height:
        y1 = min(y + band_rows, height)
        band = _get_rows(src, y, y1)
        acc = combine(acc, np.asarray(dev(jnp.asarray(band))))
        y = y1
    return acc

"""Pallas TPU kernels for hot ops.

The XLA path materializes the horizontal-pass intermediate of a separable
convolution to HBM before the vertical pass reads it back (two
conv_general_dilated calls don't fuse).  ``fused_separable_blur`` does both
passes in one kernel with the intermediate resident in VMEM — halving the
HBM traffic of the framework's most common neighborhood op (BlurImage,
effect.c:765 — the op the reference benchmarks its own parallelism with,
www/architecture.html:883).

Kernel layout: the caller edge-pads the image by the kernel radius and
flattens (W, C) into the lane axis, so a shift by one pixel is a static
slice of C lanes; both conv loops unroll over the (static) kernel taps and
accumulate in f32 registers.  Grid: (batch, H tiles); each program DMAs its
tile + halo from HBM into VMEM scratch, computes, and writes its output
block.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _blur_kernel(x_hbm, out_ref, scratch, mid, sem, *, taps, tile_h, w, c, r,
                 out_wc):
    """One (batch, row-tile) program of the fused separable blur."""
    n = pl.program_id(0)
    t = pl.program_id(1)
    wc = w * c
    rows_dma = scratch.shape[0]  # tile_h + 2r rounded up to sublane tiling
    # DMA the tile + vertical halo: rows [t*tile_h, t*tile_h + rows_dma)
    copy = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(t * tile_h, rows_dma), :],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()

    # vertical pass: accumulate shifted row-slices (intermediate keeps the
    # horizontal halo: width (w + 2r) * c lanes)
    acc = taps[0] * scratch[pl.ds(0, tile_h), :]
    for k in range(1, len(taps)):
        acc = acc + taps[k] * scratch[pl.ds(k, tile_h), :]
    mid[:, :] = acc

    # horizontal pass: shift by whole pixels = k*c lanes
    acc2 = taps[0] * mid[:, pl.ds(0, wc)]
    for k in range(1, len(taps)):
        acc2 = acc2 + taps[k] * mid[:, pl.ds(k * c, wc)]
    if out_wc > wc:  # lane-alignment padding
        acc2 = jnp.pad(acc2, ((0, 0), (0, out_wc - wc)))
    out_ref[0, :, :] = acc2


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=64)
def _build_blur(n: int, h: int, w: int, c: int, taps: tuple, tile_h: int):
    r = (len(taps) - 1) // 2
    grid = (n, -(-h // tile_h))
    wc_pad = _round_up((w + 2 * r) * c, 128)  # DMA slices must be lane-aligned
    out_wc = _round_up(w * c, 128)
    rows_dma = _round_up(tile_h + 2 * r, 8)  # DMA rows: sublane-aligned
    kernel = functools.partial(_blur_kernel, taps=taps, tile_h=tile_h,
                               w=w, c=c, r=r, out_wc=out_wc)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, tile_h, out_wc),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, -(-h // tile_h) * tile_h, out_wc),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows_dma, wc_pad), jnp.float32),
            pltpu.VMEM((tile_h, wc_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )


def fused_separable_blur(img: jnp.ndarray, taps: np.ndarray,
                         tile_h: int = 128) -> Optional[jnp.ndarray]:
    """Both separable passes in one VMEM-resident kernel.

    img: (N, H, W, C) float32; taps: normalized 1-D kernel (odd length).
    Returns None when the shape/kernel doesn't fit the kernel's constraints
    (caller falls back to the XLA conv path).
    """
    if not HAVE_PALLAS or jax.default_backend() not in ("tpu", "axon"):
        return None
    if img.ndim != 4 or img.dtype != jnp.float32:
        return None
    n, h, w, c = img.shape
    r = (len(taps) - 1) // 2
    if r == 0 or len(taps) > 33:
        return None
    # Adapt the row-tile to VMEM: scratch + mid + (double-buffered) out,
    # with Mosaic's own buffering overhead — stay well under the 16MB limit.
    wc_pad = _round_up((w + 2 * r) * c, 128)
    budget = 3 * 1024 * 1024  # bytes of nominal buffer footprint
    tile_h = min(tile_h, h)
    while tile_h > 8 and (4 * tile_h + 2 * r) * wc_pad * 4 > budget:
        tile_h //= 2
    tile_h = max(_round_up(min(tile_h, h), 8), 8)
    if (4 * tile_h + 2 * r) * wc_pad * 4 > budget:
        return None
    h_pad_to = -(-h // tile_h) * tile_h
    rows_dma = _round_up(tile_h + 2 * r, 8)
    # edge-pad: r top halo rows; bottom pad to tile multiple + DMA alignment
    bottom = (h_pad_to - h) + r + (rows_dma - tile_h - 2 * r)
    x = jnp.pad(img, ((0, 0), (r, bottom), (r, r), (0, 0)),
                mode="edge")
    x = x.reshape(n, h + r + bottom, (w + 2 * r) * c)
    wc_pad = _round_up((w + 2 * r) * c, 128)
    out_wc = _round_up(w * c, 128)
    if wc_pad > x.shape[-1]:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, wc_pad - x.shape[-1])))
    fn = _build_blur(n, h, w, c, tuple(float(t) for t in np.asarray(taps)),
                     tile_h)
    out = fn(x)
    return out[..., : w * c].reshape(n, h_pad_to, w, c)[:, :h]

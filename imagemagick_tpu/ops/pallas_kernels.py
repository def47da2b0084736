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


# ---------------------------------------------------------------------------
# Fused bilevel -> open -> close -> edge chain (BASELINE config #3 tail)
# ---------------------------------------------------------------------------

def _morph_edge_kernel(r0_ref, thr_ref, x_hbm, out_ref, band, sem,
                       *, TO, BAND, W, WPAD, nprog, halo, ntiles, H):
    """threshold + 3x3 open + 3x3 close + edge(1) in one VMEM pass.

    XLA runs this chain at ~20ms for 14MP (each stencil re-reads HBM and
    stage composition defeats fusion); here the band is read once.
    Per-STAGE row edge policy (the reference pads each op's own input)
    is applied in-kernel for the image-top and image-bottom bands, so no
    host-side strip fix-up pass is needed.
    """
    step = pl.program_id(0)

    def band_dma(s, which):
        r0 = pl.multiple_of(r0_ref[which], 8)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(r0, BAND), :], band.at[s], sem.at[s])

    @pl.when(step == 0)
    def _():
        for k in range(min(4, nprog)):
            band_dma(k, k).start()

    nxt = step + 3

    @pl.when((step > 0) & (nxt < nprog))
    def _():
        band_dma(nxt % 4, nxt).start()

    slot = step % 4
    band_dma(slot, step).wait()

    thr = thr_ref[0]
    x = band[slot]                               # (BAND, WPAD)
    t = jnp.where(x >= thr, 1.0, 0.0)

    lpad = halo
    rstart = lpad + W

    def relane(v):
        """Per-stage lane edge policy: out-of-image columns replicate the
        image border column (each op pads ITS OWN input in the reference,
        so the pad must track the current stage, not the original)."""
        left = jnp.broadcast_to(v[:, lpad:lpad + 1], (v.shape[0], lpad))
        right = jnp.broadcast_to(v[:, rstart - 1:rstart],
                                 (v.shape[0], v.shape[1] - rstart))
        return jnp.concatenate([left, v[:, lpad:rstart], right], axis=1)

    def shift_lr(v):
        left = jnp.concatenate([v[:, :1], v[:, :-1]], axis=1)
        right = jnp.concatenate([v[:, 1:], v[:, -1:]], axis=1)
        return left, right

    def min9(v):
        l, r = shift_lr(relane(v))
        m = jnp.minimum(jnp.minimum(l, v), r)
        return jnp.minimum(jnp.minimum(m[:-2], m[1:-1]), m[2:])

    def max9(v):
        l, r = shift_lr(relane(v))
        m = jnp.maximum(jnp.maximum(l, v), r)
        return jnp.maximum(jnp.maximum(m[:-2], m[1:-1]), m[2:])

    def edge9(v):
        v = relane(v)
        l, r = shift_lr(v)
        s = l + v + r
        total = s[:-2] + s[1:-1] + s[2:]
        return jnp.clip(9.0 * v[1:-1] - total, 0.0, 1.0)

    # per-stage row-edge fixup: after k completed stages the array index
    # j maps to padded row (band start + j + k); image row 0 sits at
    # index halo-k in the top band, the last image row at iL0-k in the
    # bottom band. Replicating those rows outward reproduces the
    # reference's pad-each-stage-input semantics exactly.
    t_idx = step % ntiles
    is_top = t_idx == 0
    is_bot = t_idx == (ntiles - 1)
    iL0 = halo + (H - 1) - (ntiles - 1) * TO

    def stage_fix(v, k):
        rows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        i0 = halo - k
        if i0 > 0:
            rep = jnp.broadcast_to(v[i0:i0 + 1], v.shape)
            v = jnp.where(is_top & (rows < i0), rep, v)
        iL = iL0 - k
        if 0 <= iL < v.shape[0] - 1:
            repb = jnp.broadcast_to(v[iL:iL + 1], v.shape)
            v = jnp.where(is_bot & (rows > iL), repb, v)
        return v

    y = stage_fix(min9(t), 1)        # erode   (rows: BAND -> BAND-2)
    y = stage_fix(max9(y), 2)        # dilate  -> open done
    y = stage_fix(max9(y), 3)        # dilate
    y = stage_fix(min9(y), 4)        # erode   -> close done
    y = edge9(y)                     # edge    (rows: -2)
    out_ref[:, :] = y[:TO, :]


@functools.lru_cache(maxsize=16)
def _build_morph_edge_v2(N, H, Hp, W, WPAD, TO, ntiles, interpret=False):
    # H = image height (drives the in-kernel bottom-edge index);
    # Hp = padded per-image extent in the flat input
    halo = 5
    BAND = _round_up(TO + 2 * halo, 8)
    nprog = N * ntiles
    kern = functools.partial(_morph_edge_kernel, TO=TO, BAND=BAND, W=W,
                             WPAD=WPAD, nprog=nprog, halo=halo,
                             ntiles=ntiles, H=H)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nprog,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TO, WPAD), lambda i, r0, t: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4, BAND, WPAD), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nprog * TO, WPAD), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    ), BAND


def fused_bilevel_morph_edge(img: jnp.ndarray, threshold,
                             TO: int = 352,
                             interpret: bool = False) -> Optional[jnp.ndarray]:
    """Bilevel(threshold) -> open(square:1) -> close(square:1) -> edge(1).

    img: (N, H, W, 1) or (N, H, W) f32; threshold: scalar (may be traced —
    e.g. the Otsu value).  Returns the same-shape result or None when the
    shape doesn't fit (caller falls back to the op composition).
    """
    if not HAVE_PALLAS:
        return None
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        return None
    squeeze = False
    if img.ndim == 4 and img.shape[-1] == 1:
        x = img[..., 0]
        squeeze = True
    elif img.ndim == 3:
        x = img
    else:
        return None
    N, H, W = x.shape
    halo = 5
    WPAD = _round_up(W + 2 * halo, 128)
    lpad = halo
    rpad = WPAD - W - halo
    ntiles = -(-H // TO)
    BAND = _round_up(TO + 2 * halo, 8)
    # pad rows so tile t's band starts exactly at t*TO (output row i of a
    # band = padded row t*TO + i + halo = image row t*TO + i): top halo +
    # bottom fill to ntiles*TO + BAND - TO total rows (all %8, edge policy)
    Hp = ntiles * TO + BAND - TO
    bot = Hp - halo - H
    if bot < 0:
        return None
    xf = jnp.pad(x, ((0, 0), (halo, bot), (lpad, rpad)), mode="edge")
    call, _ = _build_morph_edge_v2(N, H, Hp, W, WPAD, TO, ntiles,
                                   interpret)
    r0_flat = (np.repeat(np.arange(N, dtype=np.int64) * Hp, ntiles) +
               np.tile(np.arange(ntiles, dtype=np.int64) * TO, N)
               ).astype(np.int32)
    out = call(jnp.asarray(r0_flat),
               jnp.asarray([threshold], jnp.float32).reshape(1),
               xf.reshape(N * Hp, WPAD))
    out = out.reshape(N, ntiles * TO, WPAD)[:, :H, lpad:lpad + W]
    # per-STAGE edge policy is handled inside the kernel (stage_fix), so
    # no host-side strip recomputation or full-tensor stitching passes
    return out[..., None] if squeeze else out


def _morph_edge_reference(x3: jnp.ndarray, threshold) -> jnp.ndarray:
    """Op-chain evaluation of the same pipeline (exact per-stage pads)."""
    from . import blur as _bl
    from . import morphology as _mo
    from . import threshold as _th

    y = _th.bilevel(x3[..., None], threshold)
    y = _mo.morphology(y, "open", "square:1")
    y = _mo.morphology(y, "close", "square:1")
    return _bl.edge_image(y, 1.0)[..., 0]


# ---------------------------------------------------------------------------
# 256-bin histogram (histogram.c role): factored one-hot matmul with the
# one-hots built in VMEM. The XLA path materializes two (P, 16) bf16
# one-hot matrices in HBM (~0.9 GB of traffic at 14MP); here each band's
# one-hots live and die in VMEM and only a (16, 16) f32 accumulator ever
# leaves the chip.
# ---------------------------------------------------------------------------

_HIST_LANES = 512
_HIST_ROWS = 256           # 128K elements/program (measured best)


def _hist_kernel(x_hbm, out_ref, band, sem, *, B, nprog):
    step = pl.program_id(0)

    def dma(s, which):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(which * B, B), :], band.at[s], sem.at[s])

    @pl.when(step == 0)
    def _():
        for k in range(min(2, nprog)):
            dma(k, k).start()

    nxt = step + 1

    @pl.when((step > 0) & (nxt < nprog))
    def _():
        dma(nxt % 2, nxt).start()

    slot = step % 2
    dma(slot, step).wait()

    v = band[slot]                                   # (B, LANES)
    P = B * _HIST_LANES
    # negatives clip into bin 0 — identical to the XLA fallback in
    # histogram._histogram_fixed and this function's own tail path (HDRI
    # pixels can be out of range; all paths must agree)
    idx = jnp.clip((v * 255.0 + 0.5).astype(jnp.int32), 0, 255)
    hi = (idx >> 4).reshape(1, P)
    lo = (idx & 15).reshape(1, P)
    # one-hots laid out (16, P): 16 sublanes x P lanes — 2 MB each in
    # bf16 instead of the 16 MB a lane-padded (P, 16) layout would take
    iota = jax.lax.broadcasted_iota(jnp.int32, (16, P), 0)
    oh = jnp.where(hi == iota, 1.0, 0.0).astype(jnp.bfloat16)
    ol = jnp.where(lo == iota, 1.0, 0.0).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(oh, ol, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    @pl.when(step == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    out_ref[:16, :16] += acc


@functools.lru_cache(maxsize=8)
def _build_hist(nprog, interpret=False):
    B = _HIST_ROWS
    kern = functools.partial(_hist_kernel, B=B, nprog=nprog)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nprog,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((32, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, B, _HIST_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )


def pallas_histogram256(values: jnp.ndarray,
                        interpret: bool = False) -> Optional[jnp.ndarray]:
    """256-bin histogram of values in [0,1] (flattened); returns (256,)
    f32 counts or None when the path doesn't apply. Exact for < 2^24
    valid elements (f32 accumulation)."""
    if not HAVE_PALLAS:
        return None
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        return None
    if values.dtype != jnp.float32:
        return None
    try:
        from jax.interpreters import batching

        if isinstance(values, batching.BatchTracer):
            # vmap adds a batch dim the ANY-memspace specs can't express;
            # the XLA path handles the batched case
            return None
    except Exception:
        pass
    flat = values.reshape(-1)
    E = flat.size
    chunk = _HIST_ROWS * _HIST_LANES
    if E < 4 * chunk or E >= (1 << 24):
        return None
    nprog = E // chunk
    main = flat[:nprog * chunk].reshape(nprog * _HIST_ROWS, _HIST_LANES)
    out = _build_hist(nprog, interpret)(main)
    hist = out[:16, :16].reshape(256)
    tail = flat[nprog * chunk:]
    if tail.size:
        idx = jnp.clip((tail * 255.0 + 0.5).astype(jnp.int32), 0, 255)
        iota = jnp.arange(256, dtype=jnp.int32)
        hist = hist + jnp.sum((idx[:, None] == iota[None, :])
                              .astype(jnp.float32), axis=0)
    return hist

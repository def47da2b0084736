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


# ---------------------------------------------------------------------------
# General banded op-chain executor (the "any op over a tera-pixel image"
# tier: cache.c:3479 disk cache + the per-op row windows of cache-view.c,
# generalized to arbitrary chains instead of per-op special cases)
# ---------------------------------------------------------------------------

#: registry: name -> (halo_rows(params) -> int, apply(x, params) -> x).
#: Every op is shape-preserving along H and W; geometry changes go
#: through the dedicated resize stage of run_chain below.
_CHAIN_OPS = {}


def _chain_op(name, halo):
    def deco(fn):
        _CHAIN_OPS[name] = (halo, fn)
        return fn
    return deco


@_chain_op("negate", lambda p: 0)
def _oc_negate(x, p):
    return 1.0 - x


@_chain_op("gamma", lambda p: 0)
def _oc_gamma(x, p):
    import jax.numpy as jnp

    from ..ops import enhance

    return enhance.gamma(x, float(p.get("value", 1.0)))


@_chain_op("level", lambda p: 0)
def _oc_level(x, p):
    from ..ops import enhance

    return enhance.level(x, float(p.get("black", 0.0)),
                         float(p.get("white", 1.0)),
                         float(p.get("gamma", 1.0)))


@_chain_op("modulate", lambda p: 0)
def _oc_modulate(x, p):
    from ..ops import enhance

    return enhance.modulate(x, float(p.get("brightness", 100.0)),
                            float(p.get("saturation", 100.0)),
                            float(p.get("hue", 100.0)))


@_chain_op("colorspace", lambda p: 0)
def _oc_colorspace(x, p):
    from ..ops import colorspace as cs

    return cs.convert(x, p.get("src", "srgb"), p["dst"])


@_chain_op("threshold", lambda p: 0)
def _oc_threshold(x, p):
    import jax.numpy as jnp

    return (x > float(p.get("value", 0.5))).astype(x.dtype)


def _blur_halo(p):
    from ..ops.blur import gaussian_kernel_1d

    k = gaussian_kernel_1d(float(p.get("radius", 0.0)),
                           float(p.get("sigma", 1.0)))
    return max(len(k) // 2, 1)   # the exact kernel support, not 3-sigma


@_chain_op("blur", _blur_halo)
def _oc_blur(x, p):
    from ..ops import blur as bl

    return bl.gaussian_blur(x, float(p.get("radius", 0.0)),
                            float(p.get("sigma", 1.0)))


@_chain_op("unsharp", _blur_halo)
def _oc_unsharp(x, p):
    from ..ops import blur as bl

    return bl.unsharp_mask(x, float(p.get("radius", 0.0)),
                           float(p.get("sigma", 1.0)),
                           float(p.get("amount", 1.0)),
                           float(p.get("threshold", 0.05)))


#: primitive passes per morphology method: each pass widens the halo by
#: the kernel radius (open = erode+dilate, smooth = open+close, ...)
_MORPH_PASSES = {"erode": 1, "dilate": 1, "erodeintensity": 1,
                 "dilateintensity": 1, "hitandmiss": 1, "hmt": 1,
                 "thinning": 1, "thicken": 1, "edgein": 1, "edgeout": 1,
                 "edge": 1, "open": 2, "close": 2, "openintensity": 2,
                 "closeintensity": 2, "tophat": 2, "bottomhat": 2,
                 "smooth": 4, "correlate": 1, "convolve": 1}


def _morph_halo(p):
    from ..ops.morphology import get_kernel

    iters = int(p.get("iterations", 1))
    if iters < 0:
        raise ValueError("outofcore: morphology until-converged "
                         "(iterations=-1) needs the full image in core")
    meth = str(p.get("method", "dilate")).lower().replace("-", "")
    passes = _MORPH_PASSES.get(meth)
    if passes is None:
        raise ValueError(f"outofcore: morphology method {meth!r} is not "
                         "row-local (use the in-core path)")
    k = get_kernel(p.get("kernel", "square:1"))[0]
    return max(k.shape[0] // 2, 1) * passes * max(iters, 1)


@_chain_op("morphology", _morph_halo)
def _oc_morphology(x, p):
    from ..ops import morphology as mo

    return mo.morphology(x, p.get("method", "dilate"),
                         p.get("kernel", "square:1"),
                         iterations=int(p.get("iterations", 1)))


@_chain_op("median", lambda p: int(p.get("radius", 1)))
def _oc_median(x, p):
    from ..ops import statistic as st

    r = int(p.get("radius", 1))
    return st.statistic(x, "median", 2 * r + 1, 2 * r + 1)


def _expand_ops(ops):
    """Expand compound/iterated morphology into primitive single-pass
    stages so the per-op edge re-replication between stages reproduces
    the in-core edge policy exactly (open = erode;dilate, close =
    dilate;erode, smooth = open;close, iterations = repeated stages).
    Methods that combine a neighborhood result with the pre-op input
    pointwise (tophat/bottomhat/edge/hmt) stay single stages."""
    out = []
    for name, params in ops:
        if name != "morphology":
            out.append((name, params))
            continue
        meth = str(params.get("method", "dilate")).lower().replace("-", "")
        iters = max(int(params.get("iterations", 1)), 1)
        seq = {"open": ["erode", "dilate"], "close": ["dilate", "erode"],
               "smooth": ["erode", "dilate", "dilate", "erode"],
               "openintensity": ["erodeintensity", "dilateintensity"],
               "closeintensity": ["dilateintensity", "erodeintensity"],
               }.get(meth)
        if seq is None and meth in ("erode", "dilate", "erodeintensity",
                                    "dilateintensity") and iters > 1:
            seq = [meth]
        if seq is None:
            out.append((name, params))
            continue
        for _ in range(iters):
            for prim in seq:
                out.append(("morphology",
                            dict(params, method=prim, iterations=1)))
    return out


def chain_halo(ops) -> int:
    """Total halo rows a shape-preserving op chain needs."""
    total = 0
    for name, params in ops:
        if name not in _CHAIN_OPS:
            raise ValueError(f"outofcore: unsupported chain op {name!r}")
        total += _CHAIN_OPS[name][0](params)
    return total


def run_chain(src: Loader, in_shape: Tuple[int, int, int], ops,
              resize: Optional[Tuple[int, int, str]] = None,
              post_ops=(), band_rows: int = 512,
              out: Optional[np.ndarray] = None) -> np.ndarray:
    """Run [ops] -> optional resize -> [post_ops] over row bands.

    src: (H, W, C) array/memmap or loader(y0, y1); never fully resident.
    ops/post_ops: [(name, params)] from the registry above — any chain.
    resize: (Hout, Wout, filter) or None.

    The H-resize distributes over bands by slicing the (Hout, Hin) axis
    operator: output band [o0, o1) reads exactly the input rows its
    operator columns touch, extended by the pre-chain halo — the banded
    analog of fused_pipeline._axis_operator.  Exact in the interior;
    global edges are edge-replicated (cache.c:2627 EdgeY policy).
    """
    import jax
    import jax.numpy as jnp

    from ..ops.resize import resize_matrix

    H, W, C = in_shape
    ops = _expand_ops(list(ops))
    post_ops = _expand_ops(list(post_ops))
    pre_halo = chain_halo(ops)
    post_halo = chain_halo(post_ops)

    def _apply_edges(seq, x, top_pad, bot_pad):
        """Apply the chain; at GLOBAL image edges re-replicate each op's
        own output into the pad region between ops, so every op sees
        edge-replication of its *input* exactly like the in-core edge
        virtual-pixel policy (a single input-side replicate diverges
        for chains of 2+ neighborhood ops)."""
        for idx, (name, params) in enumerate(seq):
            x = _CHAIN_OPS[name][1](x, params)
            if idx + 1 < len(seq):
                if top_pad:
                    x = x.at[:top_pad].set(x[top_pad:top_pad + 1])
                if bot_pad:
                    x = x.at[x.shape[0] - bot_pad:].set(
                        x[x.shape[0] - bot_pad - 1:x.shape[0] - bot_pad])
        return x

    if resize is None:
        full = list(ops) + list(post_ops)
        halo = pre_halo + post_halo
        fns = {}
        y = 0
        while y < H:
            y1 = min(y + band_rows, H)
            lo = max(y - halo, 0)
            hi = min(y1 + halo, H)
            rows = _get_rows(src, lo, hi)
            bsize = band_rows + 2 * halo
            pad_top = halo - (y - lo)
            pad_bot = bsize - rows.shape[0] - pad_top
            if pad_top or pad_bot:
                rows = np.pad(rows, [(max(pad_top, 0), max(pad_bot, 0))] +
                              [(0, 0)] * (rows.ndim - 1), mode="edge")
            key = (max(pad_top, 0), max(pad_bot, 0))
            if key not in fns:
                fns[key] = jax.jit(lambda x, tp=key[0], bp=key[1]:
                                   _apply_edges(full, x, tp, bp))
            res = np.asarray(fns[key](jnp.asarray(rows)))
            res = res[halo:halo + (y1 - y)]
            if out is None:
                out = np.empty((H,) + res.shape[1:], res.dtype)
            out[y:y1] = res
            y = y1
        return out

    Hout, Wout, filt = resize
    Mv = resize_matrix(H, Hout, filt).astype(np.float32).T   # (Hout, Hin)
    Mw = jnp.asarray(resize_matrix(W, Wout, filt).astype(np.float32))

    # fixed device shapes: one executable serves every band.  Output
    # bands are extended by post_halo resized rows on each side so the
    # post chain sees real neighbors before the trim.
    ob_rows = min(band_rows, Hout)
    bands = []
    for o0 in range(0, Hout, ob_rows):
        o1 = min(o0 + ob_rows, Hout)
        o0x = max(o0 - post_halo, 0)
        o1x = min(o1 + post_halo, Hout)
        cols = np.nonzero(np.abs(Mv[o0x:o1x]).sum(axis=0) > 0)[0]
        bands.append((o0, o1, o0x, o1x, int(cols[0]), int(cols[-1]) + 1))
    max_span = max(b - a for *_, a, b in bands) + 2 * pre_halo
    ob_ext = ob_rows + 2 * post_halo

    fns = {}

    def _band_fn(tp, bp, otp, obp):
        if (tp, bp, otp, obp) not in fns:

            @jax.jit
            def f(rows, mv_block, _tp=tp, _bp=bp, _otp=otp, _obp=obp):
                x = rows
                for name, params in ops:
                    x = _CHAIN_OPS[name][1](x, params)
                    if _tp:
                        x = x.at[:_tp].set(x[_tp:_tp + 1])
                    if _bp:
                        x = x.at[x.shape[0] - _bp:].set(
                            x[x.shape[0] - _bp - 1:x.shape[0] - _bp])
                y = jnp.einsum("oh,hwc->owc", mv_block, x,
                               precision="high")   # H-resize (banded)
                y = jnp.einsum("wp,owc->opc", Mw, y,
                               precision="high")   # W-resize (full width)
                y = _apply_edges(list(post_ops), y, _otp, _obp)
                return y
            fns[(tp, bp, otp, obp)] = f
        return fns[(tp, bp, otp, obp)]

    for o0, o1, o0x, o1x, a, b in bands:
        lo = max(a - pre_halo, 0)
        hi = min(b + pre_halo, H)
        rows = _get_rows(src, lo, hi)
        pad_top = pre_halo - (a - lo)   # >0 when clipped at row 0
        pad_bot = max_span - rows.shape[0] - pad_top
        if pad_top or pad_bot:
            rows = np.pad(rows, [(max(pad_top, 0), max(pad_bot, 0))] +
                          [(0, 0)] * (rows.ndim - 1), mode="edge")
        # operator block aligned to the padded band: column j of the
        # band is absolute input row (a - pre_halo) + j.  Output rows of
        # the block: the extended band [o0x, o1x), top-aligned at the
        # slot post_halo - (o0 - o0x).
        mv = np.zeros((ob_ext, max_span), np.float32)
        oo = post_halo - (o0 - o0x)
        mv[oo:oo + (o1x - o0x), pre_halo:pre_halo + (b - a)] = \
            Mv[o0x:o1x, a:b]
        # replicate clipped output-edge rows of the operator so post
        # ops see edge-replicated resized rows at the global edges
        if oo:
            mv[:oo] = mv[oo]
        tail = oo + (o1x - o0x)
        if tail < ob_ext:
            mv[tail:] = mv[tail - 1]
        f = _band_fn(max(pad_top, 0), max(pad_bot, 0),
                     post_halo - (o0 - o0x), post_halo - (o1x - o1))
        res = np.asarray(f(jnp.asarray(rows), jnp.asarray(mv)))
        res = res[post_halo:post_halo + (o1 - o0)]
        if out is None:
            out = np.empty((Hout,) + res.shape[1:], res.dtype)
        out[o0:o1] = res
    return out

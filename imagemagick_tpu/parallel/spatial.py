"""Spatially-sharded image ops with explicit halo exchange over ICI.

This is the TPU-native answer to the reference's tera-pixel machinery
(SURVEY.md §5 "long-context analog"): the disk-backed pixel cache
(/root/reference/MagickCore/cache.c:3479 OpenPixelCacheOnDisk) and the TCP
distributed pixel cache (distribute-cache.c) both exist because one host
can't hold the image.  Here a giant image is a jax.Array sharded over a
(sy, sx) mesh; neighborhood ops exchange fixed-width boundary halos with
``jax.lax.ppermute`` (neighbor ICI hops, no host round-trips), and global
reductions (histograms, statistics) are ``psum`` collectives.

The pattern mirrors ring/halo attention for sequence parallelism: each chip
owns a tile, the op runs locally on tile+halo, the result stays sharded.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
try:  # jax >= 0.8 top-level API; experimental path kept for older jax
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _exchange_halo_1d(block: jnp.ndarray, axis_name: str, spatial_axis: int,
                      halo: int) -> jnp.ndarray:
    """Concatenate `halo` rows from each neighbor along one sharded axis.

    Edge shards replicate their own border (virtual-pixel 'edge' policy),
    matching the cache layer's EdgeX/EdgeY semantics (cache.c:2627).
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    if n == 1:
        pad = [(0, 0)] * block.ndim
        pad[spatial_axis] = (halo, halo)
        return jnp.pad(block, pad, mode="edge")
    if block.shape[spatial_axis] < halo:
        raise ValueError(
            f"halo width {halo} exceeds the per-device shard extent "
            f"{block.shape[spatial_axis]} along {axis_name!r}; a one-hop "
            f"ppermute cannot provide a halo wider than one shard — use "
            f"fewer devices on this axis or a smaller kernel radius")

    # slices to send
    lo = lax.slice_in_dim(block, 0, halo, axis=spatial_axis)
    hi_start = block.shape[spatial_axis] - halo
    hi = lax.slice_in_dim(block, hi_start, block.shape[spatial_axis], axis=spatial_axis)

    # send hi -> right neighbor (they receive as their left halo)
    right_perm = [(i, (i + 1) % n) for i in range(n)]
    left_perm = [(i, (i - 1) % n) for i in range(n)]
    from_left = lax.ppermute(hi, axis_name, right_perm)   # my left halo
    from_right = lax.ppermute(lo, axis_name, left_perm)   # my right halo

    # edge policy at the global boundary: replicate own border
    own_lo_edge = lax.slice_in_dim(block, 0, 1, axis=spatial_axis)
    own_hi_edge = lax.slice_in_dim(block, block.shape[spatial_axis] - 1,
                                   block.shape[spatial_axis], axis=spatial_axis)
    rep = [1] * block.ndim
    rep[spatial_axis] = halo
    from_left = jnp.where(idx == 0, jnp.tile(own_lo_edge, rep), from_left)
    from_right = jnp.where(idx == n - 1, jnp.tile(own_hi_edge, rep), from_right)
    return jnp.concatenate([from_left, block, from_right], axis=spatial_axis)


def halo_map(fn: Callable[[jnp.ndarray], jnp.ndarray], mesh: Mesh,
             halo_y: int, halo_x: int = 0,
             in_spec: P = P("dp", "sy", "sx", None)) -> Callable:
    """Wrap a local neighborhood op into a spatially-sharded op.

    ``fn`` must map an (N, h+2*halo_y, w+2*halo_x, C) block to an
    (N, h, w, C) block after trimming is accounted for — i.e. run the
    windowed op in VALID fashion over the halo'd tile.  Returns a function
    over globally-sharded arrays.
    """

    def local(block):
        if halo_y:
            block = _exchange_halo_1d(block, "sy", block.ndim - 3, halo_y)
        if halo_x:
            block = _exchange_halo_1d(block, "sx", block.ndim - 2, halo_x)
        return fn(block)

    return shard_map(local, mesh=mesh, in_specs=(in_spec,), out_specs=in_spec)


def sharded_neighborhood(fn: Callable[[jnp.ndarray], jnp.ndarray],
                         mesh: Mesh, radius_y: int, radius_x: int,
                         in_spec: P = P("dp", "sy", "sx", None)) -> Callable:
    """Shard ANY 'same'-mode neighborhood op of bounded radius.

    ``fn`` maps (N, h, w, C) -> (N, h, w, C) using only pixels within
    (radius_y, radius_x) of each output pixel (the op's own virtual-pixel
    padding is never reached by kept outputs: the halo provides real
    neighbor rows, replicated at the global boundary = 'edge' policy).
    This is the general DPC replacement (distribute-cache.c:939): run the
    op on tile+halo, crop the halo, result stays sharded.
    """

    def local(block):
        ry, rx = radius_y, radius_x
        if ry:
            block = _exchange_halo_1d(block, "sy", block.ndim - 3, ry)
        if rx:
            block = _exchange_halo_1d(block, "sx", block.ndim - 2, rx)
        out = fn(block)
        if ry:
            out = lax.slice_in_dim(out, ry, out.shape[out.ndim - 3] - ry,
                                   axis=out.ndim - 3)
        if rx:
            out = lax.slice_in_dim(out, rx, out.shape[out.ndim - 2] - rx,
                                   axis=out.ndim - 2)
        return out

    return shard_map(local, mesh=mesh, in_specs=(in_spec,), out_specs=in_spec)


# primitive-pass decomposition per morphology method: each pass gets its
# OWN halo exchange — edge replication of an intermediate result is NOT
# the same as running the composite over one wide halo (the reference
# re-applies virtual-pixel padding to the current image on every pass)
_METHOD_PRIMS = {
    "erode": ("e",), "dilate": ("d",),
    "erodeintensity": ("e",), "dilateintensity": ("d",),
    "open": ("e", "d"), "close": ("d", "e"),
    "openintensity": ("e", "d"), "closeintensity": ("d", "e"),
    "smooth": ("e", "d", "d", "e"),
    "convolve": ("c",), "correlate": ("x",),
}


def sharded_morphology(mesh: Mesh, method: str, kernel_spec: str,
                       iterations: int = 1,
                       in_spec: P = P("dp", "sy", "sx", None)) -> Callable:
    """Spatially-sharded MorphologyImage (morphology.c:4129) for bounded
    methods (erode/dilate/open/close/smooth/edge/tophat/bottomhat/
    convolve/correlate).  Convergence (-1) methods need a global fixpoint
    and are not shardable this way."""
    import numpy as np

    from ..ops import morphology as mo

    if iterations < 0:
        raise ValueError("iterations=-1 (converge) is not shardable")
    m = method.lower().replace("-", "").replace("_", "")
    kernel = mo.get_kernel(kernel_spec)[0]
    ry, rx = kernel.shape[0] // 2, kernel.shape[1] // 2

    prim_fns = {
        "e": lambda b: mo.erode(b, kernel),
        "d": lambda b: mo.dilate(b, kernel),
        "c": lambda b: mo.convolve_kernel(b, kernel),
        "x": lambda b: mo.correlate_kernel(b, kernel),
    }

    def seq(prims):
        fns = [sharded_neighborhood(prim_fns[p], mesh, ry, rx, in_spec)
               for p in prims]

        def run(x):
            for _ in range(max(iterations, 1)):
                for f in fns:
                    x = f(x)
            return x

        return run

    if m in _METHOD_PRIMS:
        return seq(_METHOD_PRIMS[m])
    if m == "edge":            # dilate - erode
        d, e = seq(("d",)), seq(("e",))
        return lambda x: d(x) - e(x)
    if m == "edgein":          # x - erode
        e = seq(("e",))
        return lambda x: x - e(x)
    if m == "edgeout":         # dilate - x
        d = seq(("d",))
        return lambda x: d(x) - x
    if m == "tophat":          # x - open
        o = seq(("e", "d"))
        return lambda x: x - o(x)
    if m == "bottomhat":       # close - x
        c = seq(("d", "e"))
        return lambda x: c(x) - x
    raise ValueError(f"morphology method {method!r} has no sharded form")


def sharded_median(mesh: Mesh, radius: int = 1,
                   in_spec: P = P("dp", "sy", "sx", None)) -> Callable:
    """Spatially-sharded median / rank filter (StatisticImage,
    statistic.c MedianStatistic) via halo exchange."""
    from ..ops.statistic import median_filter

    return sharded_neighborhood(lambda b: median_filter(b, radius),
                                mesh, radius, radius, in_spec)


def sharded_statistic(mesh: Mesh, stat: str, width: int, height: int,
                      in_spec: P = P("dp", "sy", "sx", None)) -> Callable:
    """Spatially-sharded windowed statistic (min/max/mean/median/mode/
    gradient...) — the rank-filter family of statistic.c."""
    from ..ops.statistic import statistic

    return sharded_neighborhood(lambda b: statistic(b, stat, width, height),
                                mesh, height // 2, width // 2, in_spec)


def _shard_axis_weights(M: "np.ndarray", n: int):
    """Split a dense (out, in) resample operator into per-shard local
    blocks.  Returns (W, h): W[d] is (out/n, in/n + 2h) acting on shard
    d's halo'd rows; h is the uniform halo width (max boundary overreach
    of any shard's output support into its neighbors)."""
    import numpy as np

    Hout, Hin = M.shape
    if Hout % n or Hin % n:
        raise ValueError(f"axis dims ({Hout}, {Hin}) not divisible by {n}")
    out_loc, in_loc = Hout // n, Hin // n
    h = 1
    for d in range(n):
        rows = M[d * out_loc:(d + 1) * out_loc]
        nz = np.nonzero(np.any(rows != 0.0, axis=0))[0]
        if nz.size:
            h = max(h, d * in_loc - int(nz[0]), int(nz[-1]) + 1
                    - (d + 1) * in_loc)
    if h > in_loc:
        raise ValueError(
            f"resize support halo {h} exceeds shard extent {in_loc}; use "
            f"fewer devices on this axis")
    W = np.zeros((n, out_loc, in_loc + 2 * h), np.float32)
    for d in range(n):
        lo = d * in_loc - h
        for j in range(in_loc + 2 * h):
            col = lo + j
            if 0 <= col < Hin:
                W[d, :, j] = M[d * out_loc:(d + 1) * out_loc, col]
    return W, h


def sharded_resize(mesh: Mesh, in_hw: Tuple[int, int], out_hw: Tuple[int, int],
                   filter_name: str = "lanczos", has_alpha: bool = False,
                   in_spec: P = P("dp", "sy", "sx", None)) -> Callable:
    """Spatially-sharded separable filter resize (resize.c HorizontalFilter/
    VerticalFilter): each device applies its shard's slice of the dense
    resample operator to its halo'd tile — shard-boundary weight splitting,
    no gather-redistribute.  ARBITRARY in/out dims: non-mesh-divisible axes
    are padded to the mesh in OPERATOR space (zero-extended rows/columns —
    the same trick the single-chip Pallas dispatch uses for odd shapes),
    the input is zero-padded to match, and the padded output rows/cols are
    cropped after the shard_map (distribute-cache.c:939 serves arbitrary
    geometry; so does this).  Alpha inputs get the reference's
    alpha-weighted resample (premultiply / renormalize are pointwise, so
    they ride the sharding for free).
    """
    import numpy as np

    from ..ops.resize import resize_matrix

    Hin, Win = in_hw
    Hout, Wout = out_hw
    ny = mesh.shape["sy"]
    nx = mesh.shape["sx"]

    def _pad_up(v, n):
        return -(-v // n) * n

    HinP, WinP = _pad_up(Hin, ny), _pad_up(Win, nx)
    HoutP, WoutP = _pad_up(Hout, ny), _pad_up(Wout, nx)
    Mv = np.zeros((HoutP, HinP), np.float32)
    Mv[:Hout, :Hin] = np.asarray(resize_matrix(Hin, Hout, filter_name),
                                 np.float32).T
    Mw = np.zeros((WoutP, WinP), np.float32)
    Mw[:Wout, :Win] = np.asarray(resize_matrix(Win, Wout, filter_name),
                                 np.float32).T
    WY, hy = _shard_axis_weights(Mv, ny)
    WX, hx = _shard_axis_weights(Mw, nx)

    def local(block):
        iy = lax.axis_index("sy")
        ix = lax.axis_index("sx")
        b = _exchange_halo_1d(block, "sy", block.ndim - 3, hy)
        wv = jnp.asarray(WY)[iy]
        # resize einsums at HIGH precision (repo invariant: >=60dB gate)
        b = jnp.einsum("oi,...iwc->...owc", wv, b, precision="high")
        b = _exchange_halo_1d(b, "sx", b.ndim - 2, hx)
        ww = jnp.asarray(WX)[ix]
        b = jnp.einsum("oj,...hjc->...hoc", ww, b, precision="high")
        return b

    smap = shard_map(local, mesh=mesh, in_specs=(in_spec,), out_specs=in_spec)

    def run(x):
        if has_alpha and x.shape[-1] > 1:
            a = x[..., -1:]
            x = jnp.concatenate([x[..., :-1] * a, a], axis=-1)
        if HinP != Hin or WinP != Win:
            # zero pad: the padded operator columns carry zero weight, so
            # the pad value never reaches a real output pixel
            pad = [(0, 0)] * (x.ndim - 3) + [(0, HinP - Hin),
                                             (0, WinP - Win), (0, 0)]
            x = jnp.pad(x, pad)
        out = smap(x)
        if HoutP != Hout or WoutP != Wout:
            out = out[..., :Hout, :Wout, :]
        if has_alpha and out.shape[-1] > 1:
            a = out[..., -1:]
            safe = jnp.where(jnp.abs(a) < 1e-6, 1.0, a)
            out = jnp.concatenate([out[..., :-1] / safe, a], axis=-1)
        return jnp.clip(out, 0.0, 1.0)   # resize.c clamps the final pass

    return run


def sharded_otsu_threshold(mesh: Mesh,
                           in_spec: P = P("dp", "sy", "sx", None)) -> Callable:
    """Sharded -auto-threshold otsu: psum'd global intensity histogram,
    threshold computed redundantly on every device (256-bin argmax is
    microscopic), pointwise apply — output stays sharded."""
    from ..ops.enhance import grayscale

    def local(block):
        inten = grayscale(block)[..., 0] if block.shape[-1] >= 3 \
            else block[..., 0]
        # PER-IMAGE histograms (threshold.c processes one image at a time;
        # dp carries independent images — never merge across it)
        flat = inten.reshape((inten.shape[0], -1))
        hists = lax.map(_local_histogram_256, flat)       # (Nloc, 256)
        hists = lax.psum(hists, "sy")
        hists = lax.psum(hists, "sx")
        p = hists / jnp.maximum(jnp.sum(hists, -1, keepdims=True), 1.0)
        omega = jnp.cumsum(p, -1)
        levels = jnp.arange(256, dtype=jnp.float32)
        mu = jnp.cumsum(p * levels, -1)
        denom = omega * (1.0 - omega)
        sigma_b = jnp.where(denom > 1e-12,
                            (mu[:, -1:] * omega - mu) ** 2
                            / jnp.maximum(denom, 1e-12), 0.0)
        t = jnp.argmax(sigma_b, -1).astype(jnp.float32) / 255.0
        # auto_threshold semantics: single-channel bilevel of intensity
        return (inten > t[:, None, None])[..., None].astype(block.dtype)

    return shard_map(local, mesh=mesh, in_specs=(in_spec,), out_specs=in_spec)


def _local_histogram_256(values: jnp.ndarray) -> jnp.ndarray:
    """Per-device 256-bin histogram via the factored one-hot matmul
    (scatter-adds serialize on TPU — see ops/histogram._histogram_fixed)."""
    idx = jnp.clip((values.reshape(-1) * 255.0 + 0.5).astype(jnp.int32),
                   0, 255)
    hi = idx // 16
    lo = idx - hi * 16
    oh = (hi[:, None] == jnp.arange(16, dtype=jnp.int32)[None, :]
          ).astype(jnp.bfloat16)
    ol = (lo[:, None] == jnp.arange(16, dtype=jnp.int32)[None, :]
          ).astype(jnp.bfloat16)
    h2 = lax.dot_general(oh, ol, (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    return h2.reshape(256)


def sharded_gaussian_blur(mesh: Mesh, sigma: float,
                          in_spec: P = P("dp", "sy", "sx", None)) -> Callable:
    """Spatially-sharded separable Gaussian blur with ICI halo exchange.

    The distributed replacement for BlurImage on images too large for one
    chip: each device convolves its tile plus a kernel-radius halo.
    """
    from ..ops.blur import gaussian_kernel_1d
    import numpy as np
    from jax import lax as jlax

    k = gaussian_kernel_1d(0.0, sigma)
    r = (len(k) - 1) // 2
    kj = jnp.asarray(np.asarray(k, np.float32))

    def conv1d(x, axis):
        # depthwise VALID conv along `axis` of (N, H, W, C)
        c = x.shape[-1]
        if axis == 1:
            kern = jnp.tile(kj[:, None, None, None], (1, 1, 1, c))
        else:
            kern = jnp.tile(kj[None, :, None, None], (1, 1, 1, c))
        return jlax.conv_general_dilated(
            x, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c, preferred_element_type=jnp.float32)

    def local(block):
        block = _exchange_halo_1d(block, "sy", 1, r)
        block = conv1d(block, axis=1)
        block = _exchange_halo_1d(block, "sx", 2, r)
        block = conv1d(block, axis=2)
        return block

    return shard_map(local, mesh=mesh, in_specs=(in_spec,), out_specs=in_spec)


def sharded_histogram(mesh: Mesh, bins: int = 256,
                      in_spec: P = P("dp", "sy", "sx", None)) -> Callable:
    """Global histogram over a sharded image: local scatter-add + psum.

    The collective analog of GetImageHistogram for tera-pixel inputs.
    """

    def local(block):
        if bins == 256:
            hist = _local_histogram_256(block)
        else:  # small bin counts: direct compare (no scatter — serializes)
            idx = jnp.clip((block.reshape(-1) * (bins - 1) + 0.5)
                           .astype(jnp.int32), 0, bins - 1)
            iota = jnp.arange(bins, dtype=jnp.int32)
            hist = jnp.sum((idx[:, None] == iota[None, :])
                           .astype(jnp.float32), axis=0)
        hist = lax.psum(hist, "sy")
        hist = lax.psum(hist, "sx")
        hist = lax.psum(hist, "dp") if "dp" in mesh.axis_names else hist
        return hist

    return shard_map(local, mesh=mesh, in_specs=(in_spec,), out_specs=P())


def sharded_statistics(mesh: Mesh, in_spec: P = P("dp", "sy", "sx", None)) -> Callable:
    """Sharded mean/min/max/std per channel via psum/pmin/pmax collectives."""

    def local(block):
        cnt = jnp.asarray(block[..., 0].size, jnp.float32)
        s = jnp.sum(block, axis=tuple(range(block.ndim - 1)))
        s2 = jnp.sum(block * block, axis=tuple(range(block.ndim - 1)))
        mn = jnp.min(block, axis=tuple(range(block.ndim - 1)))
        mx = jnp.max(block, axis=tuple(range(block.ndim - 1)))
        for ax in mesh.axis_names:
            cnt = lax.psum(cnt, ax)
            s = lax.psum(s, ax)
            s2 = lax.psum(s2, ax)
            mn = lax.pmin(mn, ax)
            mx = lax.pmax(mx, ax)
        mean = s / cnt
        var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
        return mean, jnp.sqrt(var), mn, mx

    return shard_map(local, mesh=mesh, in_specs=(in_spec,),
                     out_specs=(P(), P(), P(), P()))

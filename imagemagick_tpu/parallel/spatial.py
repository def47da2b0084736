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
        idx = jnp.clip((block * (bins - 1) + 0.5).astype(jnp.int32), 0, bins - 1)
        hist = jnp.zeros((bins,), jnp.float32).at[idx.reshape(-1)].add(1.0)
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

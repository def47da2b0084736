"""Gigapixel pipeline: spatially-sharded processing of huge single images.

The tera-pixel story (SURVEY.md §5 "long-context analog"): the reference
handles images beyond RAM with a disk-backed pixel cache (cache.c
OpenPixelCacheOnDisk) or by farming pixel regions to TCP cache servers
(distribute-cache.c).  Here a huge image lives *sharded across the device
mesh* — each chip owns a (sy, sx) tile — and a whole multi-op pipeline runs
where the data lives: neighborhood ops exchange halos over ICI, global
statistics are psum collectives, and nothing round-trips through the host.

``process_sharded`` is the user entry: give it a mesh, a huge array (or a
host loader), and a pipeline spec; it returns the still-sharded result plus
any requested global reductions.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
try:  # jax >= 0.8 top-level API; experimental path kept for older jax
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import make_mesh
from ..parallel.spatial import _exchange_halo_1d


def shard_image(mesh: Mesh, img: jnp.ndarray) -> jax.Array:
    """Place an (N, H, W, C) array sharded over (dp, sy, sx)."""
    return jax.device_put(img, NamedSharding(mesh, P("dp", "sy", "sx", None)))


def sharded_pipeline(mesh: Mesh, sigma: float = 2.0,
                     unsharp_gain: float = 1.0,
                     to_gray: bool = False) -> Callable:
    """Blur -> unsharp -> (optional grayscale) on a spatially-sharded image.

    All neighborhood reads cross shard boundaries via ppermute halos; the
    compiled program runs one fused step per device with two ICI exchanges.
    """
    from ..ops.blur import gaussian_kernel_1d

    taps = np.asarray(gaussian_kernel_1d(0.0, sigma), np.float32)
    r = (len(taps) - 1) // 2
    tj = jnp.asarray(taps)

    def conv_axis(x, axis):
        # unrolled separable conv along one axis of (N, H, W, C), VALID
        out = tj[0] * lax.slice_in_dim(x, 0, x.shape[axis] - 2 * r, axis=axis)
        for k in range(1, len(taps)):
            out = out + tj[k] * lax.slice_in_dim(
                x, k, k + x.shape[axis] - 2 * r, axis=axis)
        return out

    def local(block):
        blurred = _exchange_halo_1d(block, "sy", 1, r)
        blurred = conv_axis(blurred, 1)
        blurred = _exchange_halo_1d(blurred, "sx", 2, r)
        blurred = conv_axis(blurred, 2)
        sharp = jnp.clip(block + unsharp_gain * (block - blurred), 0.0, 1.0)
        if to_gray:
            y = (0.212656 * sharp[..., 0] + 0.715158 * sharp[..., 1] +
                 0.072186 * sharp[..., 2])[..., None]
            return y
        return sharp

    spec_in = P("dp", "sy", "sx", None)
    return shard_map(local, mesh=mesh, in_specs=(spec_in,), out_specs=spec_in)


def sharded_global_stats(mesh: Mesh) -> Callable:
    """Mean/std/min/max across every shard (psum/pmin/pmax over all axes)."""
    from ..parallel.spatial import sharded_statistics

    return sharded_statistics(mesh)


def process_gigapixel(img: np.ndarray, mesh: Optional[Mesh] = None,
                      sigma: float = 2.0, to_gray: bool = False
                      ) -> Tuple[jax.Array, Dict[str, np.ndarray]]:
    """End-to-end sharded run: place, process, reduce.

    Returns (sharded result array, global statistics dict).  The result
    stays sharded — callers can write tiles independently or gather.
    """
    n_dev = len(jax.devices())
    if mesh is None:
        sy = 2 if n_dev % 2 == 0 and n_dev >= 2 else 1
        sx = 2 if n_dev % 4 == 0 and n_dev >= 4 else 1
        dp = n_dev // (sy * sx)
        mesh = make_mesh(dp=dp, sy=sy, sx=sx)
    x = img if img.ndim == 4 else img[None]
    xs = shard_image(mesh, jnp.asarray(x, jnp.float32))
    pipe = jax.jit(sharded_pipeline(mesh, sigma, to_gray=to_gray))
    out = pipe(xs)
    stats_fn = jax.jit(sharded_global_stats(mesh))
    mean, std, mn, mx = stats_fn(out)
    stats = {"mean": np.asarray(mean), "std": np.asarray(std),
             "min": np.asarray(mn), "max": np.asarray(mx)}
    return out, stats

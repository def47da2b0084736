"""Device-mesh helpers: the TPU-native replacement for the reference's
parallelism menu (SURVEY.md §2.5).

The reference scales with OpenMP row loops (single host), OpenCL (single
device), and a TCP distributed pixel cache (storage only).  Here:

  * batch data-parallelism  -> mesh axis "dp" (replaces OpenMP/-concurrent)
  * spatial sharding        -> mesh axes "sy"/"sx" over image H/W with halo
    exchange over ICI (replaces the disk cache / DPC for tera-pixel images)

Meshes come from jax.sharding; collectives are XLA's (psum/ppermute) —
no custom wire protocol (distribute-cache.c:939's server is obsolete here).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, sy: int = 1, sx: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a (dp, sy, sx) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    need = dp * sy * sx
    if need > len(devices):
        raise ValueError(f"mesh {dp}x{sy}x{sx} needs {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(dp, sy, sx)
    return Mesh(arr, axis_names=("dp", "sy", "sx"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch-parallel: N over dp, H over sy, W over sx."""
    return NamedSharding(mesh, P("dp", "sy", "sx", None))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """HWC single-image spatial: H over sy, W over sx."""
    return NamedSharding(mesh, P("sy", "sx", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host DCN initialization — the replacement for the DPC server.

    The reference's only multi-host mechanism is the distributed pixel
    cache (/root/reference/MagickCore/distribute-cache.c:939): remote
    TCP servers holding pixel *storage*, every access a socket round
    trip.  Here multi-host means a multi-process JAX runtime: call this
    once per host before any jax use; every host then sees the global
    device set and `make_mesh` lays a (dp, sy, sx) mesh across hosts —
    batch parallelism rides DCN, spatial halos ride ICI within each
    host's slice.  No custom wire protocol; XLA's collectives do the
    communication.

    With no arguments, uses the JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID environment (or single-process
    defaults).  Returns the global device count.  Safe to call in a
    single-process session: it is a no-op if distribution is already
    initialized or no coordinator is configured.
    """
    import os

    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord is not None:
        try:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=num_processes or
                int(os.environ.get("JAX_NUM_PROCESSES", "1")),
                process_id=process_id if process_id is not None else
                int(os.environ.get("JAX_PROCESS_ID", "0")))
        except RuntimeError:
            pass  # already initialized
    return len(jax.devices())


def auto_mesh(batch: int = 1) -> Mesh:
    """Pick a sensible mesh for the current device count.

    Prefers batch parallelism (embarrassingly parallel, zero collectives),
    then splits leftover device factors over image rows.
    """
    n = len(jax.devices())
    dp = 1
    # largest power-of-two dp dividing both batch and n
    while dp * 2 <= n and batch % (dp * 2) == 0:
        dp *= 2
    rest = n // dp
    return make_mesh(dp=dp, sy=rest, sx=1)

"""Multi-device sharding tests on the 8-virtual-CPU mesh.

Replaces the reference's untested distributed pixel cache (SURVEY.md §4
item 9: "Distributed/multi-node testing: none") with actual correctness
checks: sharded halo-exchange ops must match their single-device versions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from imagemagick_tpu.parallel.mesh import make_mesh
from imagemagick_tpu.parallel.spatial import (sharded_gaussian_blur,
                                              sharded_histogram,
                                              sharded_statistics)
from imagemagick_tpu.ops import blur as bl


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(dp=2, sy=2, sx=2)


@pytest.fixture
def batch(rng):
    return jnp.asarray(rng.uniform(0, 1, (4, 32, 48, 3)).astype(np.float32))


def test_sharded_blur_matches_single_device(mesh, batch):
    sharding = NamedSharding(mesh, P("dp", "sy", "sx", None))
    xs = jax.device_put(batch, sharding)
    out_sharded = np.asarray(jax.jit(sharded_gaussian_blur(mesh, 1.5))(xs))
    # single-device separable blur with same kernel + edge policy
    k = bl.gaussian_kernel_1d(0.0, 1.5)
    ref = np.asarray(bl._separable_conv(batch, k, "edge"))
    assert np.max(np.abs(out_sharded - ref)) < 1e-5


def test_sharded_histogram_counts(mesh, batch):
    sharding = NamedSharding(mesh, P("dp", "sy", "sx", None))
    xs = jax.device_put(batch, sharding)
    hist = np.asarray(jax.jit(sharded_histogram(mesh, bins=64))(xs))
    assert hist.sum() == batch.size
    # compare against numpy histogram
    idx = np.clip((np.asarray(batch) * 63 + 0.5).astype(np.int32), 0, 63)
    ref = np.bincount(idx.reshape(-1), minlength=64)
    assert np.array_equal(hist.astype(np.int64), ref)


def test_sharded_statistics(mesh, batch):
    sharding = NamedSharding(mesh, P("dp", "sy", "sx", None))
    xs = jax.device_put(batch, sharding)
    mean, std, mn, mx = jax.jit(sharded_statistics(mesh))(xs)
    arr = np.asarray(batch)
    assert np.allclose(np.asarray(mean), arr.mean(axis=(0, 1, 2)), atol=1e-5)
    assert np.allclose(np.asarray(std), arr.std(axis=(0, 1, 2)), atol=1e-4)
    assert np.allclose(np.asarray(mn), arr.min(axis=(0, 1, 2)), atol=1e-7)
    assert np.allclose(np.asarray(mx), arr.max(axis=(0, 1, 2)), atol=1e-7)


def test_batch_parallel_pipeline(mesh, batch):
    """Fused pipeline sharded over dp must equal unsharded run."""
    from imagemagick_tpu.ops import colorspace as cs
    from imagemagick_tpu.ops import resize as rz

    def pipe(b):
        t = rz.resize(b, 16, 16, "lanczos")
        return cs.convert(t, "srgb", "gray")

    sharding = NamedSharding(mesh, P("dp", None, None, None))
    xs = jax.device_put(batch, sharding)
    out = np.asarray(jax.jit(pipe)(xs))
    ref = np.asarray(pipe(batch))
    assert np.max(np.abs(out - ref)) < 1e-5


def test_gigapixel_sharded_pipeline(mesh, rng):
    """Sharded blur+unsharp pipeline matches unsharded reference math."""
    from imagemagick_tpu.models import gigapixel as gp
    from imagemagick_tpu.ops import blur as bl

    img = rng.uniform(0, 1, (2, 32, 64, 3)).astype(np.float32)
    out, stats = gp.process_gigapixel(img, mesh=mesh, sigma=1.5)
    # reference: single-device same math
    blurred = np.asarray(bl._separable_conv(jnp.asarray(img),
                                            bl.gaussian_kernel_1d(0.0, 1.5),
                                            "edge"))
    ref = np.clip(img + 1.0 * (img - blurred), 0, 1)
    assert np.max(np.abs(np.asarray(out) - ref)) < 1e-5
    assert np.allclose(stats["mean"], ref.mean(axis=(0, 1, 2)), atol=1e-5)


def test_gigapixel_grayscale(mesh, rng):
    from imagemagick_tpu.models import gigapixel as gp

    img = rng.uniform(0, 1, (2, 32, 64, 3)).astype(np.float32)
    out, _ = gp.process_gigapixel(img, mesh=mesh, sigma=1.0, to_gray=True)
    assert out.shape == (2, 32, 64, 1)

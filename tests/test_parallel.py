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


# --- round-4 sharded op families (VERDICT r3 #4): equality vs 1-device ---

def test_sharded_resize_matches_single_device(mesh, batch):
    from imagemagick_tpu.ops import resize as rz
    from imagemagick_tpu.parallel.spatial import sharded_resize

    sharding = NamedSharding(mesh, P("dp", "sy", "sx", None))
    xs = jax.device_put(batch, sharding)
    h, w = batch.shape[1], batch.shape[2]
    fn = jax.jit(sharded_resize(mesh, (h, w), (h // 2, w // 2), "lanczos"))
    out = np.asarray(fn(xs))
    ref = np.asarray(rz.resize(batch, h // 2, w // 2, "lanczos"))
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 1e-4


def test_sharded_resize_upscale(mesh, batch):
    from imagemagick_tpu.ops import resize as rz
    from imagemagick_tpu.parallel.spatial import sharded_resize

    sharding = NamedSharding(mesh, P("dp", "sy", "sx", None))
    xs = jax.device_put(batch, sharding)
    h, w = batch.shape[1], batch.shape[2]
    fn = jax.jit(sharded_resize(mesh, (h, w), (h * 2, w * 2), "mitchell"))
    out = np.asarray(fn(xs))
    ref = np.asarray(rz.resize(batch, h * 2, w * 2, "mitchell"))
    assert np.max(np.abs(out - ref)) < 1e-4


def test_sharded_morphology_matches_single_device(mesh, batch):
    from imagemagick_tpu.ops import morphology as mo
    from imagemagick_tpu.parallel.spatial import sharded_morphology

    sharding = NamedSharding(mesh, P("dp", "sy", "sx", None))
    xs = jax.device_put(batch, sharding)
    for method, spec in (("erode", "square:1"), ("dilate", "diamond:1"),
                         ("open", "square:1"), ("edge", "square:1")):
        fn = jax.jit(sharded_morphology(mesh, method, spec))
        out = np.asarray(fn(xs))
        ref = np.asarray(mo.morphology(batch, method, spec))
        assert np.max(np.abs(out - ref)) < 1e-6, method


def test_sharded_median_matches_single_device(mesh, batch):
    from imagemagick_tpu.ops.statistic import median_filter
    from imagemagick_tpu.parallel.spatial import sharded_median

    sharding = NamedSharding(mesh, P("dp", "sy", "sx", None))
    xs = jax.device_put(batch, sharding)
    out = np.asarray(jax.jit(sharded_median(mesh, radius=1))(xs))
    ref = np.asarray(median_filter(batch, 1))
    assert np.max(np.abs(out - ref)) < 1e-6


def test_sharded_otsu_matches_auto_threshold(mesh, batch):
    from imagemagick_tpu.ops.threshold import auto_threshold
    from imagemagick_tpu.parallel.spatial import sharded_otsu_threshold

    sharding = NamedSharding(mesh, P("dp", "sy", "sx", None))
    xs = jax.device_put(batch, sharding)
    out = np.asarray(jax.jit(sharded_otsu_threshold(mesh))(xs))
    ref = np.asarray(auto_threshold(batch, "otsu"))
    assert out.shape == ref.shape
    assert np.mean(out != ref) < 1e-3  # identical up to bin-edge ties


def test_cli_define_tpu_mesh_autoshards(tmp_path):
    """-define tpu:mesh=SYxSX runs the lazy chain GSPMD-sharded and the
    output matches the unsharded run (distribute-cache.c replacement
    surfaced at the CLI)."""
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.main import main as cli_main
    from imagemagick_tpu.ops import dispatch

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    rng = np.random.default_rng(7)
    src = tmp_path / "big.png"
    PILImage.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)
                       ).save(src)
    chain = ["-gaussian-blur", "0x2", "-auto-threshold", "otsu"]
    rc = cli_main([str(src)] + chain + [str(tmp_path / "plain.png")])
    assert rc == 0
    before = dispatch.COUNTS.get("gspmd", 0)
    rc = cli_main([str(src), "-define", "tpu:mesh=2x2",
                   "-define", "tpu:shard-threshold=1024"] + chain +
                  [str(tmp_path / "sharded.png")])
    assert rc == 0
    assert dispatch.COUNTS.get("gspmd", 0) == before + 1
    a = np.asarray(PILImage.open(tmp_path / "plain.png"))
    b = np.asarray(PILImage.open(tmp_path / "sharded.png"))
    assert a.shape == b.shape
    assert np.mean(a != b) < 1e-3


def test_sharded_resize_arbitrary_shape(mesh):
    """Non-mesh-divisible dims (VERDICT r4 #7): operator-space zero padding
    + output crop — a 45x67 image resized to 31x23 on a 2x2 spatial mesh,
    equal to the single-device resize."""
    from imagemagick_tpu.ops import resize as rz
    from imagemagick_tpu.parallel.spatial import sharded_resize

    rng = np.random.default_rng(11)
    x = rng.uniform(0, 1, (2, 45, 67, 3)).astype(np.float32)
    # pad the INPUT layout only to the mesh (the operator handles the
    # rest): callers shard whatever layout they have
    fn = jax.jit(sharded_resize(mesh, (45, 67), (31, 23), "lanczos"))
    out = np.asarray(fn(x))
    ref = np.asarray(rz.resize(x, 31, 23, "lanczos"))
    assert out.shape == ref.shape == (2, 31, 23, 3)
    assert np.max(np.abs(out - ref)) < 1e-4


def test_sharded_resize_odd_upscale(mesh):
    from imagemagick_tpu.ops import resize as rz
    from imagemagick_tpu.parallel.spatial import sharded_resize

    rng = np.random.default_rng(12)
    x = rng.uniform(0, 1, (2, 33, 49, 3)).astype(np.float32)
    fn = jax.jit(sharded_resize(mesh, (33, 49), (77, 101), "mitchell"))
    out = np.asarray(fn(x))
    ref = np.asarray(rz.resize(x, 77, 101, "mitchell"))
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 1e-4

"""Fused Pallas pipeline kernel: math validated on CPU via interpret mode.

The kernel compiles resize+blur+channel-mix into two banded block matmuls
(ops/fused_pipeline.py).  These tests run the identical kernel code in the
Pallas interpreter against an independent float64 evaluation of the same
operators — boundary rows/cols included (resize.c:3389 clipped windows,
edge-replicate blur pads are baked into the host-built matrices).
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imagemagick_tpu.ops.fused_pipeline import (
    blur_band_matrix, fused_resize_pipeline, reference_pipeline_f64)

GRAY = np.array([[0.212656, 0.715158, 0.072186]])


def _psnr(a, b):
    rms = float(np.sqrt(((np.asarray(a, np.float64) - b) ** 2).mean()))
    return 20 * math.log10(1.0 / max(rms, 1e-12))


@pytest.fixture
def batch(rng):
    return jnp.asarray(rng.uniform(0, 1, (2, 64, 128, 3)).astype(np.float32))


def test_fused_resize_only(batch):
    out = fused_resize_pipeline(batch, 32, 32, "lanczos", 0.0,
                                interpret=True, TO=16)
    assert out is not None and out.shape == (2, 32, 32, 3)
    ref = reference_pipeline_f64(np.asarray(batch), 32, 32, "lanczos", 0.0)
    assert _psnr(out, ref) >= 100.0


def test_fused_resize_blur_gray(batch):
    out = fused_resize_pipeline(batch, 32, 32, "lanczos", 1.5, GRAY,
                                interpret=True, TO=16)
    assert out is not None and out.shape == (2, 32, 32, 1)
    ref = reference_pipeline_f64(np.asarray(batch), 32, 32, "lanczos", 1.5,
                                 GRAY)
    assert _psnr(out, ref) >= 100.0


def test_fused_matches_op_composition(batch):
    """Against the independent per-op implementations (not the same
    matrices): resize + gaussian_blur + gray, interior-dominated."""
    from imagemagick_tpu.ops import blur as bl
    from imagemagick_tpu.ops import colorspace as cs
    from imagemagick_tpu.ops import resize as rz

    out = fused_resize_pipeline(batch, 32, 64, "triangle", 1.0, GRAY,
                                interpret=True, TO=16)
    ops = cs.convert(bl.gaussian_blur(
        rz.resize(batch, 32, 64, "triangle"), 0.0, 1.0), "srgb", "gray")
    # resize() clips before blur (Q16-style); fused is linear end-to-end —
    # compare where no mid-pipeline clipping occurred
    diff = np.abs(np.asarray(out) - np.asarray(ops))
    assert float(np.median(diff)) < 1e-4
    assert float(np.mean(diff < 5e-3)) > 0.98


def test_fused_flat_input(batch):
    n, h, w, c = batch.shape
    flat = batch.reshape(n * h, w * c)
    out = fused_resize_pipeline(flat, 32, 32, "lanczos", 0.0,
                                in_shape=(n, h, w, c),
                                interpret=True, TO=16)
    out4 = fused_resize_pipeline(batch, 32, 32, "lanczos", 0.0,
                                 interpret=True, TO=16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out4))


def test_fused_declines_bad_shapes(batch):
    # lanes not %128
    x = jnp.zeros((2, 64, 100, 3), jnp.float32)
    assert fused_resize_pipeline(x, 32, 32, interpret=True) is None
    # upscale declined
    assert fused_resize_pipeline(batch, 128, 256, interpret=True) is None
    # flat without in_shape declined
    assert fused_resize_pipeline(batch.reshape(128, 384), 32, 32,
                                 interpret=True) is None


def test_blur_band_matrix_rows_normalized():
    B = blur_band_matrix(33, 2.0)
    np.testing.assert_allclose(B.sum(axis=1), 1.0, atol=1e-12)
    # edge rows accumulate clamped taps (edge-replicate policy)
    assert B[0, 0] > B[16, 16] - 0.5  # mass concentrates at the clamp


def test_fused_bilevel_morph_edge_matches_ops(batch):
    """fused threshold+open+close+edge == the op chain, boundaries exact."""
    import jax.numpy as jnp

    from imagemagick_tpu.ops import blur as bl
    from imagemagick_tpu.ops import morphology as mo
    from imagemagick_tpu.ops import threshold as th
    from imagemagick_tpu.ops.pallas_kernels import fused_bilevel_morph_edge

    gray = jnp.mean(batch, axis=-1, keepdims=True)
    got = fused_bilevel_morph_edge(gray, 0.5, TO=32, interpret=True)
    assert got is not None
    y = th.bilevel(gray, 0.5)
    y = mo.morphology(y, "open", "square:1")
    y = mo.morphology(y, "close", "square:1")
    ref = bl.edge_image(y, 1.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_histogram256_interpret():
    """VMEM-resident 256-bin histogram matches bincount exactly."""
    import numpy as np

    from imagemagick_tpu.ops.pallas_kernels import pallas_histogram256

    rng = np.random.default_rng(9)
    vals = rng.random(5 * 256 * 512 + 333).astype(np.float32)
    # HDRI out-of-range values: negatives clip to bin 0, >1 to bin 255 —
    # in BOTH the kernel main path and the tail (ADVICE r2 consistency)
    vals[::97] = -0.25
    vals[1::101] = 1.75
    got = pallas_histogram256(jnp.asarray(vals), interpret=True)
    assert got is not None
    idx = np.clip((vals * 255 + 0.5).astype(np.int64), 0, 255)
    ref = np.bincount(idx, minlength=256).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_two_stage_blur_unsharp_matches_rank2():
    """fused_blur_unsharp_pipeline == the rank-2 operator formulation."""
    import numpy as np

    from imagemagick_tpu.ops.fused_pipeline import (
        blur_unsharp_terms, fused_blur_unsharp_pipeline)

    rng = np.random.default_rng(3)
    N, H, W, C = 2, 64, 128, 3
    x = jnp.asarray(rng.random((N, H, W, C)).astype(np.float32))
    got = fused_blur_unsharp_pipeline(x.reshape(N * H, W * C), 2.0, 1.0,
                                      1.0, C, TO=16, nslots=2,
                                      in_shape=(N, H, W, C),
                                      interpret=True)
    assert got is not None
    terms = blur_unsharp_terms(H, W, 2.0, 1.0, 1.0)
    xin = np.asarray(x, np.float64)

    def apply(Av, Bw):
        t = np.einsum("hi,nivc->nhvc", np.asarray(Av, np.float64), xin)
        return np.einsum("wv,nhvc->nhwc", np.asarray(Bw, np.float64), t)

    ref = np.clip(apply(*terms[0]) + apply(*terms[1]), 0, 1)
    assert float(np.abs(np.asarray(got) - ref).max()) < 5e-5


def test_morph_edge_odd_geometry_interpret():
    """New default tiling (TO=256) with odd geometry, bit-exact."""
    import numpy as np

    from imagemagick_tpu.ops.pallas_kernels import (
        _morph_edge_reference, fused_bilevel_morph_edge)

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.random((2, 77, 61, 1)).astype(np.float32))
    got = fused_bilevel_morph_edge(x, 0.6, TO=256, interpret=True)
    assert got is not None
    ref = np.asarray(_morph_edge_reference(x[..., 0], 0.6))[..., None]
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_blur_unsharp_lab_roundtrip_epilogue():
    """The in-kernel sRGB->Lab->sRGB epilogue (VERDICT r2 #2) matches the
    XLA colorspace ops composed after the two-stage kernel."""
    import numpy as np

    from imagemagick_tpu.ops import colorspace as cs
    from imagemagick_tpu.ops.fused_pipeline import fused_blur_unsharp_pipeline

    rng = np.random.default_rng(21)
    N, H, W, C = 2, 64, 128, 3
    x = jnp.asarray(rng.random((N, H, W, C)).astype(np.float32))

    base = fused_blur_unsharp_pipeline(x, 2.0, 1.0, 1.0, C, TO=32,
                                       interpret=True)
    want = cs.convert(cs.convert(base, "srgb", "lab"), "lab", "srgb")
    got = fused_blur_unsharp_pipeline(x, 2.0, 1.0, 1.0, C, TO=32,
                                      lab_roundtrip=True, interpret=True)
    assert got is not None
    err = np.asarray(want) - np.asarray(got)
    mse = float(np.mean(err ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-30))
    assert psnr >= 60.0, f"in-kernel Lab epilogue PSNR {psnr:.1f}dB"


def test_blur_unsharp_colchunk_hstencil_paths(monkeypatch):
    """Round-5 kernel strength reductions must not change the math: the
    column-chunked MXU/VPU interleave (col_chunk) + the h-pass Toeplitz
    stencil (hblur) path vs the plain banded-matmul path.  W=512 is the
    smallest width whose OUTP (1536) takes the col_chunk branch
    (chunk=768, Q=2); hblur fires at any OUTP>256."""
    import numpy as np

    from imagemagick_tpu.ops import fused_pipeline as fp

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((1, 64, 512, 3)).astype(np.float32))
    got = fp.fused_blur_unsharp_pipeline(x, 2.0, 1.0, 1.0, 3, TO=32,
                                         lab_roundtrip=True, interpret=True)
    monkeypatch.setenv("IMTPU_NO_COLCHUNK", "1")
    monkeypatch.setenv("IMTPU_NO_HSTENCIL", "1")
    want = fp.fused_blur_unsharp_pipeline(x, 2.0, 1.0, 1.0, 3, TO=32,
                                          lab_roundtrip=True, interpret=True)
    err = np.asarray(got) - np.asarray(want)
    psnr = 10 * np.log10(1.0 / max(float(np.mean(err ** 2)), 1e-30))
    assert psnr >= 100.0, f"col_chunk/hblur diverge from baseline: {psnr:.1f}dB"


def test_blur_unsharp_lab_survives_vmem_recursion(monkeypatch):
    """The VMEM-budget TO-halving recursion must forward lab_roundtrip/
    wscale — a positional-arg slip silently DROPPED the Lab epilogue on
    real hardware for every shape that recursed (found round 4)."""
    import numpy as np

    from imagemagick_tpu.ops import colorspace as cs
    from imagemagick_tpu.ops import fused_pipeline as fp

    rng = np.random.default_rng(22)
    N, H, W, C = 2, 64, 128, 3
    x = jnp.asarray(rng.random((N, H, W, C)).astype(np.float32))
    base = fp.fused_blur_unsharp_pipeline(x, 2.0, 1.0, 1.0, C, TO=64,
                                          interpret=True)
    want = cs.convert(cs.convert(base, "srgb", "lab"), "lab", "srgb")
    # force at least one recursion step
    monkeypatch.setattr(fp, "_VMEM_BUDGET", 1600 * 1024)
    got = fp.fused_blur_unsharp_pipeline(x, 2.0, 1.0, 1.0, C, TO=64,
                                         lab_roundtrip=True, interpret=True)
    if got is None:
        import pytest
        pytest.skip("shape declined at the tiny test budget")
    err = np.asarray(want) - np.asarray(got)
    psnr = 10 * np.log10(1.0 / max(float(np.mean(err ** 2)), 1e-30))
    assert psnr >= 60.0, f"lab missing after recursion: {psnr:.1f}dB"

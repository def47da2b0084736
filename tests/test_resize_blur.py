"""Resize + effect tests: weight properties, invariances, reference behaviors."""

import numpy as np
import pytest

from imagemagick_tpu.ops import resize as rz
from imagemagick_tpu.ops import blur as bl
from imagemagick_tpu.ops import compare as cmp_ops


def test_resize_matrix_partition_of_unity():
    for f in ["lanczos", "mitchell", "triangle", "box", "catrom", "gaussian"]:
        m = rz.resize_matrix(97, 31, f)
        cols = m.sum(axis=0)
        assert np.allclose(cols, 1.0, atol=1e-5), f
        m = rz.resize_matrix(31, 97, f)  # upscale
        assert np.allclose(m.sum(axis=0), 1.0, atol=1e-5), f


def test_resize_constant_invariance(checker_rgb):
    flat = np.full((40, 60, 3), 0.43, np.float32)
    out = np.asarray(rz.resize(flat, 17, 23))
    assert np.allclose(out, 0.43, atol=1e-5)


def test_resize_identity():
    img = np.random.default_rng(0).uniform(size=(16, 16, 3)).astype(np.float32)
    out = np.asarray(rz.resize(img, 16, 16, "point"))
    assert np.allclose(out, img, atol=1e-6)


def test_resize_downscale_shape(checker_rgb):
    out = rz.resize(checker_rgb, 12, 16)
    assert out.shape == (12, 16, 3)
    batched = rz.resize(np.stack([checker_rgb] * 3), 12, 16)
    assert batched.shape == (3, 12, 16, 3)
    # batch consistency: batched == per-image
    assert np.allclose(np.asarray(batched[0]), np.asarray(out), atol=1e-6)


def test_resize_matches_pil_lanczos(checker_rgb):
    """Cross-validate Lanczos downscale against PIL (independent impl)."""
    from PIL import Image as PILImage

    src = (checker_rgb * 255).astype(np.uint8)
    ref = PILImage.fromarray(src).resize((16, 12), PILImage.LANCZOS)
    ref_f = np.asarray(ref).astype(np.float32) / 255.0
    out = np.asarray(rz.resize(checker_rgb, 12, 16, "lanczos"))
    # Different phase conventions/clamping → close but not identical
    psnr = float(cmp_ops.psnr_db(out, ref_f))
    assert psnr > 30.0, psnr


def test_alpha_weighted_resize():
    """A fully-transparent red region must not bleed color into neighbors."""
    img = np.zeros((16, 16, 4), np.float32)
    img[:, :8] = [0, 1, 0, 1]    # opaque green
    img[:, 8:] = [1, 0, 0, 0]    # transparent red
    out = np.asarray(rz.resize(img, 8, 8, "lanczos", has_alpha=True))
    # left side stays green
    assert out[4, 1, 1] > 0.9
    assert out[4, 1, 0] < 0.1


def test_optimal_kernel_width():
    # sigma=2: the loop lands at width 17 (see gem.c:262 algorithm)
    assert bl.optimal_kernel_width_1d(0.0, 2.0) == 17
    assert bl.optimal_kernel_width_1d(3.0, 2.0) == 7  # radius override
    assert bl.optimal_kernel_width_1d(0.0, 0.0) == 3


def test_blur_preserves_mean(checker_rgb):
    out = np.asarray(bl.blur(checker_rgb, 0.0, 2.0))
    assert abs(out.mean() - checker_rgb.mean()) < 5e-3
    assert out.std() < checker_rgb.std()  # smoothing reduces variance


def test_blur_zero_sigma_identity(checker_rgb):
    out = np.asarray(bl.blur(checker_rgb, 0.0, 0.0))
    assert np.allclose(out, checker_rgb)


def test_unsharp_sharpens(checker_rgb):
    blurred = np.asarray(bl.blur(checker_rgb, 0.0, 1.5))
    sharp = np.asarray(bl.unsharp_mask(blurred, 0.0, 1.0, 1.0, 0.0))
    # unsharp must increase local contrast back toward the original
    assert sharp.std() > blurred.std()


def test_sharpen_kernel_sums_to_one():
    k = bl._sharpen_kernel(0.0, 1.0)
    assert abs(k.sum() - 1.0) < 1e-5
    assert k.min() < 0.0  # negative surround


def test_edge_flat_is_black():
    flat = np.full((12, 12, 3), 0.6, np.float32)
    out = np.asarray(bl.edge_image(flat))
    assert np.allclose(out, 0.0, atol=1e-4)


def test_despeckle_removes_salt():
    img = np.full((16, 16, 1), 0.5, np.float32)
    img[8, 8, 0] = 1.0
    out = np.asarray(bl.despeckle(img))
    assert out[8, 8, 0] < 1.0  # speckle reduced


def test_bilateral_preserves_edges():
    img = np.zeros((16, 16, 1), np.float32)
    img[:, 8:] = 1.0
    out = np.asarray(bl.bilateral_blur(img, 5, 5, 0.2))
    assert out[8, 0, 0] < 0.05
    assert out[8, 15, 0] > 0.95


def test_kuwahara_flat_regions():
    img = np.zeros((16, 16, 1), np.float32)
    img[:, 8:] = 1.0
    out = np.asarray(bl.kuwahara(img, 2))
    # edge must stay sharp-ish (edge-preserving smoothing)
    assert out[8, 2, 0] < 0.1 and out[8, 13, 0] > 0.9


def test_psnr_ssim_identity(checker_rgb):
    p = float(cmp_ops.psnr_db(checker_rgb, checker_rgb))
    assert p > 90.0
    s = float(cmp_ops.ssim(checker_rgb, checker_rgb))
    assert s > 0.999


def test_psnr_known_value():
    a = np.zeros((8, 8, 1), np.float32)
    b = np.full((8, 8, 1), 0.1, np.float32)
    p = float(cmp_ops.psnr_db(a, b))
    assert abs(p - 20.0) < 1e-3  # 10*log10(1/0.01)

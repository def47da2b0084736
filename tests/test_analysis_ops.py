"""Tests for fx expressions, feature detection, CCL, segmentation, quantize."""

import numpy as np
import pytest

from imagemagick_tpu.ops import fx as fxm
from imagemagick_tpu.ops import feature, vision, segment, quantize, statistic


def test_fx_arithmetic(checker_rgb):
    out = np.asarray(fxm.fx(checker_rgb, "u/2+0.25"))
    assert np.allclose(out, checker_rgb / 2 + 0.25, atol=1e-6)


def test_fx_channels(checker_rgb):
    out = np.asarray(fxm.fx(checker_rgb, "u.g"))
    # every channel becomes green
    for c in range(3):
        assert np.allclose(out[..., c], checker_rgb[..., 1], atol=1e-6)


def test_fx_conditional(checker_rgb):
    out = np.asarray(fxm.fx(checker_rgb, "u>0.5?1.0:0.0"))
    assert np.array_equal(out, (checker_rgb > 0.5).astype(np.float32))


def test_fx_coordinates(checker_rgb):
    out = np.asarray(fxm.fx(checker_rgb, "i/w"))
    expected = np.arange(32, dtype=np.float32) / 32.0
    assert np.allclose(out[0, :, 0], expected, atol=1e-6)


def test_fx_two_images(checker_rgb):
    half = checker_rgb * 0.5
    out = np.asarray(fxm.fx([checker_rgb, half], "(u+v)/2"))
    assert np.allclose(out, checker_rgb * 0.75, atol=1e-6)


def test_fx_pixel_offset(checker_rgb):
    out = np.asarray(fxm.fx(checker_rgb, "p[1,0]"))
    assert np.allclose(out[:, :-1], checker_rgb[:, 1:], atol=1e-6)


def test_fx_functions(checker_rgb):
    out = np.asarray(fxm.fx(checker_rgb, "sqrt(u)*sin(pi/2)"))
    assert np.allclose(out, np.sqrt(checker_rgb), atol=1e-5)


def test_fx_variables(checker_rgb):
    out = np.asarray(fxm.fx(checker_rgb, "t=u*2; t-u"))
    assert np.allclose(out, checker_rgb, atol=1e-6)


def test_canny_finds_edge():
    img = np.zeros((32, 32, 3), np.float32)
    img[:, 16:] = 1.0
    edges = np.asarray(feature.canny_edge(img))
    # edge column is detected, flat regions are not
    assert edges[16, 15:17].max() == 1.0
    assert edges[16, 3, 0] == 0.0 and edges[16, 28, 0] == 0.0


def test_hough_detects_vertical_line():
    img = np.zeros((32, 32, 1), np.float32)
    img[:, 16] = 1.0
    lines = feature.hough_lines(img, threshold=10)
    assert lines
    rho, theta, count = lines[0]
    # vertical line through the center: theta ~ 0, rho ~ 0 (the reference
    # accumulator measures radius from the image CENTER, feature.c:1905)
    assert abs(theta) < 0.2 or abs(theta - np.pi) < 0.2
    assert abs(rho) < 2.5
    assert count >= 30


def test_glcm_features_flat_vs_noise(rng):
    flat = np.full((32, 32, 1), 0.5, np.float32)
    noise = rng.uniform(0, 1, (32, 32, 1)).astype(np.float32)
    f_flat = feature.glcm_features(flat)
    f_noise = feature.glcm_features(noise)
    assert float(f_flat["energy"]) > float(f_noise["energy"])
    assert float(f_noise["contrast"]) > float(f_flat["contrast"])


def test_connected_components():
    img = np.zeros((16, 16, 1), np.float32)
    img[2:5, 2:5] = 1.0    # block A
    img[10:14, 9:15] = 1.0  # block B
    labels = np.asarray(vision.connected_components(img, fuzz=0.1))
    a = labels[3, 3]
    b = labels[11, 10]
    bg = labels[0, 0]
    assert a != b and a != bg and b != bg
    assert (labels[2:5, 2:5] == a).all()
    assert (labels[10:14, 9:15] == b).all()
    stats = vision.component_statistics(img, labels)
    areas = sorted(s["area"] for s in stats)
    assert areas == [9, 24, 256 - 9 - 24]


def test_segment_reduces_colors(checker_rgb):
    out = np.asarray(segment.segment(checker_rgb))
    uniq_in = len(np.unique((checker_rgb * 255).astype(np.uint8)))
    uniq_out = len(np.unique((out * 255).astype(np.uint8)))
    assert uniq_out <= uniq_in


def test_kmeans_palette(checker_rgb):
    pal, labels = quantize.kmeans(checker_rgb, 4, max_iters=10)
    assert pal.shape == (4, 3)
    out = np.asarray(pal)[np.asarray(labels)]
    # quantized image close to original (coarse)
    assert np.mean(np.abs(out - checker_rgb)) < 0.15


def test_floyd_steinberg_preserves_mean(checker_rgb):
    gray = checker_rgb.mean(axis=-1, keepdims=True).astype(np.float32)
    pal = np.asarray([[0.0], [1.0]], np.float32)
    import jax.numpy as jnp

    out = np.asarray(quantize.floyd_steinberg(jnp.asarray(gray), jnp.asarray(pal)))
    assert set(np.unique(out)) <= {0.0, 1.0}
    assert abs(out.mean() - gray.mean()) < 0.02  # error diffusion preserves mean


def test_statistic_median():
    img = np.zeros((9, 9, 1), np.float32)
    img[4, 4] = 1.0  # single spike
    out = np.asarray(statistic.statistic(img, "median", 3, 3))
    assert out[4, 4, 0] == 0.0  # median removes the spike


def test_moments_centroid():
    img = np.zeros((16, 16, 1), np.float32)
    img[8, 12] = 1.0
    m = statistic.get_moments(img)
    cx, cy = m["centroid"]
    assert abs(float(cx[0]) - 12) < 1e-4 and abs(float(cy[0]) - 8) < 1e-4


def test_phash_similar_vs_different(checker_rgb, rng):
    shifted = np.roll(checker_rgb, 1, axis=1)
    noise = rng.uniform(0, 1, checker_rgb.shape).astype(np.float32)
    d_close = float(statistic.phash_distance(checker_rgb, shifted))
    d_far = float(statistic.phash_distance(checker_rgb, noise))
    assert d_close < d_far


def test_sparse_color_voronoi_and_shepards():
    import jax.numpy as jnp
    from imagemagick_tpu.ops import distort as dt

    img = jnp.zeros((16, 16, 3), jnp.float32)
    pts = [(0, 0, (1, 0, 0)), (15, 15, (0, 0, 1))]
    vor = np.asarray(dt.sparse_color(img, "voronoi", pts))
    assert vor[1, 1, 0] == 1.0 and vor[14, 14, 2] == 1.0
    shep = np.asarray(dt.sparse_color(img, "shepards", pts))
    assert shep[0, 0, 0] > 0.9 and shep[15, 15, 2] > 0.9
    assert 0.2 < shep[8, 8, 0] < 0.8  # blended midway
    bary = np.asarray(dt.sparse_color(img, "barycentric", pts))
    assert bary.shape == (16, 16, 3)


def test_distort_polynomial_identity(checker_rgb):
    from imagemagick_tpu.ops import distort as dt

    # identity control points -> image unchanged (interior)
    pts = []
    for x, y in [(0, 0), (31, 0), (0, 23), (31, 23), (16, 12)]:
        pts += [x, y, x, y]
    out = np.asarray(dt.distort(checker_rgb, "polynomial", [1.5] + pts,
                                sampler="bilinear"))
    assert np.abs(out[4:-4, 4:-4] - checker_rgb[4:-4, 4:-4]).max() < 1e-3


def test_distort_shepards_identity(checker_rgb):
    from imagemagick_tpu.ops import distort as dt

    pts = [0, 0, 0, 0, 31, 23, 31, 23]
    out = np.asarray(dt.distort(checker_rgb, "shepards", pts, sampler="bilinear"))
    assert out.shape == checker_rgb.shape


def test_liquid_rescale_carves():
    import jax.numpy as jnp
    from imagemagick_tpu.ops import distort as dt

    # low-energy flat middle column band should be carved preferentially
    img = np.zeros((12, 20, 3), np.float32)
    img[:, :4] = 1.0   # high contrast edges at left
    img[:, -4:] = 1.0  # and right
    out = np.asarray(dt.liquid_rescale(jnp.asarray(img), 16, 12))
    assert out.shape == (12, 16, 3)
    # edge content preserved
    assert out[6, 0, 0] > 0.9 and out[6, -1, 0] > 0.9


def test_distort_projection_variants(checker_rgb):
    """AffineProjection/PerspectiveProjection/RigidAffine/BilinearForward
    (distort.h:34-57 tail)."""
    import numpy as np
    import jax.numpy as jnp
    from imagemagick_tpu.ops.distort import distort

    x = jnp.asarray(checker_rgb)
    # raw-coefficient identity projections are exact with point sampling
    out = distort(x, "affineprojection", [1, 0, 0, 1, 0, 0],
                  sampler="bilinear")
    np.testing.assert_allclose(np.asarray(out), checker_rgb, atol=1e-5)
    out = distort(x, "perspectiveprojection", [1, 0, 0, 0, 1, 0, 0, 0],
                  sampler="bilinear")
    np.testing.assert_allclose(np.asarray(out), checker_rgb, atol=1e-5)
    # rigid affine translation by (+3, +2) fitted from two point pairs
    out = np.asarray(distort(x, "rigidaffine", [0, 0, 3, 2, 10, 0, 13, 2],
                             sampler="bilinear"))
    np.testing.assert_allclose(out[2:20, 3:30], checker_rgb[0:18, 0:27],
                               atol=1e-4)
    # bilinear forward == bilinear reverse when the point set is affine
    pts = [0, 0, 2, 1, 31, 0, 33, 1, 0, 23, 2, 24, 31, 23, 33, 24]
    f = np.asarray(distort(x, "bilinearforward", pts, sampler="bilinear"))
    r = np.asarray(distort(x, "bilinearreverse", pts, sampler="bilinear"))
    interior = (slice(4, 18), slice(6, 26))
    np.testing.assert_allclose(f[interior], r[interior], atol=1e-3)

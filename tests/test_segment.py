"""Scale-space fuzzy c-means segmentation (segment.c:1796 parity;
VERDICT r2 #5 — replaces the per-channel peak-snap approximation)."""

import numpy as np

import jax.numpy as jnp

from imagemagick_tpu.ops import segment as sg


def _blob_image(levels, h=64, w=66, noise=0.01, seed=0):
    """Gray blobs at the given levels, equal areas, mild noise."""
    rng = np.random.default_rng(seed)
    cols = np.array_split(np.arange(w), len(levels))
    img = np.zeros((h, w, 3), np.float32)
    for lv, cc in zip(levels, cols):
        img[:, cc, :] = lv
    img += rng.normal(0, noise, img.shape).astype(np.float32)
    return np.clip(img, 0, 1).astype(np.float32)


def test_optimal_tau_finds_bimodal_extrema():
    """Two well-separated histogram modes land inside peak regions.
    (The reference's ZeroCrossHistogram parity quirk yields extra
    boundary regions — counts are ITS behavior, not an invariant.)"""
    rng = np.random.default_rng(1)
    vals = np.concatenate([
        np.clip(rng.normal(60, 5, 4000), 0, 255),
        np.clip(rng.normal(190, 5, 4000), 0, 255)]).astype(np.int64)
    hist = np.bincount(vals, minlength=256)[:256]
    extrema = sg.optimal_tau(hist, 1.5)
    regions = sg._regions(extrema)
    assert regions, "no peak regions found"
    assert any(l <= 60 <= r for l, r in regions), regions
    assert any(l <= 190 <= r for l, r in regions), regions


def test_segment_three_gray_blobs():
    """Three dominant clusters near the true levels cover the image."""
    img = _blob_image([0.1, 0.5, 0.9])
    out = np.asarray(sg.segment(jnp.asarray(img)))
    flat = out.reshape(-1, 3)
    uniq, counts = np.unique(np.round(flat * 255), axis=0,
                             return_counts=True)
    order = np.argsort(counts)[::-1]
    assert counts[order[:3]].sum() >= 0.95 * counts.sum(), (uniq, counts)
    got = sorted(uniq[order[:3]][:, 0] / 255.0)
    assert np.allclose(got, [0.1, 0.5, 0.9], atol=0.04), got


def test_segment_two_color_clusters():
    rng = np.random.default_rng(3)
    img = np.zeros((64, 64, 3), np.float32)
    img[:, :32] = (0.8, 0.15, 0.15)     # red-ish
    img[:, 32:] = (0.1, 0.2, 0.75)      # blue-ish
    img += rng.normal(0, 0.01, img.shape).astype(np.float32)
    img = np.clip(img, 0, 1).astype(np.float32)
    out = np.asarray(sg.segment(jnp.asarray(img)))
    uniq, counts = np.unique(np.round(out.reshape(-1, 3) * 255), axis=0,
                             return_counts=True)
    # two dominant clusters (the reference's SafeMargin boxes + its weak
    # prune rule allow a few stray boundary clusters, segment.c:433)
    order = np.argsort(counts)[::-1]
    assert counts[order[0]] + counts[order[1]] >= 0.95 * counts.sum(), \
        (uniq, counts)
    assert len(uniq) <= 6
    # red side stays red-dominant, blue side blue-dominant
    assert out[5, 5, 0] > out[5, 5, 2]
    assert out[5, 50, 2] > out[5, 50, 0]


def test_segment_uniform_image_single_cluster():
    img = np.full((24, 24, 3), 0.4, np.float32)
    out = np.asarray(sg.segment(jnp.asarray(img)))
    uniq = np.unique(np.round(out.reshape(-1, 3) * 255), axis=0)
    assert len(uniq) == 1
    assert abs(out[0, 0, 0] - 0.4) < 0.01


def test_segment_preserves_shape_and_alpha():
    rng = np.random.default_rng(5)
    img = np.concatenate([rng.random((16, 16, 3)).astype(np.float32),
                          np.full((16, 16, 1), 0.5, np.float32)], -1)
    out = np.asarray(sg.segment(jnp.asarray(img)))
    assert out.shape == (16, 16, 4)
    np.testing.assert_allclose(out[..., 3], 0.5)


import os
import subprocess

import pytest

_REF_MAGICK = "/tmp/imbuild/utilities/magick"


@pytest.mark.skipif(not os.path.exists(_REF_MAGICK),
                    reason="reference binary not built on this machine")
def test_segment_matches_reference_binary(tmp_path):
    """Oracle check against the actual reference build: 3 dominant
    clusters at the blob levels covering >95% (measured 99.8% on the
    reference: centers (26,26,26)/(127,128,128)/(229,229,229))."""
    from PIL import Image as PILImage

    img = _blob_image([0.1, 0.5, 0.9])
    src = tmp_path / "seg.png"
    PILImage.fromarray((img * 255 + 0.5).astype(np.uint8)).save(str(src))
    dst = tmp_path / "seg_ref.png"
    subprocess.run([_REF_MAGICK, str(src), "-segment", "1x1.5", str(dst)],
                   check=True, capture_output=True)
    ref = np.asarray(PILImage.open(str(dst)).convert("RGB"))
    runiq, rcounts = np.unique(ref.reshape(-1, 3), axis=0,
                               return_counts=True)
    rorder = np.argsort(rcounts)[::-1]
    ref_centers = np.sort(runiq[rorder[:3]][:, 0])

    out = np.asarray(sg.segment(jnp.asarray(img)))
    uniq, counts = np.unique(np.round(out.reshape(-1, 3) * 255), axis=0,
                             return_counts=True)
    order = np.argsort(counts)[::-1]
    got_centers = np.sort(uniq[order[:3]][:, 0])
    assert counts[order[:3]].sum() >= 0.95 * counts.sum()
    # dominant cluster centers agree with the reference within 3 chars
    np.testing.assert_allclose(got_centers, ref_centers, atol=3)

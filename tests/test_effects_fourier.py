"""Visual effects + Fourier op tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from imagemagick_tpu.ops import fourier as ft
from imagemagick_tpu.ops import visual_effects as vfx


def test_fft_roundtrip(checker_rgb):
    mag, ph = ft.forward_fft(checker_rgb)
    back = np.asarray(ft.inverse_fft(mag, ph))
    assert np.max(np.abs(back - checker_rgb)) < 1e-4


def test_fft_realimag_roundtrip(checker_rgb):
    re, im = ft.forward_fft(checker_rgb, modulus=False)
    back = np.asarray(ft.inverse_fft(re, im, modulus=False))
    assert np.max(np.abs(back - checker_rgb)) < 1e-4


def test_fft_dc_centered(checker_rgb):
    mag, _ = ft.forward_fft(checker_rgb)
    m = np.asarray(mag)[..., 0]
    h, w = m.shape
    # DC (the mean) sits at the center after fftshift and dominates
    assert m[h // 2, w // 2] == m.max()
    assert abs(m[h // 2, w // 2] - checker_rgb[..., 0].mean()) < 1e-4


def test_complex_ops(checker_rgb):
    re, im = ft.forward_fft(checker_rgb, modulus=False)
    r2, i2 = ft.complex_images(re, im, re, im, "subtract")
    assert np.allclose(np.asarray(r2), 0) and np.allclose(np.asarray(i2), 0)
    mag, ph = ft.complex_images(re, im, re, im, "magnitudephase")
    assert np.all(np.asarray(mag) >= 0)


def test_wiener_reduces_noise(rng):
    clean = np.zeros((64, 64, 1), np.float32)
    clean[16:48, 16:48] = 0.8
    noisy = np.clip(clean + rng.normal(0, 0.08, clean.shape), 0, 1).astype(np.float32)
    out = np.asarray(ft.wiener_deconvolve(jnp.asarray(noisy), noise=0.05))
    err_in = np.abs(noisy - clean).mean()
    err_out = np.abs(out - clean).mean()
    assert err_out < err_in


def test_noise_types(checker_rgb):
    for t in ("uniform", "gaussian", "impulse", "laplacian",
              "multiplicative", "poisson", "random"):
        out = np.asarray(vfx.add_noise(checker_rgb, t))
        assert out.shape == checker_rgb.shape
        if t != "random":
            assert abs(out.mean() - checker_rgb.mean()) < 0.25, t


def test_solarize_sepia_blueshift(checker_rgb):
    sol = np.asarray(vfx.solarize(checker_rgb, 0.5))
    mask = checker_rgb > 0.5
    assert np.allclose(sol[mask], 1.0 - checker_rgb[mask])
    sep = np.asarray(vfx.sepia_tone(checker_rgb, 0.8))
    # sepia: warm cast — red channel >= blue channel on average
    assert sep[..., 0].mean() >= sep[..., 2].mean()
    bs = np.asarray(vfx.blue_shift(checker_rgb, 1.5))
    assert bs.shape == checker_rgb.shape


def test_vignette_blends_corners_to_background(checker_rgb):
    """Reference semantics: corners fade to the BACKGROUND color
    (default white; black here to observe darkening) — oracle-verified
    in test_reference_oracle.py."""
    flat = np.ones((32, 32, 3), np.float32)
    out = np.asarray(vfx.vignette(jnp.asarray(flat), sigma=5.0,
                                  background=(0.0, 0.0, 0.0)))
    assert out[16, 16, 0] > 0.9     # center bright
    assert out[0, 0, 0] < 0.3       # corner faded to black bg


def test_color_matrix_identity_and_swap(checker_rgb):
    ident = np.eye(4, dtype=np.float32)
    out = np.asarray(vfx.color_matrix(checker_rgb, ident))
    assert np.allclose(out, checker_rgb, atol=1e-5)
    swap = np.zeros((4, 4), np.float32)
    swap[0, 1] = swap[1, 0] = swap[2, 2] = 1.0
    out = np.asarray(vfx.color_matrix(checker_rgb, swap))
    assert np.allclose(out[..., 0], checker_rgb[..., 1], atol=1e-5)


def test_wavelet_denoise(rng):
    # smooth content + modest noise: the reference shrink (which biases
    # surviving coefficients by the full magnitude) wins clearly here
    yy, xx = np.mgrid[0:32, 0:32] / 31.0
    clean = (0.3 + 0.4 * np.sin(3 * yy) * np.cos(2 * xx)).astype(np.float32)[..., None]
    noisy = np.clip(clean + rng.normal(0, 0.05, clean.shape), 0, 1).astype(np.float32)
    out = np.asarray(vfx.wavelet_denoise(jnp.asarray(noisy), 0.1))
    assert np.abs(out - clean).mean() < 0.75 * np.abs(noisy - clean).mean()


def test_charcoal_and_stereo(checker_rgb):
    ch = np.asarray(vfx.charcoal(checker_rgb, 0.0, 1.0))
    assert ch.shape == checker_rgb.shape
    right = np.roll(checker_rgb, 2, axis=1)
    st = np.asarray(vfx.stereo(jnp.asarray(checker_rgb), jnp.asarray(right)))
    assert np.allclose(st[..., 0], checker_rgb[..., 0])
    assert np.allclose(st[..., 1], right[..., 1])

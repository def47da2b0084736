"""Fidelity gates: pipeline output vs float64 reference math, PSNR >= 60dB.

BASELINE.json requires "outputs match the Q16/HDRI reference (PSNR >= 60dB
per op)".  Without the reference binary in this environment, the gate is an
independent float64 numpy evaluation of the same op definitions — catching
any precision loss from the device path (bf16 matmuls, fused kernels,
approximation shortcuts).
"""

import math

import numpy as np
import pytest

from imagemagick_tpu.ops import blur as bl
from imagemagick_tpu.ops import colorspace as cs
from imagemagick_tpu.ops import resize as rz


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10 * math.log10(1.0 / max(mse, 1e-30))


@pytest.fixture
def img1080(rng):
    return rng.uniform(0, 1, (2, 256, 384, 3)).astype(np.float32)


def _resize_f64(img, out_h, out_w, filter_name="lanczos"):
    mh = rz.resize_matrix(img.shape[-3], out_h, filter_name).astype(np.float64)
    mw = rz.resize_matrix(img.shape[-2], out_w, filter_name).astype(np.float64)
    x = np.asarray(img, np.float64)
    x = np.einsum("nhwc,hH->nHwc", x, mh)
    x = np.einsum("nhwc,wW->nhWc", x, mw)
    return np.clip(x, 0, 1)


def _gauss_f64(img, sigma):
    k = bl.gaussian_kernel_1d(0.0, sigma).astype(np.float64)
    r = (len(k) - 1) // 2
    x = np.asarray(img, np.float64)
    xp = np.pad(x, ((0, 0), (r, r), (0, 0), (0, 0)), mode="edge")
    out = np.zeros_like(x)
    for i, t in enumerate(k):
        out += t * xp[:, i:i + x.shape[1]]
    xp = np.pad(out, ((0, 0), (0, 0), (r, r), (0, 0)), mode="edge")
    out2 = np.zeros_like(x)
    for i, t in enumerate(k):
        out2 += t * xp[:, :, i:i + x.shape[2]]
    return out2


def _gray_f64(img):
    x = np.asarray(img, np.float64)
    return (0.212656 * x[..., 0] + 0.715158 * x[..., 1] +
            0.072186 * x[..., 2])[..., None]


def test_resize_psnr_gate(img1080):
    ours = np.asarray(rz.resize(img1080, 96, 128, "lanczos"))
    ref = _resize_f64(img1080, 96, 128)
    assert psnr(ours, ref) >= 60.0, psnr(ours, ref)


def test_blur_psnr_gate(img1080):
    ours = np.asarray(bl.gaussian_blur(img1080, 0.0, 2.0))
    ref = np.clip(_gauss_f64(img1080, 2.0), 0, 1)
    assert psnr(ours, ref) >= 60.0, psnr(ours, ref)


def test_gray_psnr_gate(img1080):
    ours = np.asarray(cs.convert(img1080, "srgb", "gray"))
    ref = _gray_f64(img1080)
    assert psnr(ours, ref) >= 60.0


def test_full_pipeline_psnr_gate(img1080):
    """The headline pipeline end-to-end vs float64 reference math."""
    ours = np.asarray(cs.convert(
        bl.gaussian_blur(rz.resize(img1080, 96, 128, "lanczos"), 0.0, 2.0),
        "srgb", "gray"))
    ref = _gray_f64(np.clip(_gauss_f64(_resize_f64(img1080, 96, 128), 2.0), 0, 1))
    p = psnr(ours, ref)
    assert p >= 60.0, p


def test_lab_roundtrip_psnr_gate(img1080):
    lab = cs.convert(img1080, "srgb", "lab")
    back = np.asarray(cs.convert(lab, "lab", "srgb"))
    assert psnr(back, img1080) >= 60.0

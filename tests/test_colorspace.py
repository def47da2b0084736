"""Colorspace round-trip validation.

Mirrors the reference's ValidateColorspaces strategy
(/root/reference/tests/validate.c:527): convert sRGB -> X -> sRGB and check
numeric round-trip, plus spot-check known triplets.
"""

import numpy as np
import pytest

from imagemagick_tpu.ops import colorspace as cs

ROUNDTRIP_SPACES = [
    "rgb", "xyz", "lab", "lchab", "luv", "lchuv", "xyy", "lms",
    "oklab", "oklch", "hsl", "hsv", "hsb", "hwb", "hsi", "hcl",
    "ycbcr", "ypbpr", "rec601ycbcr", "rec709ycbcr", "yiq", "yuv",
    "ydbdr", "ohta", "cmy", "cmyk", "adobe98", "displayp3", "prophoto",
    "jzazbz", "log",
]


@pytest.fixture
def colors(rng):
    # avoid exact 0/1 extremes where clamping makes roundtrips lossy
    return rng.uniform(0.02, 0.98, (64, 3)).astype(np.float32)


@pytest.mark.parametrize("space", ROUNDTRIP_SPACES)
def test_roundtrip(colors, space):
    mid = cs.convert(colors, "srgb", space)
    back = cs.convert(mid, space, "srgb")
    err = np.max(np.abs(np.asarray(back) - colors))
    tol = {"jzazbz": 2e-2, "log": 3e-3, "hsi": 5e-3}.get(space, 2e-3)
    assert err < tol, f"{space} roundtrip err {err}"


def test_gray_luma():
    # pure green sRGB -> gray must use Rec709 luma on encoded values
    # (colorspace.c:901 GRAY case)
    c = np.array([[[0.0, 1.0, 0.0]]], dtype=np.float32)
    g = np.asarray(cs.convert(c, "srgb", "gray"))
    assert g.shape[-1] == 1
    assert abs(g[0, 0, 0] - 0.715158) < 1e-5


def test_linear_gray_differs_from_gray():
    c = np.array([[[0.5, 0.5, 0.5]]], dtype=np.float32)
    g = np.asarray(cs.convert(c, "srgb", "gray"))[0, 0, 0]
    lg = np.asarray(cs.convert(c, "srgb", "linear_gray"))[0, 0, 0]
    assert abs(g - 0.5) < 1e-5
    assert lg < g  # linear luma of mid-gray is ~0.214


def test_known_lab_white():
    # sRGB white -> Lab should be L=1.0 (100/100), a=b=0.5 (offset encoding)
    white = np.array([[[1.0, 1.0, 1.0]]], dtype=np.float32)
    lab = np.asarray(cs.convert(white, "srgb", "lab"))
    assert abs(lab[0, 0, 0] - 1.0) < 1e-3
    assert abs(lab[0, 0, 1] - 0.5) < 1e-3
    assert abs(lab[0, 0, 2] - 0.5) < 1e-3


def test_known_xyz_values():
    # sRGB red (1,0,0) -> XYZ ~ (0.4124, 0.2126, 0.0193)
    red = np.array([[[1.0, 0.0, 0.0]]], dtype=np.float32)
    xyz = np.asarray(cs.convert(red, "srgb", "xyz"))
    assert np.allclose(xyz[0, 0], [0.412396, 0.212586, 0.019297], atol=2e-4)


def test_hsl_red():
    red = np.array([[[1.0, 0.0, 0.0]]], dtype=np.float32)
    hsl = np.asarray(cs.convert(red, "srgb", "hsl"))
    assert np.allclose(hsl[0, 0], [0.0, 1.0, 0.5], atol=1e-5)


def test_ycbcr_gray_axis():
    gray = np.array([[[0.5, 0.5, 0.5]]], dtype=np.float32)
    y = np.asarray(cs.convert(gray, "srgb", "ycbcr"))
    assert np.allclose(y[0, 0], [0.5, 0.5, 0.5], atol=1e-5)


def test_srgb_transfer_inverse():
    v = np.linspace(0.0, 1.0, 256, dtype=np.float32)
    lin = np.asarray(cs.srgb_to_linear(v))
    back = np.asarray(cs.linear_to_srgb(lin))
    assert np.max(np.abs(back - v)) < 1e-5


def test_cmyk_channels():
    c = np.array([[[1.0, 0.0, 0.0]]], dtype=np.float32)  # red
    cmyk = np.asarray(cs.convert(c, "srgb", "cmyk"))
    assert cmyk.shape[-1] == 4
    # red -> c=0, m=1, y=1, k=0 (in linear space)
    assert cmyk[0, 0, 0] < 1e-5
    assert cmyk[0, 0, 3] < 1e-5

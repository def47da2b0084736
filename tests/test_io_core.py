"""IO round-trips (validate.c ValidateImageFormatsInMemory analog) + core types."""

import numpy as np
import pytest

from imagemagick_tpu import Image, ImageSpec
from imagemagick_tpu.core.geometry import parse_geometry, parse_meta_geometry
from imagemagick_tpu.core.color import parse_color
from imagemagick_tpu.io import (image_from_blob, image_to_blob, read_images,
                                write_image)
from imagemagick_tpu.ops import compare as cmp_ops


@pytest.fixture
def img(checker_rgb):
    return Image(checker_rgb)


LOSSLESS = ["miff", "png", "ppm", "pam", "bmp", "tiff"]


@pytest.mark.parametrize("fmt", LOSSLESS)
def test_lossless_roundtrip(img, fmt):
    blob = image_to_blob(img, fmt, depth=8)
    back = image_from_blob(blob)[0]
    rmse = float(cmp_ops.root_mean_squared_error(img.data, back.data))
    assert rmse < 1.0 / 255.0, f"{fmt}: rmse={rmse}"


def test_miff_16bit_roundtrip(img):
    blob = image_to_blob(img, "miff", depth=16)
    back = image_from_blob(blob)[0]
    rmse = float(cmp_ops.root_mean_squared_error(img.data, back.data))
    assert rmse < 1.0 / 30000.0


def test_miff_properties_roundtrip(img):
    img.properties["comment"] = "hello-world"
    from imagemagick_tpu.io import miff

    blob = miff.encode(img)
    back = miff.decode(blob)[0]
    assert back.properties.get("comment") == "hello-world"


def test_jpeg_lossy_close(img):
    blob = image_to_blob(img, "jpeg", quality=95)
    back = image_from_blob(blob)[0]
    psnr = float(cmp_ops.psnr(img.data, back.data))
    assert psnr > 28.0


def test_pfm_float_roundtrip(img):
    blob = image_to_blob(img, "pfm")
    back = image_from_blob(blob)[0]
    # PFM stores linear RGB; our encode writes raw values, decode tags rgb
    assert back.data.shape == img.data.shape


def test_pseudo_formats():
    xc = read_images("xc:red", size="4x3")[0]
    assert xc.data.shape == (3, 4, 3)
    assert np.allclose(np.asarray(xc.data)[0, 0], [1, 0, 0], atol=1e-6)

    grad = read_images("gradient:black-white", size="8x8")[0]
    arr = np.asarray(grad.data)
    assert arr[0, 0, 0] < 0.01 and arr[-1, 0, 0] > 0.99

    hald = read_images("hald:4")[0]
    assert hald.data.shape == (64, 64, 3)

    rose = read_images("rose:")[0]
    assert rose.data.shape == (46, 70, 3)


def test_mpr_registry(img):
    write_image(img, "mpr:snapshot")
    back = read_images("mpr:snapshot")[0]
    assert np.allclose(np.asarray(back.data), np.asarray(img.data))


def test_geometry_parsing():
    g = parse_geometry("300x200+10-20!")
    assert (g.width, g.height, g.x, g.y, g.exact) == (300, 200, 10, -20, True)
    assert parse_meta_geometry("50%", 100, 80) == (50, 40, 0, 0)
    assert parse_meta_geometry("200x200", 400, 200) == (200, 100, 0, 0)  # fit
    assert parse_meta_geometry("200x200^", 400, 200) == (400, 200, 0, 0)  # cover
    assert parse_meta_geometry("200x200!", 400, 200) == (200, 200, 0, 0)
    assert parse_meta_geometry("800x800>", 400, 200) == (400, 200, 0, 0)  # shrink only
    assert parse_meta_geometry("100x100<", 400, 200) == (400, 200, 0, 0)  # enlarge only
    assert parse_meta_geometry("x100", 400, 200) == (200, 100, 0, 0)
    assert parse_meta_geometry("80000@", 400, 200) == (400, 200, 0, 0)[:2] + (0, 0)


def test_color_parsing():
    assert parse_color("red") == (1.0, 0.0, 0.0, 1.0)
    assert parse_color("#00ff00") == (0.0, 1.0, 0.0, 1.0)
    assert parse_color("#0000ff80")[3] == pytest.approx(128 / 255)
    assert parse_color("none")[3] == 0.0
    r, g, b, a = parse_color("rgb(255,128,0)")
    assert (r, a) == (1.0, 1.0) and abs(g - 128 / 255) < 1e-6
    assert parse_color("gray50") == (0.5, 0.5, 0.5, 1.0)


def test_image_wrapper(img):
    assert img.width == 32 and img.height == 24 and img.channels == 3
    small = img.resize(16, 12)
    assert small.data.shape == (12, 16, 3)
    gray = img.transform_colorspace("gray")
    assert gray.channels == 1 and gray.colorspace == "gray"
    back = gray.transform_colorspace("srgb")
    assert back.channels == 3
    with_a = img.set_alpha(True)
    assert with_a.channels == 4 and with_a.alpha
    assert np.allclose(np.asarray(with_a.data[..., -1]), 1.0)


def test_image_is_pytree(img):
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(img)
    assert len(leaves) == 1
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rebuilt.spec == img.spec


def test_pipeline_jits(img):
    import jax
    import jax.numpy as jnp
    from imagemagick_tpu.ops import resize as rz, blur as bl, colorspace as cs

    @jax.jit
    def pipeline(x):
        x = rz.resize(x, 12, 16, "lanczos")
        x = bl.blur(x, 0.0, 2.0)
        return cs.convert(x, "srgb", "gray")

    out = pipeline(img.data)
    assert out.shape == (12, 16, 1)
    # second call hits the cache
    out2 = pipeline(img.data)
    assert np.allclose(np.asarray(out), np.asarray(out2))

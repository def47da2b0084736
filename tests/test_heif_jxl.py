"""HEIC + JPEG-XL coders (coders/heic.c:1 / coders/jxl.c:1 parity) via the
native dlopen bindings over the system libheif/libjxl
(native/heifjxl.cpp).  Skips when the libraries are absent."""

import numpy as np
import pytest

from imagemagick_tpu import io as iio
from imagemagick_tpu import native
from imagemagick_tpu.core.image import Image
from imagemagick_tpu.core.spec import ImageSpec


def _img(h=40, w=48, alpha=False):
    yy, xx = np.mgrid[0:h, 0:w]
    chans = [yy % 256, xx % 256, (yy + xx) % 256]
    if alpha:
        chans.append(np.full((h, w), 200))
    return Image((np.stack(chans, -1) / 255.0).astype(np.float32),
                 ImageSpec(colorspace="srgb", alpha=alpha))


@pytest.mark.skipif(not native.jxl_available(), reason="libjxl absent")
def test_jxl_roundtrip_blob_and_file(tmp_path):
    img = _img()
    blob = iio.image_to_blob(img, "jxl")
    assert blob[:2] == b"\xff\x0a" or blob[4:8] == b"JXL "
    back = iio.image_from_blob(blob)[0]        # magic-sniffed, no fmt hint
    assert back.data.shape == (40, 48, 3)
    assert np.abs(np.asarray(back.data) - np.asarray(img.data)).mean() < 0.02
    p = tmp_path / "x.jxl"
    iio.write_image(img, str(p))
    assert iio.read_image(str(p)).data.shape == (40, 48, 3)


@pytest.mark.skipif(not native.jxl_available(), reason="libjxl absent")
def test_jxl_alpha():
    img = _img(alpha=True)
    blob = iio.image_to_blob(img, "jxl")
    back = iio.image_from_blob(blob, "jxl")[0]
    assert back.data.shape[-1] == 4
    assert abs(float(back.data[0, 0, 3]) - 200 / 255.0) < 0.02


@pytest.mark.skipif(not native.heif_available(), reason="libheif absent")
def test_heic_roundtrip(tmp_path):
    img = _img()
    blob = iio.image_to_blob(img, "heic", quality=90)
    if blob is None:
        pytest.skip("no HEVC encoder plugin")
    assert b"ftyp" in blob[:16]
    back = iio.image_from_blob(blob)[0]
    assert back.data.shape == (40, 48, 3)
    assert np.abs(np.asarray(back.data) - np.asarray(img.data)).mean() < 0.03

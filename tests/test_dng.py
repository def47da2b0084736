"""DNG raw decode (coders/dng.c / dcraw delegate replacement,
delegates.xml.in:70): native TIFF-IFD parse + device bilinear demosaic."""

import numpy as np
import pytest

from imagemagick_tpu import io as iio
from imagemagick_tpu.core.image import Image
from imagemagick_tpu.core.spec import ImageSpec
from imagemagick_tpu.io import dng


def _smooth(h=32, w=40):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([0.5 + 0.4 * np.sin(yy / 9.0),
                    0.5 + 0.3 * np.cos(xx / 7.0),
                    np.clip(xx / w, 0, 1)], -1)
    return np.clip(img, 0.02, 0.98).astype(np.float32)


def test_dng_roundtrip_smooth():
    img = Image(_smooth(), ImageSpec(colorspace="srgb"))
    blob = dng.encode_dng(img)
    assert dng.is_dng(blob)
    back = dng.decode_dng(blob)
    assert back.data.shape == (32, 40, 3)
    # bilinear demosaic of a smooth scene reconstructs closely
    err = np.abs(np.asarray(back.data) - np.asarray(img.data))
    assert float(np.mean(err)) < 0.03, float(np.mean(err))


def test_dng_through_io_layer(tmp_path):
    img = Image(_smooth(), ImageSpec(colorspace="srgb"))
    p = tmp_path / "x.dng"
    iio.write_image(img, str(p))
    back = iio.read_image(str(p))
    assert back.data.shape == (32, 40, 3)
    # sniffed from bytes (DNG shares TIFF magic; DNGVersion routes it)
    blob = open(p, "rb").read()
    back2 = iio.image_from_blob(blob)[0]
    assert back2.data.shape == (32, 40, 3)


def test_dng_compressed_raises():
    img = Image(_smooth(8, 8), ImageSpec(colorspace="srgb"))
    blob = bytearray(dng.encode_dng(img))
    # flip the Compression tag value to 7 (LJPEG)
    import struct
    pos = 8 + 2
    n = struct.unpack_from("<H", blob, 8)[0]
    for i in range(n):
        tag = struct.unpack_from("<H", blob, pos)[0]
        if tag == 259:
            struct.pack_into("<H", blob, pos + 8, 7)
        pos += 12
    with pytest.raises(ValueError, match="compression"):
        dng.decode_dng(bytes(blob))


def test_plain_tiff_not_dng(tmp_path):
    from PIL import Image as PILImage

    p = tmp_path / "t.tiff"
    PILImage.fromarray((np.ones((8, 8, 3)) * 128).astype(np.uint8)).save(
        str(p))
    assert not dng.is_dng(open(p, "rb").read())
    img = iio.read_image(str(p))     # still decodes as plain TIFF
    assert img.data.shape[-1] == 3

"""Property sweep: every format that is both writable and readable must
round-trip odd-sized images with sane geometry and bounded error.

This guards the long tail of native coders (io/formats2-4) against
edge-size bugs (odd widths vs packed rows, padding, single-pixel
images). Lossy/fixed-geometry/lossy-structure formats carry their own
expectations below.
"""

import numpy as np
import pytest

from imagemagick_tpu.core.image import Image
from imagemagick_tpu.core.spec import ImageSpec
from imagemagick_tpu.io import (image_from_blob, image_to_blob,
                                supported_read_formats,
                                supported_write_formats)

# formats excluded from the generic sweep and why
SKIP = {
    "ashlar",           # multi-image packer, geometry intentionally differs
    "braille", "brf", "ubrl", "ubrl6", "isobrl", "isobrl6",  # text art
    "uil", "html", "htm", "shtml", "cip", "txt", "ftxt",     # text formats
    "info", "json", "yaml",
    "eps", "ps", "ps2", "ps3", "pdf", "ept", "ept2", "ept3",  # delegate
    "video", "mpr", "null", "mpc",   # mpc is mmap-file-based by design
    "hrz",              # fixed 256x240 geometry
    "mono", "uyvy", "yuv", "bayer", "map", "gray", "rgb", "rgba",
    "bgr", "bgra", "cmyk", "ycbcr", "raw",   # need -size on read
    "fax", "g3", "g4",  # width-parameterized raw streams
    "magick", "h",      # wraps another format; covered separately
    "ipl",              # grayscale-only by design (covered separately)
    "pgx",              # grayscale-only by design (covered separately)
    "cube",             # LUT resource, not raster
    "kernel",           # kernel-spec resource: read normalizes min-max
                        # (kernel.c semantics; own tests in test_coders_r4)
    "mask",             # wrapper coder: writes the image's write-mask via
                        # an inner format (mask.c; own tests in
                        # test_coders_r4)
    "heic", "avif",     # plugin-dependent encode quality
    "xbm", "xpm", "wbmp", "otb", "rgf",  # bilevel/palette by design
    "jbig", "jbg", "bie",                # bilevel by design (jbig-kit;
                                         # own tests in test_outofcore_chain)
    "sixel", "six",     # 6-row banding + palette
    "tim",              # 5-bit quantization (covered in test_formats4)
    "palm",             # palette format (own tests)
    "pict", "pct",      # own round-trip tests
    "pam", "im",
    "cur",              # write-only interop: PNG-frame cursors (Vista+)
                        # that Pillow's DIB-only CUR reader rejects
    "dng",              # CFA mosaic: lossy by construction on noise;
                        # own round-trip tests in test_dng.py
    "8bim", "8bimtext", "exif", "app1", "xmp", "icc", "icm", "iptc",
    "iptctext",         # meta.c profile carriers, not rasters (own
                        # tests in test_coders_r4b)
    "strimg",           # string<->image coder: write reduces to 8-bit
                        # gray text bytes (own tests in test_coders_r4b)
    "dmr",              # repository coder: needs dmr:path define (own
                        # tests in test_coders_r4b)
}

LOSSY = {"jpeg", "jpg", "webp", "jxl", "pdb", "j2k", "jp2",
         "heic", "heif"}   # HEVC on noise is very lossy


def _fmts():
    r = set(supported_read_formats())
    w = set(supported_write_formats())
    return sorted((r & w) - SKIP)


@pytest.mark.parametrize("fmt", _fmts())
def test_roundtrip_odd_size(fmt):
    import zlib

    rng = np.random.default_rng(zlib.crc32(fmt.encode()))
    arr = rng.random((11, 13, 3)).astype(np.float32)
    img = Image(arr, ImageSpec(colorspace="srgb"))
    blob = image_to_blob(img, fmt)
    back = image_from_blob(blob, fmt)[0]
    assert (back.height, back.width) == (11, 13), fmt
    got = np.asarray(back.data)
    if got.shape[-1] == 1:
        return                       # grayscale-collapsing formats
    got = got[..., :3]
    if fmt in LOSSY:
        assert np.mean((got - arr) ** 2) < 0.06, fmt   # webp noise worst-case
    else:
        # hdr (shared-exponent RGBE) and float formats compare against
        # the raw float input; 8-bit formats against its quantization
        if fmt in ("hdr", "fits", "fts", "exr", "fl32", "pfm", "mat",
                   "vips"):
            np.testing.assert_allclose(got, arr, atol=1 / 128,
                                       err_msg=fmt)
        else:
            np.testing.assert_allclose(got, np.round(arr * 255) / 255,
                                       atol=1 / 254 + 1e-6, err_msg=fmt)


@pytest.mark.parametrize("fmt", _fmts())
def test_roundtrip_single_pixel(fmt):
    if fmt in ("pcx", "dcx"):
        pytest.skip("Pillow's PCX codec cannot round-trip 1x1 images")
    img = Image(np.full((1, 1, 3), 0.5, np.float32),
                ImageSpec(colorspace="srgb"))
    try:
        blob = image_to_blob(img, fmt)
    except (ValueError, OSError):
        pytest.skip(f"{fmt}: rejects 1x1 (documented geometry limit)")
    back = image_from_blob(blob, fmt)[0]
    assert (back.height, back.width) == (1, 1), fmt


SIZED = ["gray", "rgb", "rgba", "bgr", "cmyk", "mono", "yuv", "bayer",
         "map", "raw"]


@pytest.mark.parametrize("fmt", SIZED)
def test_sized_raw_roundtrip(fmt, tmp_path):
    """-size-parameterized raw streams round-trip through real files."""
    import os

    from imagemagick_tpu.io import read_images, write_image

    rng = np.random.default_rng(11)
    arr = rng.random((10, 14, 3)).astype(np.float32)
    img = Image(arr, ImageSpec(colorspace="srgb"))
    path = str(tmp_path / f"t.{fmt}")
    write_image(img, f"{fmt}:{path}", depth=8)
    assert os.path.getsize(path) > 0
    back = read_images(path, size="14x10")[0]
    assert (back.height, back.width) == (10, 14), fmt
    got = np.asarray(back.data)
    if fmt in ("rgb", "rgba", "bgr"):
        np.testing.assert_allclose(got[..., :3],
                                   np.round(arr * 255) / 255,
                                   atol=1 / 254, err_msg=fmt)
    elif fmt in ("gray", "raw", "mono"):
        assert got.shape[-1] == 1


DEEP = ["png", "tiff", "miff", "ppm", "vips", "pgx", "exr", "fits",
        "pfm", "fl32", "mat"]


@pytest.mark.parametrize("fmt", DEEP)
def test_deep_roundtrip_16bit_precision(fmt):
    """Formats claiming >8-bit depth must beat 8-bit quantization error."""
    grad = np.linspace(0.0, 1.0, 31 * 9, dtype=np.float32)
    arr = grad.reshape(9, 31, 1).repeat(3, axis=2)
    img = Image(arr.copy(), ImageSpec(colorspace="srgb", depth=16))
    blob = image_to_blob(img, fmt, depth=16)
    back = image_from_blob(blob, fmt)[0]
    got = np.asarray(back.data)
    if got.shape[-1] == 1:
        got = np.repeat(got, 3, -1)
    err = float(np.abs(got[..., :3] - arr).max())
    assert err < 1 / 1024, f"{fmt}: max err {err} not better than 8-bit"

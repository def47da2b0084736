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
    psnr = float(cmp_ops.psnr_db(img.data, back.data))
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


def _miff_header(**kv):
    head = "id=ImageMagick  version=1.0\n"
    for k, v in kv.items():
        head += f"{k}={v}\n"
    head += "\x0c\n:\x1a"
    return head.encode()


def test_miff_pseudoclass_decode():
    """PseudoClass MIFF: colormap + index pixels (miff.c:1226-1318)."""
    from imagemagick_tpu.io import miff
    cmap = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0]],
                    np.uint8)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], np.uint8)
    blob = _miff_header(**{"class": "PseudoClass", "colors": 4,
                           "columns": 4, "rows": 2, "depth": 8,
                           "colorspace": "sRGB", "compression": "None"})
    blob += cmap.tobytes() + idx.tobytes()
    img = miff.decode(blob)[0]
    expect = cmap[idx].astype(np.float32) / 255.0
    np.testing.assert_allclose(np.asarray(img.data), expect, atol=1e-6)


def test_miff_rle_decode():
    """RLE MIFF: <samples><count-1> packets (miff.c WriteRLEPixels)."""
    from imagemagick_tpu.io import miff
    # 4x2 gray8 image: row0 = [10,10,10,20], row1 = [30,30,30,30]
    packets = bytes([10, 2, 20, 0, 30, 3])
    blob = _miff_header(**{"class": "DirectClass", "columns": 4, "rows": 2,
                           "depth": 8, "colorspace": "Gray",
                           "compression": "RLE"})
    blob += packets
    img = miff.decode(blob)[0]
    expect = np.array([[10, 10, 10, 20], [30, 30, 30, 30]],
                      np.float32)[..., None] / 255.0
    np.testing.assert_allclose(np.asarray(img.data), expect, atol=1e-6)


def test_miff_profile_payload(img):
    """Binary profile blobs: MSB-u32 length + payload (miff.c:1184-1223)."""
    from imagemagick_tpu.io import miff
    icc = b"\x00fake-icc-profile-bytes\x01\x02"
    plain = miff.encode(img, depth=8)
    head, _, pixels = plain.partition(b":\x1a")
    head = head.replace(b"columns=", b"profile=icc\ncolumns=")
    blob = (head + b":\x1a" + len(icc).to_bytes(4, "big") + icc + pixels)
    back = miff.decode(blob)[0]
    assert back.profiles["icc"] == icc
    np.testing.assert_allclose(np.asarray(back.data), np.asarray(img.data),
                               atol=1.0 / 255.0)


@pytest.mark.parametrize("compression", ["zip", "bzip"])
def test_miff_framed_compression_roundtrip(img, compression):
    """version>=1 zip/bzip streams are MSB-u32 length-prefixed row chunks
    (miff.c:1573 read / :2710 write)."""
    from imagemagick_tpu.io import miff
    blob = miff.encode(img, depth=16, compression=compression)
    back = miff.decode(blob)[0]
    np.testing.assert_allclose(np.asarray(back.data), np.asarray(img.data),
                               atol=1.0 / 65535.0 + 1e-6)


def test_miff_unsupported_compression_raises():
    from imagemagick_tpu.io import miff
    blob = _miff_header(**{"class": "DirectClass", "columns": 2, "rows": 2,
                           "depth": 8, "colorspace": "Gray",
                           "compression": "LZMA"}) + b"\x00" * 4
    with pytest.raises(ValueError, match="compression"):
        miff.decode(blob)


def test_miff_float_quantum_reencode_roundtrip():
    """Regression: a decoded half-float MIFF (quantum:format=floating-point,
    miff.c Q16-HDRI payload) must survive re-encode + re-decode. The decoder
    used to pass 'quantum:format' through as a property; the encoder re-emitted
    it while writing integer >u2 pixels, so a second decode misread integers
    as half-floats (values ~3424.0 from a [0,1] image)."""
    from imagemagick_tpu.io import miff

    vals = np.linspace(0.0, 1.0, 12, dtype=np.float32).reshape(2, 2, 3)
    payload = vals.astype(">f2").tobytes()
    blob = (b"id=ImageMagick  version=1.0\n"
            b"class=DirectClass  colors=0  alpha=False\n"
            b"columns=2  rows=2  depth=16\n"
            b"colorspace=sRGB\ncompression=None\n"
            b"quantum:format={floating-point}\n"
            b"\x0c\n:\x1a") + payload
    first = miff.decode(blob)[0]
    assert float(np.abs(first.to_numpy() - vals).max()) < 1e-3
    again = miff.decode(miff.encode(first, depth=16))[0]
    diff = float(np.abs(again.to_numpy() - first.to_numpy()).max())
    assert diff < 1e-4, f"re-encode round-trip corrupted pixels (max {diff})"
    assert "quantum:format" not in again.properties


def test_stream_float_quantum_miff(tmp_path):
    """io.stream row readers must honor quantum:format=floating-point
    (half-float rows), mirroring miff.decode (ADVICE r4)."""
    from imagemagick_tpu.io import stream as iostream

    vals = np.linspace(0.0, 1.0, 24, dtype=np.float32).reshape(4, 2, 3)
    blob = (b"id=ImageMagick  version=1.0\n"
            b"class=DirectClass  colors=0  alpha=False\n"
            b"columns=2  rows=4  depth=16\n"
            b"colorspace=sRGB\ncompression=None\n"
            b"quantum:format={floating-point}\n"
            b"\x0c\n:\x1a") + vals.astype(">f2").tobytes()
    p = tmp_path / "f16.miff"
    p.write_bytes(blob)
    loader, (h, w, c) = iostream.open_rows(str(p))
    assert (h, w, c) == (4, 2, 3)
    rows = loader(1, 3)
    assert float(np.abs(rows - vals[1:3]).max()) < 1e-3
    got = []
    iostream.read_stream(str(p), lambda b, y: got.append(b), rows_per_batch=2)
    assert float(np.abs(np.concatenate(got) - vals).max()) < 1e-3


def test_meta_channels(img):
    """Meta-channel tail (pixel.h:27 64-channel map analog): carried by
    geometry ops, ignored by color ops, strippable."""
    import jax.numpy as jnp
    from imagemagick_tpu.ops import transform as tf

    meta = jnp.stack([jnp.ones_like(img.data[..., 0]) * 0.25,
                      jnp.zeros_like(img.data[..., 0])], -1)
    m = img.with_meta(meta)
    assert m.spec.meta_channels == 2 and m.channels == 5
    np.testing.assert_allclose(np.asarray(m.meta_data()), np.asarray(meta))
    # colorspace transform preserves the tail
    g = m.transform_colorspace("lab")
    assert g.spec.meta_channels == 2
    np.testing.assert_allclose(np.asarray(g.meta_data()), np.asarray(meta))
    # geometry ops slice the tail with the pixel
    c = m.replace(data=tf.crop(m.data, 2, 3, 10, 8))
    assert c.data.shape[-1] == 5
    np.testing.assert_allclose(np.asarray(c.data[..., 3]), 0.25)
    # strip
    s = m.with_meta(None)
    assert s.spec.meta_channels == 0 and s.channels == 3

"""Round-4 coder tail: ORA, KERNEL, MASK, CLIP, PANGO, video, delegates.

Delegate-backed formats (video encode, dot/pcl/xps/office) skip cleanly
when the external binary is absent — the rules activate conditionally,
exactly like delegates.xml entries for uninstalled programs.
"""

import io as _io
import zipfile

import numpy as np
import pytest

from imagemagick_tpu import io as iio
from imagemagick_tpu.core.image import Image
from imagemagick_tpu.core.spec import ImageSpec


@pytest.fixture
def rgb8():
    rng = np.random.default_rng(3)
    return Image(rng.random((24, 32, 3)).astype(np.float32),
                 ImageSpec(colorspace="srgb"))


def test_ora_roundtrip(rgb8, tmp_path):
    p = tmp_path / "t.ora"
    iio.write_image(rgb8, str(p))
    with zipfile.ZipFile(p) as z:
        names = set(z.namelist())
        assert {"mimetype", "stack.xml", "mergedimage.png",
                "Thumbnails/thumbnail.png"} <= names
        info = z.getinfo("mimetype")
        assert info.compress_type == zipfile.ZIP_STORED  # spec: stored first
        assert z.read("mimetype") == b"image/openraster"
    back = iio.read_image(str(p))
    assert back.width == rgb8.width and back.height == rgb8.height
    a = np.asarray(back.data)[..., :3]
    assert np.max(np.abs(a - np.asarray(rgb8.data))) < 2e-2  # 8-bit PNG


def test_ora_sniffed_without_extension(rgb8, tmp_path):
    p = tmp_path / "blob.bin"
    iio.write_image(rgb8, "ora:" + str(p))
    back = iio.read_images(str(p))  # magic sniff: zip + openraster mimetype
    assert back[0].width == rgb8.width


def test_kernel_write_format(tmp_path):
    img = Image(np.asarray([[[0.0], [0.5]], [[1.0], [0.25]]], np.float32),
                ImageSpec(colorspace="gray"))
    blob = iio.image_to_blob([img], "kernel")
    text = blob.decode()
    assert text.startswith("2x2:")
    vals = [float(v) for v in text[4:].strip().split(",")]
    assert vals == pytest.approx([0.0, 0.5, 1.0, 0.25], abs=1e-6)


def test_kernel_write_transparent_dash():
    data = np.zeros((1, 2, 2), np.float32)
    data[0, 0] = [0.75, 1.0]   # opaque
    data[0, 1] = [0.25, 0.1]   # transparent -> '-'
    img = Image(data, ImageSpec(colorspace="gray", alpha=True))
    text = iio.image_to_blob([img], "kernel").decode()
    assert text.strip() == "2x1:0.75,-"


def test_kernel_pseudo_read():
    img = iio.read_image("kernel:octagon:2")
    assert img.width == 5 and img.height == 5
    arr = np.asarray(img.data)
    assert arr.shape[-1] == 2                   # gray + definedness alpha
    assert arr[..., 1].max() == 1.0
    assert arr[0, 0, 0] == 0.0                  # octagon corner tap is 0
    assert arr[2, 2, 0] == 1.0                  # center tap is max


def test_mask_read_grayscales(rgb8, tmp_path):
    p = tmp_path / "m.png"
    iio.write_image(rgb8, str(p))
    imgs = iio.read_images(f"mask:{p}")
    assert imgs[0].data.shape[-1] == 1
    assert imgs[0].spec.colorspace == "gray"


def test_mask_write_requires_mask(rgb8, tmp_path):
    with pytest.raises(Exception):
        iio.write_image(rgb8, f"mask:{tmp_path}/m.png")
    m = np.zeros((24, 32), np.float32)
    m[:, :16] = 1.0
    rgb8.properties["wand:mask"] = m
    iio.write_image(rgb8, f"mask:{tmp_path}/m.png")
    back = iio.read_image(str(tmp_path / "m.png"))
    arr = np.asarray(back.data)[..., 0]
    assert arr[0, 0] > 0.9 and arr[0, 31] < 0.1


def test_clip_read_from_8bim_path(tmp_path):
    """Build a minimal 8BIM path resource (resource 2000, two-knot
    rectangle) and check clip: rasterizes it."""
    import struct

    def fixed(v):
        return struct.pack(">i", int(v * (1 << 24)))

    def knot(y, x):
        # control-in == anchor == control-out (straight corners)
        return struct.pack(">H", 1) + (fixed(y) + fixed(x)) * 3

    records = struct.pack(">H", 0) + b"\x00" * 24      # closed subpath len
    for (y, x) in ((0.25, 0.25), (0.25, 0.75), (0.75, 0.75), (0.75, 0.25)):
        records += knot(y, x)
    payload = records
    res = (b"8BIM" + struct.pack(">H", 2000) + b"\x00\x00"
           + struct.pack(">I", len(payload)) + payload)
    img = Image(np.ones((40, 40, 3), np.float32), ImageSpec())
    img.profiles["8bim"] = res
    from imagemagick_tpu.io import coders_r4

    out = coders_r4.read_clip([img])[0]
    arr = np.asarray(out.data)[..., 0]
    assert arr[20, 20] == 1.0       # inside the rectangle
    assert arr[2, 2] == 0.0         # outside
    # no clip path -> CoderError analog
    img2 = Image(np.ones((8, 8, 3), np.float32), ImageSpec())
    with pytest.raises(Exception):
        coders_r4.read_clip([img2])


def test_pango_markup_stripped():
    img = iio.read_images("pango:<b>Hello</b> <span size='12'>world</span>",
                          size="200x40")[0]
    assert img.width >= 10 and img.height >= 8
    assert np.asarray(img.data).min() < 0.9     # something was rendered


def test_video_write_skips_cleanly(rgb8, tmp_path):
    from imagemagick_tpu.io import delegates

    if not delegates.has_ffmpeg():
        with pytest.raises(Exception):
            iio.write_image([rgb8, rgb8], str(tmp_path / "o.mp4"))
        pytest.skip("ffmpeg not installed")
    iio.write_image([rgb8] * 4, str(tmp_path / "o.mp4"))
    frames = iio.read_images(str(tmp_path / "o.mp4"))
    assert len(frames) >= 1


def test_delegate_rules_registered():
    from imagemagick_tpu.io import delegates

    d = delegates.list_delegates()
    assert "dot (graphviz dot/gv)" in d
    assert "gpcl6 (pcl)" in d
    assert "gxps (xps)" in d
    assert "libreoffice (doc/docx/odt)" in d
    # absent binaries -> clean DelegateError, not a crash
    if not delegates.has_graphviz():
        with pytest.raises(delegates.DelegateError):
            delegates.decode_dot(b"digraph { a -> b }")


def test_supported_formats_grew():
    rf = iio.supported_read_formats()
    wf = iio.supported_write_formats()
    for f in ("ora", "mask", "clip", "kernel", "pango"):
        assert f in rf or f in wf, f
    assert "ora" in wf and "kernel" in wf and "mask" in wf


def test_dng_dcraw_fallback_gate(tmp_path):
    """Exotic raws the native CFA demosaic declines route to the
    dcraw/darktable delegate chain when a binary exists; with no binary
    the native error propagates (delegates.xml.in:70 rule parity)."""
    from imagemagick_tpu.io import delegates

    # a DNG-tagged TIFF with no CFA IFD: native decode raises ValueError
    import struct
    # minimal little-endian TIFF header with one IFD carrying DNGVersion
    ifd = struct.pack("<H", 1) + struct.pack("<HHI4s", 50706, 1, 4,
                                             bytes([1, 4, 0, 0])) + b"\0" * 4
    blob = b"II*\x00" + struct.pack("<I", 8) + ifd
    if delegates.has_dcraw():
        with pytest.raises(Exception):   # delegate gets it, fails cleanly
            iio.image_from_blob(blob, "dng")
    else:
        with pytest.raises(ValueError):
            iio.image_from_blob(blob, "dng")

"""Round-4 coder tail part 2: STRIMG/DEBUG/MATTE/META/DMR/WMF.

Self round-trip tests always run; text/semantic cross-checks against the
real reference binary run when /tmp/imbuild/utilities/magick exists
(strimg.c, debug.c, matte.c, meta.c, dmr.c, wmf.c)."""

import os
import struct
import subprocess

import numpy as np
import pytest

_REF = "/tmp/imbuild/utilities/magick"
_HAS_REF = os.path.exists(_REF)


def _oracle(args, **kw):
    return subprocess.run([_REF, *args], check=True, capture_output=True,
                          **kw).stdout


# ---------------------------------------------------------------------------
# STRIMG
# ---------------------------------------------------------------------------

def test_strimg_round_trip():
    import imagemagick_tpu.io as iio
    from imagemagick_tpu.io import coders_r4b as cb

    im = iio.read_images("strimg:hello world")[0]
    assert (im.width, im.height) == (11, 1)
    assert cb.encode_strimg(im) == b"hello world"


@pytest.mark.skipif(not _HAS_REF, reason="reference binary not built")
def test_strimg_matches_oracle(tmp_path):
    import imagemagick_tpu.io as iio

    out = tmp_path / "s.png"
    _oracle(["strimg:graft", str(out)])
    from PIL import Image as PILImage

    ref = np.asarray(PILImage.open(str(out)).convert("L"), np.int32)
    ours = np.asarray(iio.read_images("strimg:graft")[0].data)
    ours8 = np.round(ours[..., 0] * 255).astype(np.int32)
    assert ref.shape == ours8.shape
    assert np.array_equal(ref, ours8)


# ---------------------------------------------------------------------------
# DEBUG
# ---------------------------------------------------------------------------

def test_debug_text_format():
    from imagemagick_tpu.core.image import Image
    from imagemagick_tpu.core.spec import ImageSpec
    from imagemagick_tpu.io import coders_r4b as cb

    img = Image(np.array([[[1.0, 0.0, 0.0]]], np.float32),
                ImageSpec(colorspace="srgb", alpha=False, depth=16))
    txt = cb.encode_debug([img]).decode()
    assert txt == ("# ImageMagick pixel debugging: 1,1,65535,srgb\n"
                   "0,0: 65535,0,0 \n")


@pytest.mark.skipif(not _HAS_REF, reason="reference binary not built")
def test_debug_matches_oracle_exactly():
    from imagemagick_tpu.cli.main import process

    ref = _oracle(["-size", "2x1", "xc:srgb(1,2,3)", "debug:-"]).decode()
    r = subprocess.run(
        ["python", "-c",
         "from imagemagick_tpu.cli.main import process; "
         "process(['-size','2x1','xc:srgb(1,2,3)','debug:-'])"],
        capture_output=True, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-500:]
    assert r.stdout.decode() == ref


# ---------------------------------------------------------------------------
# MATTE
# ---------------------------------------------------------------------------

def test_matte_extracts_alpha():
    import imagemagick_tpu.io as iio
    from imagemagick_tpu.core.image import Image
    from imagemagick_tpu.core.spec import ImageSpec
    from imagemagick_tpu.io import coders_r4b as cb

    a = np.full((2, 2, 1), 0.25, np.float32)
    rgba = Image(np.concatenate([np.full((2, 2, 3), 0.5, np.float32), a],
                                -1),
                 ImageSpec(colorspace="srgb", alpha=True))
    back = iio.image_from_blob(cb.encode_matte(rgba))[0]
    arr = np.asarray(back.data)
    assert arr.shape[-1] == 3
    assert np.allclose(arr, 0.25, atol=1e-4)
    # no alpha channel -> error, like matte.c:188
    rgb = Image(np.zeros((1, 1, 3), np.float32), ImageSpec(alpha=False))
    with pytest.raises(ValueError):
        cb.encode_matte(rgb)


@pytest.mark.skipif(not _HAS_REF, reason="reference binary not built")
def test_matte_matches_oracle(tmp_path):
    import imagemagick_tpu.io as iio
    from imagemagick_tpu.core.image import Image
    from imagemagick_tpu.core.spec import ImageSpec
    from imagemagick_tpu.io import coders_r4b as cb

    ref_file = tmp_path / "ref.miff"
    _oracle(["-size", "2x2", "xc:rgba(128,64,32,0.25)",
             f"matte:{ref_file}"])
    ref = iio.read_images(str(ref_file))[0]
    a = np.full((2, 2, 1), 0.25, np.float32)
    ours = cb.encode_matte(Image(
        np.concatenate([np.zeros((2, 2, 3), np.float32), a], -1),
        ImageSpec(colorspace="srgb", alpha=True)))
    ours_im = iio.image_from_blob(ours)[0]
    assert np.allclose(np.asarray(ref.data)[..., :3],
                       np.asarray(ours_im.data)[..., :3], atol=1e-4)


# ---------------------------------------------------------------------------
# META
# ---------------------------------------------------------------------------

def _sample_8bim():
    from imagemagick_tpu.io import coders_r4b as cb

    iptc = (b"\x1c\x02\x05" + struct.pack(">H", 4) + b"Rose" +
            b"\x1c\x02\x78" + struct.pack(">H", 7) + b"caption")
    return cb._build_8bim([(1028, "", iptc), (2000, "Path", b"\x01\x02abc")])


def test_meta_8bim_text_round_trip():
    from imagemagick_tpu.io import coders_r4b as cb

    bim = _sample_8bim()
    text = cb.format_8bimtext(bim)
    assert cb.parse_8bimtext(text) == bim      # bit-exact round trip
    m = cb.decode_meta(bim, "8bim")
    assert bytes(m.profiles["8bim"]) == bim
    iptc = cb.iptc_from_8bim(bim)
    assert cb.encode_meta(m, "iptc") == iptc
    recs = {(ds, rec): d for ds, rec, d in cb._iter_iptc(iptc)}
    assert recs[(2, 5)] == b"Rose" and recs[(2, 120)] == b"caption"


@pytest.mark.skipif(not _HAS_REF, reason="reference binary not built")
def test_meta_text_matches_oracle(tmp_path):
    from imagemagick_tpu.io import coders_r4b as cb

    bim = _sample_8bim()
    p = tmp_path / "prof.8bim"
    p.write_bytes(bim)
    ref_8bimtext = _oracle([f"8BIM:{p}", "8BIMTEXT:-"]).decode()
    assert cb.format_8bimtext(bim) == ref_8bimtext
    ref_iptctext = _oracle([f"8BIM:{p}", "IPTCTEXT:-"]).decode()
    assert cb.format_iptctext(cb.iptc_from_8bim(bim)) == ref_iptctext
    ref_iptc = _oracle([f"8BIM:{p}", "IPTC:-"])
    assert cb.iptc_from_8bim(bim) == ref_iptc


def test_meta_file_io(tmp_path):
    import imagemagick_tpu.io as iio

    xmp = b"<?xpacket begin=''?><x:xmpmeta xmlns:x='adobe:ns:meta/'/>"
    f = tmp_path / "meta.xmp"
    f.write_bytes(xmp)
    im = iio.read_images(f"xmp:{f}")[0]
    assert bytes(im.profiles["xmp"]) == xmp
    out = tmp_path / "out.xmp"
    iio.write_image(im, f"xmp:{out}")
    assert out.read_bytes() == xmp


# ---------------------------------------------------------------------------
# DMR
# ---------------------------------------------------------------------------

def test_dmr_repository_round_trip(tmp_path):
    import imagemagick_tpu.io as iio
    from imagemagick_tpu.core.image import Image
    from imagemagick_tpu.core.spec import ImageSpec
    from imagemagick_tpu.io import coders_r4b as cb

    img = Image(np.random.default_rng(3).random((4, 5, 3)).astype(
        np.float32), ImageSpec(colorspace="srgb", alpha=False))
    st = {"defines": {"dmr:path": str(tmp_path)}}
    cb.write_dmr([img], "image/tests/rose", st)
    back = cb.read_dmr("image/tests/rose", st)[0]
    assert np.allclose(np.asarray(back.data)[..., :3],
                       np.asarray(img.data), atol=2e-4)
    # enciphered resources require the passphrase
    st2 = {"defines": {"dmr:path": str(tmp_path),
                       "dmr:passphrase": "open sesame"}}
    cb.write_dmr([img], "image/sec/rose", st2)
    back2 = cb.read_dmr("image/sec/rose", st2)[0]
    assert np.allclose(np.asarray(back2.data)[..., :3],
                       np.asarray(img.data), atol=2e-4)
    with pytest.raises(Exception):
        cb.read_dmr("image/sec/rose", st)
    # meta resources surface as dmr:meta (dmr.c MetaResourceType)
    mi = Image(np.zeros((1, 1, 3), np.float32), ImageSpec())
    mi.properties["dmr:meta"] = "hello repository"
    cb.write_dmr([mi], "meta/greeting", st)
    assert cb.read_dmr("meta/greeting",
                       st)[0].properties["dmr:meta"] == "hello repository"
    # escape attempts refuse
    with pytest.raises(Exception):
        cb.read_dmr("../outside", st)


def test_dmr_cli_surface(tmp_path):
    from imagemagick_tpu.cli.main import process

    process(["-define", f"dmr:path={tmp_path}", "-size", "3x3", "xc:red",
             "dmr:image/cli/red"])
    out = tmp_path / "back.png"
    process(["-define", f"dmr:path={tmp_path}", "dmr:image/cli/red",
             str(out)])
    from PIL import Image as PILImage

    arr = np.asarray(PILImage.open(str(out)).convert("RGB"))
    assert arr.shape == (3, 3, 3)
    assert arr[0, 0, 0] == 255 and arr[0, 0, 1] == 0


# ---------------------------------------------------------------------------
# WMF
# ---------------------------------------------------------------------------

def _wmf_rec(func, params):
    out = struct.pack("<IH", 3 + len(params), func)
    for p in params:
        out += struct.pack("<h", p) if -32768 <= p < 32768 \
            else struct.pack("<H", p & 0xFFFF)
    return out


def _sample_wmf():
    recs = (
        _wmf_rec(0x020C, [100, 100]) +                 # SetWindowExt
        _wmf_rec(0x020B, [0, 0]) +                     # SetWindowOrg
        _wmf_rec(0x02FC, [0, 0x00FF, 0x0000]) +        # red brush
        _wmf_rec(0x012D, [0]) +
        _wmf_rec(0x02FA, [0, 2, 0, 0x0000, 0x00FF]) +  # blue pen
        _wmf_rec(0x012D, [1]) +
        _wmf_rec(0x041B, [80, 80, 20, 20]) +           # Rectangle
        _wmf_rec(0x0214, [5, 5]) +                     # MoveTo
        _wmf_rec(0x0213, [95, 95]) +                   # LineTo
        _wmf_rec(0x0418, [95, 95, 82, 82]) +           # Ellipse
        _wmf_rec(0x0000, []))
    ph = (struct.pack("<IH4hH", 0x9AC6CDD7, 0, 0, 0, 100, 100, 72) +
          struct.pack("<IH", 0, 0))
    hdr = struct.pack("<HHHIHIH", 1, 9, 0x300, (18 + len(recs)) // 2,
                      2, 0, 0)
    return ph + hdr + recs


def test_wmf_subset_render():
    import imagemagick_tpu.io as iio

    data = _sample_wmf()
    assert iio.detect_format(data) == "wmf"
    img = iio.image_from_blob(data)[0]
    a = np.asarray(img.data)
    assert a.shape[:2] == (100, 100)
    assert a[30, 60, 0] > 0.9 and a[30, 60, 2] < 0.3   # red brush fill
    assert a[50, 50, 2] > 0.9 and a[50, 50, 0] < 0.3   # blue pen line
    assert a[88, 88, 0] > 0.9 and a[88, 88, 2] < 0.3   # red ellipse
    assert a[2, 98].min() > 0.9                        # white background


def test_wmf_text_and_polygon():
    from imagemagick_tpu.io import coders_r4b as cb

    text = b"Hi"
    recs = (
        _wmf_rec(0x020C, [64, 64]) +
        _wmf_rec(0x020B, [0, 0]) +
        _wmf_rec(0x02FC, [0, 0x0000, 0x0000]) +        # black brush
        _wmf_rec(0x012D, [0]) +
        _wmf_rec(0x0324, [3, 4, 60, 32, 4, 60, 60]) +  # triangle
        struct.pack("<IH", 3 + 1 + 1 + 2, 0x0521) +    # TextOut
        struct.pack("<H", len(text)) + text +
        struct.pack("<hh", 10, 6) +                    # y, x
        _wmf_rec(0x0000, []))
    hdr = struct.pack("<HHHIHIH", 1, 9, 0x300, (18 + len(recs)) // 2,
                      2, 0, 0)
    img = cb.decode_wmf(hdr + recs)
    a = np.asarray(img.data)
    assert a.shape[:2] == (64, 64)
    assert a[20, 32].max() < 0.3      # inside triangle: black fill
    assert a[2, 2].min() > 0.9        # background white


def test_new_formats_registered():
    import imagemagick_tpu.io as iio

    r = set(iio.supported_read_formats())
    w = set(iio.supported_write_formats())
    assert {"strimg", "dmr", "wmf", "8bim", "8bimtext", "exif", "xmp",
            "icc", "iptc", "iptctext"} <= r
    assert {"strimg", "debug", "matte", "dmr", "8bim", "8bimtext",
            "iptc", "iptctext", "xmp", "icc"} <= w

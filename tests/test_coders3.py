"""MAT / VIFF / RLA coders (io/formats3.py).

Round trips plus hand-assembled wire fixtures whose layout comes from the
format specs (MAT-file format doc, Khoros VIFF header, Wavefront RLA), so
expectations are independent of the encoder under test.
"""

import struct
import zlib

import numpy as np
import pytest

from imagemagick_tpu import io as iio
from imagemagick_tpu.core.image import Image
from imagemagick_tpu.core.spec import ImageSpec
from imagemagick_tpu.io import formats3


def _img(h, w, c=3, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.random((h, w, c)).astype(np.float32)
    cs = "gray" if c == 1 else "srgb"
    return Image(data, ImageSpec(colorspace=cs, alpha=(c == 4), depth=8))


# --- MAT ---

def test_mat_roundtrip_rgb():
    img = _img(13, 9, 3)
    blob = formats3.encode_mat(img)
    assert blob[:19] == b"MATLAB 5.0 MAT-file"
    back = formats3.decode_mat(blob)[0]
    assert back.data.shape == (13, 9, 3)
    np.testing.assert_allclose(np.asarray(back.data),
                               np.round(img.to_numpy() * 255) / 255,
                               atol=1 / 255)


def test_mat_roundtrip_gray():
    img = _img(6, 8, 1)
    back = formats3.decode_mat(formats3.encode_mat(img))[0]
    assert back.data.shape == (6, 8, 1)


def test_mat_hand_built_v5_column_major():
    """A 2x3 uint8 matrix written column-major per the MAT-5 spec."""
    # values: [[0, 100, 200], [50, 150, 250]] -> column-major payload
    payload = bytes([0, 50, 100, 150, 200, 250])

    def element(t, body):
        pad = (-len(body)) % 8
        return struct.pack("<II", t, len(body)) + body + b"\0" * pad

    matrix = (element(6, struct.pack("<II", 9, 0))        # flags: mxUINT8
              + element(5, struct.pack("<2i", 2, 3))      # dims 2x3
              + element(1, b"m")                          # name
              + element(2, payload))                      # miUINT8 data
    blob = (b"MATLAB 5.0 MAT-file test".ljust(124)
            + struct.pack("<H", 0x0100) + b"IM"
            + element(14, matrix))
    img = formats3.decode_mat(blob)[0]
    arr = np.asarray(img.data)[..., 0] * 255
    np.testing.assert_allclose(arr, [[0, 100, 200], [50, 150, 250]],
                               atol=0.5)


def test_mat_compressed_element():
    img = _img(5, 4, 1)
    blob = formats3.encode_mat(img)
    # wrap the matrix element in a miCOMPRESSED envelope
    header, element = blob[:128], blob[128:]
    comp = zlib.compress(element)
    blob2 = header + struct.pack("<II", 15, len(comp)) + comp
    back = formats3.decode_mat(blob2)[0]
    np.testing.assert_allclose(np.asarray(back.data),
                               np.asarray(formats3.decode_mat(blob)[0].data))


def test_mat_v4():
    # level-4 header: MOPT=0.0.5.0 (LE, uint8), 3 rows x 2 cols
    vals = np.arange(6, dtype=np.uint8).reshape(3, 2) * 40
    blob = (struct.pack("<5i", 50, 3, 2, 0, 2) + b"m\0"
            + vals.T.tobytes())
    img = formats3.decode_mat(blob)[0]
    assert img.data.shape == (3, 2, 1)
    np.testing.assert_allclose(np.asarray(img.data)[..., 0] * 255,
                               vals.astype(np.float32), atol=0.5)


def test_mat_via_registry():
    img = _img(4, 4, 3)
    blob = iio.image_to_blob(img, "mat")
    back = iio.image_from_blob(blob)[0]        # magic-sniffed
    assert back.data.shape == (4, 4, 3)


# --- VIFF ---

def test_viff_roundtrip_rgb():
    img = _img(7, 11, 3, seed=1)
    blob = formats3.encode_viff(img)
    assert blob[0] == 0xAB and len(blob) == 1024 + 7 * 11 * 3
    back = formats3.decode_viff(blob)
    np.testing.assert_allclose(np.asarray(back.data),
                               np.round(img.to_numpy() * 255) / 255,
                               atol=1 / 255)


def test_viff_roundtrip_gray():
    img = _img(5, 6, 1, seed=2)
    back = formats3.decode_viff(formats3.encode_viff(img))
    assert back.data.shape == (5, 6, 1)
    assert back.spec.colorspace == "gray"


def test_viff_big_endian_short():
    """Hand-built MSB ushort single-band file (machine_dependency=2)."""
    hdr = bytearray(1024)
    hdr[0], hdr[1], hdr[2], hdr[3] = 0xAB, 1, 1, 3
    hdr[4] = 0x2  # not DEC/NS order -> MSB payload
    struct.pack_into(">I", hdr, 520, 2)   # rows
    struct.pack_into(">I", hdr, 524, 3)   # cols
    struct.pack_into(">I", hdr, 548, 1)
    struct.pack_into(">I", hdr, 556, 1)
    struct.pack_into(">I", hdr, 560, 1)   # bands
    struct.pack_into(">I", hdr, 564, 2)   # VFF_TYP_2_BYTE
    vals = np.array([[0, 32768, 65535], [16384, 49152, 65535]], ">u2")
    img = formats3.decode_viff(bytes(hdr) + vals.tobytes())
    np.testing.assert_allclose(np.asarray(img.data)[..., 0],
                               vals.astype(np.float32) / 65535.0, atol=1e-4)


def test_viff_bit_type():
    hdr = bytearray(1024)
    hdr[0], hdr[1] = 0xAB, 1
    hdr[4] = 0x4  # DECORDER
    struct.pack_into("<I", hdr, 520, 1)   # rows
    struct.pack_into("<I", hdr, 524, 10)  # cols
    struct.pack_into("<I", hdr, 560, 1)   # bands
    struct.pack_into("<I", hdr, 564, 0)   # VFF_TYP_BIT
    # bits 0..9, set odd bits: LSB-first packing
    row = bytes([0b10101010, 0b00000010])
    img = formats3.decode_viff(bytes(hdr) + row)
    got = np.asarray(img.data)[0, :, 0]
    np.testing.assert_allclose(got, [0, 1, 0, 1, 0, 1, 0, 1, 0, 1])


def test_viff_via_registry():
    img = _img(4, 5, 3)
    blob = iio.image_to_blob(img, "viff")
    back = iio.image_from_blob(blob)[0]
    assert back.data.shape == (4, 5, 3)


# --- RLA ---

def test_rla_roundtrip_rgb():
    img = _img(9, 7, 3, seed=3)
    blob = formats3.encode_rla(img)
    back = formats3.decode_rla(blob)
    np.testing.assert_allclose(np.asarray(back.data),
                               np.round(img.to_numpy() * 255) / 255,
                               atol=1 / 255)


def test_rla_roundtrip_rgba():
    img = _img(5, 5, 4, seed=4)
    back = formats3.decode_rla(formats3.encode_rla(img))
    assert back.data.shape == (5, 5, 4)
    assert back.spec.alpha


def test_rla_rle_runs():
    """Constant rows exercise the run-length path end-to-end."""
    data = np.zeros((4, 200, 3), np.float32)
    data[:, :, 0] = 1.0          # solid red -> long runs
    img = Image(data, ImageSpec(colorspace="srgb", alpha=False, depth=8))
    blob = formats3.encode_rla(img)
    # long runs compress: well under raw size
    assert len(blob) < 740 + 16 + 4 * 200 * 3
    back = formats3.decode_rla(blob)
    np.testing.assert_allclose(np.asarray(back.data), data, atol=1 / 255)


def test_rla_header_fields():
    img = _img(3, 4, 3)
    blob = formats3.encode_rla(img)
    left, right, bottom, top = struct.unpack_from(">4h", blob, 8)
    assert (right - left + 1, top - bottom + 1) == (4, 3)
    n_chan, n_matte = struct.unpack_from(">2h", blob, 20)
    assert (n_chan, n_matte) == (3, 0)


def test_rla_via_registry():
    img = _img(4, 4, 3)
    blob = iio.image_to_blob(img, "rla")
    back = iio.image_from_blob(blob, "rla")[0]  # extension-routed
    assert back.data.shape == (4, 4, 3)


def test_format_lists_include_new_coders():
    r = iio.supported_read_formats()
    w = iio.supported_write_formats()
    for f in ("mat", "viff", "rla"):
        assert f in r and f in w


# --- PALM ---

def test_palm_16bit_roundtrip():
    img = _img(9, 11, 3, seed=5)
    blob = formats3.encode_palm(img)
    back = formats3.decode_palm(blob)
    # RGB565 quantization: 5/6/5 bits
    assert back.data.shape == (9, 11, 3)
    np.testing.assert_allclose(np.asarray(back.data),
                               np.asarray(img.to_numpy()), atol=1 / 31)


def test_palm_gray_roundtrip():
    img = _img(6, 10, 1, seed=6)
    blob = formats3.encode_palm(img)
    back = formats3.decode_palm(blob)
    # 4-bit grayscale ramp
    assert back.data.shape[-1] == 3
    got = np.asarray(back.data)[..., 0]
    np.testing.assert_allclose(got, np.asarray(img.to_numpy())[..., 0],
                               atol=1 / 15 + 1e-3)


def test_palm_hand_built_1bit_rle():
    """1-bit compressed bitmap assembled by hand: RLE runs per row."""
    import struct as st
    w, h, bpr = 16, 2, 2
    header = st.pack(">4HBBHBBH", w, h, bpr, 0x8000, 1, 0, 0, 0, 0x01, 0)
    # row 0: 0xF0 0x0F ; row 1: 0xFF 0x00  (RLE pairs: count,value)
    payload = bytes([1, 0xF0, 1, 0x0F, 1, 0xFF, 1, 0x00])
    blob = header + st.pack(">H", len(payload)) + payload
    img = formats3.decode_palm(blob)
    g = np.asarray(img.data)[..., 0]
    # bit=1 -> index 1 -> black; bit=0 -> white (MSB first)
    assert g[0, 0] == 0.0 and g[0, 7] == 1.0
    assert g[0, 8] == 1.0 and g[0, 15] == 0.0
    assert g[1, 0] == 0.0 and g[1, 8] == 1.0


def test_palm_scanline_compression():
    import struct as st
    w, h, bpr = 8, 3, 1
    header = st.pack(">4HBBHBBH", w, h, bpr, 0x8000, 1, 0, 0, 0, 0x00, 0)
    # scanline: row0 literal 0xAA; row1 mask=0x00 (copy); row2 mask=0x80 new 0x55
    payload = bytes([0x80, 0xAA, 0x00, 0x80, 0x55])
    blob = header + st.pack(">H", len(payload)) + payload
    img = formats3.decode_palm(blob)
    g = np.asarray(img.data)[..., 0]
    np.testing.assert_array_equal(g[0], g[1])
    assert not np.array_equal(g[0], g[2])


def test_palm_system_palette_structure():
    pal = formats3._palm_system_palette()
    assert pal.shape == (256, 3)
    assert tuple(pal[0]) == (255, 255, 255)
    assert tuple(pal[1]) == (255, 204, 255)
    assert tuple(pal[18]) == (204, 255, 255)
    assert tuple(pal[255]) == (0, 0, 0)


def test_palm_via_registry():
    img = _img(4, 4, 3)
    blob = iio.image_to_blob(img, "palm")
    back = iio.image_from_blob(blob, "palm")[0]
    assert back.data.shape == (4, 4, 3)


# --- PICT ---

def test_pict_roundtrip_rgb():
    img = _img(12, 17, 3, seed=7)
    blob = formats3.encode_pict(img)
    assert struct.unpack_from(">2H", blob, 522) == (0x0011, 0x02FF)
    back = formats3.decode_pict(blob)
    np.testing.assert_allclose(np.asarray(back.data),
                               np.round(img.to_numpy() * 255) / 255,
                               atol=1 / 255)


def test_pict_roundtrip_rgba():
    img = _img(8, 9, 4, seed=8)
    back = formats3.decode_pict(formats3.encode_pict(img))
    assert back.data.shape == (8, 9, 4)
    assert back.spec.alpha


def test_pict_wide_rows():
    """row_bytes > 250 switches to the u16 packed-length prefix."""
    img = _img(3, 100, 3, seed=9)  # row_bytes = 400
    back = formats3.decode_pict(formats3.encode_pict(img))
    np.testing.assert_allclose(np.asarray(back.data),
                               np.round(img.to_numpy() * 255) / 255,
                               atol=1 / 255)


def test_pict_packbits_runs():
    data = np.zeros((4, 64, 3), np.float32)
    data[:, :32, 1] = 1.0
    img = Image(data, ImageSpec(colorspace="srgb", alpha=False, depth=8))
    blob = formats3.encode_pict(img)
    assert len(blob) < 512 + 200 + 4 * 64 * 4  # runs compress
    back = formats3.decode_pict(blob)
    np.testing.assert_allclose(np.asarray(back.data), data, atol=1 / 255)


def test_pict_via_registry():
    img = _img(5, 6, 3)
    blob = iio.image_to_blob(img, "pict")
    back = iio.image_from_blob(blob, "pct")[0]
    assert back.data.shape == (5, 6, 3)


# --- G4 (T.6 MMR) ---

def test_g4_roundtrip_exact():
    from imagemagick_tpu.utils import fax
    rng = np.random.default_rng(21)
    for h, w, p in [(8, 64, 0.5), (16, 100, 0.1), (5, 1728, 0.9),
                    (32, 33, 0.3), (1, 7, 0.5)]:
        bits = (rng.random((h, w)) < p).astype(np.uint8)
        assert np.array_equal(fax.decode_g4(fax.encode_g4(bits), width=w),
                              bits)


def test_g4_beats_g3_on_documents():
    from imagemagick_tpu.utils import fax
    doc = np.zeros((64, 512), np.uint8)
    doc[10:20, 30:200] = 1
    doc[30:32, :] = 1
    g4 = fax.encode_g4(doc)
    g3 = fax.encode_g3(doc)
    assert np.array_equal(fax.decode_g4(g4, width=512), doc)
    assert len(g4) < len(g3) / 3  # 2-D coding wins on correlated rows


def test_g4_pass_mode():
    """A shape that shrinks then vanishes exercises pass coding."""
    from imagemagick_tpu.utils import fax
    bits = np.zeros((4, 40), np.uint8)
    bits[0, 5:30] = 1
    bits[1, 10:20] = 1   # black region inside previous -> pass candidates
    bits[2, 10:12] = 1
    assert np.array_equal(fax.decode_g4(fax.encode_g4(bits), width=40), bits)


def test_g4_via_registry():
    img = _img(16, 1728, 1, seed=22)
    blob = iio.image_to_blob(img, "g4")
    back = iio.image_from_blob(blob, "g4")[0]
    want = (np.asarray(img.to_numpy())[..., 0] >= 0.5).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(back.data)[..., 0], want)

"""Batch-4 native coders (io/formats4.py).

Round trips + wire-format spot checks against the reference coder
conventions (coders/aai.c, hrz.c, scr.c, rgf.c, cip.c, mono.c, txt.c,
inline.c, pgx.c, vips.c, uyvy.c).
"""

import struct

import numpy as np
import pytest

from imagemagick_tpu.core.image import Image
from imagemagick_tpu.core.spec import ImageSpec
from imagemagick_tpu.io import (formats2, formats4, image_from_blob,
                                image_to_blob, supported_read_formats,
                                supported_write_formats)


@pytest.fixture
def rgb():
    rng = np.random.default_rng(7)
    return Image(rng.random((13, 17, 3), np.float32),
                 ImageSpec(colorspace="srgb"))


def test_aai_roundtrip_and_layout(rgb):
    blob = image_to_blob(rgb, "aai")
    w, h = struct.unpack("<II", blob[:8])
    assert (w, h) == (17, 13)
    back = image_from_blob(blob, "aai")[0]
    q = np.round(np.asarray(rgb.data) * 255) / 255
    np.testing.assert_allclose(np.asarray(back.data)[..., :3], q, atol=1 / 254)
    # wire is BGRA: first byte is blue of pixel (0,0)
    assert blob[8] == int(np.asarray(rgb.data)[0, 0, 2] * 255 + 0.5)


def test_aai_alpha_254_promotes():
    raw = struct.pack("<II", 1, 1) + bytes([10, 20, 30, 254])
    back = formats4.decode_aai(raw)
    assert np.asarray(back.data)[0, 0, 3] == 1.0


def test_hrz_fixed_geometry(rgb):
    blob = image_to_blob(rgb, "hrz")
    assert len(blob) == 256 * 240 * 3
    back = image_from_blob(blob, "hrz")[0]
    assert (back.height, back.width) == (240, 256)
    assert blob == bytes(b for b in blob)  # all 6-bit values
    assert max(blob) <= 63


def test_hrz_roundtrip_native_size():
    rng = np.random.default_rng(3)
    img = Image(rng.random((240, 256, 3), np.float32),
                ImageSpec(colorspace="srgb"))
    back = formats4.decode_hrz(formats4.encode_hrz(img))
    np.testing.assert_allclose(np.asarray(back.data), np.asarray(img.data),
                               atol=4 / 255 + 1e-6)


def test_scr_decode():
    # ink=white(7)+bright on black paper, cell (0,0) bit pattern 0x80:
    # top-left pixel ink-bright-white, neighbour paper-black
    bitmap = bytearray(6144)
    bitmap[0] = 0x80
    attrs = bytearray([0x47] + [0] * 767)   # bright=1, paper=0, ink=7
    img = formats4.decode_scr(bytes(bitmap) + bytes(attrs))
    arr = np.asarray(img.data)
    assert arr.shape == (192, 256, 3)
    np.testing.assert_allclose(arr[0, 0], [1, 1, 1])
    np.testing.assert_allclose(arr[0, 1], [0, 0, 0])
    # non-bright ink 2 (red) in cell (0,1): palette level 192
    attrs2 = bytearray(768)
    attrs2[1] = 0x02
    bitmap2 = bytearray(6144)
    bitmap2[1] = 0x80   # x=8 top row
    img2 = formats4.decode_scr(bytes(bitmap2) + bytes(attrs2))
    np.testing.assert_allclose(np.asarray(img2.data)[0, 8],
                               [192 / 255, 0, 0], atol=1e-6)


def test_scr_y_interleave():
    # bitmap offset 256 is y=1 (same zone, octetline 1), not y=8
    bitmap = bytearray(6144)
    bitmap[256] = 0x80
    attrs = bytearray([0x07] * 768)  # white ink
    arr = np.asarray(formats4.decode_scr(bytes(bitmap) + bytes(attrs)).data)
    assert arr[1, 0, 0] > 0.5
    assert arr[8, 0, 0] == 0.0


def test_rgf_roundtrip(rgb):
    blob = image_to_blob(rgb, "rgf")
    assert blob[0] == 17 and blob[1] == 13
    back = image_from_blob(blob, "rgf")[0]
    expect = (np.asarray(rgb.data) @ [0.212656, 0.715158, 0.072186]) >= 0.5
    np.testing.assert_array_equal(np.asarray(back.data)[..., 0],
                                  expect.astype(np.float32))


def test_cip_write(rgb):
    blob = image_to_blob(rgb, "cip")
    text = blob.decode()
    assert text.startswith("<CiscoIPPhoneImage>")
    assert "<Width>18</Width>" in text       # padded to even
    assert "<Height>13</Height>" in text
    assert "<Depth>2</Depth>" in text
    # all-white 4x1 image -> luma 1.0 -> 2-bit value 3 in all lanes -> "ff"
    white = Image(np.ones((1, 4, 3), np.float32), ImageSpec(colorspace="srgb"))
    data = image_to_blob(white, "cip").decode()
    assert "<Data>ff</Data>" in data


def test_mono_wire_polarity():
    # reference wire: set bit = black (mono.c ReadMONOImage -> index 0)
    img = Image(np.zeros((1, 8, 1), np.float32), ImageSpec(colorspace="gray"))
    assert formats2.encode_mono(img) == b"\xff"
    back = formats2.decode_mono(b"\xff", 8, 1)
    np.testing.assert_array_equal(np.asarray(back.data), 0.0)


def test_txt_roundtrip(rgb):
    blob = image_to_blob(rgb, "txt")
    back = image_from_blob(blob, "txt")[0]
    assert (back.height, back.width) == (13, 17)
    np.testing.assert_allclose(np.asarray(back.data),
                               np.round(np.asarray(rgb.data) * 255) / 255,
                               atol=1 / 508)


def test_inline_roundtrip(rgb):
    blob = image_to_blob(rgb, "inline")
    assert blob.startswith(b"data:image/png;base64,")
    back = image_from_blob(blob)[0]   # sniffed via data: magic
    np.testing.assert_allclose(np.asarray(back.data),
                               np.round(np.asarray(rgb.data) * 255) / 255,
                               atol=1 / 254)


def test_pgx_roundtrip(rgb):
    blob = image_to_blob(rgb, "pgx", depth=8)
    assert blob.startswith(b"PG ML + 8 17 13\n")
    back = image_from_blob(blob, "pgx")[0]
    luma = np.asarray(rgb.data) @ [0.212656, 0.715158, 0.072186]
    np.testing.assert_allclose(np.asarray(back.data)[..., 0], luma,
                               atol=1 / 254)


def test_pgx_16bit_lm():
    gray = np.linspace(0, 1, 32, dtype=np.float32).reshape(4, 8)
    payload = (gray * 65535 + 0.5).astype("<u2").tobytes()
    blob = b"PG LM - 16 8 4\n" + payload
    back = formats4.decode_pgx(blob)
    np.testing.assert_allclose(np.asarray(back.data)[..., 0], gray,
                               atol=1 / 65534)


def test_vips_roundtrip(rgb):
    blob = image_to_blob(rgb, "vips")
    assert struct.unpack("<I", blob[:4])[0] == 0x08F2A6B6
    w, h, bands = struct.unpack("<3i", blob[4:16])
    assert (w, h, bands) == (17, 13, 3)
    back = image_from_blob(blob)[0]    # magic-sniffed
    np.testing.assert_allclose(np.asarray(back.data),
                               np.round(np.asarray(rgb.data) * 255) / 255,
                               atol=1 / 254)


def test_vips_16bit_and_gray():
    gray = Image(np.linspace(0, 1, 24, dtype=np.float32).reshape(4, 6, 1),
                 ImageSpec(colorspace="gray"))
    blob = image_to_blob(gray, "vips", depth=16)
    back = image_from_blob(blob, "vips")[0]
    assert back.spec.colorspace == "gray"
    np.testing.assert_allclose(np.asarray(back.data),
                               np.asarray(gray.data), atol=1 / 65534)


def test_vips_msb_endian():
    # big-endian header variant decodes identically
    payload = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    head = struct.pack(">I7i", 0x08F2A6B6, 2, 2, 3, 0, 0, 0, 22)
    head += struct.pack(">2f", 0.0, 0.0) + b"\x00" * 24
    back = formats4.decode_vips(head + payload.tobytes())
    np.testing.assert_allclose(np.asarray(back.data),
                               payload.astype(np.float32) / 255.0)


def test_uyvy_decode():
    # hand-built wire: U Y0 V Y1 per pixel pair
    blob = bytes([100, 10, 200, 20,    # pair 0: y=10,20 u=100 v=200
                  50, 30, 60, 40])     # pair 1: y=30,40 u=50  v=60
    back = formats4.decode_uyvy(blob, 4, 1)
    assert back.spec.colorspace == "ycbcr"
    arr = np.asarray(back.data) * 255.0
    np.testing.assert_allclose(arr[0, :, 0], [10, 20, 30, 40], atol=1e-4)
    np.testing.assert_allclose(arr[0, :, 1], [100, 100, 50, 50], atol=1e-4)
    np.testing.assert_allclose(arr[0, :, 2], [200, 200, 60, 60], atol=1e-4)


def test_format_lists_include_batch4():
    r = set(supported_read_formats())
    w = set(supported_write_formats())
    assert {"aai", "hrz", "scr", "rgf", "txt", "inline", "pgx", "vips",
            "mono", "uyvy", "cals", "art", "sct", "xwd"} <= r
    assert {"aai", "hrz", "rgf", "cip", "pgx", "vips", "inline", "cals",
            "art", "xwd", "brf", "ubrl", "isobrl", "uil", "html"} <= w


@pytest.fixture
def bilevel():
    rng = np.random.default_rng(5)
    return Image((rng.random((24, 40, 1)) > 0.5).astype(np.float32),
                 ImageSpec(colorspace="gray", depth=1))


def test_cals_roundtrip(bilevel):
    blob = image_to_blob(bilevel, "cals")
    assert len(blob) > 2048
    assert blob[:9] == b"srcdocid:"
    assert b"rpelcnt: 000040,000024" in blob[:2048]
    back = image_from_blob(blob)[0]    # magic-sniffed
    np.testing.assert_array_equal(np.asarray(back.data),
                                  np.asarray(bilevel.data))


def test_art_roundtrip(bilevel):
    blob = image_to_blob(bilevel, "art")
    import struct as s

    assert s.unpack("<4H", blob[:8]) == (0, 40, 0, 24)
    # 40px -> 5 bytes -> padded to 6 per row
    assert len(blob) == 8 + 6 * 24
    back = image_from_blob(blob, "art")[0]
    np.testing.assert_array_equal(np.asarray(back.data),
                                  np.asarray(bilevel.data))


def test_sct_decode_rgb():
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (5, 7, 3), np.uint8)
    header = bytearray(2048)
    header[80:82] = b"CT"
    header[1025] = 3                      # separations
    header[1026:1028] = (0x07).to_bytes(2, "big")
    header[1028:1042] = b"5.0           "   # physical height
    header[1042:1056] = b"7.0           "   # physical width
    header[1056:1068] = b"5           "     # rows
    header[1068:1080] = b"7           "     # cols
    stride = 8                               # 7 padded to even
    body = bytearray()
    for y in range(5):
        for s_ in range(3):
            row = bytes(px[y, :, s_]) + b"\x00" * (stride - 7)
            body += row
    img = image_from_blob(bytes(header) + bytes(body), "sct")[0]
    np.testing.assert_allclose(np.asarray(img.data),
                               px.astype(np.float32) / 255.0)


def test_xwd_roundtrip(rgb):
    blob = image_to_blob(rgb, "xwd")
    back = image_from_blob(blob)[0]      # magic-sniffed
    np.testing.assert_allclose(np.asarray(back.data)[..., :3],
                               np.round(np.asarray(rgb.data) * 255) / 255,
                               atol=1 / 254)


def test_xwd_lsb_16bpp():
    # 5-6-5 little-endian direct color
    import struct as s

    r5, g6, b5 = 31, 0, 16
    val = (r5 << 11) | (g6 << 5) | b5
    head = s.pack("<25I", 100, 7, 2, 16, 1, 1, 0, 0, 16, 0, 16, 16, 2, 4,
                  0xF800, 0x07E0, 0x001F, 5, 0, 0, 1, 1, 0, 0, 0)
    img = formats4.decode_xwd(head + s.pack("<H", val))
    np.testing.assert_allclose(np.asarray(img.data)[0, 0],
                               [1.0, 0.0, 16 / 31], atol=1e-6)


def test_braille_variants():
    # single 2x4 cell, left column dark
    img = Image(np.array([[[0.0], [1.0]]] * 4, np.float32).reshape(4, 2, 1),
                ImageSpec(colorspace="gray"))
    ub = image_to_blob(img, "ubrl").decode("utf-8")
    # dots 1,2,3,7 -> bits 0,1,2,6 -> cell 0x47
    assert chr(0x2800 + 0x47) in ub
    iso = image_to_blob(img, "isobrl")
    assert bytes([0x47]) in iso
    brf = image_to_blob(img, "brf").decode()
    # 6-dot BRF: cell_height 3 -> bits 0,1,2 = 0x07 -> 'L'
    assert "L" in brf


def test_uil_write(rgb):
    out = image_to_blob(rgb, "uil").decode()
    assert out.startswith("/* UIL */")
    assert "color_table(" in out and "icon(color_table" in out


def test_html_write(rgb):
    page = image_to_blob(rgb, "html").decode()
    assert page.startswith("<!DOCTYPE html>")
    assert "data:image/png;base64," in page


def test_cube_decode_identity():
    # identity LUT of size 2 -> hald output equals the identity hald
    lines = ["# comment", "LUT_3D_SIZE 2", 'TITLE "ident"']
    for b in (0.0, 1.0):
        for g in (0.0, 1.0):
            for r in (0.0, 1.0):
                lines.append("%g %g %g" % (r, g, b))
    img = image_from_blob("\n".join(lines).encode(), "cube")[0]
    from imagemagick_tpu.io.pseudo import hald

    ident = np.asarray(hald(8).data)
    np.testing.assert_allclose(np.asarray(img.data), ident, atol=1e-6)
    assert img.properties.get("title") == "ident"


def test_cube_decode_scale():
    # LUT that doubles red (clipped): verify trilinear midpoint
    lines = ["LUT_3D_SIZE 3"]
    for b in (0.0, 0.5, 1.0):
        for g in (0.0, 0.5, 1.0):
            for r in (0.0, 0.5, 1.0):
                lines.append("%g %g %g" % (min(2 * r, 1.0), g, b))
    img = image_from_blob("\n".join(lines).encode(), "cube")[0]
    arr = np.asarray(img.data)
    ident = np.asarray(__import__(
        "imagemagick_tpu.io.pseudo", fromlist=["hald"]).hald(8).data)
    # red midpoint 0.5 maps to 1.0 under trilinear of this LUT
    mid = np.isclose(ident[..., 0], 0.5079365)   # 32/63
    assert arr[mid][:, 0].max() > 0.99


def test_tim_16bpp_roundtrip(rgb):
    blob = image_to_blob(rgb, "tim")
    assert blob[:4] == b"\x10\x00\x00\x00"
    back = image_from_blob(blob, "tim")[0]
    # 5-bit quantization
    np.testing.assert_allclose(np.asarray(back.data),
                               np.asarray(rgb.data), atol=1 / 31 + 1e-6)


def test_tim_8bpp_clut():
    # 2x1 8bpp with CLUT: entries red and white (5:5:5)
    clut = np.zeros(256, "<u2")
    clut[0] = 0x1F                  # red (low bits)
    clut[1] = 0x7FFF                # white
    head = struct.pack("<II", 0x10, 0x09)       # mode 1 + CLUT
    head += struct.pack("<IHHHH", 12 + 512, 0, 0, 256, 1) + clut.tobytes()
    head += struct.pack("<IHHHH", 12 + 2, 0, 0, 1, 1)   # w16=1 -> w=2
    head += bytes([0, 1])
    img = image_from_blob(head, "tim")[0]
    arr = np.asarray(img.data)
    np.testing.assert_allclose(arr[0, 0], [1.0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(arr[0, 1], [1.0, 1.0, 1.0], atol=1e-6)


def test_pdb_roundtrip(rgb):
    blob = image_to_blob(rgb, "pdb")
    assert blob[60:68] == b"vIMGView"
    back = image_from_blob(blob)[0]     # magic-sniffed
    gray = np.asarray(rgb.data) @ [0.212656, 0.715158, 0.072186]
    expect = np.minimum((gray * 4).astype(int), 3) / 3.0
    np.testing.assert_allclose(np.asarray(back.data)[..., 0], expect,
                               atol=1e-6)


def test_pdb_rle():
    # version 1 (RLE): 4x2 1-bit image, all black (bits set)
    raw = formats4._pdb_rle(bytes([0x81, 0xF0]), 2)   # run of 2 x 0xF0
    assert raw == b"\xf0\xf0"
    lit = formats4._pdb_rle(bytes([0x01, 0xAA, 0xBB]), 2)
    assert lit == b"\xaa\xbb"


def _scramble_sfw(rgb):
    jpeg = bytearray(image_to_blob(rgb, "jpeg", quality=95))
    # strip DHT segments (C4) like SFW files lack, scramble marker codes
    out = bytearray()
    i = 0
    inv = {v: k for k, v in formats4._SFW_XLAT.items()}
    while i < len(jpeg):
        if jpeg[i] == 0xFF and i + 1 < len(jpeg):
            m = jpeg[i + 1]
            if m == 0xC4:
                seglen = (jpeg[i + 2] << 8) | jpeg[i + 3]
                i += 2 + seglen
                continue
            if m == 0xD8:
                out += b"\xff\xc8"
                i += 2
                continue
            if m in (0xE0,):
                # APP0 -> D0, blank the JFIF id like SFW does
                seglen = (jpeg[i + 2] << 8) | jpeg[i + 3]
                seg = bytearray(jpeg[i:i + 2 + seglen])
                seg[1] = 0xD0
                seg[4:11] = b"\x00" * 7
                out += seg
                i += 2 + seglen
                continue
            if m in inv and m != 0xD8:
                out += bytes([0xFF, inv[m]])
                i += 2
                if m in (0xDB, 0xC0, 0xDA):
                    pass
                continue
        out.append(jpeg[i])
        i += 1
    # replace trailing EOI
    if out[-2:] == b"\xff\xd9":
        out[-2:] = b"\xff\xc9"
    return b"SFW94A" + bytes(out)


def test_sfw_roundtrip(rgb):
    # scramble a real JPEG into SFW form, then decode through the sfw path
    sfw = _scramble_sfw(rgb)
    back = image_from_blob(sfw)[0]       # magic-sniffed via SFW prefix
    assert (back.height, back.width) == (13, 17)
    rgbf = np.asarray(rgb.data)
    got = np.asarray(back.data)
    assert np.mean((got - rgbf) ** 2) < 0.01   # lossy JPEG tolerance


def test_pwp_container(rgb):
    pwp = b"SFW95" + b"\x00" * 8 + _scramble_sfw(rgb) + _scramble_sfw(rgb)
    imgs = image_from_blob(pwp)          # magic-sniffed SFW95
    assert len(imgs) == 2
    assert (imgs[0].height, imgs[0].width) == (13, 17)


def test_mvg_decode():
    mvg = (b"viewbox 0 0 40 30\n"
           b"fill 'red'\nrectangle 5,5 20,20\n")
    img = image_from_blob(mvg, "mvg")[0]
    assert (img.height, img.width) == (30, 40)
    arr = np.asarray(img.data)
    np.testing.assert_allclose(arr[10, 10], [1, 0, 0], atol=1e-3)
    np.testing.assert_allclose(arr[25, 35], [1, 1, 1], atol=1e-3)


def test_ttf_preview():
    data = open("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
                "rb").read()
    img = image_from_blob(data)          # magic-sniffed \x00\x01\x00\x00
    assert (img[0].height, img[0].width) == (480, 800)
    arr = np.asarray(img[0].data)
    assert arr.min() < 0.5               # some dark glyph pixels


def test_stegano_extract_roundtrip(tmp_path):
    import jax

    from imagemagick_tpu.io import read_images, write_image
    from imagemagick_tpu.core.image import Image as Im
    from imagemagick_tpu.core.spec import ImageSpec as Spec
    from imagemagick_tpu.ops.visual_effects import stegano

    rng = np.random.default_rng(2)
    host = rng.random((20, 24, 3)).astype(np.float32)
    wm = (rng.random((6, 8, 1)) > 0.5).astype(np.float32)
    stamped = np.asarray(stegano(host, wm))
    write_image(Im(stamped, Spec(colorspace="srgb")),
                str(tmp_path / "host.png"))
    out = read_images("stegano:" + str(tmp_path / "host.png"), size="8x6")[0]
    np.testing.assert_array_equal(np.asarray(out.data)[..., 0], wm[..., 0])


def test_vid_montage(tmp_path):
    from imagemagick_tpu.io import read_images, write_image
    from imagemagick_tpu.core.image import Image as Im
    from imagemagick_tpu.core.spec import ImageSpec as Spec

    for i, color in enumerate([(1, 0, 0), (0, 1, 0)]):
        arr = np.broadcast_to(np.asarray(color, np.float32),
                              (10, 10, 3)).copy()
        write_image(Im(arr, Spec(colorspace="srgb")),
                    str(tmp_path / f"t{i}.png"))
    img = read_images("vid:" + str(tmp_path / "t*.png"))[0]
    assert img.width > 10 and img.height > 5


def test_cut_decode_8bit():
    # 3x2 8-bit: row RLE with a run and literals
    rows = [bytes([0x83, 100, 0]),                 # run of 3 x 100
            bytes([0x03, 10, 20, 30, 0])]          # 3 literals
    body = b"".join(struct.pack("<H", len(r)) + r for r in rows)
    blob = struct.pack("<HHH", 3, 2, 0) + body
    img = image_from_blob(blob, "cut")[0]
    arr = np.asarray(img.data)[..., 0] * 255.0
    np.testing.assert_allclose(arr[0], [100, 100, 100], atol=0.5)
    np.testing.assert_allclose(arr[1], [10, 20, 30], atol=0.5)


def test_rle_decode_rgb():
    # 2x2 3-plane image via RunData/ByteData opcodes, bottom-up rows
    head = b"\x52\xcc" + struct.pack("<4H", 0, 0, 2, 2)
    head += bytes([0x02, 3, 8, 0, 0])    # no-background flag, 3 planes
    head += b"\x00"                       # pad (planes odd -> no bg pad?)
    body = bytearray()
    # y=0 (file bottom row -> image row 1): red run across both pixels
    body += bytes([0x02, 0])              # SetColor plane 0 (red)
    body += bytes([0x06, 1, 255, 0])      # RunData len 2 value 255
    body += bytes([0x01, 1])              # SkipLines 1 -> y=1
    body += bytes([0x02, 1])              # plane 1 (green)
    body += bytes([0x05, 1, 11, 22])      # ByteData 2 literals
    body += bytes([0x07, 0])              # EOF op
    img = formats4.decode_rle(bytes(head) + bytes(body))
    arr = np.asarray(img.data) * 255
    np.testing.assert_allclose(arr[1, :, 0], [255, 255], atol=0.5)  # bottom
    np.testing.assert_allclose(arr[0, :, 1], [11, 22], atol=0.5)    # top


def test_rle_no_background_flag():
    # flags bit 0x02 -> single pad byte instead of planes bg bytes
    head = b"\x52\xcc" + struct.pack("<4H", 0, 0, 1, 1)
    head += bytes([0x02 | 0x00, 1, 8, 0, 0]) + b"\x00"
    body = bytes([0x06, 0, 77, 0, 0x07, 0])
    img = formats4.decode_rle(head + body)
    assert abs(float(np.asarray(img.data)[0, 0, 0]) * 255 - 77) < 0.5


def test_mac_decode():
    # 512-byte header (type 0); encode an all-black page: wire bytes 0xFF
    # inverted from runs. Run op: count>=128 -> run of (~count)+2 copies.
    stride, H = 72, 720
    payload = bytearray()
    total = stride * H
    while total > 0:
        n = min(129, total)            # run length 2..129 representable
        if n < 2:
            payload += bytes([0x00, 0xFF])  # literal 1 wire byte, all ink
            total -= 1
            continue
        count = (~(n - 2)) & 0xFF
        payload += bytes([count, 0xFF])  # wire 0xFF = all ink = black
        total -= n
    blob = struct.pack("<H", 0) + b"\x00" * 510 + bytes(payload)
    img = image_from_blob(blob, "mac")[0]
    arr = np.asarray(img.data)
    assert arr.shape == (720, 576, 1)
    assert float(arr.mean()) == 0.0     # all black


def test_pix_decode():
    # 2x1 24-bit: count 2 of BGR (10,20,30) -> RGB (30,20,10)
    blob = struct.pack(">5H", 2, 1, 0, 0, 24) + bytes([2, 10, 20, 30])
    img = image_from_blob(blob, "pix")[0]
    arr = np.asarray(img.data) * 255
    np.testing.assert_allclose(arr[0, 0], [30, 20, 10], atol=0.5)
    np.testing.assert_allclose(arr[0, 1], [30, 20, 10], atol=0.5)


def test_yuv_roundtrip():
    rng = np.random.default_rng(4)
    img = Image(rng.random((8, 10, 3), np.float32),
                ImageSpec(colorspace="srgb"))
    blob = image_to_blob(img, "yuv")
    assert len(blob) == 8 * 10 + 2 * 4 * 5
    back = formats4.decode_yuv(blob, 10, 8)
    assert back.spec.colorspace == "ycbcr"


def test_bayer_roundtrip_flat():
    # flat-color images survive mosaic->demosaic exactly
    img = Image(np.full((6, 8, 3), 0.25, np.float32),
                ImageSpec(colorspace="srgb"))
    blob = image_to_blob(img, "bayer", depth=8)
    assert len(blob) == 6 * 8
    back = formats4.decode_bayer(blob, 8, 6)
    np.testing.assert_allclose(np.asarray(back.data),
                               np.asarray(img.data), atol=1 / 254)


def test_bayer_mosaic_layout():
    # RGGB: top-left sample comes from red, (1,1) from blue
    arr = np.zeros((2, 2, 3), np.float32)
    arr[0, 0, 0] = 1.0      # red at (0,0)
    arr[1, 1, 2] = 0.5      # blue at (1,1)
    blob = image_to_blob(Image(arr, ImageSpec(colorspace="srgb")), "bayer",
                         depth=8)
    vals = np.frombuffer(blob, np.uint8).reshape(2, 2)
    assert vals[0, 0] == 255 and vals[1, 1] == 128
    assert vals[0, 1] == 0 and vals[1, 0] == 0   # green samples


def test_ps_write_alias(rgb):
    blob = image_to_blob(rgb, "ps")
    assert blob[:2] == b"%!"


def test_ept_roundtrip(rgb):
    blob = image_to_blob(rgb, "ept")
    assert struct.unpack("<I", blob[:4])[0] == 0xC6D3D0C5
    back = image_from_blob(blob)        # magic-sniffed
    assert back[0].width == 17 and back[0].height == 13


def test_wpg_decode_8bpp_palette():
    # header: FF 'WPC', data at 16, type 0x16
    head = struct.pack("<II", 0x435057FF, 16) + bytes([1, 0x16]) + b"\x00" * 6
    # palette record 0x0E: start 0, 3 entries
    pal = bytes([0x0E, 4 + 9]) + struct.pack("<HH", 0, 3) + bytes(
        [255, 0, 0,  0, 255, 0,  0, 0, 255])
    # bitmap type1 0x0B: 3x2, 8bpp; RLE: literal row (3 bytes), repeat prev
    raster = bytes([0x03, 0, 1, 2,       # literal 3 bytes -> row 0
                    0x00, 0x01])          # repeat previous row once
    bm = bytes([0x0B]) + bytes([10 + len(raster)]) + struct.pack(
        "<5H", 3, 2, 8, 0, 0) + raster
    img = image_from_blob(head + pal + bm)[0]
    arr = np.asarray(img.data) * 255
    np.testing.assert_allclose(arr[0, 0], [255, 0, 0], atol=0.5)
    np.testing.assert_allclose(arr[0, 1], [0, 255, 0], atol=0.5)
    np.testing.assert_allclose(arr[1, 2], [0, 0, 255], atol=0.5)


def test_wpg_decode_1bpp_runs():
    head = struct.pack("<II", 0x435057FF, 16) + bytes([1, 0x16]) + b"\x00" * 6
    # 8x2 1bpp without palette: row of 0xFF (run-of-0xFF opcode), then
    # explicit repeat-value run
    raster = bytes([0x80, 0x01,          # rc=0 -> next byte count of 0xFF
                    0x81, 0x00])          # run of 1 x 0x00
    bm = bytes([0x0B]) + bytes([10 + len(raster)]) + struct.pack(
        "<5H", 8, 2, 1, 0, 0) + raster
    img = image_from_blob(head + bm)[0]
    arr = np.asarray(img.data)[..., 0]
    np.testing.assert_allclose(arr[0], 1.0)
    np.testing.assert_allclose(arr[1], 0.0)


def test_ipl_roundtrip(rgb):
    blob = image_to_blob(rgb, "ipl")
    assert blob[:4] == b"iiii" and blob[12:16] == b"data"
    back = image_from_blob(blob)[0]     # magic-sniffed
    luma = np.asarray(rgb.data) @ [0.212656, 0.715158, 0.072186]
    np.testing.assert_allclose(np.asarray(back.data)[..., 0], luma,
                               atol=1 / 65534)


def test_ipl_msb_float():
    gray = np.linspace(0, 1, 12, dtype=np.float32).reshape(3, 4)
    head = b"mmmm" + b"\x00" * 8 + b"data"
    head += struct.pack(">7I", gray.nbytes, 4, 3, 1, 1, 0, 4)
    back = formats4.decode_ipl(head + gray.astype(">f4").tobytes())[0]
    np.testing.assert_allclose(np.asarray(back.data)[..., 0], gray,
                               atol=1e-6)


def test_map_roundtrip():
    # two-color image survives a 256-color MAP round trip
    arr = np.zeros((4, 6, 3), np.float32)
    arr[:, 3:] = [1.0, 0.0, 0.0]
    img = Image(arr, ImageSpec(colorspace="srgb"))
    blob = image_to_blob(img, "map")
    back = formats4.decode_map(blob, 6, 4)
    np.testing.assert_allclose(np.asarray(back.data), arr, atol=1 / 254)


def test_ftxt_roundtrip(rgb):
    blob = image_to_blob(rgb, "ftxt")
    assert blob.startswith(b"0,0:")
    back = image_from_blob(blob, "ftxt")[0]
    assert (back.height, back.width) == (13, 17)
    np.testing.assert_allclose(np.asarray(back.data),
                               np.asarray(rgb.data), atol=1e-4)


def test_ashlar_write(rgb):
    imgs = [rgb, rgb, rgb]
    blob = image_to_blob(imgs, "ashlar")
    packed = image_from_blob(blob, "png")[0]
    # three 17x13 tiles packed: canvas holds all of them
    assert packed.width * packed.height >= 3 * 17 * 13


def test_magick_header_roundtrip(rgb):
    blob = image_to_blob(rgb, "magick")
    text = blob.decode()
    assert "static const unsigned char" in text
    assert "MagickImage[] =" in text
    back = image_from_blob(blob, "magick")[0]
    assert (back.height, back.width) == (13, 17)


def test_tim2_16bpp():
    # 2x1 direct 16bpp: red (0x1F | A bit) and green
    words = np.array([0x1F | 0x8000, (0x1F << 5) | 0x8000], "<u2")
    ihdr = struct.pack("<3IHH", 48 + 4, 0, 4, 48, 0)
    ihdr += bytes([0, 1, 0, 1])                 # format, mips, clut, 16bpp
    ihdr += struct.pack("<HH", 2, 1)
    ihdr += b"\x00" * 24                        # GsTex registers
    blob = b"TIM2" + bytes([4, 0]) + struct.pack("<H", 1) + b"\x00" * 8
    blob += ihdr + words.tobytes()
    img = image_from_blob(blob)[0]              # magic-sniffed
    arr = np.asarray(img.data)
    np.testing.assert_allclose(arr[0, 0], [0xF8 / 255, 0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(arr[0, 1], [0, 0xF8 / 255, 0, 1], atol=1e-6)


def test_tim2_8bpp_clut32():
    # 2x1 8bpp with a 32-bit CLUT; alpha 0x80 -> 1.0
    idx = bytes([0, 1])
    clut = bytes([255, 0, 0, 0x80, 0, 0, 255, 0x40])
    ihdr = struct.pack("<3IHH", 48 + 2 + 8, 8, 2, 48, 2)
    ihdr += bytes([0, 1, 0x13, 5])              # CSM2 32-bit clut, 8bpp
    ihdr += struct.pack("<HH", 2, 1) + b"\x00" * 24
    blob = b"TIM2" + bytes([4, 0]) + struct.pack("<H", 1) + b"\x00" * 8
    blob += ihdr + idx + clut
    img = image_from_blob(blob, "tim2")[0]
    arr = np.asarray(img.data)
    np.testing.assert_allclose(arr[0, 0], [1, 0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(arr[0, 1], [0, 0, 1, 128 / 255], atol=1e-2)


def test_jnx_decode(rgb):
    jpeg = image_to_blob(rgb, "jpeg", quality=90)
    tile = jpeg[2:]                     # strip SOI like JNX storage does
    # v3 header: version, serial, 4 geo extents, levels=1, expire, id,
    # crc, signature, offset
    head = struct.pack("<12i", 3, 0, 100, 100, -100, -100, 1, 0, 0, 0, 0, 0)
    level_off = len(head) + 12
    level = struct.pack("<iii", 1, level_off, 0)
    tile_off = level_off + 28
    entry = struct.pack("<4iHHIi", 50, 60, -50, -60, 17, 13, len(tile),
                        tile_off)
    blob = head + level + entry + tile
    imgs = image_from_blob(blob, "jnx")
    assert len(imgs) == 1
    assert imgs[0].width == 17 and imgs[0].height == 13
    assert "jnx:northeast" in imgs[0].properties


def test_dcx_write_pil_reads(rgb, tmp_path):
    blob = image_to_blob([rgb, rgb], "dcx")
    assert struct.unpack("<I", blob[:4])[0] == 0x3ADE68B1
    from PIL import Image as P
    import io as _io

    im = P.open(_io.BytesIO(blob))
    assert im.size == (17, 13)
    im.seek(1)                      # second frame exists
    # and our own PIL-bridged reader decodes it
    back = image_from_blob(blob, "dcx")
    assert back[0].width == 17


def test_cur_write(rgb):
    blob = image_to_blob(rgb, "cur")
    assert blob[:4] == b"\x00\x00\x02\x00"      # cursor resource type
    # directory entry geometry + the embedded PNG frame both intact
    assert blob[6] == 17 and blob[7] == 13
    off = struct.unpack_from("<I", blob, 18)[0]
    assert blob[off:off + 8] == b"\x89PNG\r\n\x1a\n"


def test_raw_alias(rgb):
    blob = image_to_blob(rgb, "raw", depth=8)
    assert len(blob) == 17 * 13
    from imagemagick_tpu.io import read_images
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".raw", delete=False) as f:
        f.write(blob)
        name = f.name
    try:
        back = read_images(name, size="17x13")[0]
        assert back.spec.colorspace == "gray"
    finally:
        os.unlink(name)


def test_pes_decode():
    # hand-built PES: pec_offset points right after the 12-byte header;
    # one color, a square of normal stitches in red (thread index 5)
    pec_off = 0
    head = b"#PES" + b"0001" + struct.pack("<i", pec_off)
    body = bytearray(b"\x00" * 36)      # discarded region
    body += bytes([0])                  # ncolors-1 -> 1 color
    body += bytes([5])                  # thread 5 = (237,23,31)
    body += b"\x00" * (532 - 1 - 21)    # pad to the stitch stream
    # stitches: start 0,0 then +20,0 / 0,+20 / -20,0 / 0,-20 (7-bit)
    st = bytearray()
    st += bytes([0, 0])
    st += bytes([20, 0])
    st += bytes([0, 20])
    st += bytes([0x40 | (0x7F & -20) & 0x7F, 0])   # -20 via 7-bit signed
    st += bytes([0, 0x40 | (0x7F & -20) & 0x7F])
    st += b"\xff\x00"                   # terminator
    blob = head + bytes(body) + bytes(st)
    img = image_from_blob(blob)[0]      # magic-sniffed
    arr = np.asarray(img.data)
    assert arr.shape[0] >= 19 and arr.shape[1] >= 19
    # some stitched pixels carry the thread color (red-dominant)
    reds = (arr[..., 0] > 0.5) & (arr[..., 1] < 0.4)
    assert reds.sum() > 10


def test_wpg_write_roundtrip():
    # two flat color regions survive the palette + RLE round trip
    arr = np.zeros((10, 20, 3), np.float32)
    arr[:, 10:] = [1.0, 0.2, 0.2]
    img = Image(arr, ImageSpec(colorspace="srgb"))
    blob = image_to_blob(img, "wpg")
    assert struct.unpack("<I", blob[:4])[0] == 0x435057FF
    back = image_from_blob(blob)[0]          # magic-sniffed
    assert (back.height, back.width) == (10, 20)
    np.testing.assert_allclose(np.asarray(back.data), arr, atol=0.02)

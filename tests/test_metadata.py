"""EXIF / IPTC(8BIM) / XMP binary parsers (property.c:827/:579/:1814).

The EXIF fixture is built by hand (raw TIFF structure, not via PIL) so the
parser is tested against independently-constructed bytes; the JPEG fixture
embeds it in a real APP1 segment.
"""

import struct

import numpy as np
import pytest

from imagemagick_tpu.core import metadata as md


def _tiff_exif(entries, bo="<"):
    """Build a minimal TIFF/EXIF blob: IFD0 with the given (tag, type,
    count, value_bytes_or_int) entries."""
    head = (b"II" if bo == "<" else b"MM") + struct.pack(bo + "HI", 42, 8)
    n = len(entries)
    ifd = struct.pack(bo + "H", n)
    data_off = 8 + 2 + 12 * n + 4
    tail = b""
    for tag, vtype, count, val in entries:
        size = md._TYPE_SIZE[vtype] * count
        if isinstance(val, int):
            raw = struct.pack(bo + {3: "H", 4: "I"}[vtype], val)
        else:
            raw = val
        if size <= 4:
            field = raw.ljust(4, b"\0")
        else:
            field = struct.pack(bo + "I", data_off + len(tail))
            tail += raw
        ifd += struct.pack(bo + "HHI", tag, vtype, count) + field
    ifd += struct.pack(bo + "I", 0)
    return head + ifd + tail


def test_exif_parse_basic():
    blob = _tiff_exif([
        (0x0110, 2, 6, b"TPU-1\0"),                 # Model
        (0x0112, 3, 1, 6),                          # Orientation
        (0x0132, 2, 20, b"2024:01:02 03:04:05\0"),  # DateTime
    ])
    props = md.parse_exif(blob)
    assert props["exif:Model"] == "TPU-1"
    assert props["exif:Orientation"] == "6"
    assert props["exif:DateTime"] == "2024:01:02 03:04:05"


def test_exif_parse_big_endian_and_subifd():
    # IFD0 with an EXIF sub-IFD pointer holding ISOSpeedRatings
    bo = ">"
    sub_off = 8 + 2 + 12 * 1 + 4          # right after IFD0
    head = b"MM" + struct.pack(bo + "HI", 42, 8)
    ifd0 = struct.pack(bo + "H", 1)
    ifd0 += struct.pack(bo + "HHI", 0x8769, 4, 1) + struct.pack(bo + "I",
                                                                sub_off)
    ifd0 += struct.pack(bo + "I", 0)
    sub = struct.pack(bo + "H", 1)
    sub += struct.pack(bo + "HHI", 0x8827, 3, 1) + struct.pack(
        bo + "H", 400).ljust(4, b"\0")
    sub += struct.pack(bo + "I", 0)
    props = md.parse_exif(head + ifd0 + sub)
    assert props["exif:ISOSpeedRatings"] == "400"


def test_jpeg_app1_extraction(tmp_path):
    """Embed the EXIF blob in a real JPEG APP1 and read via the framework."""
    from imagemagick_tpu import Image, io as iio

    exif = _tiff_exif([(0x0112, 3, 1, 3),
                       (0x0132, 2, 20, b"2023:06:07 08:09:10\0")])
    app1 = b"Exif\x00\x00" + exif
    base = iio.image_to_blob(Image(np.random.rand(16, 24, 3)
                                   .astype(np.float32)), "jpeg")
    assert base[:2] == b"\xff\xd8"
    jpeg = base[:2] + b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + \
        app1 + base[2:]
    img = iio.image_from_blob(jpeg, "jpeg")[0]
    assert img.properties["exif:Orientation"] == "3"
    assert img.properties["exif:DateTime"] == "2023:06:07 08:09:10"

    # %[EXIF:...] escapes through the property interpreter
    from imagemagick_tpu.core.properties import interpret

    assert interpret("%[EXIF:DateTime]", img) == "2023:06:07 08:09:10"

    # -auto-orient honours the parsed orientation (3 = rotate 180)
    p = tmp_path / "x.jpg"
    p.write_bytes(jpeg)
    from imagemagick_tpu.cli.main import process

    st = process([str(p), "-auto-orient", "null:"])
    out = st.images[0].materialize()
    assert out.properties["exif:Orientation"] == 1
    ref = iio.image_from_blob(jpeg, "jpeg")[0]
    np.testing.assert_allclose(np.asarray(out.data),
                               np.asarray(ref.data)[::-1, ::-1], atol=1e-6)


def test_iptc_8bim_parse():
    iptc = (b"\x1c\x02\x78" + struct.pack(">H", 11) + b"Hello World" +
            b"\x1c\x02\x19" + struct.pack(">H", 3) + b"tpu" +
            b"\x1c\x02\x19" + struct.pack(">H", 4) + b"xla!")
    blob = (b"Photoshop 3.0\x00" + b"8BIM" + struct.pack(">H", 0x0404) +
            b"\x00\x00" + struct.pack(">I", len(iptc)) + iptc)
    props = md.parse_8bim(blob)
    assert props["iptc:Caption"] == "Hello World"
    assert props["iptc:Keyword"] == "tpu;xla!"


def test_xmp_parse():
    xmp = b"""<?xpacket begin="" id="W5M0MpCehiHzreSzNTczkc9d"?>
    <x:xmpmeta xmlns:x="adobe:ns:meta/">
      <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
        <rdf:Description rdf:about=""
            xmlns:xmp="http://ns.adobe.com/xap/1.0/"
            xmp:CreatorTool="tmagick 1.0" xmp:Rating="5">
          <dc:title>Sunset</dc:title>
        </rdf:Description>
      </rdf:RDF>
    </x:xmpmeta><?xpacket end="w"?>"""
    props = md.parse_xmp(xmp)
    assert props["xmp:CreatorTool"] == "tmagick 1.0"
    assert props["xmp:Rating"] == "5"
    assert props["xmp:title"] == "Sunset"


def test_png_exif_chunk():
    """PNG eXIf chunk path."""
    import zlib as _z

    from imagemagick_tpu import Image, io as iio

    base = iio.image_to_blob(Image(np.random.rand(8, 8, 3)
                                   .astype(np.float32)), "png")
    exif = _tiff_exif([(0x010F, 2, 4, b"TPU\0")])  # Make
    chunk_data = exif
    chunk = struct.pack(">I", len(chunk_data)) + b"eXIf" + chunk_data
    chunk += struct.pack(">I", _z.crc32(b"eXIf" + chunk_data))
    # insert after the IHDR chunk (8 sig + 25 IHDR)
    out = base[:33] + chunk + base[33:]
    img = iio.image_from_blob(out, "png")[0]
    assert img.properties["exif:Make"] == "TPU"

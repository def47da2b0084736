"""EMF coder (coders/emf.c:894 re-designed as a portable EMR-record parser
-> MVG rasterizer; the reference plays EMF back through Windows GDI, so
these gates use hand-crafted record streams + golden-raster properties)."""

import struct

import numpy as np
import pytest

from imagemagick_tpu import io as iio
from imagemagick_tpu.io import emf


def _rec(rtype, payload=b""):
    size = 8 + len(payload)
    pad = (-size) % 4
    return struct.pack("<II", rtype, size + pad) + payload + b"\0" * pad


def _emf(records, bounds=(0, 0, 99, 99), frame=None):
    """Assemble a minimal EMF: EMR_HEADER + records + EMR_EOF."""
    if frame is None:
        # 0.01mm frame chosen so 96dpi gives (bounds+1)-sized pixels
        frame = (0, 0,
                 int(round((bounds[2] + 1) * 2540 / 96.0)),
                 int(round((bounds[3] + 1) * 2540 / 96.0)))
    body = b"".join(records) + _rec(14, struct.pack("<3I", 0, 16, 20))
    hdr_payload = struct.pack(
        "<4i4iIIIHHIII2i2i",
        *bounds, *frame, emf._EMF_SIG, 0x10000,
        88 + len(body), len(records) + 2, 16, 0, 0, 0,
        1024, 768, 270, 203)
    hdr = struct.pack("<II", 1, 8 + len(hdr_payload)) + hdr_payload
    return hdr + body


def test_emf_detect_and_rectangle():
    # red-filled, black-stroked rectangle over a white canvas
    recs = [
        _rec(38, struct.pack("<IIiiI", 1, 0, 1, 0, 0x000000)),   # CreatePen
        _rec(39, struct.pack("<IIII", 2, 0, 0x0000FF, 0)),       # red brush
        _rec(37, struct.pack("<I", 1)),                          # select pen
        _rec(37, struct.pack("<I", 2)),                          # select brush
        _rec(43, struct.pack("<4i", 20, 20, 80, 80)),            # Rectangle
    ]
    blob = _emf(recs)
    assert emf.is_emf(blob)
    assert iio.detect_format(blob) == "emf"
    img = iio.image_from_blob(blob, "emf")[0]
    a = np.asarray(img.data)
    h, w = a.shape[:2]
    assert (h, w) == (100, 100)
    # interior is red
    cx = a[h // 2, w // 2]
    assert cx[0] > 0.8 and cx[1] < 0.2 and cx[2] < 0.2, cx
    # outside is white
    assert np.all(a[5, 5] > 0.9)


def test_emf_polygon_and_stock_objects():
    # NULL_PEN + BLACK_BRUSH stock objects, 16-bit polygon record
    pts = [(10, 10), (90, 10), (50, 90)]
    payload = struct.pack("<4i", 0, 0, 99, 99) + struct.pack("<I", len(pts))
    for x, y in pts:
        payload += struct.pack("<2h", x, y)
    recs = [
        _rec(37, struct.pack("<I", 0x80000000 | 8)),   # NULL_PEN
        _rec(37, struct.pack("<I", 0x80000000 | 4)),   # BLACK_BRUSH
        _rec(86, payload),                             # Polygon16
    ]
    img = iio.image_from_blob(_emf(recs), "emf")[0]
    a = np.asarray(img.data)
    assert np.all(a[40, 50] < 0.2)        # inside the triangle: black
    assert np.all(a[15, 5] > 0.9)         # corner: white


def test_emf_path_fill():
    # BeginPath + MoveTo/LineTo + CloseFigure + FillPath
    recs = [
        _rec(39, struct.pack("<IIII", 1, 0, 0x00FF00, 0)),   # green brush
        _rec(37, struct.pack("<I", 1)),
        _rec(59),                                            # BeginPath
        _rec(27, struct.pack("<2i", 10, 10)),                # MoveToEx
        _rec(54, struct.pack("<2i", 90, 10)),                # LineTo
        _rec(54, struct.pack("<2i", 90, 90)),                # LineTo
        _rec(54, struct.pack("<2i", 10, 90)),                # LineTo
        _rec(61),                                            # CloseFigure
        _rec(60),                                            # EndPath
        _rec(62, struct.pack("<4i", 0, 0, 99, 99)),          # FillPath
    ]
    img = iio.image_from_blob(_emf(recs), "emf")[0]
    a = np.asarray(img.data)
    c = a[50, 50]
    assert c[1] > 0.8 and c[0] < 0.2 and c[2] < 0.2, c


def test_emf_window_viewport_transform():
    # logical window 0..199 mapped onto the 0..99 device viewport: a
    # rectangle at logical 100..199 lands in device 50..99
    recs = [
        _rec(10, struct.pack("<2i", 0, 0)),        # SetWindowOrgEx
        _rec(9, struct.pack("<2i", 200, 200)),     # SetWindowExtEx
        _rec(12, struct.pack("<2i", 0, 0)),        # SetViewportOrgEx
        _rec(11, struct.pack("<2i", 100, 100)),    # SetViewportExtEx
        _rec(39, struct.pack("<IIII", 1, 0, 0xFF0000, 0)),   # blue brush
        _rec(37, struct.pack("<I", 1)),
        _rec(37, struct.pack("<I", 0x80000000 | 8)),         # NULL_PEN
        _rec(43, struct.pack("<4i", 100, 100, 200, 200)),
    ]
    img = iio.image_from_blob(_emf(recs), "emf")[0]
    a = np.asarray(img.data)
    assert a[75, 75][2] > 0.8 and a[75, 75][0] < 0.2    # inside: blue
    assert np.all(a[25, 25] > 0.9)                      # outside: white


def test_emf_ext_textout():
    msg = "Hi"
    txt = msg.encode("utf-16le")
    # EMRTEXT at offset 36 (rclBounds 16 + mode/scales 12 after the 8-byte
    # header): ptlRef, nChars, offString, fOptions, rcl, offDx
    emrtext = struct.pack("<2iIII4iI", 10, 40, len(msg), 76, 0,
                          0, 0, 0, 0, 0)
    payload = (struct.pack("<4i", 0, 0, 99, 99) + struct.pack("<I", 1) +
               struct.pack("<2f", 1.0, 1.0) + emrtext + txt)
    recs = [
        _rec(24, struct.pack("<I", 0x000000)),               # SetTextColor
        _rec(82, struct.pack("<Ii", 1, -20) + b"\0" * 24 +
             "Arial".encode("utf-16le") + b"\0" * 54),       # font, 20px
        _rec(37, struct.pack("<I", 1)),
        _rec(84, payload),                                   # ExtTextOutW
    ]
    img = iio.image_from_blob(_emf(recs), "emf")[0]
    a = np.asarray(img.data)
    assert a.min() < 0.5      # some dark glyph pixels were rendered


def test_emf_truncated_raises():
    with pytest.raises(ValueError):
        emf.decode_emf(b"\x01\x00\x00\x00" + b"\0" * 40)

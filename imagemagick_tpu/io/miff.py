"""Native MIFF codec — ImageMagick's canonical lossless format.

Re-implements the core of /root/reference/coders/miff.c (2,863 LoC): a
text key=value header terminated by ``:\x1a`` followed by big-endian raw
samples (optionally zlib/bz2 compressed).  Supported here: DirectClass,
depth 8/16/32-float, gray/sRGB/CMYK ± alpha, None/Zip/BZip compression,
multi-frame streams, and header comments/properties (round-tripped into
Image.properties).
"""

from __future__ import annotations

import bz2
import re
import zlib
from typing import Dict, List, Tuple

import numpy as np

from ..core.image import Image
from ..core.spec import ImageSpec, normalize_colorspace

_MAGIC = b"id=ImageMagick"


def _parse_header(data: bytes, pos: int) -> Tuple[Dict[str, str], int]:
    """Parse key=value pairs up to the ':' separator (miff.c ReadMIFFImage)."""
    fields: Dict[str, str] = {}
    token = b""
    comment = False
    key = None
    i = pos
    while i < len(data):
        ch = data[i:i + 1]
        if comment:
            if ch == b"}":
                comment = False
                fields["comment"] = token.decode("utf-8", "replace")
                token = b""
            else:
                token += ch
            i += 1
            continue
        if ch == b"{" and key is None:
            comment = True
            token = b""
            i += 1
            continue
        if ch == b":":
            # header terminator; may be followed by \x1a
            i += 1
            if data[i:i + 1] == b"\x1a":
                i += 1
            break
        if ch == b"=":
            key = token.decode("ascii", "replace").strip().lower()
            token = b""
            i += 1
            # value may be {...} quoted
            if data[i:i + 1] == b"{":
                j = data.index(b"}", i)
                fields[key] = data[i + 1:j].decode("utf-8", "replace")
                key = None
                i = j + 1
            continue
        if ch.isspace():
            if key is not None:
                fields[key] = token.decode("utf-8", "replace")
                key = None
            token = b""
            i += 1
            continue
        token += ch
        i += 1
    return fields, i


def decode(data: bytes) -> List[Image]:
    images = []
    pos = 0
    while pos < len(data) and data[pos:pos + len(_MAGIC)].lower() == _MAGIC.lower():
        fields, pos = _parse_header(data, pos)
        w = int(fields["columns"])
        h = int(fields["rows"])
        depth = int(fields.get("depth", "16"))
        cs_name = fields.get("colorspace", "sRGB")
        try:
            cs = normalize_colorspace(cs_name)
        except ValueError:
            cs = "srgb"
        alpha = fields.get("alpha", fields.get("matte", "False")).lower() == "true"
        ncolor = 4 if cs == "cmyk" else (1 if cs in ("gray", "linear_gray") else 3)
        nch = ncolor + (1 if alpha else 0)
        compression = fields.get("compression", "None").lower()
        if depth == 8:
            itemsize, dt = 1, np.uint8
        elif depth == 16:
            itemsize, dt = 2, ">u2"
        elif depth == 32 and fields.get("quantum-format", "") == "floating-point":
            itemsize, dt = 4, ">f4"
        else:
            itemsize, dt = 4, ">u4"
        nbytes = w * h * nch * itemsize
        if compression in ("zip", "zlib"):
            dec = zlib.decompressobj()
            raw = dec.decompress(data[pos:], nbytes)
            pos = len(data) - len(dec.unused_data)
        elif compression in ("bzip",):
            dec = bz2.BZ2Decompressor()
            raw = dec.decompress(data[pos:], nbytes)
            pos = len(data) - len(dec.unused_data)
        else:
            raw = data[pos:pos + nbytes]
            pos += nbytes
        arr = np.frombuffer(raw, dt, count=w * h * nch).reshape(h, w, nch)
        if depth == 8:
            f = arr.astype(np.float32) / 255.0
        elif depth == 16:
            f = arr.astype(np.float32) / 65535.0
        elif dt == ">f4":
            f = arr.astype(np.float32)
        else:
            f = arr.astype(np.float32) / 4294967295.0
        props = {k: v for k, v in fields.items()
                 if k not in ("columns", "rows", "depth", "colorspace", "alpha",
                              "matte", "compression", "class", "colors",
                              "quantum-format", "id", "version")}
        img = Image(f, ImageSpec(colorspace=cs, alpha=alpha, depth=min(depth, 16)),
                    properties=props)
        images.append(img)
        # skip whitespace between frames
        while pos < len(data) and data[pos:pos + 1] in b"\r\n \t":
            pos += 1
    if not images:
        raise ValueError("not a MIFF stream")
    return images


def encode(images, depth: int = 16, compression: str = "none") -> bytes:
    if isinstance(images, Image):
        images = [images]
    out = bytearray()
    for img in images:
        arr = img.to_numpy()
        if arr.ndim == 4:
            for i in range(arr.shape[0]):
                out += _encode_one(Image(arr[i], img.spec, img.properties), depth, compression)
            continue
        out += _encode_one(img, depth, compression)
    return bytes(out)


_CS_NAMES = {
    "srgb": "sRGB", "rgb": "RGB", "gray": "Gray", "linear_gray": "LinearGray",
    "cmyk": "CMYK", "lab": "Lab", "xyz": "XYZ", "hsl": "HSL", "hsb": "HSB",
    "ycbcr": "YCbCr",
}


def _encode_one(img: Image, depth: int, compression: str) -> bytes:
    arr = np.clip(img.to_numpy(), 0.0, 1.0)
    h, w, c = arr.shape
    cs = _CS_NAMES.get(img.spec.colorspace, "sRGB")
    comp_name = {"none": "None", "zip": "Zip", "zlib": "Zip", "bzip": "BZip"}[compression.lower()]
    head = (
        f"id=ImageMagick  version=1.0\n"
        f"class=DirectClass  colors=0  alpha={'True' if img.spec.alpha else 'False'}\n"
        f"columns={w}  rows={h}  depth={depth}\n"
        f"colorspace={cs}\n"
        f"compression={comp_name}  quality=0\n"
    )
    for k, v in img.properties.items():
        if re.match(r"^[A-Za-z][\w:.-]*$", str(k)):
            head += f"{k}={{{v}}}\n"
    head += "\x0c\n:\x1a"
    if depth == 8:
        q = (arr * 255.0 + 0.5).astype(np.uint8)
    elif depth == 32:
        q = arr.astype(">f4")
        head = head.replace("compression=", "quantum-format=floating-point\ncompression=")
    else:
        q = (arr * 65535.0 + 0.5).astype(">u2")
    payload = q.tobytes()
    if comp_name == "Zip":
        payload = zlib.compress(payload, 6)
    elif comp_name == "BZip":
        payload = bz2.compress(payload)
    return head.encode("utf-8") + payload

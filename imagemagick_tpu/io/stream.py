"""Incremental pixel streaming: row-batch callbacks without a full decode.

The reference's `stream` utility (/root/reference/MagickCore/stream.c:993
ReadStream / :121 StreamImagePixels) walks an image a row batch at a time
through a user callback, never holding the full pixel store.  Here:

  * binary PNM (P5/P6), raw gray/rgb/rgba/bgr, and uncompressed MIFF are
    streamed TRULY incrementally — each batch is one byte-range read;
  * other formats fall back to a full decode with batched delivery (the
    callback contract is identical; memory is not bounded — documented).

The callback receives float32 (rows, W, C) batches and may return False
to stop early (the reference's StreamHandler contract).
"""

from __future__ import annotations

import os
import re
from typing import Callable, Optional, Tuple

import numpy as np

from ..core.image import Image

StreamHandler = Callable[[np.ndarray, int], Optional[bool]]


def _pnm_header(f) -> Tuple[str, int, int, int, int]:
    """Parse a binary PNM header; returns (kind, w, h, maxval, data_off)."""
    data = f.read(512)
    m = re.match(rb"(P[56])\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)\s+(\d+)\s",
                 data)
    if not m:
        raise ValueError("not a binary PNM stream")
    kind = m.group(1).decode()
    w, h, maxval = int(m.group(2)), int(m.group(3)), int(m.group(4))
    return kind, w, h, maxval, m.end()


def read_stream(filename: str, handler: StreamHandler,
                rows_per_batch: int = 64,
                size: Optional[str] = None) -> int:
    """ReadStream analog: deliver row batches to `handler`; returns rows
    delivered.  Incremental for P5/P6 PNM, raw (needs `size`), and
    uncompressed MIFF; full-decode fallback otherwise."""
    ext = os.path.splitext(filename)[1].lstrip(".").lower()

    def deliver_incremental(f, w, h, c, itemsize, dtype, scale, offset):
        f.seek(offset)
        row_bytes = w * c * itemsize
        done = 0
        while done < h:
            n = min(rows_per_batch, h - done)
            raw = f.read(row_bytes * n)
            if len(raw) < row_bytes * n:
                break
            batch = np.frombuffer(raw, dtype, n * w * c).astype(np.float32)
            batch = (batch / scale).reshape(n, w, c)
            if handler(batch, done) is False:
                return done + n
            done += n
        return done

    with open(filename, "rb") as f:
        head = f.read(16)
        f.seek(0)
        if head[:2] in (b"P5", b"P6"):
            kind, w, h, maxval, off = _pnm_header(f)
            c = 1 if kind == "P5" else 3
            if maxval < 256:
                return deliver_incremental(f, w, h, c, 1, np.uint8,
                                           float(maxval), off)
            return deliver_incremental(f, w, h, c, 2, ">u2", float(maxval),
                                       off)
        if head[:14] == b"id=ImageMagick":
            from . import miff as miffmod

            data = f.read()
            fields, pos = miffmod._parse_header(data, 0)
            comp = fields.get("compression", "None").lower()
            cls = fields.get("class", "DirectClass").lower()
            if comp in ("none", "undefined") and cls == "directclass" \
                    and "__profiles__" not in fields:
                w = int(fields["columns"])
                h = int(fields["rows"])
                depth = int(fields.get("depth", "16"))
                cs = fields.get("colorspace", "sRGB").lower()
                alpha = fields.get("alpha", "False").lower() == "true"
                c = (1 if "gray" in cs else 4 if cs == "cmyk" else 3) + \
                    (1 if alpha else 0)
                qfmt = fields.get("quantum:format",
                                  fields.get("quantum-format", "")).lower()
                f.seek(pos)
                if qfmt == "floating-point":
                    # Q16-HDRI half-float / Q32 float payloads, values
                    # already normalized [0,1] (miff.c quantum:format) —
                    # mirror miff.decode's >f2/>f4 handling.
                    isz, dt = (2, ">f2") if depth == 16 else (4, ">f4")
                    return deliver_incremental(f, w, h, c, isz, dt, 1.0, pos)
                if depth == 8:
                    return deliver_incremental(f, w, h, c, 1, np.uint8,
                                               255.0, pos)
                return deliver_incremental(f, w, h, c, 2, ">u2", 65535.0,
                                           pos)
        if ext in ("gray", "rgb", "rgba", "bgr") and size:
            from ..core.geometry import parse_geometry

            g = parse_geometry(size)
            w, h = int(g.width), int(g.height)
            c = {"gray": 1, "rgb": 3, "rgba": 4, "bgr": 3}[ext]
            return deliver_incremental(f, w, h, c, 1, np.uint8, 255.0, 0)

    # fallback: full decode, batched delivery (memory NOT bounded)
    from . import read_images

    img = read_images(filename, size=size)[0]
    arr = img.to_numpy()
    h = arr.shape[0]
    done = 0
    while done < h:
        n = min(rows_per_batch, h - done)
        if handler(arr[done:done + n], done) is False:
            return done + n
        done += n
    return done


def open_rows(filename: str, size: Optional[str] = None):
    """Random-access row-range reader for streamable formats.

    Returns (loader, (H, W, C)) where loader(y0, y1) -> float32
    (y1-y0, W, C) reads exactly that byte range from disk — the source
    contract of models/outofcore.run_chain, so an op chain can run over
    an image that is never fully resident (stream.c ReadStream's window
    + cache.c's disk cache rolled together).  Supports binary PNM
    (P5/P6), uncompressed DirectClass MIFF, and raw gray/rgb/rgba/bgr
    with an explicit size.
    """
    with open(filename, "rb") as f:
        head = f.read(16)
        f.seek(0)
        if head[:2] in (b"P5", b"P6"):
            kind, w, h, maxval, off = _pnm_header(f)
            c = 1 if kind == "P5" else 3
            itemsize, dtype = (1, np.uint8) if maxval < 256 else (2, ">u2")
            scale = float(maxval)
        elif head[:14] == b"id=ImageMagick":
            from . import miff as miffmod

            data = f.read(64 * 1024)
            fields, off = miffmod._parse_header(data, 0)
            comp = fields.get("compression", "None").lower()
            cls = fields.get("class", "DirectClass").lower()
            if comp not in ("none", "undefined") or cls != "directclass" \
                    or "__profiles__" in fields:
                raise ValueError("open_rows: only uncompressed DirectClass "
                                 "MIFF streams are row-addressable")
            w = int(fields["columns"])
            h = int(fields["rows"])
            depth = int(fields.get("depth", "16"))
            cs = fields.get("colorspace", "sRGB").lower()
            alpha = fields.get("alpha", "False").lower() == "true"
            c = (1 if "gray" in cs else 4 if cs == "cmyk" else 3) + \
                (1 if alpha else 0)
            qfmt = fields.get("quantum:format",
                              fields.get("quantum-format", "")).lower()
            if qfmt == "floating-point":
                itemsize, dtype = (2, ">f2") if depth == 16 else (4, ">f4")
                scale = 1.0
            else:
                itemsize, dtype = (1, np.uint8) if depth == 8 else (2, ">u2")
                scale = 255.0 if depth == 8 else 65535.0
        else:
            ext = os.path.splitext(filename)[1].lstrip(".").lower()
            if ext in ("gray", "rgb", "rgba", "bgr") and size:
                from ..core.geometry import parse_geometry

                g = parse_geometry(size)
                w, h = int(g.width), int(g.height)
                c = {"gray": 1, "rgb": 3, "rgba": 4, "bgr": 3}[ext]
                itemsize, dtype, scale, off = 1, np.uint8, 255.0, 0
            else:
                raise ValueError(f"open_rows: {filename!r} is not a "
                                 "row-addressable stream format")
    row_bytes = w * c * itemsize

    def loader(y0: int, y1: int) -> np.ndarray:
        with open(filename, "rb") as fh:
            fh.seek(off + y0 * row_bytes)
            raw = fh.read(row_bytes * (y1 - y0))
        a = np.frombuffer(raw, dtype, (y1 - y0) * w * c).astype(np.float32)
        return (a / scale).reshape(y1 - y0, w, c)

    return loader, (h, w, c)


class _IncrementalWriter:
    """numpy-assignment shim: run_chain writes out[y0:y1] = band in
    ascending order; each slice is encoded and flushed immediately —
    the output is never fully resident (WriteStream, stream.c:993).

    Formats: binary PNM (P5/P6), raw gray/rgb, uncompressed DirectClass
    MIFF, and PNG (zlib-streamed IDAT chunks, filter 0 rows)."""

    def __init__(self, out_path: str, fmt: str, Hout: int, Wout: int,
                 depth: int):
        self.path = out_path
        self.fmt = fmt
        self.h, self.w = Hout, Wout
        self.depth = depth
        self.f = None
        self.next_row = 0
        self.cout = None
        self._z = None          # PNG zlib stream
        self._crc = None

    def _begin(self, cout: int):
        import struct
        import zlib

        self.cout = cout
        self.f = open(self.path, "wb")
        maxval = (1 << self.depth) - 1
        if self.fmt == "pnm":
            if cout not in (1, 3):
                raise ValueError(
                    f"streaming PNM supports 1 or 3 channels, chain "
                    f"produced {cout} (flatten or -separate alpha first)")
            kind = b"P5" if cout == 1 else b"P6"
            self.f.write(kind + b"\n%d %d\n%d\n" % (self.w, self.h, maxval))
        elif self.fmt == "miff":
            cs = "Gray" if cout == 1 else "sRGB"
            alpha = "True" if cout in (2, 4) else "False"
            hdr = (f"id=ImageMagick  version=1.0\n"
                   f"class=DirectClass  colors=0  alpha={alpha}\n"
                   f"columns={self.w}  rows={self.h}  depth={self.depth}\n"
                   f"colorspace={cs}\ncompression=None\n\x0c\n:\x1a")
            self.f.write(hdr.encode("latin-1"))
        elif self.fmt == "png":
            if cout not in (1, 2, 3, 4):
                raise ValueError(f"PNG cannot carry {cout} channels")
            ctype = {1: 0, 2: 4, 3: 2, 4: 6}[cout]
            bitdepth = 8 if self.depth == 8 else 16
            self.f.write(b"\x89PNG\r\n\x1a\n")
            ihdr = struct.pack(">IIBBBBB", self.w, self.h, bitdepth,
                               ctype, 0, 0, 0)
            self._chunk(b"IHDR", ihdr)
            self._z = zlib.compressobj(6)
        elif self.fmt == "raw":
            pass
        else:
            raise ValueError(f"no incremental writer for {self.fmt!r}")

    def _chunk(self, tag: bytes, payload: bytes):
        import struct
        import zlib

        self.f.write(struct.pack(">I", len(payload)) + tag + payload +
                     struct.pack(">I", zlib.crc32(tag + payload)
                                 & 0xFFFFFFFF))

    def __setitem__(self, key, value):
        y0, y1 = key.start or 0, key.stop
        assert y0 == self.next_row, "bands must arrive in order"
        value = np.asarray(value)
        if self.f is None:
            self._begin(value.shape[-1])
        maxval = (1 << self.depth) - 1
        q = np.clip(np.asarray(value, np.float64) * maxval + 0.5,
                    0, maxval)
        if self.fmt == "png":
            rows = (q.astype(np.uint8) if self.depth == 8
                    else q.astype(">u2"))
            n, w, c = rows.shape
            body = np.zeros((n, 1 + w * c * rows.dtype.itemsize), np.uint8)
            flat = rows.reshape(n, -1).view(np.uint8)
            body[:, 1:] = flat.reshape(n, -1)
            data = self._z.compress(body.tobytes())
            if data:
                self._chunk(b"IDAT", data)
        else:
            buf = (q.astype(np.uint8) if self.depth == 8
                   else q.astype(">u2")).tobytes()
            self.f.write(buf)
        self.next_row = y1

    def close(self):
        if self.f is not None:
            if self.fmt == "png" and self._z is not None:
                tail = self._z.flush()
                if tail:
                    self._chunk(b"IDAT", tail)
                self._chunk(b"IEND", b"")
            self.f.close()


_WRITER_EXT = {"pnm": "pnm", "ppm": "pnm", "pgm": "pnm",
               "miff": "miff", "png": "png",
               "gray": "raw", "rgb": "raw", "rgba": "raw"}


def convert_streaming(in_path: str, out_path: str, ops=(),
                      resize=None, post_ops=(), band_rows: int = 512,
                      depth: int = 8, size: Optional[str] = None) -> None:
    """End-to-end never-resident convert: row-addressable input -> banded
    op chain (+ resize) on device -> incremental encoder.

    The tera-pixel tier as one call: input rows are read per band
    (open_rows), the chain runs via models/outofcore.run_chain, and each
    output band is encoded to disk as soon as it is computed (an
    out-array writer that never holds the full output).  Output formats:
    PNM, raw planes, uncompressed MIFF, PNG (streamed IDAT)."""
    from ..models.outofcore import run_chain

    loader, (H, W, C) = open_rows(in_path, size=size)
    if resize is not None:
        Hout, Wout = resize[0], resize[1]
    else:
        Hout, Wout = H, W
    ext = os.path.splitext(out_path)[1].lstrip(".").lower()
    fmt = _WRITER_EXT.get(ext)
    if fmt is None:
        raise ValueError(
            f"convert_streaming: no incremental writer for {ext!r} "
            f"(supported: {sorted(_WRITER_EXT)})")

    w = _IncrementalWriter(out_path, fmt, Hout, Wout, depth)
    try:
        run_chain(loader, (H, W, C), ops, resize=resize,
                  post_ops=post_ops, band_rows=band_rows, out=w)
    finally:
        w.close()

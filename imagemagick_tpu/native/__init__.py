"""Native codec runtime bindings (ctypes over miniio.cpp).

Builds libminiio.so on first use (g++ against system libjpeg/libpng) and
exposes GIL-free decode/encode.  Falls back cleanly to None when the
toolchain or libraries are absent — callers (io/codecs.py, models/
thumbnailer.py) probe ``available()`` and use PIL otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libminiio.so")
_SRC = os.path.join(_HERE, "miniio.cpp")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-fPIC", "-shared", _SRC,
           "-ljpeg", "-lpng", "-o", _SO_PATH]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        return r.returncode == 0
    except Exception:
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO_PATH) or \
                os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _build_failed = True
            return None
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.miniio_decode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(c_u8p), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.miniio_decode_jpeg.restype = ctypes.c_int
        lib.miniio_decode_jpeg_scaled.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(c_u8p), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.miniio_decode_jpeg_scaled.restype = ctypes.c_int
        lib.miniio_encode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(c_u8p),
            ctypes.POINTER(ctypes.c_size_t)]
        lib.miniio_encode_jpeg.restype = ctypes.c_int
        lib.miniio_decode_png.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(c_u8p), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.miniio_decode_png.restype = ctypes.c_int
        lib.miniio_encode_png.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(c_u8p),
            ctypes.POINTER(ctypes.c_size_t)]
        lib.miniio_encode_png.restype = ctypes.c_int
        lib.miniio_free.argtypes = [ctypes.c_void_p]
        lib.miniio_abi_version.restype = ctypes.c_int
        if lib.miniio_abi_version() != 2:
            _build_failed = True
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    """Decode JPEG bytes -> (H, W, 3) uint8, or None on failure."""
    lib = _load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_uint8)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.miniio_decode_jpeg(data, len(data), ctypes.byref(out),
                                ctypes.byref(w), ctypes.byref(h),
                                ctypes.byref(c))
    if rc != 0:
        return None
    n = w.value * h.value * c.value
    arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    lib.miniio_free(out)
    return arr.reshape(h.value, w.value, c.value)


def decode_jpeg_scaled(data: bytes, min_w: int, min_h: int
                       ) -> Optional[np.ndarray]:
    """DCT-scaled JPEG decode (jpeg:size semantics, coders/jpeg.c): decode
    at the largest 1/{1,2,4,8} scale whose output still covers
    (min_w, min_h).  -> (H, W, 3) uint8, or None on failure."""
    lib = _load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_uint8)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.miniio_decode_jpeg_scaled(data, len(data), min_w, min_h,
                                       ctypes.byref(out), ctypes.byref(w),
                                       ctypes.byref(h), ctypes.byref(c))
    if rc != 0:
        return None
    n = w.value * h.value * c.value
    arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    lib.miniio_free(out)
    return arr.reshape(h.value, w.value, c.value)


def encode_jpeg(arr: np.ndarray, quality: int = 92) -> Optional[bytes]:
    """Encode (H, W, 1|3) uint8 -> JPEG bytes."""
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr, np.uint8)
    h, w, c = arr.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = ctypes.c_size_t()
    rc = lib.miniio_encode_jpeg(arr.ctypes.data_as(ctypes.c_char_p),
                                w, h, c, quality,
                                ctypes.byref(out), ctypes.byref(size))
    if rc != 0:
        return None
    data = ctypes.string_at(out, size.value)
    lib.miniio_free(out)
    return data


# ---------------------------------------------------------------------------
# HEIC/JXL codec layer (native/heifjxl.cpp — dlopen over the system
# libheif/libjxl, the same libraries coders/heic.c and coders/jxl.c use)
# ---------------------------------------------------------------------------

_HJ_SO = os.path.join(_HERE, "libheifjxl.so")
_HJ_SRC = os.path.join(_HERE, "heifjxl.cpp")
_hj_lib = None
_hj_failed = False


def _hj_load():
    global _hj_lib, _hj_failed
    with _lock:
        if _hj_lib is not None or _hj_failed:
            return _hj_lib
        if not os.path.exists(_HJ_SO) or \
                os.path.getmtime(_HJ_SO) < os.path.getmtime(_HJ_SRC):
            try:
                r = subprocess.run(["g++", "-O3", "-fPIC", "-shared",
                                    _HJ_SRC, "-ldl", "-o", _HJ_SO],
                                   capture_output=True, timeout=120)
                if r.returncode != 0:
                    _hj_failed = True
                    return None
            except Exception:
                _hj_failed = True
                return None
        try:
            lib = ctypes.CDLL(_HJ_SO)
        except OSError:
            _hj_failed = True
            return None
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        for name in ("hj_decode_heif", "hj_decode_jxl"):
            fn = getattr(lib, name)
            fn.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                           ctypes.POINTER(c_u8p), ctypes.POINTER(ctypes.c_int),
                           ctypes.POINTER(ctypes.c_int),
                           ctypes.POINTER(ctypes.c_int)]
            fn.restype = ctypes.c_int
        lib.hj_encode_heif.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(c_u8p),
            ctypes.POINTER(ctypes.c_size_t)]
        lib.hj_encode_heif.restype = ctypes.c_int
        lib.hj_encode_jxl.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(c_u8p), ctypes.POINTER(ctypes.c_size_t)]
        lib.hj_encode_jxl.restype = ctypes.c_int
        lib.hj_free.argtypes = [ctypes.c_void_p]
        lib.hj_heif_available.restype = ctypes.c_int
        lib.hj_jxl_available.restype = ctypes.c_int
        lib.hj_abi_version.restype = ctypes.c_int
        if lib.hj_abi_version() != 1:
            _hj_failed = True
            return None
        _hj_lib = lib
        return _hj_lib


def heif_available() -> bool:
    lib = _hj_load()
    return bool(lib and lib.hj_heif_available())


def jxl_available() -> bool:
    lib = _hj_load()
    return bool(lib and lib.hj_jxl_available())


def _hj_decode(fn_name: str, data: bytes) -> Optional[np.ndarray]:
    lib = _hj_load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_uint8)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    rc = getattr(lib, fn_name)(data, len(data), ctypes.byref(out),
                               ctypes.byref(w), ctypes.byref(h),
                               ctypes.byref(c))
    if rc != 0:
        return None
    n = w.value * h.value * c.value
    arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    lib.hj_free(out)
    return arr.reshape(h.value, w.value, c.value)


def decode_heif(data: bytes) -> Optional[np.ndarray]:
    """HEIC/HEIF/AVIF-in-HEIF decode -> (H, W, 3|4) u8, or None."""
    return _hj_decode("hj_decode_heif", data)


def decode_jxl(data: bytes) -> Optional[np.ndarray]:
    """JPEG-XL decode -> (H, W, C) u8, or None."""
    return _hj_decode("hj_decode_jxl", data)


def encode_heif(arr: np.ndarray, quality: int = 75) -> Optional[bytes]:
    """HEIC encode; None when no HEVC encoder plugin is installed."""
    lib = _hj_load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr, np.uint8)
    h, w, c = arr.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = ctypes.c_size_t()
    rc = lib.hj_encode_heif(arr.ctypes.data_as(ctypes.c_char_p), w, h, c,
                            quality, ctypes.byref(out), ctypes.byref(size))
    if rc != 0:
        return None
    data = ctypes.string_at(out, size.value)
    lib.hj_free(out)
    return data


def encode_jxl(arr: np.ndarray) -> Optional[bytes]:
    """JPEG-XL encode (default effort/quality), or None."""
    lib = _hj_load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr, np.uint8)
    h, w, c = arr.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = ctypes.c_size_t()
    rc = lib.hj_encode_jxl(arr.ctypes.data_as(ctypes.c_char_p), w, h, c,
                           ctypes.byref(out), ctypes.byref(size))
    if rc != 0:
        return None
    data = ctypes.string_at(out, size.value)
    lib.hj_free(out)
    return data


def decode_png(data: bytes) -> Optional[Tuple[np.ndarray, int]]:
    """Decode PNG bytes -> ((H, W, C) uint8|uint16 array, bit_depth)."""
    lib = _load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_uint8)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    depth = ctypes.c_int()
    rc = lib.miniio_decode_png(data, len(data), ctypes.byref(out),
                               ctypes.byref(w), ctypes.byref(h),
                               ctypes.byref(c), ctypes.byref(depth))
    if rc != 0:
        return None
    nbytes = w.value * h.value * c.value * (depth.value // 8)
    raw = np.ctypeslib.as_array(out, shape=(nbytes,)).copy()
    lib.miniio_free(out)
    if depth.value == 16:
        arr = raw.view(">u2").reshape(h.value, w.value, c.value)
    else:
        arr = raw.reshape(h.value, w.value, c.value)
    return arr, depth.value


def encode_png(arr: np.ndarray, bit_depth: int = 8) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    if bit_depth == 16:
        arr = np.ascontiguousarray(arr.astype(">u2"))
        raw = arr.view(np.uint8)
    else:
        arr = np.ascontiguousarray(arr, np.uint8)
        raw = arr
    h, w, c = arr.shape[:3]
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = ctypes.c_size_t()
    rc = lib.miniio_encode_png(raw.ctypes.data_as(ctypes.c_char_p),
                               w, h, c, bit_depth,
                               ctypes.byref(out), ctypes.byref(size))
    if rc != 0:
        return None
    data = ctypes.string_at(out, size.value)
    lib.miniio_free(out)
    return data


# ---------------------------------------------------------------------------
# Riemersma dither (riemersma.cpp) — host-sequential Hilbert-curve error
# diffusion used by posterize/quantize when dithering is enabled.
# ---------------------------------------------------------------------------

_RZ_SO = os.path.join(_HERE, "libriemersma.so")
_RZ_SRC = os.path.join(_HERE, "riemersma.cpp")
_rz_lib = None
_rz_failed = False


def _rz_load():
    global _rz_lib, _rz_failed
    with _lock:
        if _rz_lib is not None or _rz_failed:
            return _rz_lib
        if not os.path.exists(_RZ_SO) or \
                os.path.getmtime(_RZ_SO) < os.path.getmtime(_RZ_SRC):
            cmd = ["g++", "-O2", "-fPIC", "-shared", _RZ_SRC, "-o", _RZ_SO]
            try:
                r = subprocess.run(cmd, capture_output=True, timeout=120)
                if r.returncode != 0:
                    _rz_failed = True
                    return None
            except Exception:
                _rz_failed = True
                return None
        try:
            lib = ctypes.CDLL(_RZ_SO)
        except OSError:
            _rz_failed = True
            return None
        for fn in ("rz_riemersma_posterize", "rz_floyd_steinberg_posterize"):
            f = getattr(lib, fn)
            f.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
                ctypes.c_long, ctypes.c_int, ctypes.c_double]
            f.restype = ctypes.c_int
        lib.rz_quantize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_long)]
        lib.rz_quantize.restype = ctypes.c_int
        lib.rz_remap.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.c_long, ctypes.c_int, ctypes.c_double]
        lib.rz_remap.restype = ctypes.c_int
        _rz_lib = lib
        return _rz_lib


def riemersma_available() -> bool:
    return _rz_load() is not None


def _dither_posterize(arr, levels, diffusion, fname):
    lib = _rz_load()
    if lib is None:
        return None
    out = np.ascontiguousarray(arr, dtype=np.float32).copy()
    h, w = out.shape[0], out.shape[1]
    c = 1 if out.ndim == 2 else out.shape[2]
    rc = getattr(lib, fname)(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, c, int(levels), float(diffusion))
    return out if rc == 0 else None


def riemersma_posterize(arr: np.ndarray, levels: int,
                        diffusion: float = 1.0) -> Optional[np.ndarray]:
    """Dither `arr` (H,W,C float32 [0,1]) to a `levels`-per-channel
    lattice along a Hilbert curve.  Returns None if the native library
    is unavailable (callers fall back to undithered rounding)."""
    return _dither_posterize(arr, levels, diffusion,
                             "rz_riemersma_posterize")


def floyd_steinberg_posterize(arr: np.ndarray, levels: int,
                              diffusion: float = 1.0) -> Optional[np.ndarray]:
    """Serpentine Floyd-Steinberg posterize via the same octree/cache
    color assignment as the Riemersma path."""
    return _dither_posterize(arr, levels, diffusion,
                             "rz_floyd_steinberg_posterize")


def octree_quantize(arr: np.ndarray, max_colors: int, dither: str = "riemersma",
                    tree_depth: int = 0, diffusion: float = 1.0):
    """Full reference-semantics octree quantization (quantize.c
    QuantizeImage): classify / reduce / colormap / assign, with optional
    Riemersma or Floyd-Steinberg dithering.  Returns (out_image,
    palette) or None if the native library is unavailable."""
    lib = _rz_load()
    if lib is None:
        return None
    meth = {"none": 0, "": 0, "riemersma": 1,
            "floydsteinberg": 2, "fs": 2}.get(str(dither).lower(), 1)
    out = np.ascontiguousarray(arr, dtype=np.float32).copy()
    h, w = out.shape[0], out.shape[1]
    c = 1 if out.ndim == 2 else out.shape[2]
    cap = max(int(max_colors), 256)
    pal = np.zeros((cap, 4), np.float32)
    n = ctypes.c_long(0)
    rc = lib.rz_quantize(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, c, int(max_colors), meth, int(tree_depth), float(diffusion),
        pal.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(n))
    if rc != 0:
        return None
    return out, pal[:n.value]


def octree_remap(arr: np.ndarray, palette: np.ndarray,
                 dither: str = "riemersma", diffusion: float = 1.0):
    """RemapImage with reference octree/cache semantics.  `palette` is
    (N, C) float32 [0,1].  Returns the remapped image or None."""
    lib = _rz_load()
    if lib is None:
        return None
    meth = {"none": 0, "": 0, "riemersma": 1,
            "floydsteinberg": 2, "fs": 2}.get(str(dither).lower(), 1)
    out = np.ascontiguousarray(arr, dtype=np.float32).copy()
    pal = np.ascontiguousarray(palette, dtype=np.float32)
    h, w = out.shape[0], out.shape[1]
    c = 1 if out.ndim == 2 else out.shape[2]
    pc = 1 if pal.ndim == 1 else pal.shape[1]
    rc = lib.rz_remap(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, c, pal.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pal.shape[0], pc, meth, float(diffusion))
    return out if rc == 0 else None


# ---------------------------------------------------------------------------
# JBIG (jbig-kit shim — the library coders/jbig.c uses)
# ---------------------------------------------------------------------------

_JB_SO = os.path.join(_HERE, "libjbigio.so")
_JB_SRC = os.path.join(_HERE, "jbigio.cpp")
_jb_lib = None
_jb_failed = False


def jbig_load():
    """Build+load the jbig shim; None when libjbig/-dev is unavailable."""
    global _jb_lib, _jb_failed
    with _lock:
        if _jb_lib is not None or _jb_failed:
            return _jb_lib
        if not os.path.exists(_JB_SO) or \
                os.path.getmtime(_JB_SO) < os.path.getmtime(_JB_SRC):
            try:
                r = subprocess.run(["g++", "-O2", "-fPIC", "-shared",
                                    _JB_SRC, "-ljbig", "-o", _JB_SO],
                                   capture_output=True, timeout=120)
                if r.returncode != 0:
                    _jb_failed = True
                    return None
            except Exception:
                _jb_failed = True
                return None
        try:
            lib = ctypes.CDLL(_JB_SO)
        except OSError:
            _jb_failed = True
            return None
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.jb_decode.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                  ctypes.POINTER(c_u8p),
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
        lib.jb_decode.restype = ctypes.c_int
        lib.jb_encode.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                  ctypes.c_int, ctypes.POINTER(c_u8p),
                                  ctypes.POINTER(ctypes.c_size_t)]
        lib.jb_encode.restype = ctypes.c_int
        lib.jb_free.argtypes = [c_u8p]
        lib.jb_free.restype = None
        _jb_lib = lib
        return lib


def jbig_available() -> bool:
    return jbig_load() is not None


def jbig_decode(data: bytes):
    """JBIG blob -> (H, W) uint8 {0,1} bitmap (1 = black) or None."""
    lib = jbig_load()
    if lib is None:
        return None
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    out = c_u8p()
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    rc = lib.jb_decode(data, len(data), ctypes.byref(out),
                       ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    stride = (w.value + 7) // 8
    buf = np.ctypeslib.as_array(out, shape=(h.value * stride,)).copy()
    lib.jb_free(out)
    bits = np.unpackbits(buf.reshape(h.value, stride), axis=1)
    return bits[:, :w.value]


def jbig_encode(bitmap: np.ndarray):
    """(H, W) {0,1} bitmap (1 = black) -> JBIG blob or None."""
    lib = jbig_load()
    if lib is None:
        return None
    bm = np.asarray(bitmap, np.uint8)
    h, w = bm.shape
    packed = np.packbits(bm, axis=1).tobytes()
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    out = c_u8p()
    n = ctypes.c_size_t(0)
    rc = lib.jb_encode(packed, w, h, ctypes.byref(out), ctypes.byref(n))
    if rc != 0:
        return None
    blob = ctypes.string_at(out, n.value)
    lib.jb_free(out)
    return blob

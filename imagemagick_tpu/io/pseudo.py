"""Procedural pseudo-coders: xc:, gradient:, plasma:, pattern:, noise, hald.

The reference implements these as coders (/root/reference/coders/xc.c,
gradient.c, plasma.c, pattern.c, hald.c) that synthesize pixels on the CPU.
Here they are device-side generators — a gradient or hald CLUT is one
broadcast/iota expression that fuses straight into the downstream pipeline,
so "decode" costs nothing.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.color import parse_color
from ..core.image import Image
from ..core.spec import ImageSpec


def xc(color: str = "white", width: int = 1, height: int = 1) -> Image:
    """xc: / canvas: — constant-color canvas (coders/xc.c)."""
    r, g, b, a = parse_color(color)
    has_alpha = a < 1.0
    ch = 4 if has_alpha else 3
    vals = jnp.asarray([r, g, b, a][:ch], jnp.float32)
    data = jnp.broadcast_to(vals, (height, width, ch))
    return Image(data, ImageSpec(colorspace="srgb", alpha=has_alpha))


def gradient(spec: str = "white-black", width: int = 256, height: int = 256,
             direction: str = "vertical") -> Image:
    """gradient: — linear two-color ramp (coders/gradient.c)."""
    if "-" in spec:
        c1s, c2s = spec.split("-", 1)
    else:
        c1s, c2s = spec or "white", "black"
    c1 = jnp.asarray(parse_color(c1s or "white"), jnp.float32)
    c2 = jnp.asarray(parse_color(c2s or "black"), jnp.float32)
    # paint.c:545-551: the default diagonal vector collapses to vertical
    # only when rows>1 (y2 != 0); a 1-row gradient runs horizontally
    if direction == "vertical" and height == 1:
        direction = "horizontal"
    if direction == "horizontal":
        t = jnp.linspace(0.0, 1.0, width)[None, :, None]
        t = jnp.broadcast_to(t, (height, width, 1))
    else:
        t = jnp.linspace(0.0, 1.0, height)[:, None, None]
        t = jnp.broadcast_to(t, (height, width, 1))
    data = c1 * (1.0 - t) + c2 * t
    has_alpha = bool(c1[3] < 1.0 or c2[3] < 1.0)
    if not has_alpha:
        data = data[..., :3]
    return Image(data, ImageSpec(colorspace="srgb", alpha=has_alpha))


def radial_gradient(spec: str = "white-black", width: int = 256,
                    height: int = 256) -> Image:
    """radial-gradient: (coders/gradient.c radial mode)."""
    if "-" in spec:
        c1s, c2s = spec.split("-", 1)
    else:
        c1s, c2s = spec or "white", "black"
    c1 = jnp.asarray(parse_color(c1s or "white"), jnp.float32)
    c2 = jnp.asarray(parse_color(c2s or "black"), jnp.float32)
    cy, cx = (height - 1) / 2.0, (width - 1) / 2.0
    yy = jnp.arange(height, dtype=jnp.float32)[:, None]
    xx = jnp.arange(width, dtype=jnp.float32)[None, :]
    r = jnp.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    t = jnp.clip(r / max(math.hypot(cx, cy), 1e-6), 0.0, 1.0)[..., None]
    data = c1 * (1.0 - t) + c2 * t
    has_alpha = bool(c1[3] < 1.0 or c2[3] < 1.0)
    if not has_alpha:
        data = data[..., :3]
    return Image(data, ImageSpec(colorspace="srgb", alpha=has_alpha))


def plasma(spec: str = "", width: int = 256, height: int = 256,
           seed: int = 0) -> Image:
    """plasma: — fractal diamond-square clouds (coders/plasma.c).

    The reference recursively splits rectangles with random perturbation;
    here we synthesize the same spectrum with band-filtered noise (power-law
    spectrum), fully vectorized.
    """
    # Host-side numpy synthesis: plasma canvases are small and generated
    # once at read time, and this keeps the pseudo-coder independent of
    # the device backend's FFT support (the axon TPU backend has been
    # observed to reject FFT ops entirely after worker restarts).
    rng = np.random.default_rng(seed)
    fy = np.fft.fftfreq(height)[:, None]
    fx = np.fft.rfftfreq(width)[None, :]
    f = np.sqrt(fy * fy + fx * fx)
    amp = np.where(f > 0, 1.0 / np.maximum(f, 1e-6), 0.0)

    def layer():
        phase = rng.uniform(0.0, 2.0 * math.pi, amp.shape)
        spec_ = amp * np.exp(1j * phase)
        x = np.fft.irfft2(spec_, s=(height, width))
        return (x - x.min()) / max(x.max() - x.min(), 1e-12)

    data = np.stack([layer(), layer(), layer()], axis=-1)
    return Image(data.astype(np.float32), ImageSpec(colorspace="srgb"))


def hald(level: int = 8) -> Image:
    """hald: — identity Hald CLUT of the given level (coders/hald.c).

    A level-N Hald image is (N³)x(N³) encoding an N²-per-axis identity LUT.
    """
    n = level * level  # samples per channel axis
    side = level ** 3
    idx = jnp.arange(side * side, dtype=jnp.int32)
    r = idx % n
    g = (idx // n) % n
    b = idx // (n * n)
    scale = 1.0 / (n - 1)
    data = jnp.stack([r * scale, g * scale, b * scale], axis=-1)
    return Image(data.reshape(side, side, 3).astype(jnp.float32),
                 ImageSpec(colorspace="srgb"))


def checkerboard(width: int = 256, height: int = 256, size: int = 16,
                 c1: str = "#CCCCCC", c2: str = "#666666") -> Image:
    """pattern:checkerboard (coders/pattern.c built-in tile)."""
    a = jnp.asarray(parse_color(c1)[:3], jnp.float32)
    b = jnp.asarray(parse_color(c2)[:3], jnp.float32)
    yy = (jnp.arange(height) // size)[:, None]
    xx = (jnp.arange(width) // size)[None, :]
    mask = ((yy + xx) % 2 == 0)[..., None]
    data = jnp.where(mask, a, b)
    return Image(data, ImageSpec(colorspace="srgb"))


_PATTERNS = {"checkerboard": checkerboard}


def pattern(name: str, width: int = 256, height: int = 256) -> Image:
    name = name.lower()
    if name in _PATTERNS:
        return _PATTERNS[name](width, height)
    # gray-percent patterns (pattern:gray50 etc.)
    if name.startswith("gray"):
        pct = int(name[4:]) / 100.0
        return xc(f"gray({pct * 255.0:.0f})", width, height)
    raise ValueError(f"unknown pattern {name!r}")


# The reference embeds the built-in images as literal GIF/PNM blobs in
# coders/magick.c:12992 (MagickImageList[]: LOGO/GRANITE/ROSE/WIZARD/
# NETSCAPE, registered at coders/magick.c:13106+).  We carry the SAME
# canonical pixels, extracted once from a reference 7.1.1-45 Q16-HDRI
# build (`magick rose: -depth 8 RGB:rose.raw`) and packed as one
# zlib-compressed asset — data extraction, so rose:-derived fixtures and
# user scripts keyed on built-ins are bit-exact with the reference.
_BUILTIN_CACHE = {}


def _load_builtin(name: str) -> Image:
    if name not in _BUILTIN_CACHE:
        import os
        import struct
        import zlib

        import numpy as np

        path = os.path.join(os.path.dirname(__file__), "builtin_images.bin")
        with open(path, "rb") as f:
            blob = f.read()
        pos = 0
        found = None
        while pos < len(blob):
            end = blob.index(b"\0", pos)
            key = blob[pos:end].decode()
            h, w, clen = struct.unpack_from("<III", blob, end + 1)
            data_off = end + 13
            if key == name:
                raw = zlib.decompress(blob[data_off:data_off + clen])
                arr = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
                found = arr.astype(np.float32) / 255.0
            pos = data_off + clen
        if found is None:
            raise ValueError(f"unknown builtin image {name!r}")
        _BUILTIN_CACHE[name] = found
    return Image(jnp.asarray(_BUILTIN_CACHE[name]),
                 ImageSpec(colorspace="srgb", depth=8))


def logo() -> Image:
    return _load_builtin("logo")


def rose() -> Image:
    return _load_builtin("rose")


def wizard() -> Image:
    return _load_builtin("wizard")


def granite() -> Image:
    return _load_builtin("granite")


def netscape() -> Image:
    return _load_builtin("netscape")


def label(text: str, width=None, height=None, settings=None) -> Image:
    """label: pseudo-coder (coders/label.c): render text on a canvas sized
    to the text metrics, honoring pointsize/font/fill/background settings."""
    from ..core.color import parse_color
    from ..ops.draw import render_text_mask
    import jax.numpy as jnp

    s = settings or {}
    size = float(s.get("pointsize", 12) or 12)
    font = s.get("font") or None
    fill = parse_color(s.get("fill", "black"))
    bg = parse_color(s.get("background", "white"))
    mask, _ = render_text_mask(text, font, size,
                               direction=s.get("direction"))
    mh, mw = mask.shape
    w = width or mw
    h = height or mh
    canvas = np.ones((h, w, 3), np.float32) * np.asarray(bg[:3], np.float32)
    m = np.zeros((h, w), np.float32)
    m[:min(mh, h), :min(mw, w)] = mask[:min(mh, h), :min(mw, w)]
    out = canvas * (1 - m[..., None]) + np.asarray(fill[:3]) * m[..., None]
    img = Image(out, ImageSpec(colorspace="srgb", depth=8))
    img.properties["label"] = text
    return img


def caption(text: str, width=None, height=None, settings=None) -> Image:
    """caption: pseudo-coder (coders/caption.c): word-wrapped label."""
    from ..ops.draw import get_type_metrics

    s = settings or {}
    size = float(s.get("pointsize", 12) or 12)
    font = s.get("font") or None
    w = width or 256
    # greedy word wrap to the canvas width
    words = text.split()
    lines, cur = [], ""
    for word in words:
        probe = (cur + " " + word).strip()
        if get_type_metrics(probe, font, size)["width"] > w and cur:
            lines.append(cur)
            cur = word
        else:
            cur = probe
    if cur:
        lines.append(cur)
    return label("\n".join(lines), width, height, settings)


def tile_file(filename: str, width=None, height=None, settings=None) -> Image:
    """tile: pseudo-coder (coders/tile.c): tile a file to the -size canvas."""
    from . import read_images

    base = read_images(filename)[0]
    w = width or base.width
    h = height or base.height
    arr = base.to_numpy()
    ry = -(-h // base.height)
    rx = -(-w // base.width)
    tiled = np.tile(arr, (ry, rx, 1))[:h, :w]
    return Image(tiled, base.spec)


def histogram_file(filename: str, width=None, height=None, settings=None) -> Image:
    """histogram: pseudo-coder (coders/histogram.c): 256x200 channel graph."""
    from . import read_images

    base = read_images(filename)[0]
    arr = np.clip(base.to_numpy(), 0, 1)
    if arr.ndim == 4:
        arr = arr[0]
    h_out, w_out = height or 200, width or 256
    c = min(arr.shape[-1], 3)
    canvas = np.zeros((h_out, w_out, 3), np.float32)
    for ci in range(c):
        hist, _ = np.histogram(arr[..., ci], bins=w_out, range=(0.0, 1.0))
        peak = max(hist.max(), 1)
        heights = (hist / peak * (h_out - 1)).astype(np.int64)
        color = np.zeros(3, np.float32)
        color[ci if c == 3 else slice(None)] = 1.0
        for x in range(w_out):
            if heights[x]:
                canvas[h_out - heights[x]:, x, :] = np.maximum(
                    canvas[h_out - heights[x]:, x, :], color)
    img = Image(canvas, ImageSpec(colorspace="srgb", depth=8))
    img.properties["comment"] = "histogram"
    return img


def thumbnail_file(filename: str, width=None, height=None, settings=None) -> Image:
    """thumbnail: pseudo-coder (coders/thumbnail.c): read + ThumbnailImage."""
    from . import read_images
    from ..ops.resize import thumbnail as thumb_op

    base = read_images(filename)[0]
    w = width or 106
    h = height or int(round(w * base.height / base.width))
    return base.replace(data=thumb_op(base.data, h, w,
                                      has_alpha=base.spec.alpha))


def stegano_file(filename: str, width=None, height=None,
                 settings=None) -> Image:
    """stegano: pseudo-coder (coders/stegano.c read side): extract the
    LSB watermark from a host image; geometry comes from -size."""
    from . import formats4, read_images

    if not (width and height):
        raise ValueError("stegano: requires -size WxH")
    host = read_images(filename)[0]
    return formats4.decode_stegano(host, int(width), int(height))


def vid_file(pattern: str, width=None, height=None, settings=None) -> Image:
    """vid: pseudo-coder (coders/vid.c): visual image directory — a
    thumbnail montage of the files matching a glob."""
    import glob as _glob

    from . import read_images
    from ..ops import montage as mtg
    from ..ops.resize import thumbnail as thumb_op

    names = sorted(_glob.glob(pattern)) or [pattern]
    tiles = []
    labels = []
    for name in names[:64]:
        try:
            im = read_images(name)[0]
        except Exception:
            continue
        tw = int(width or 120)
        th = max(1, int(round(tw * im.height / max(1, im.width))))
        tiles.append(Image(np.asarray(
            thumb_op(im.data, th, tw, has_alpha=im.spec.alpha)), im.spec))
        labels.append(name.rsplit("/", 1)[-1])
    if not tiles:
        raise FileNotFoundError("vid: no readable files match %r" % pattern)
    del labels
    return mtg.montage(tiles)

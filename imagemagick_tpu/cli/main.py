"""tmagick: the magick-compatible command-line interface.

Re-implements the CLI engine (/root/reference/MagickWand/magick-cli.c:
MagickImageCommand :1284, ProcessCommandOptions :587; option dispatch in
operation.c) as a sequential interpreter over an image list — but where the
reference executes each option as a full pixel pass, this interpreter
*accumulates* device ops per image and compiles the whole chain as one
fused XLA program at materialization (write/identify/compare), realizing
the pipeline-fusion win described in SURVEY.md §7.

Option grammar follows option.c's CommandOptions[]: settings vs simple ops
vs list ops, parenthesized image stacks, -clone/-swap/-delete, +opt forms.
"""

from __future__ import annotations

import json
import math
import re
import sys
import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.color import parse_color
from ..core.geometry import (parse_geometry, parse_meta_geometry,
                             parse_page_geometry)
from ..core.image import Image
from ..core.spec import ImageSpec, normalize_colorspace


class CLIError(Exception):
    pass


# -define tpu:mesh=SYxSX (or DPxSYxSX) state: (mesh, min_pixels) or None.
# Set by the -define handler; consulted by LazyImage.materialize.
_ACTIVE_SHARD = None


def _set_shard_mesh(spec: Optional[str], threshold: Optional[str] = None):
    """Activate (or clear) CLI auto-sharding from -define tpu:mesh=..."""
    global _ACTIVE_SHARD
    if not spec:
        _ACTIVE_SHARD = None
        return
    from ..parallel.mesh import make_mesh

    parts = [int(p) for p in spec.lower().replace("x", ",").split(",") if p]
    if len(parts) == 2:
        dp, (sy, sx) = 1, parts
    elif len(parts) == 3:
        dp, sy, sx = parts
    else:
        raise CLIError(f"bad tpu:mesh geometry {spec!r} (want SYxSX)")
    mesh = make_mesh(dp=dp, sy=sy, sx=sx)
    minpx = int(threshold) if threshold else 4 * 1024 * 1024
    _ACTIVE_SHARD = (mesh, minpx)


def _auto_shard_sharding(data):
    """NamedSharding for a (H, W, C) image when auto-sharding applies."""
    if _ACTIVE_SHARD is None or getattr(data, "ndim", 0) != 3:
        return None
    mesh, minpx = _ACTIVE_SHARD
    h, w = int(data.shape[0]), int(data.shape[1])
    sy, sx = mesh.shape["sy"], mesh.shape["sx"]
    if h * w < minpx or h % sy or w % sx:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P("sy", "sx", None))


class LazyImage:
    """An image plus a queue of pending device ops (for whole-chain fusion).

    Shape-changing ops (resize/crop/extent/...) stay lazy too: they pass
    their statically-known output (h, w) to push(), so later options can
    compute geometry against the *pending* dimensions without forcing a
    materialization — the whole chain compiles as one XLA program.

    Ops whose math the fused Pallas kernels cover additionally pass a
    structured ``tag``; at materialization the tagged prefix of the chain
    is pattern-matched and dispatched to ONE banded-block-matmul kernel
    (ops/dispatch.py — the accelerate.c:3986 try-first pattern inverted),
    with the XLA chain as the transparent fallback.
    """

    __slots__ = ("image", "pending", "_shape")

    def __init__(self, image: Image, pending=None):
        self.image = image
        self.pending = list(pending or [])
        self._shape = None  # (h, w) after pending ops; None = unchanged

    @property
    def height(self) -> int:
        return self._shape[0] if self._shape else self.image.height

    @property
    def width(self) -> int:
        return self._shape[1] if self._shape else self.image.width

    @property
    def spec(self) -> ImageSpec:
        """Spec AFTER pending ops (folds queued spec updates)."""
        s = self.image.spec
        for _, upd, _ in self.pending:
            if upd is not None:
                s = upd(s)
        return s

    def push(self, fn, spec_update=None, new_shape=None, tag=None):
        self.pending.append((fn, spec_update, tag))
        if new_shape is not None:
            self._shape = new_shape

    def materialize(self) -> Image:
        if not self.pending:
            return self.image
        import jax

        from ..ops import dispatch as _dispatch

        ops = list(self.pending)
        data = self.image.data
        consumed = 0
        res = _dispatch.try_fused_chain(data, [t for _, _, t in ops],
                                        alpha=self.image.spec.alpha)
        if res is not None:
            data, consumed = res
            _dispatch.COUNTS["pallas"] += 1
        rest = ops[consumed:]
        if rest:
            _dispatch.COUNTS["xla"] += 1

            def chain(x):
                for fn, _, _ in rest:
                    x = fn(x)
                return x

            sharding = _auto_shard_sharding(data)
            if sharding is not None:
                # -define tpu:mesh= auto-sharding: the image lives
                # spatially sharded over the mesh and XLA GSPMD inserts
                # the halo/reduction collectives every op needs — the
                # general tera-pixel execution story (the explicit-halo
                # ops in parallel/spatial.py are the hand-tuned forms)
                data = jax.device_put(data, sharding)
                _dispatch.COUNTS["gspmd"] = \
                    _dispatch.COUNTS.get("gspmd", 0) + 1
            data = jax.jit(chain)(data)
        spec = self.image.spec
        for _, upd, _ in ops:
            if upd is not None:
                spec = upd(spec)
        out = Image(data, spec, self.image.properties, self.image.profiles,
                    self.image.page, self.image.delay)
        self.image = out
        self.pending = []
        self._shape = None
        return out


class CLIState:
    def __init__(self):
        self.images: List[LazyImage] = []
        self.stack: List[List[LazyImage]] = []
        self.settings_stack: List[Dict[str, str]] = []
        self.settings: Dict[str, str] = {
            "background": "white",
            "fill": "black",
            "gravity": "undefined",
            "filter": "undefined",
            "quality": "92",
            "virtual-pixel": "edge",
            "bordercolor": "#dfdfdf",
            "mattecolor": "#bdbdbd",
            "colorspace-setting": "",
            "interpolate": "bilinear",
            "channel": "default",
            "noise-attenuate": "1.0",
        }
        self.defines: Dict[str, str] = {}
        self.size: Optional[str] = None
        self.depth: Optional[int] = None
        self.exit_code = 0

    # -- helpers --
    def require_images(self, opt):
        if not self.images:
            raise CLIError(f"no images for option {opt}")

    def each(self, fn):
        self.require_images("op")
        for li in self.images:
            fn(li)

    def bg(self):
        return parse_color(self.settings["background"])

    def fill(self):
        return parse_color(self.settings["fill"])


def _geom_args(arg: str) -> Tuple[float, float]:
    """Parse 'AxB' op arguments like -blur 0x2 -> (radius, sigma)."""
    g = parse_geometry(arg)
    radius = g.width if g.width is not None else 0.0
    sigma = g.height if g.height is not None else 1.0
    return radius, sigma


# ---------------------------------------------------------------------------
# Option implementations.  Each handler: (state, arg, plus_form) -> None.
# n_args mirrors option.c's CommandOptions[] arg counts.
# ---------------------------------------------------------------------------

def _op_resize(st, arg, plus, op="resize"):
    """Resize stays LAZY: output dims are static, so the op joins the
    pending chain and the whole pipeline compiles as one XLA program.

    Alpha-free resize/scale (and thumbnail without its pre-sample stage)
    are pure separable-linear maps, tagged for the fused Pallas kernel
    (ops/dispatch.py)."""
    from ..ops import resize as rz
    from ..ops.resize import _default_filter

    filt = st.settings["filter"]
    for li in st.images:
        alpha = li.spec.alpha
        cw, ch = li.width, li.height
        w, h, _, _ = parse_meta_geometry(arg, cw, ch)
        tag = None
        if op == "adaptive-resize":
            # resize.c:1331 — mesh-interpolated lookup, not a filter resize
            fn = lambda x, h=h, w=w: rz.interpolative_resize(x, h, w, "mesh")
        elif op == "resize":
            fn = lambda x, h=h, w=w: rz.resize(x, h, w, filt, has_alpha=alpha)
            # alpha images tag too: dispatch runtime-probes full opacity,
            # where premultiplied sampling == straight sampling exactly
            rf = filt if filt not in ("undefined", "", None) else \
                _default_filter(ch, cw, h, w, alpha)
            tag = ("resize", (h, w, rf))
        elif op == "scale":
            fn = lambda x, h=h, w=w: rz.scale(x, h, w)
            tag = ("resize", (h, w, "box"))
        elif op == "sample":
            fn = lambda x, h=h, w=w: rz.sample(x, h, w)
        elif op == "thumbnail":
            # resize.c:3692: the final filter defaults to LanczosSharp
            tf_ = filt if filt not in ("undefined", "", None) else \
                "lanczossharp"
            fn = lambda x, h=h, w=w, f=tf_: rz.thumbnail(
                x, h, w, has_alpha=alpha, filter_name=f)
            if not alpha and not ((cw // w) > 2 and (ch // h) > 2):
                tag = ("resize", (h, w, tf_))
        li.push(fn, new_shape=(h, w), tag=tag)


def _pixel_round(x: float) -> int:
    """PixelRoundOffset (transform.c:780): round-half-away via floor/ceil
    distance compare."""
    import math

    return int(math.floor(x)) if (x - math.floor(x)) < (math.ceil(x) - x) \
        else int(math.ceil(x))


def _crop_tiles(arg, cw, ch, gravity):
    """CropImageToTiles (transform.c:790) geometry resolution: returns a
    list of (x, y, w, h) crop rects — one for offset crops, a full tiling
    for offset-less WxH, an NxM split for the '@' form."""
    from ..ops.composite import gravity_offset

    has_xy = bool(re.search(r"[-+][\d.]", arg))
    at_form = "@" in arg
    w, h, x, y = parse_page_geometry(arg.replace("@", "").replace("!", ""),
                                     cw, ch)
    if at_form:
        nx, ny = max(w, 1) if w else 1, max(h, 1) if h else 1
        # NxM tiles: delta stepping with PixelRoundOffset boundaries
        dx = max(cw / nx, 1.0)
        dy = max(ch / ny, 1.0)
        tiles = []
        oy = 0.0
        while oy < ch:
            ty = _pixel_round(oy)
            oy += dy
            th = _pixel_round(oy) - ty
            ox = 0.0
            while ox < cw:
                tx = _pixel_round(ox)
                ox += dx
                tw = _pixel_round(ox) - tx
                tiles.append((tx, ty, tw, th))
        return tiles
    if (w == 0 and h == 0) or has_xy:
        gx, gy = gravity_offset(gravity, cw, ch, w, h, x, y)
        return [(gx, gy, w, h)]
    if cw > w or ch > h:
        w = w or cw
        h = h or ch
        return [(tx, ty, min(w, cw - tx), min(h, ch - ty))
                for ty in range(0, ch, h) for tx in range(0, cw, w)]
    return [(0, 0, min(w, cw), min(h, ch))]


def _op_geometry_slice(st, arg, plus, op):
    """Geometry slices stay LAZY (static output shapes) except trim,
    whose bounding box is data-dependent (host readback required)."""
    from ..ops import transform as tf

    gravity = st.settings.get("gravity", "northwest")

    if op == "crop":
        # CropImageToTiles (transform.c:790): offset-less geometry tiles
        # the image; '@' tiles into NxM pieces; offsets = one gravity-
        # adjusted region
        new_images = []
        for li in st.images:
            cw, ch = li.width, li.height
            tiles = _crop_tiles(arg, cw, ch, gravity)
            if len(tiles) == 1:
                x, y, w, h = tiles[0]
                li.push(lambda d, a=(x, y, w, h): tf.crop(d, *a),
                        new_shape=(h, w))
                new_images.append(li)
            else:
                img = li.materialize()
                for x, y, w, h in tiles:
                    new_images.append(LazyImage(img.replace(
                        data=tf.crop(img.data, x, y, w, h))))
        st.images = new_images
        return

    for li in st.images:
        cw, ch = li.width, li.height
        nch = li.image.channels
        if op == "chop":
            w, h, x, y = parse_page_geometry(arg, cw, ch)
            from ..ops.composite import gravity_offset

            x, y = gravity_offset(gravity, cw, ch, w, h, x, y)
            out_h = ch - (min(y + h, ch) - max(y, 0))
            out_w = cw - (min(x + w, cw) - max(x, 0))
            li.push(lambda d, a=(x, y, w, h): tf.chop(d, *a),
                    new_shape=(out_h, out_w))
        elif op == "extent":
            w, h, x, y = parse_page_geometry(arg, cw, ch)
            from ..ops.composite import gravity_offset

            gx, gy = gravity_offset(st.settings["gravity"], w, h,
                                    cw, ch, -x, -y)
            bgc = st.bg()[:nch]
            li.push(lambda d, a=(-gx, -gy, w, h), b=bgc:
                    tf.extent(d, *a, background=b), new_shape=(h, w))
        elif op == "shave":
            g = parse_geometry(arg)
            sx = int(g.width or 0)
            sy = int(g.height or g.width or 0)
            li.push(lambda d, a=(sx, sy): tf.shave(d, *a),
                    new_shape=(max(ch - 2 * sy, 1), max(cw - 2 * sx, 1)))
        elif op == "splice":
            w, h, x, y = parse_page_geometry(arg, cw, ch)
            bgc = st.bg()[:nch]
            li.push(lambda d, a=(x, y, w, h), b=bgc:
                    tf.splice(d, *a, background=b),
                    new_shape=(ch + h, cw + w))
        elif op == "roll":
            g = parse_geometry(arg, offsets_first=True)
            li.push(lambda d, a=(g.x or 0, g.y or 0): tf.roll(d, *a))
        elif op == "trim":
            img = li.materialize()
            li.image = img.replace(data=tf.trim(img.data))


def _lazy_op(st, make_fn, spec_update=None, tag=None):
    st.require_images("op")
    for li in st.images:
        c = li.image.spec  # spec BEFORE this op (approximation: specs only
        # change via spec_update chains, tracked per-op)
        li.push(make_fn(li), spec_update, tag=tag)


_CHANNEL_LETTERS = {"r": 0, "g": 1, "b": 2, "c": 0, "m": 1, "y": 2,
                    "k": 3, "a": -1, "o": -1}


def _channel_indices(setting: str, nch: int):
    """Parse a -channel setting ('RGB', 'Red,Green', 'All', ...) to indices."""
    s = (setting or "default").strip().lower()
    if s in ("default", "all", "sync", ""):
        return None  # apply to everything
    idx = set()
    for name in re.split(r"[,|\s]+", s):
        name = name.strip()
        if not name:
            continue
        if name in ("red", "green", "blue", "cyan", "magenta", "yellow",
                    "black", "alpha", "opacity", "gray"):
            i = _CHANNEL_LETTERS[name[0]]
        elif all(ch in _CHANNEL_LETTERS for ch in name):
            for ch in name:
                i = _CHANNEL_LETTERS[ch]
                idx.add(nch - 1 if i == -1 else i)
            continue
        else:
            continue
        idx.add(nch - 1 if i == -1 else i)
    return sorted(i for i in idx if i < nch) or None


def _op_simple(module: str, fname: str, argmap, tag_fn=None):
    """Build a lazy per-pixel/neighborhood op handler (honors -channel).

    ``tag_fn(st, arg, plus)`` may return a dispatch tag (ops/dispatch.py)
    when the op instance is expressible by the fused Pallas kernel."""

    def handler(st, arg, plus):
        import importlib

        mod = importlib.import_module(f"imagemagick_tpu.ops.{module}")
        fn = getattr(mod, fname)
        kwargs_builder = argmap
        channel_setting = st.settings.get("channel", "default")
        any_mask = any(li.image.properties.get("wand:mask") is not None
                       for li in st.images)
        tag = None
        if tag_fn is not None and not plus and not any_mask and \
                _channel_indices(channel_setting, 4) is None:
            tag = tag_fn(st, arg, plus)

        def make(li):
            kwargs = kwargs_builder(st, arg, plus) if kwargs_builder else {}
            wmask = li.image.properties.get("wand:mask")

            def run(x):
                out = fn(x, **kwargs)
                if out.shape == x.shape:
                    import jax.numpy as jnp

                    sel = _channel_indices(channel_setting, x.shape[-1])
                    if sel is not None:
                        mask = jnp.zeros((x.shape[-1],), bool).at[
                            jnp.asarray(sel)].set(True)
                        out = jnp.where(mask, out, x)
                    if wmask is not None and \
                            wmask.shape[:2] == x.shape[-3:-1]:
                        # write mask (-region/-write-mask): pixels outside
                        # the mask keep their prior values
                        m = jnp.asarray(wmask)[..., None]
                        out = jnp.where(m > 0.5, out, x)
                return out

            return run

        _lazy_op(st, make, tag=tag)

    return handler


def _op_colorspace(st, arg, plus):
    """-colorspace stays LAZY (data math is per-pixel, spec update queued);
    sRGB->gray is a linear luma mix, tagged for fused-kernel dispatch."""
    from ..ops import colorspace as cs

    target = normalize_colorspace(arg)
    for li in st.images:
        src = li.spec.colorspace
        if src == target:
            continue
        nc = li.spec.color_channels
        import jax.numpy as jnp

        def fn(x, src=src, tgt=target, nc=nc):
            color = cs.convert(x[..., :nc], src, tgt)
            rest = x[..., nc:]
            return jnp.concatenate([color, rest], axis=-1) \
                if rest.shape[-1] else color

        tag = None
        if src == "srgb" and target == "gray" and nc == 3:
            luma = tuple(cs.REC709_LUMA)
            if li.spec.alpha:
                # gray+alpha: luma row with zero alpha weight + identity
                # alpha row (commutes with unpremultiplication)
                tag = ("mix", (luma + (0.0,), (0.0, 0.0, 0.0, 1.0)))
            else:
                tag = ("mix", (luma,))
        li.push(fn, spec_update=lambda s, t=target: s.with_(colorspace=t),
                tag=tag)


def _op_grayscale(st, arg, plus):
    from ..ops import colorspace as cs
    from ..ops import enhance as en

    for li in st.images:
        method = arg or "rec709luma"

        def fn(x, m=method):
            return en.grayscale(x, m)

        tag = None
        lumas = {"rec709luma": cs.REC709_LUMA, "rec601luma": cs.REC601_LUMA}
        if method.lower() in lumas and li.spec.color_channels == 3:
            luma = tuple(lumas[method.lower()])
            # en.grayscale drops alpha: single luma row either way
            tag = ("mix", (luma + (0.0,),)) \
                if li.spec.alpha else ("mix", (luma,))
        li.push(fn, spec_update=lambda s: s.with_(colorspace="gray"),
                tag=tag)


def _op_separate(st, arg, plus):
    # SeparateImages (channel.c): one gray image per channel in the
    # -channel mask ("-channel R -separate" yields exactly one image)
    from ..ops import channel as chan

    channel_setting = st.settings.get("channel", "default")
    new_images = []
    for li in st.images:
        img = li.materialize()
        comps = chan.separate_all(img.data)
        sel = _channel_indices(channel_setting, img.data.shape[-1])
        if sel is not None:
            comps = [comps[i] for i in sel]
        gspec = img.spec.with_(colorspace="gray", alpha=False)
        for comp in comps:
            new_images.append(LazyImage(Image(comp, gspec)))
    st.images = new_images


def _op_combine(st, arg, plus):
    from ..ops import channel as chan

    imgs = [li.materialize() for li in st.images]
    data = chan.combine([im.data for im in imgs])
    cs_name = "srgb" if data.shape[-1] >= 3 else "gray"
    alpha = data.shape[-1] in (2, 4)
    st.images = [LazyImage(Image(data, imgs[0].spec.with_(
        colorspace=cs_name, alpha=alpha)))]


def _op_alpha(st, arg, plus):
    from ..ops import channel as chan

    for li in st.images:
        img = li.materialize()
        data = chan.set_alpha(img.data, arg, img.spec.alpha,
                              background=st.bg()[:3])
        alpha = arg.lower() in ("set", "on", "activate", "opaque", "copy", "transparent")
        if arg.lower() in ("off", "deactivate", "remove", "flatten"):
            alpha = False
        if arg.lower() == "extract":
            li.image = Image(data, ImageSpec(colorspace="gray"))
        else:
            li.image = Image(data, img.spec.with_(alpha=alpha), img.properties,
                             img.profiles, img.page, img.delay)


def _op_rotate(st, arg, plus):
    from ..ops import distort as dt

    deg = float(arg.rstrip("<>"))
    for li in st.images:
        img = li.materialize()
        li.image = img.replace(data=dt.rotate(img.data, deg,
                                              background=st.bg()[: img.channels]))


def _op_noise(st, arg, plus):
    from ..ops import visual_effects as vfx
    import jax

    if plus:  # +noise TYPE = add noise
        att = float(st.settings.get("noise-attenuate", "1.0"))

        def handler_make(li):
            def run(x):
                return vfx.add_noise(x, arg, attenuate=att,
                                     key=jax.random.PRNGKey(int(time.time_ns()) % (2 ** 31)))

            return run

        _lazy_op(st, handler_make)
    else:  # -noise RADIUS = median-ish reduce
        from ..ops import statistic as stx

        r = int(float(arg))

        def handler_make(li):
            def run(x):
                return stx.statistic(x, "nonpeak", 2 * r + 1, 2 * r + 1)

            return run

        _lazy_op(st, handler_make)


def _op_morphology(st, arg, plus):
    from ..ops import morphology as mo

    parts = arg.split(None, 1)
    if len(parts) == 1 and " " not in arg:
        raise CLIError("-morphology needs 'method kernel'")
    method = parts[0]
    kernel = parts[1] if len(parts) > 1 else "square:1"
    iters = 1
    if ":" in method:
        method, _, it = method.partition(":")
        iters = int(it)

    def make(li):
        def run(x):
            return mo.morphology(x, method, kernel, iterations=iters,
                                 virtual_pixel=st.settings["virtual-pixel"])

        return run

    _lazy_op(st, make)


def _op_composite_list(st, arg, plus):
    """-composite list operator: images[0] = dst, images[1] = src (+ mask)."""
    from ..ops import composite as comp

    if len(st.images) < 2:
        raise CLIError("-composite needs at least two images")
    dst = st.images[0].materialize()
    src = st.images[1].materialize()
    op = st.settings.get("compose", "over")
    g = st.settings.get("compose-geometry")
    x = y = 0
    if g:
        gg = parse_geometry(g)
        x, y = gg.x or 0, gg.y or 0
    cargs = ()
    art = st.defines.get("compose:args")
    if art:
        cargs = tuple(float(v) for v in re.findall(
            r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?", art))
    out = comp.composite_at(dst.data, src.data, op, x, y,
                            st.settings["gravity"],
                            dst_alpha=dst.spec.alpha, src_alpha=src.spec.alpha,
                            args=cargs)
    alpha = out.shape[-1] > dst.spec.color_channels
    st.images = [LazyImage(Image(out, dst.spec.with_(alpha=alpha),
                                 dst.properties, dst.profiles))]


def _op_append(st, arg, plus):
    # AppendImages (image.c:379): -append = top-to-bottom, +append =
    # left-to-right; background fill + gravity cross-axis placement
    from ..ops import layer as ly

    imgs = [li.materialize() for li in st.images]
    out = ly.append(imgs, stack=not plus, background=st.bg(),
                    gravity=st.settings.get("gravity", "northwest"))
    st.images = [LazyImage(out)]


def _op_flatten(st, arg, plus):
    # MergeImageLayers FlattenLayer (layer.c:2010): background-color
    # canvas sized to the first frame, every frame composited at its
    # page offsets.
    from ..ops import layer as ly

    imgs = [li.materialize() for li in st.images]
    st.images = [LazyImage(ly.flatten(imgs, background=st.bg()))]


def _op_border(st, arg, plus):
    from ..ops import transform as tf

    g = parse_geometry(arg)
    bw = int(g.width or 0)
    bh = int(g.height if g.height is not None else bw)
    # BorderImage fills with the -bordercolor setting (default #dfdfdf,
    # image-private.h:33), not -background
    bc = parse_color(st.settings.get("bordercolor", "#dfdfdf"))
    for li in st.images:
        img = li.materialize()
        data = tf.extent(img.data, -bw, -bh, img.width + 2 * bw,
                         img.height + 2 * bh,
                         background=bc[: img.channels])
        li.image = img.replace(data=data)


def _op_fft(st, arg, plus):
    from ..ops import fourier as ft

    new_images = []
    for li in st.images:
        img = li.materialize()
        mag, ph = ft.forward_fft(img.data, modulus=not plus)
        new_images.append(LazyImage(Image(mag, img.spec)))
        new_images.append(LazyImage(Image(ph, img.spec)))
    st.images = new_images


def _op_ift(st, arg, plus):
    from ..ops import fourier as ft

    if len(st.images) < 2:
        raise CLIError("-ift needs a magnitude/phase image pair")
    mag = st.images[0].materialize()
    ph = st.images[1].materialize()
    data = ft.inverse_fft(mag.data, ph.data, modulus=not plus)
    st.images = [LazyImage(Image(data, mag.spec))]


def _op_evaluate(st, arg, plus):
    from ..ops import statistic as stx

    # StringToDoubleInterval(arg, QuantumRange+1): raw numbers are quantum
    # counts, percents are fractions of 65536 (operation.c:2356)
    parts = arg.split(None, 1)
    op = parts[0]
    if len(parts) > 1 and parts[1].strip().endswith("%"):
        val = float(parts[1].strip()[:-1]) * 65536.0 / 100.0
    else:
        val = float(parts[1]) if len(parts) > 1 else 0.0

    def make(li):
        def run(x):
            return stx.evaluate(x, op, val)

        return run

    _lazy_op(st, make)


def _op_function(st, arg, plus):
    from ..ops import statistic as stx

    parts = arg.split(None, 1)
    fname = parts[0]
    params = [float(p) for p in parts[1].replace(",", " ").split()] if len(parts) > 1 else []

    def make(li):
        def run(x):
            return stx.function(x, fname, params)

        return run

    _lazy_op(st, make)


def _parse_level_arg(arg):
    # "black,white,gamma" with % support: "10%,90%,1.5"
    parts = [p.strip() for p in arg.replace(",", " ").split()]
    def pv(p):
        return float(p[:-1]) / 100.0 if p.endswith("%") else float(p)
    black = pv(parts[0]) if parts else 0.0
    white = pv(parts[1]) if len(parts) > 1 else 1.0
    gamma = pv(parts[2]) if len(parts) > 2 else 1.0
    return black, white, gamma


# handler table: name -> (n_args, handler)
def _build_ops() -> Dict[str, Tuple[int, Callable]]:
    from functools import partial

    O: Dict[str, Tuple[int, Callable]] = {}

    # --- resize family ---
    O["resize"] = (1, partial(_op_resize, op="resize"))
    O["adaptive-resize"] = (1, partial(_op_resize, op="adaptive-resize"))
    O["scale"] = (1, partial(_op_resize, op="scale"))
    O["sample"] = (1, partial(_op_resize, op="sample"))
    O["thumbnail"] = (1, partial(_op_resize, op="thumbnail"))
    O["magnify"] = (0, _op_simple("resize", "magnify", None))

    # --- geometry ---
    for name in ("crop", "chop", "extent", "shave", "splice", "roll"):
        O[name] = (1, partial(_op_geometry_slice, op=name))
    O["trim"] = (0, partial(_op_geometry_slice, op="trim"))
    O["flip"] = (0, _op_simple("transform", "flip", None))
    O["flop"] = (0, _op_simple("transform", "flop", None))
    O["transpose"] = (0, _op_simple("transform", "transpose", None))
    O["transverse"] = (0, _op_simple("transform", "transverse", None))
    O["rotate"] = (1, _op_rotate)
    O["border"] = (1, _op_border)

    # --- blurs/convolutions ---
    def _rs_vp(st, a, p):
        kw = dict(zip(("radius", "sigma"), _geom_args(a)))
        kw["virtual_pixel"] = st.settings["virtual-pixel"]
        return kw

    def _tag_gblur(rule):
        """Dispatch tag for -blur/-gaussian-blur: separable gaussian with
        edge-replicate pads is exactly what the fused kernel's band
        matrices encode (fused_pipeline.blur_band_matrix)."""

        def tag(st, a, p):
            r, s = _geom_args(a)
            if s <= 0 or st.settings["virtual-pixel"] != "edge":
                return None
            return ("gblur", (float(r), float(s), rule))

        return tag

    O["blur"] = (1, _op_simple("blur", "blur", _rs_vp, _tag_gblur("1d")))
    O["gaussian-blur"] = (1, _op_simple("blur", "gaussian_blur", _rs_vp,
                                        _tag_gblur("2d")))
    O["sharpen"] = (1, _op_simple("blur", "sharpen", _rs_vp))
    O["unsharp"] = (1, _op_simple("blur", "unsharp_mask",
        lambda st, a, p: _unsharp_args(a)))
    O["adaptive-blur"] = (1, _op_simple("blur", "adaptive_blur",
        lambda st, a, p: dict(zip(("radius", "sigma"), _geom_args(a)))))
    O["adaptive-sharpen"] = (1, _op_simple("blur", "adaptive_sharpen",
        lambda st, a, p: dict(zip(("radius", "sigma"), _geom_args(a)))))
    O["motion-blur"] = (1, _op_simple("blur", "motion_blur",
        lambda st, a, p: _motion_args(a)))
    O["rotational-blur"] = (1, _op_simple("blur", "rotational_blur",
        lambda st, a, p: {"angle": float(a)}))
    O["bilateral-blur"] = (1, _op_simple("blur", "bilateral_blur",
        lambda st, a, p: _bilateral_args(a)))
    # operation.c:2634 — sigma defaults to rho-0.5 when absent
    O["kuwahara"] = (1, _op_simple("blur", "kuwahara",
        lambda st, a, p: _kuwahara_args(a)))
    O["despeckle"] = (0, _op_simple("blur", "despeckle", None))
    O["edge"] = (1, _op_simple("blur", "edge_image",
        lambda st, a, p: {"radius": _geom_args(a)[0]}))
    O["emboss"] = (1, _op_simple("blur", "emboss",
        lambda st, a, p: dict(zip(("radius", "sigma"), _geom_args(a)))))
    O["shade"] = (1, _op_simple("blur", "shade",
        lambda st, a, p: _shade_args(a)))
    O["sketch"] = (1, _op_simple("visual_effects", "sketch",
        lambda st, a, p: dict(_motion_args(a),
                              has_alpha=bool(st.images
                                             and st.images[0].spec.alpha))))
    O["charcoal"] = (1, _op_simple("visual_effects", "charcoal",
        lambda st, a, p: dict(zip(("radius", "sigma"), _geom_args(a)))))
    O["spread"] = (1, _op_simple("blur", "spread",
        lambda st, a, p: {"radius": float(a)}))
    O["morphology"] = (2, _op_morphology)
    O["statistic"] = (2, lambda st, a, p: _op_statistic(st, a, p))
    O["median"] = (1, _op_simple("statistic", "statistic",
        lambda st, a, p: {"stat": "median", "width": 2 * int(float(a)) + 1,
                          "height": 2 * int(float(a)) + 1}))
    # operation.c:3690 — % scales BOTH rho (threshold) and sigma (softness)
    O["wavelet-denoise"] = (1, _op_simple("visual_effects", "wavelet_denoise",
        lambda st, a, p: _wavelet_args(a)))

    # --- color/levels ---
    O["colorspace"] = (1, _op_colorspace)
    O["grayscale"] = (1, _op_grayscale)
    O["negate"] = (0, _op_simple("enhance", "negate",
        lambda st, a, p: {"grayscale_only": p}))
    # operation.c:2479 StringToDouble stops at the comma — "2.2,1,0.8"
    # applies 2.2 to all channels
    O["gamma"] = (1, _op_simple("enhance", "gamma",
        lambda st, a, p: {"value": float(re.match(
            r"[-+]?[\d.]*(?:[eE][-+]?\d+)?", a.strip()).group() or 0)}))
    O["level"] = (1, _op_simple("enhance", "level",
        lambda st, a, p: dict(zip(("black_point", "white_point", "gamma_"),
                                  _parse_level_arg(a)))))
    O["auto-level"] = (0, _op_simple("enhance", "auto_level", None))
    O["auto-gamma"] = (0, _op_simple("enhance", "auto_gamma", None))
    O["normalize"] = (0, _op_simple("enhance", "normalize", None))
    O["equalize"] = (0, _op_simple("enhance", "equalize", None))
    O["contrast-stretch"] = (1, _op_simple("enhance", "contrast_stretch",
        lambda st, a, p: _stretch_args(a)))
    O["linear-stretch"] = (1, _op_simple("enhance", "linear_stretch",
        lambda st, a, p: _stretch_args(a)))
    O["sigmoidal-contrast"] = (1, _op_simple("enhance", "sigmoidal_contrast",
        lambda st, a, p: _sigmoidal_args(a, not p)))
    O["brightness-contrast"] = (1, _op_simple("enhance", "brightness_contrast",
        lambda st, a, p: _bc_args(a)))
    O["modulate"] = (1, _op_simple("enhance", "modulate",
        lambda st, a, p: _modulate_args(a)))
    # operation.c:2006 — WxH{%} tile size, +bins, +clip-limit (psi float).
    # Host-sequential (integer clip/redistribute), so runs eagerly.
    def _op_clahe(st, a, p):
        from ..ops import enhance as en

        g = parse_geometry(a)
        _, _, _, psi, _, _ = _geometry_info(a)
        bins = int(g.x) if g.x else 128
        clip = psi if psi is not None else 3.0
        tw_ = g.width or 0
        th_ = g.height or 0
        for li in st.images:
            img = li.materialize()
            # ParseRegionGeometry (operation.c:2011): the tile size goes
            # through META geometry semantics — "2x2" on 92x60 fits the
            # aspect ratio and yields 2x1 tiles, not 2x2
            tw2, th2, _, _ = parse_meta_geometry(a, li.width, li.height)
            li.image = img.replace(data=en.clahe_reference(
                img.data, tw2, th2, bins, clip))

    O["clahe"] = (1, _op_clahe)
    O["white-balance"] = (0, _op_simple("enhance", "white_balance", None))
    O["enhance"] = (0, _op_simple("enhance", "enhance", None))
    O["sepia-tone"] = (1, _op_simple("visual_effects", "sepia_tone",
        lambda st, a, p: {"threshold": _percent(a)}))
    O["solarize"] = (1, _op_simple("visual_effects", "solarize",
        lambda st, a, p: {"threshold": _percent(a)}))
    O["blue-shift"] = (1, _op_simple("visual_effects", "blue_shift",
        lambda st, a, p: {"factor": float(a)}))
    def _op_tint(st, a, p):
        g = parse_geometry(a)
        rho = g.width if g.width is not None else 100.0
        blend = (rho,
                 g.height if g.height is not None else rho,
                 float(g.x) if g.x is not None else rho)
        _lazy_op(st, lambda li: (
            lambda x: __import__("imagemagick_tpu.ops.visual_effects",
                                 fromlist=["tint"]).tint(
                                     x, st.fill()[:3], blend)))

    O["tint"] = (1, _op_tint)
    def _op_vignette(st, a, p):
        from ..ops import visual_effects as vfx

        r, s_ = _geom_args(a)
        g = parse_geometry(a)
        bg = st.bg()[:3]
        for li in st.images:
            w_, h_ = li.width, li.height
            vx = float(g.x) if g.x is not None else 0.1 * w_
            vy = float(g.y) if g.y is not None else 0.1 * h_
            if g.percent:
                vx *= w_ / 100.0
                vy *= h_ / 100.0
            # operation.c:3671 rounds the offsets to ssize_t
            vx = math.ceil(vx - 0.5)
            vy = math.ceil(vy - 0.5)
            li.push(lambda d, a_=(r, s_, vx, vy), b=bg:
                    vfx.vignette(d, *a_, background=b))

    O["vignette"] = (1, _op_vignette)
    O["implode"] = (1, _op_simple("distort", "implode",
        lambda st, a, p: {"amount": float(a)}))
    O["swirl"] = (1, _op_simple("distort", "swirl",
        lambda st, a, p: {"degrees": float(a)}))
    O["wave"] = (1, _op_simple("distort", "wave",
        lambda st, a, p: dict(zip(("amplitude", "wavelength", "background"),
                                  (*_geom_args(a), st.bg()[:3])))))
    O["posterize"] = (1, lambda st, a, p: _op_posterize(st, a, p))
    O["kmeans"] = (1, lambda st, a, p: _op_kmeans(st, a, p))
    O["colors"] = (1, lambda st, a, p: _op_colors(st, a, p))

    # --- thresholds ---
    O["threshold"] = (1, _op_simple("threshold", "bilevel",
        lambda st, a, p: {"threshold": _percent(a)}))
    O["black-threshold"] = (1, _op_simple("threshold", "black_threshold",
        lambda st, a, p: {"threshold": _percent(a)}))
    O["white-threshold"] = (1, _op_simple("threshold", "white_threshold",
        lambda st, a, p: {"threshold": _percent(a)}))
    O["auto-threshold"] = (1, lambda st, a, p: _op_auto_threshold(st, a, p))
    O["ordered-dither"] = (1, _op_simple("threshold", "ordered_dither",
        lambda st, a, p: _dither_args(a)))
    O["random-threshold"] = (1, _op_simple("threshold", "random_threshold",
        lambda st, a, p: _random_thresh_args(a)))
    O["lat"] = (1, _op_simple("threshold", "adaptive_threshold",
        lambda st, a, p: _lat_args(a)))
    O["clamp"] = (0, _op_simple("threshold", "clamp", None))

    # --- misc ---
    O["noise"] = (1, _op_noise)
    O["paint"] = (1, _op_simple("paint", "oil_paint",
        lambda st, a, p: {"radius": max(_geom_args(a)[0], 1.0)}))
    O["oil-paint"] = O["paint"]
    O["evaluate"] = (2, _op_evaluate)
    O["function"] = (2, _op_function)
    O["fft"] = (0, _op_fft)
    O["ift"] = (0, _op_ift)
    O["separate"] = (0, _op_separate)
    O["combine"] = (0, _op_combine)
    O["alpha"] = (1, _op_alpha)
    O["channel-fx"] = (1, lambda st, a, p: _op_channel_fx(st, a, p))
    O["opaque"] = (1, lambda st, a, p: _op_opaque(st, a, p))
    O["transparent"] = (1, lambda st, a, p: _op_transparent(st, a, p))
    O["distort"] = (2, lambda st, a, p: _op_distort(st, a, p))
    O["sparse-color"] = (2, lambda st, a, p: _op_sparse_color(st, a, p))
    O["liquid-rescale"] = (1, lambda st, a, p: _op_liquid(st, a, p))
    O["deskew"] = (1, lambda st, a, p: _op_deskew(st, a, p))
    O["shear"] = (1, lambda st, a, p: _op_shear(st, a, p))

    # --- analysis / expression ops ---
    O["fx"] = (1, lambda st, a, p: _op_fx(st, a, p))
    O["canny"] = (1, _op_simple("feature", "canny_edge",
        lambda st, a, p: _canny_args(a)))
    O["mean-shift"] = (1, _op_simple("feature", "mean_shift",
        lambda st, a, p: _meanshift_args(a)))
    O["connected-components"] = (1, lambda st, a, p: _op_ccl(st, a, p))
    O["segment"] = (1, lambda st, a, p: _op_segment(st, a, p))
    O["hough-lines"] = (1, lambda st, a, p: _op_hough(st, a, p))

    O["preview"] = (1, lambda st, a, p: _op_preview(st, a, p))
    O["unique-colors"] = (0, lambda st, a, p: _op_unique_colors(st, a, p))
    O["map"] = (1, lambda st, a, p: _op_map(st, a, p))
    O["orient"] = (1, lambda st, a, p: _op_orient(st, a, p))
    O["auto-orient"] = (0, lambda st, a, p: _op_auto_orient(st, a, p))
    O["type"] = (1, lambda st, a, p: _op_type(st, a, p))
    O["evaluate-sequence"] = (1, lambda st, a, p: _op_eval_seq(st, a, p))
    O["average"] = (0, lambda st, a, p: _op_eval_seq(st, "mean", p))

    # --- drawing / decoration ---
    O["draw"] = (1, lambda st, a, p: _op_draw(st, a, p))
    O["annotate"] = (2, lambda st, a, p: _op_annotate(st, a, p))
    O["frame"] = (1, lambda st, a, p: _op_frame(st, a, p))
    O["raise"] = (1, lambda st, a, p: _op_raise(st, a, not p))

    # --- round-2 additions (option.c:620 coverage) ---
    O["layers"] = (1, _op_layers)
    O["hald-clut"] = (0, _op_hald_clut)
    O["clut"] = (0, _op_clut)
    O["polaroid"] = (1, _op_polaroid)
    O["shadow"] = ("?", _op_shadow)
    O["stegano"] = (1, _op_stegano)
    O["stereo"] = (1, _op_stereo)
    O["encipher"] = (1, partial(_op_encipher, decipher=False))
    O["decipher"] = (1, partial(_op_encipher, decipher=True))
    O["complex"] = (1, _op_complex)
    O["poly"] = (1, _op_poly)
    O["compare"] = (0, _op_compare_list)
    O["colorize"] = (1, _op_colorize)
    O["color-matrix"] = (1, _op_color_matrix)
    O["recolor"] = O["color-matrix"]
    O["contrast"] = (0, _op_contrast)
    O["local-contrast"] = (1, _op_simple("enhance", "local_contrast",
        lambda st, a, p: dict(zip(("radius", "strength"), _geom_args(a)))))
    O["range-threshold"] = (1, _op_range_threshold)
    O["perceptible"] = (1, _op_simple("threshold", "perceptible",
        lambda st, a, p: {"epsilon": float(a)}))
    O["cdl"] = (1, _op_cdl)
    O["remap"] = (1, lambda st, a, p: _op_map(st, a, p))
    O["affinity"] = O["remap"]   # deprecated v6 alias
    O["resample"] = (1, _op_resample)
    O["interpolative-resize"] = (1, _op_interpolative_resize)
    O["monochrome"] = (0, _op_monochrome)
    O["gaussian"] = O["gaussian-blur"]
    O["levelize"] = (1, _op_simple("enhance", "levelize",
        lambda st, a, p: dict(zip(("black_point", "white_point", "gamma_"),
                                  _parse_level_arg(a)))))
    O["level-colors"] = (1, _op_level_colors)
    O["profile"] = (1, _op_profile)
    O["features"] = (1, _op_features)
    O["moments"] = (0, _op_moments)
    O["transform"] = (0, _op_transform)
    O["matte"] = (0, lambda st, a, p: _op_alpha(st, "off" if p else "set", False))
    O["noop"] = (0, lambda st, a, p: None)

    def _op_convolve(st, a, p):
        vals = [float(v) for v in a.replace(",", " ").split()]
        n = int(round(len(vals) ** 0.5))
        if n * n != len(vals):
            raise CLIError("-convolve needs a square kernel")
        kern = np.asarray(vals, np.float32).reshape(n, n)
        vp = st.settings["virtual-pixel"]
        for li in st.images:
            li.push(lambda x, k=kern, v=vp: __import__(
                "imagemagick_tpu.ops.morphology",
                fromlist=["convolve_kernel"]).convolve_kernel(
                    x, k, normalize=True, virtual_pixel=v))

    O["convolve"] = (1, _op_convolve)

    # --- option.c tail (round 2, second batch) ---
    O["selective-blur"] = (1, _op_simple("blur", "selective_blur",
        lambda st, a, p: _selective_args(a)))
    O["color-threshold"] = (1, _op_color_threshold)
    O["floodfill"] = (2, _op_floodfill)
    O["integral"] = (0, lambda st, a, p: _lazy_op(st, lambda li: (
        lambda x: _integral_image(x))))
    O["maximum"] = (0, lambda st, a, p: _op_eval_seq(st, "max", p))
    O["minimum"] = (0, lambda st, a, p: _op_eval_seq(st, "min", p))
    O["morph"] = (1, _op_morph)
    O["sort-pixels"] = (0, _op_sort_pixels)
    O["clip-mask"] = (1, _op_clip_mask)
    O["read-mask"] = (1, _op_clip_mask)
    O["write-mask"] = (1, _op_clip_mask)
    O["mask"] = (1, _op_clip_mask)
    O["clip"] = (0, _op_clip)
    O["clip-path"] = (1, _op_clip)
    O["process"] = (1, _op_process_module)

    def _op_cycle(st, a, p):
        """-cycle: colormap rotate; on DirectClass data this is a modular
        intensity shift (the reference quantizes first, colormap.c)."""
        amount = float(a) / 256.0
        import jax.numpy as jnp

        for li in st.images:
            li.push(lambda x, d=amount: jnp.mod(x + d, 1.0))

    O["cycle"] = (1, _op_cycle)

    # --- list ops ---
    O["append"] = (0, _op_append)
    O["composite"] = (0, _op_composite_list)
    O["flatten"] = (0, _op_flatten)
    O["mosaic"] = (0, _op_mosaic)
    O["coalesce"] = (0, _op_coalesce)
    O["duplicate"] = (1, lambda st, a, p: _op_duplicate(st, a, p))
    O["insert"] = (1, lambda st, a, p: _op_insert(st, a, p))
    O["smush"] = (1, lambda st, a, p: _op_smush(st, a, p))
    O["deconstruct"] = (0, _op_deconstruct)
    O["montage"] = (0, _op_montage)

    return O


def _op_auto_orient(st, arg, plus):
    from ..ops import transform as tf

    for li in st.images:
        img = li.materialize()
        o = int(img.properties.get("exif:Orientation", 1))
        li.image = img.replace(data=tf.auto_orient(img.data, o))
        li.image.properties["exif:Orientation"] = 1


def _op_preview(st, arg, plus):
    """-preview TYPE: grid of parameter variations (PreviewImage, effect.c)."""
    from ..ops import montage as mo
    from ..ops import enhance as en
    from ..ops import blur as bl

    t = arg.lower()
    variants = []
    for li in st.images[:1]:
        img = li.materialize()
        for k in range(9):
            f = (k + 1) / 3.0
            if t == "gamma":
                data = en.gamma(img.data, 0.3 + 0.3 * k)
            elif t == "blur":
                data = bl.blur(img.data, 0.0, 0.2 + 0.4 * k)
            elif t == "brightness":
                data = en.brightness_contrast(img.data, -40 + 10 * k, 0)
            elif t == "saturation":
                data = en.modulate(img.data, 100, 40 + 15 * k, 100)
            elif t == "hue":
                data = en.modulate(img.data, 100, 100, 60 + 10 * k)
            else:
                data = en.gamma(img.data, 0.3 + 0.3 * k)
            variants.append(Image(data, img.spec))
    st.images = [LazyImage(mo.montage(variants, tile="3x3",
                                      geometry="120x120+2+2"))]


def _op_unique_colors(st, arg, plus):
    from ..ops import histogram as hg
    import jax.numpy as jnp

    for li in st.images:
        img = li.materialize()
        colors, _ = hg.unique_colors(img.data)
        li.image = Image(jnp.asarray(colors.reshape(1, -1, colors.shape[-1])),
                         img.spec)


def _op_map(st, arg, plus):
    """-remap/-map: RemapImage — dithers by default with Riemersma like
    the reference; native octree path for exact cache/local-search
    semantics, device nearest-palette fallback."""
    import numpy as np

    import jax.numpy as jnp

    from .. import io as iio_map
    from .. import native
    from ..ops import quantize as qz

    pal_img = iio_map.read_images(arg)[0]
    pal = pal_img.data.reshape(-1, pal_img.channels)
    meth = st.settings.get("dither", "riemersma").lower()
    dither = {"none": "none", "false": "none", "": "none",
              "floydsteinberg": "fs", "fs": "fs"}.get(meth, "riemersma")
    for li in st.images:
        img = li.materialize()
        arr = np.asarray(img.data, np.float32)
        res = None
        if arr.ndim == 3:
            res = native.octree_remap(arr, np.asarray(pal, np.float32),
                                      dither)
        if res is not None:
            li.image = img.replace(data=jnp.asarray(res))
        else:
            li.image = img.replace(
                data=qz.remap(img.data, pal[:, : img.channels],
                              dither != "none"))


def _op_type(st, arg, plus):
    from ..ops import attribute as at

    t = arg.lower()
    for li in st.images:
        img = li.materialize()
        data = at.set_image_type(img.data, t, img.spec.alpha)
        spec = img.spec
        if t.startswith(("bilevel", "grayscale")):
            spec = spec.with_(colorspace="gray")
        elif data.shape[-1] >= 3 and spec.color_channels == 1:
            spec = spec.with_(colorspace="srgb")
        li.image = Image(data, spec, img.properties, img.profiles)


def _normalize_list_channels(imgs):
    """Promote a mixed image list to a common layout (gray→RGB when any
    member is color, opaque alpha added when any member carries alpha) so
    sequence reductions can stack them; returns (datas, spec)."""
    import jax.numpy as jnp

    any_color = any(im.spec.color_channels >= 3 for im in imgs)
    any_alpha = any(im.spec.alpha for im in imgs)
    datas = []
    for im in imgs:
        d = im.data
        a = d[..., -1:] if im.spec.alpha else None
        col = d[..., :-1] if im.spec.alpha else d
        if any_color and col.shape[-1] == 1:
            col = jnp.repeat(col, 3, -1)
        if any_alpha:
            if a is None:
                a = jnp.ones(col.shape[:-1] + (1,), col.dtype)
            col = jnp.concatenate([col, a], -1)
        datas.append(col)
    spec = imgs[0].spec.with_(alpha=any_alpha)
    if any_color and spec.colorspace == "gray":
        spec = spec.with_(colorspace="srgb")
    return datas, spec


def _op_eval_seq(st, arg, plus):
    import jax.numpy as jnp
    from ..ops import statistic as stx

    imgs = [li.materialize() for li in st.images]
    datas, spec = _normalize_list_channels(imgs)
    stack = jnp.stack(datas)
    st.images = [LazyImage(Image(stx.evaluate_images(stack, arg), spec))]


def _op_orient(st, arg, plus):
    from ..ops import transform as tf

    names = {"topleft": 1, "topright": 2, "bottomright": 3, "bottomleft": 4,
             "lefttop": 5, "righttop": 6, "rightbottom": 7, "leftbottom": 8}
    o = names.get(arg.lower().replace("-", ""), 1)
    for li in st.images:
        img = li.materialize()
        li.image = img.replace(data=tf.auto_orient(img.data, o))


def _op_draw(st, arg, plus):
    from ..ops import draw as dw

    prelude = []
    fill = st.settings.get("fill", "black")
    stroke = st.settings.get("stroke")
    swidth = st.settings.get("strokewidth")
    psize = st.settings.get("pointsize")
    font = st.settings.get("font")
    prelude.append(f"fill '{fill}'")
    if stroke:
        prelude.append(f"stroke '{stroke}'")
    if swidth:
        prelude.append(f"stroke-width {swidth}")
    if psize:
        prelude.append(f"font-size {psize}")
    if font:
        prelude.append(f"font '{font}'")
    mvg = " ".join(prelude) + " " + arg
    for li in st.images:
        img = li.materialize()
        li.image = img.replace(data=dw.draw(
            img.data, mvg, img.spec.alpha,
            fuzz=_percent(st.settings.get("fuzz", "0") or "0")))


def _op_annotate(st, arg, plus):
    from ..ops import draw as dw

    geom, _, text = arg.partition(" ")
    g = parse_geometry(geom)
    for li in st.images:
        img = li.materialize()
        li.image = img.replace(data=dw.annotate(
            img.data, text.strip("'\""), g.x or 0, g.y or 0,
            color=st.fill(),
            size=float(st.settings.get("pointsize", "12")),
            font=st.settings.get("font"),
            gravity=st.settings["gravity"],
            direction=st.settings.get("direction")))


def _op_frame(st, arg, plus):
    from ..ops import decorate as dec

    g = parse_geometry(arg)
    for li in st.images:
        img = li.materialize()
        mc = parse_color(st.settings.get("mattecolor", "#bdbdbd"))
        li.image = img.replace(data=dec.frame(
            img.data, int(g.width or 6), int(g.height or g.width or 6),
            outer_bevel=abs(g.x) if g.x is not None else 2,
            inner_bevel=abs(g.y) if g.y is not None else 2,
            matte_color=mc))


def _op_raise(st, arg, raised):
    from ..ops import decorate as dec

    g = parse_geometry(arg)
    for li in st.images:
        img = li.materialize()
        li.image = img.replace(data=dec.raise_image(
            img.data, int(g.width or 6), int(g.height or g.width or 6), raised))


def _op_mosaic(st, arg, plus):
    from ..ops import layer as ly

    imgs = [li.materialize() for li in st.images]
    st.images = [LazyImage(ly.mosaic(imgs, background=st.bg()))]


def _op_duplicate(st, arg, plus):
    n = int(arg) if arg and arg.lstrip("+-").isdigit() else 1
    last = st.images[-1]
    for _ in range(n):
        st.images.append(LazyImage(last.materialize()))


def _op_insert(st, arg, plus):
    idx = int(arg)
    img = st.images.pop()
    st.images.insert(idx if idx >= 0 else len(st.images) + idx + 1, img)


def _op_smush(st, arg, plus):
    # SmushImages (image.c:3706): -smush stacks vertically, +smush
    # horizontally; offset = minimum seam distance (may be negative)
    from ..ops import layer as ly

    offset = int(float(arg)) if arg else 0
    imgs = [li.materialize() for li in st.images]
    out = ly.smush(imgs, stack=not plus, offset=offset,
                   background=st.bg(),
                   gravity=st.settings.get("gravity", "northwest"))
    st.images = [LazyImage(out)]


def _op_coalesce(st, arg, plus):
    from ..ops import layer as ly

    imgs = [li.materialize() for li in st.images]
    st.images = [LazyImage(im) for im in ly.coalesce(imgs)]


def _op_deconstruct(st, arg, plus):
    from ..ops import layer as ly

    imgs = [li.materialize() for li in st.images]
    st.images = [LazyImage(im) for im in ly.deconstruct(imgs)]


def _op_montage(st, arg, plus):
    from ..ops import montage as mo

    imgs = [li.materialize() for li in st.images]
    geom = st.settings.get("compose-geometry") or "120x120+4+3"
    st.images = [LazyImage(mo.montage(imgs, tile=st.settings.get("tile", ""),
                                      geometry=geom))]


def _percent(a: str) -> float:
    a = a.strip()
    if a.endswith("%"):
        return float(a[:-1]) / 100.0
    v = float(a)
    return v if v <= 1.0 else v / 100.0 if v <= 100.0 else v / 65535.0


_GEOMINFO_RE = re.compile(
    r"^\s*(?P<rho>[-+]?[\d.]+(?:[eE][-+]?\d+)?)?"
    r"(?:[x,:](?P<sigma>[-+]?[\d.]+(?:[eE][-+]?\d+)?))?"
    r"(?P<xi>[-+][\d.]+(?:[eE][-+]?\d+)?)?"
    r"(?P<psi>[-+][\d.]+(?:[eE][-+]?\d+)?)?"
    r"(?P<chi>[-+][\d.]+(?:[eE][-+]?\d+)?)?"
    r"\s*(?P<percent>%)?\s*$")


def _geometry_info(a):
    """ParseGeometry (geometry.c) float semantics: RHOxSIGMA+XI+PSI+CHI,
    all doubles — unlike the pixel-geometry parser, offsets keep their
    fractional part.  Returns (rho, sigma, xi, psi, chi, percent) with
    None for absent fields."""
    m = _GEOMINFO_RE.match(a.replace("%", "") + ("%" if "%" in a else ""))
    if not m:
        return None, None, None, None, None, False
    f = lambda s: float(s) if s is not None else None
    return (f(m.group("rho")), f(m.group("sigma")), f(m.group("xi")),
            f(m.group("psi")), f(m.group("chi")), m.group("percent") is not None)


def _unsharp_args(a):
    # operation.c:3625 — xi=gain (default 1.0), psi=threshold (default
    # 0.05, a raw fraction of QuantumRange — NOT a percentage)
    rho, sigma, xi, psi, _, _ = _geometry_info(a)
    return {"radius": rho or 0.0,
            "sigma": sigma if sigma is not None else 1.0,
            "gain": xi if xi is not None else 1.0,
            "threshold": psi if psi is not None else 0.05}


def _motion_args(a):
    g = parse_geometry(a)
    return {"radius": g.width or 0.0, "sigma": g.height if g.height is not None else 1.0,
            "angle": float(g.x or 0)}


def _bilateral_args(a):
    # operation.c:1849-1864: rho=width, sigma=height (defaults to rho),
    # xi=intensity sigma (default sqrt(w²+h²)), psi=spatial (default xi/4)
    g = parse_geometry(a)
    w = int(g.width or 5)
    h = int(g.height if g.height is not None else w)
    kw = {"width": w, "height": h}
    if g.x is not None:
        kw["intensity_sigma"] = float(g.x)
    if g.y is not None:
        kw["spatial_sigma"] = float(g.y)
    return kw


def _shade_args(a):
    g = parse_geometry(a)
    return {"azimuth": g.width or 30.0,
            "elevation": g.height if g.height is not None else 30.0}


def _stretch_args(a):
    parts = [p for p in a.replace(",", "x").split("x") if p]
    bp = _percent(parts[0]) if parts else 0.0
    wp = _percent(parts[1]) if len(parts) > 1 else None
    return {"black_point": bp, "white_point": wp}


def _sigmoidal_args(a, sharpen):
    parts = [p for p in a.replace(",", "x").split("x") if p]
    contrast = float(parts[0]) if parts else 3.0
    mid = _percent(parts[1]) if len(parts) > 1 else 0.5
    return {"sharpen": sharpen, "contrast": contrast, "midpoint": mid}


def _bc_args(a):
    parts = [p for p in a.replace(",", "x").split("x") if p]
    return {"brightness": float(parts[0]) if parts else 0.0,
            "contrast": float(parts[1]) if len(parts) > 1 else 0.0}


def _modulate_args(a):
    parts = [p for p in a.replace(",", " ").replace("/", " ").split() if p]
    return {"brightness": float(parts[0]) if parts else 100.0,
            "saturation": float(parts[1]) if len(parts) > 1 else 100.0,
            "hue": float(parts[2]) if len(parts) > 2 else 100.0}


def _dither_args(a):
    name, _, lv = a.partition(",")
    return {"map_name": name, "levels": int(lv) if lv else 2}


def _random_thresh_args(a):
    parts = [p for p in a.replace(",", "x").split("x") if p]
    return {"low": _percent(parts[0]) if parts else 0.0,
            "high": _percent(parts[1]) if len(parts) > 1 else 1.0}


def _lat_args(a):
    g = parse_geometry(a)
    return {"width": int(g.width or 3), "height": int(g.height or g.width or 3),
            "bias": (float(g.x) / 100.0) if g.x is not None else 0.0}


def _op_statistic(st, arg, plus):
    from ..ops import statistic as stx

    parts = arg.split(None, 1)
    stat = parts[0]
    g = parse_geometry(parts[1]) if len(parts) > 1 else None
    w = int(g.width or 3) if g else 3
    h = int(g.height or w) if g else 3

    def make(li):
        def run(x):
            return stx.statistic(x, stat, w, h)

        return run

    _lazy_op(st, make)


def _op_posterize(st, arg, plus):
    """PosterizeImage: dithers by default with the Riemersma method like
    the reference (quantize.c:2236 -> RemapImage with RiemersmaDither);
    +dither / -dither none disables, -dither ordered keeps the o8x8
    threshold-map variant.  Host-sequential, so runs eagerly."""
    from ..ops import quantize as qz

    levels = int(arg)
    meth = st.settings.get("dither", "riemersma").lower()
    dither = {"none": False, "false": False, "": False,
              "ordered": "ordered", "floydsteinberg": "floydsteinberg",
              "fs": "floydsteinberg"}.get(meth, True)
    for li in st.images:
        img = li.materialize()
        li.image = img.replace(data=qz.posterize(img.data, levels, dither))


def _op_colors(st, arg, plus):
    """-colors: the reference octree quantizer (quantize.c QuantizeImage)
    via native/riemersma.cpp rz_quantize — classify/reduce/assign with
    the default Riemersma dither (+dither disables, -dither selects).
    Falls back to device k-means when the native toolchain is absent."""
    import numpy as np

    import jax.numpy as jnp

    from .. import native
    from ..ops import quantize as qz

    n = int(arg.split()[0])
    meth = st.settings.get("dither", "riemersma").lower()
    dither = {"none": "none", "false": "none", "": "none",
              "floydsteinberg": "fs", "fs": "fs"}.get(meth, "riemersma")
    # quantize.c QuantizeImage: quantize_info->colorspace (the -quantize
    # setting) transforms the pixels into that space for the octree
    # classify/assign, then back to sRGB
    qspace = normalize_colorspace(st.settings.get("quantize", "")) \
        if st.settings.get("quantize") else None
    for li in st.images:
        img = li.materialize()
        nc = img.spec.color_channels
        data = img.data[..., :nc] if img.spec.alpha else img.data
        src_cs = img.spec.colorspace
        if qspace and qspace != src_cs:
            from ..ops import colorspace as cs_ops

            data = cs_ops.convert(data[..., :3], src_cs, qspace)
        arr = np.asarray(data, np.float32)
        res = None
        if arr.ndim == 3 and arr.shape[-1] == 3:
            res = native.octree_quantize(arr, n, dither)
        if res is None:
            out = qz.kmeans_quantize(jnp.asarray(arr), n)
        else:
            out = jnp.asarray(res[0])
        if qspace and qspace != src_cs:
            from ..ops import colorspace as cs_ops

            out = cs_ops.convert(out, qspace, src_cs)
        if img.spec.alpha:
            out = jnp.concatenate([out, img.data[..., -1:]], -1)
        li.image = img.replace(data=out)


def _op_kmeans(st, arg, plus):
    # operation.c:2618-2632: rho=colors, sigma=max iterations (default
    # 300), xi=tolerance (default 0.0001); no dithering
    from ..ops import quantize as qz

    g = parse_geometry(arg)
    n = int(g.width or 8)
    iters = int(g.height) if g.height is not None else 300
    tol = float(g.x) if g.x is not None else 0.0001
    for li in st.images:
        img = li.materialize()
        li.image = img.replace(data=qz.kmeans_reference(
            img.data, n, max_iters=iters, tolerance=tol))


def _op_auto_threshold(st, arg, plus):
    from ..ops import threshold as th

    for li in st.images:
        img = li.materialize()
        data = th.auto_threshold(img.data, arg)
        li.image = Image(data, ImageSpec(colorspace="gray"), img.properties)


def _op_channel_fx(st, arg, plus):
    from ..ops import channel as chan

    for li in st.images:
        img = li.materialize()
        li.image = img.replace(data=chan.channel_fx(img.data, arg, img.spec.alpha))


def _op_opaque(st, arg, plus):
    from ..ops import paint as pt

    target = parse_color(arg)
    for li in st.images:
        img = li.materialize()
        li.image = img.replace(data=pt.opaque_paint(
            img.data, target[: img.channels], st.fill()[: img.channels],
            fuzz=_percent(st.settings.get("fuzz", "0") or "0"),
            invert=plus))


def _op_transparent(st, arg, plus):
    from ..ops import paint as pt

    target = parse_color(arg)
    for li in st.images:
        img = li.materialize()
        if not img.spec.alpha:
            img = img.set_alpha(True)
        li.image = img.replace(data=pt.transparent_paint(
            img.data, target[:3], 0.0,
            fuzz=_percent(st.settings.get("fuzz", "0") or "0"),
            invert=plus))


def _op_sparse_color(st, arg, plus):
    from ..ops import distort as dt

    parts = arg.split(None, 1)
    method = parts[0]
    toks = parts[1].replace(",", " ").split() if len(parts) > 1 else []
    pts = []
    i = 0
    while i + 2 < len(toks) + 1 and i + 2 <= len(toks):
        x, y = float(toks[i]), float(toks[i + 1])
        col = parse_color(toks[i + 2])
        pts.append((x, y, col))
        i += 3
    for li in st.images:
        img = li.materialize()
        li.image = img.replace(data=dt.sparse_color(img.data, method, pts))


def _op_liquid(st, arg, plus):
    from ..ops import distort as dt

    for li in st.images:
        img = li.materialize()
        w, h, _, _ = parse_meta_geometry(arg, img.width, img.height)
        li.image = img.replace(data=dt.liquid_rescale(img.data, w, h))


def _op_deskew(st, arg, plus):
    from ..ops import shear as sh

    thr = _percent(arg) if arg else 0.4
    for li in st.images:
        img = li.materialize()
        li.image = img.replace(data=sh.deskew(img.data, thr,
                                              background=st.bg()[: img.channels]))


def _op_shear(st, arg, plus):
    from ..ops import shear as sh

    g = parse_geometry(arg)
    xdeg = g.width or 0.0
    # operation.c:3430 — sigma defaults to rho when absent
    ydeg = g.height if g.height is not None else xdeg
    for li in st.images:
        img = li.materialize()
        li.image = img.replace(data=sh.shear(
            img.data, xdeg, ydeg,
            background=st.bg()[: img.channels]))


def _op_distort(st, arg, plus):
    from ..ops import distort as dt

    parts = arg.split(None, 1)
    method = parts[0]
    args = [float(x) for x in parts[1].replace(",", " ").split()] if len(parts) > 1 else []
    vp = st.settings.get("virtual-pixel", "edge").lower()
    for li in st.images:
        img = li.materialize()
        bg = None if vp in ("edge", "") else st.bg()[: img.channels]
        data = dt.distort(img.data, method, args, background=bg,
                          bestfit=bool(plus), vp=vp)
        if data.shape[-1] != img.channels:   # transparent vp adds alpha
            li.image = Image(data, img.spec.with_(alpha=True))
        else:
            li.image = img.replace(data=data)


def _canny_args(a):
    g = parse_geometry(a)
    kw = {"radius": g.width or 0.0, "sigma": g.height if g.height is not None else 1.0}
    if g.x is not None:
        kw["lower_percent"] = abs(g.x) / 100.0
    if g.y is not None:
        kw["upper_percent"] = abs(g.y) / 100.0
    return kw


def _wavelet_args(a):
    # operation.c:3695 scales rho AND sigma by QuantumRange/100 under %;
    # threshold is in quantum units (normalized here), softness is the raw
    # dimensionless multiplier from visual-effects.c:3717
    g = parse_geometry(a)
    thr = g.width if g.width is not None else 0.0
    soft = g.height if g.height is not None else 0.0
    if g.percent:
        thr /= 100.0
        soft *= 65535.0 / 100.0
    else:
        thr /= 65535.0
    return {"threshold": thr, "softness": soft}


def _kuwahara_args(a):
    g = parse_geometry(a)
    radius = g.width if g.width is not None else 0.0
    sigma = g.height if g.height is not None else radius - 0.5
    return {"radius": radius, "sigma": sigma}


def _meanshift_args(a):
    g = parse_geometry(a)
    kw = {"width": int(g.width or 7), "height": int(g.height or g.width or 7)}
    if g.x is not None:
        kw["color_distance"] = abs(g.x) / 100.0
    return kw


def _op_fx(st, arg, plus):
    from ..ops import fx as fxm

    imgs = [li.materialize() for li in st.images]
    data = fxm.fx([im.data for im in imgs], arg)
    st.images = [LazyImage(Image(data, imgs[0].spec, imgs[0].properties))]


def _op_ccl(st, arg, plus):
    from ..ops import vision as vi

    conn = int(arg) if arg and arg.strip().isdigit() else 4
    verbose = st.defines.get("connected-components:verbose", "") == "true"
    mean_color = st.defines.get("connected-components:mean-color",
                                "") == "true"
    area_thresh = st.defines.get("connected-components:area-threshold", "")
    import numpy as np

    import jax.numpy as jnp

    for li in st.images:
        img = li.materialize()
        labels = vi.connected_components(img.data, connectivity=conn,
                                         fuzz=float(st.settings.get("fuzz", "0")) / 100.0)
        seq = vi.relabel_sequential(labels)
        if area_thresh:
            seq = vi.merge_small_components(seq, int(float(area_thresh)),
                                            conn)
            seq = np.unique(seq, return_inverse=True)[1] \
                .reshape(seq.shape).astype(np.int32)
        if verbose:
            for s in vi.component_statistics(img.data, jnp.asarray(seq)):
                bx, by, bw, bh = s["bbox"]
                print(f"  {s['id']}: {bw}x{bh}+{bx}+{by} "
                      f"{s['centroid'][0]:.1f},{s['centroid'][1]:.1f} "
                      f"{s['area']} srgb{tuple(round(c, 3) for c in s['mean_color'])}")
        if mean_color:
            # replace each object with its mean color (vision.c:717)
            arr = np.asarray(img.data)
            flat = seq.reshape(-1)
            n = int(flat.max()) + 1
            cnt = np.bincount(flat, minlength=n).astype(np.float64)
            out = np.empty_like(arr)
            for c in range(arr.shape[-1]):
                s = np.bincount(flat, weights=arr[..., c].reshape(-1),
                                minlength=n)
                out[..., c] = (s / np.maximum(cnt, 1))[flat] \
                    .reshape(arr.shape[:-1])
            li.image = img.replace(data=jnp.asarray(out.astype(np.float32)))
        else:
            # default AcquireImageColormap gray ramp: value = id/65535
            # (Q16 MaxColormapSize identity — vision.c keeps label
            # indices; the colormap maps entry i to gray i/(2^16-1))
            norm = jnp.asarray(seq.astype(np.float32) / 65535.0)
            li.image = Image(norm[..., None], ImageSpec(colorspace="gray"))


def _op_segment(st, arg, plus):
    from ..ops import segment as sg

    parts = [p for p in arg.replace(",", "x").split("x") if p]
    ct = float(parts[0]) if parts else 1.0
    sm = float(parts[1]) if len(parts) > 1 else 1.5
    for li in st.images:
        img = li.materialize()
        li.image = img.replace(data=sg.segment(img.data, cluster_threshold=ct,
                                               smooth_threshold=sm))


def _op_hough(st, arg, plus):
    # HoughLineImage (feature.c:1840): detect lines in the accumulator
    # and RENDER them as MVG 'line' primitives on a background canvas
    import jax.numpy as jnp

    from ..ops import draw as dw
    from ..ops import feature as ft

    g = parse_geometry(arg)
    w = int(g.width or 5)
    h = int(g.height or w)
    thr = int(g.x or 0)
    for li in st.images:
        img = li.materialize()
        segs = ft.hough_line_segments(img.data, w, h, thr)
        ih, iw = img.height, img.width
        bgc = st.bg()[:3]
        canvas = jnp.broadcast_to(
            jnp.asarray(bgc, jnp.float32), (ih, iw, 3)).astype(jnp.float32)
        prelude = [f"fill '{st.settings.get('fill', 'black')}'"]
        if st.settings.get("stroke"):
            prelude.append(f"stroke '{st.settings['stroke']}'")
        if st.settings.get("strokewidth"):
            prelude.append(f"stroke-width {st.settings['strokewidth']}")
        mvg = " ".join(prelude) + " " + " ".join(
            f"line {x1:g},{y1:g} {x2:g},{y2:g}"
            for x1, y1, x2, y2, _, _, _ in segs)
        out = dw.draw(canvas, mvg, False) if segs else canvas
        li.image = Image(out, img.spec.with_(colorspace="srgb",
                                             alpha=False))


# ---------------------------------------------------------------------------
# Round-2 option surface expansion (option.c:620 CommandOptions order).
# ---------------------------------------------------------------------------

def _op_layers(st, arg, plus):
    """-layers METHOD (layer.c; OptimizeImageLayers et al.)."""
    from ..ops import layer as ly

    method = arg.lower().replace("_", "-")
    frames = [li.materialize() for li in st.images]
    fuzz = _percent(st.settings.get("fuzz", "0")) if st.settings.get("fuzz") else 0.0
    if method == "coalesce":
        out = ly.coalesce(frames)
    elif method in ("optimize", "optimize-frame", "optimize-image",
                    "optimize-plus"):
        out = ly.optimize_layers(frames, fuzz)
    elif method == "optimize-transparency":
        out = ly.optimize_transparency(frames, fuzz)
    elif method in ("remove-dups", "removedups"):
        out = ly.remove_duplicate_layers(frames, fuzz)
    elif method in ("remove-zero", "removezero"):
        out = ly.remove_zero_delay_layers(frames)
    elif method in ("compare-any", "compare-clear", "compare-overlay"):
        out = ly.deconstruct(frames, fuzz)
    elif method in ("flatten", "merge"):
        out = [ly.flatten(frames, background=st.bg())]
    elif method in ("mosaic", "trim-bounds"):
        out = [ly.mosaic(frames)]
    elif method == "dispose":
        out = ly.dispose_images(frames)
    elif method == "composite":
        # two stacks separated by a null: image (layer.c CompositeLayers)
        sep = next((i for i, im in enumerate(frames)
                    if im.properties.get("null-separator")), None)
        if sep is None:
            raise CLIError("-layers composite needs a null: separator "
                           "between the destination and source stacks")
        dst_stack, src_stack = frames[:sep], frames[sep + 1:]
        from ..ops.composite import composite_at

        compose = st.settings.get("compose", "over")
        out = []
        for i, dst_f in enumerate(dst_stack):
            s = src_stack[min(i, len(src_stack) - 1)]
            out.append(dst_f.replace(data=composite_at(
                dst_f.data, s.data, compose, 0, 0,
                st.settings.get("gravity", "undefined"),
                dst_alpha=dst_f.spec.alpha, src_alpha=s.spec.alpha)))
    else:
        raise CLIError(f"unknown -layers method {arg!r}")
    st.images = [LazyImage(im) for im in out]


def jnp_zeros_like(x):
    import jax.numpy as jnp

    return jnp.zeros_like(x)


def _op_hald_clut(st, arg, plus):
    """-hald-clut list op: last image is the Hald CLUT (enhance.c HaldClut)."""
    from ..ops import enhance as eh

    if len(st.images) < 2:
        raise CLIError("-hald-clut needs an image and a Hald CLUT image")
    hald = st.images.pop().materialize()
    for li in st.images:
        img = li.materialize()
        li.image = img.replace(data=eh.hald_clut(img.data, hald.data))


def _op_clut(st, arg, plus):
    from ..ops import enhance as eh

    if len(st.images) < 2:
        raise CLIError("-clut needs an image and a lookup image")
    lut = st.images.pop().materialize()
    method = st.settings.get("interpolate", "bilinear") or "bilinear"
    if method.lower() in ("undefined", ""):
        method = "bilinear"
    for li in st.images:
        img = li.materialize()
        out = eh.clut(img.data, lut.data, method=method,
                      lut_alpha=lut.spec.alpha, has_alpha=img.spec.alpha)
        spec = img.spec
        if lut.spec.alpha and not spec.alpha:
            # ClutImage tail: clut with alpha activates the channel
            import jax.numpy as jnp

            out = jnp.concatenate(
                [out, jnp.ones(out.shape[:-1] + (1,), out.dtype)], -1)
            spec = spec.with_(alpha=True)
        li.image = img.replace(data=out, spec=spec)


def _op_polaroid(st, arg, plus):
    from ..ops import visual_effects as vfx

    angle = 0.0 if plus or arg is None else float(arg)
    for li in st.images:
        img = li.materialize()
        out = vfx.polaroid(img.data, angle, background=st.bg()[:3])
        li.image = Image(out, img.spec.with_(alpha=True))


def _op_shadow(st, arg, plus):
    from ..ops import visual_effects as vfx

    g = parse_geometry(arg or "80x3+5+5")
    for li in st.images:
        img = li.materialize()
        data = img.data
        if not img.spec.alpha:
            import jax.numpy as jnp

            data = jnp.concatenate([data, jnp.ones_like(data[..., :1])], -1)
        out = vfx.shadow(data, g.width or 80.0, g.height or 3.0,
                         int(g.x or 5), int(g.y or 5), color=st.bg()[:3])
        li.image = Image(out, img.spec.with_(alpha=True))


def _op_stegano(st, arg, plus):
    from ..ops import visual_effects as vfx

    if len(st.images) < 2:
        raise CLIError("-stegano needs an image and a watermark")
    wm = st.images.pop().materialize()
    offset = int(arg or 0)
    for li in st.images:
        img = li.materialize()
        li.image = img.replace(data=vfx.stegano(img.data, wm.data, offset))


def _op_stereo(st, arg, plus):
    from ..ops import visual_effects as vfx

    if len(st.images) < 2:
        raise CLIError("-stereo needs two images")
    g = parse_geometry(arg or "+0+0", offsets_first=True)
    xo, yo = int(g.x or 0), int(g.y or 0)
    right = st.images.pop().materialize()
    left = st.images[-1].materialize()
    st.images[-1].image = left.replace(
        data=vfx.stereo(left.data, right.data, xo, yo))


def _read_passphrase(arg: str) -> str:
    import os

    if os.path.isfile(arg):
        with open(arg, "r") as f:
            return f.read()
    return arg


def _op_encipher(st, arg, plus, decipher=False):
    from ..utils.signature import decipher_image, encipher_image

    pp = _read_passphrase(arg)
    fn = decipher_image if decipher else encipher_image
    for li in st.images:
        img = li.materialize()
        li.image = img.replace(data=fn(img.data, pp, depth=img.spec.depth))


def _op_complex(st, arg, plus):
    """-complex OP over (real, imag) image pairs (fourier.c ComplexImages)."""
    from ..ops import fourier as ff

    if len(st.images) < 2:
        raise CLIError("-complex needs image pairs")
    op = arg.lower()
    imgs = [li.materialize() for li in st.images]
    a_r, a_i = imgs[0], imgs[1]
    b_r = imgs[2].data if len(imgs) > 2 else jnp_zeros_like(a_r.data)
    b_i = imgs[3].data if len(imgs) > 3 else jnp_zeros_like(a_i.data)
    out_r, out_i = ff.complex_images(a_r.data, a_i.data, b_r, b_i, op)
    st.images = [LazyImage(a_r.replace(data=out_r)),
                 LazyImage(a_i.replace(data=out_i))]


def _op_poly(st, arg, plus):
    """-poly "w1,e1 w2,e2 ..." (statistic.c PolynomialImage)."""
    from ..ops import statistic as stx

    terms = []
    for part in arg.replace(",", " ").split():
        terms.append(float(part))
    if len(terms) % 2:
        raise CLIError("-poly needs weight,exponent pairs")
    pairs = [(terms[j], terms[j + 1]) for j in range(0, len(terms), 2)]
    imgs = [li.materialize() for li in st.images]
    datas, spec = _normalize_list_channels(imgs)
    out = stx.polynomial_images(datas, pairs)
    st.images = [LazyImage(Image(out, spec, imgs[0].properties,
                                 imgs[0].profiles))]


def _op_compare_list(st, arg, plus):
    """-compare list op: difference visualization + distortion on stderr."""
    from ..ops import compare as cmx

    if len(st.images) < 2:
        raise CLIError("-compare needs two images")
    b = st.images.pop().materialize()
    a = st.images[-1].materialize()
    metric = st.settings.get("metric", "rmse")
    dist = float(cmx.get_distortion(a.data, b.data, metric))
    diff = cmx.compare_images(a.data, b.data, metric)[0]
    print(f"{dist:g}", file=sys.stderr)
    st.images[-1].image = a.replace(data=diff)


def _op_colorize(st, arg, plus):
    from ..ops import visual_effects as vfx

    parts = [float(p.rstrip("%")) / 100.0
             for p in arg.replace("/", ",").split(",")]
    if len(parts) == 1:
        parts = parts * 3
    import jax.numpy as jnp

    for li in st.images:
        img = li.materialize()
        amounts = jnp.asarray(parts[:img.spec.color_channels], jnp.float32)
        fill = st.fill()[:img.spec.color_channels]
        color = img.data[..., :img.spec.color_channels]
        out = color * (1 - amounts) + jnp.asarray(fill) * amounts
        if img.spec.alpha:
            out = jnp.concatenate([out, img.data[..., -1:]], -1)
        li.image = img.replace(data=out)


def _op_color_matrix(st, arg, plus):
    from ..ops import visual_effects as vfx

    vals = [float(v) for v in arg.replace(",", " ").split()]
    n = int(round(len(vals) ** 0.5))
    if n * n != len(vals):
        raise CLIError("-color-matrix needs a square matrix")
    mat = np.asarray(vals, np.float32).reshape(n, n)
    for li in st.images:
        li.push(lambda x, m=mat: __import__(
            "imagemagick_tpu.ops.visual_effects",
            fromlist=["color_matrix"]).color_matrix(x, m))


def _op_contrast(st, arg, plus):
    for li in st.images:
        li.push(lambda x, s=not plus: __import__(
            "imagemagick_tpu.ops.enhance",
            fromlist=["contrast"]).contrast(x, s))


def _op_range_threshold(st, arg, plus):
    from ..ops import threshold as th

    vals = [_percent(v) for v in arg.split(",")]
    while len(vals) < 4:
        vals.append(vals[-1])
    for li in st.images:
        li.push(lambda x, v=vals: th.range_threshold(x, *v[:4]))


def _op_cdl(st, arg, plus):
    """-cdl "slope,offset,power{:saturation}" ASC CDL (enhance.c)."""
    from ..ops import enhance as eh

    body, _, sat = arg.partition(":")
    nums = [float(v) for v in body.replace(",", " ").split()]
    if len(nums) == 3:
        slope, offset, power = ([nums[0]] * 3, [nums[1]] * 3, [nums[2]] * 3)
    elif len(nums) >= 9:
        slope, offset, power = nums[0:3], nums[3:6], nums[6:9]
    else:
        raise CLIError("-cdl needs 3 or 9 numbers")
    s = float(sat) if sat else 1.0
    for li in st.images:
        li.push(lambda x, a=slope, b=offset, c=power, d=s:
                eh.color_decision_list(x, tuple(a), tuple(b), tuple(c), d))


def _op_resample(st, arg, plus):
    """-resample XxY: resize by density ratio (resize.c ResampleImage)."""
    g = parse_geometry(arg)
    dx = g.width or 72.0
    dy = g.height or dx
    cur = st.settings.get("density", "72")
    cg = parse_geometry(cur)
    cdx, cdy = cg.width or 72.0, (cg.height or cg.width or 72.0)
    from ..ops import resize as rz

    for li in st.images:
        img = li.materialize()
        w = max(int(img.width * dx / cdx + 0.5), 1)
        h = max(int(img.height * dy / cdy + 0.5), 1)
        li.image = img.replace(data=rz.resize(
            img.data, h, w, st.settings.get("filter", "undefined")))


def _op_interpolative_resize(st, arg, plus):
    from ..ops import resize as rz

    for li in st.images:
        img = li.materialize()
        w, h, _, _ = parse_meta_geometry(arg, img.width, img.height)
        li.image = img.replace(data=rz.interpolative_resize(
            img.data, h, w, st.settings.get("interpolate", "bilinear")))


def _op_monochrome(st, arg, plus):
    """-monochrome: SetImageType(BilevelType) = gray + NormalizeImage +
    BilevelImage(QuantumRange/2) (attribute.c:2320-2330); the trailing
    2-color quantize is a no-op on an already-bilevel image."""
    from ..ops import colorspace as cs
    from ..ops import enhance as eh
    from ..ops import threshold as th

    for li in st.images:
        img = li.materialize()
        gray = cs.convert(img.data[..., :img.spec.color_channels],
                          img.spec.colorspace, "gray")
        gray = eh.normalize(gray)
        gray = th.bilevel(gray, 0.5)
        li.image = Image(gray, img.spec.with_(colorspace="gray",
                                              alpha=False))


def _op_level_colors(st, arg, plus):
    """-level-colors black,white: map the color range to full range."""
    import jax.numpy as jnp

    lo_s, _, hi_s = arg.partition(",")
    lo = np.asarray(parse_color(lo_s or "black")[:3], np.float32)
    hi = np.asarray(parse_color(hi_s or "white")[:3], np.float32)
    for li in st.images:
        def fn(x, lo=lo, hi=hi, inv=plus):
            c = x[..., :3]
            if inv:   # +level-colors: map full range INTO the colors
                out = lo + c * (hi - lo)
            else:
                # LevelPixel's scale is PerceptibleReciprocal(white-black):
                # sign-preserving — a REVERSED color range inverts the
                # channel (enhance.c:3244 per-channel LevelImage)
                diff = hi - lo
                scale = jnp.where(jnp.abs(diff) < 1e-12,
                                  jnp.sign(diff) * 1e12 + (diff == 0) * 1e12,
                                  1.0 / jnp.where(jnp.abs(diff) < 1e-12,
                                                  1.0, diff))
                out = (c - lo) * scale
            out = jnp.clip(out, 0.0, 1.0)
            return jnp.concatenate([out, x[..., 3:]], -1) if x.shape[-1] > 3 else out
        li.push(fn)


def _op_profile(st, arg, plus):
    from ..core import profile as prof

    if plus:  # +profile pattern: remove matching profiles
        import fnmatch

        for li in st.images:
            li.image.profiles = {
                k: v for k, v in li.image.profiles.items()
                if not fnmatch.fnmatch(k.lower(), arg.lower())}
        return
    with open(arg, "rb") as f:
        blob = f.read()
    for li in st.images:
        img = li.materialize()
        li.image = prof.profile_image(img, blob)


def _op_features(st, arg, plus):
    from ..ops import feature as ft

    dist = int(float(arg or 1))
    for li in st.images:
        img = li.materialize()
        feats = ft.glcm_features(img.data, offset=(0, dist))
        for k, v in feats.items():
            print(f"  {k}: {np.asarray(v).ravel()[:4]}")


def _op_moments(st, arg, plus):
    from ..ops import statistic as stx

    for li in st.images:
        img = li.materialize()
        mom = stx.get_moments(img.data)
        for k, v in mom.items():
            print(f"  {k}: {np.asarray(v).ravel()[:8]}")


def _op_transform(st, arg, plus):
    """-transform: apply the -affine matrix (AffineTransformImage)."""
    from ..ops import distort as dt

    aff = st.settings.get("affine", "1,0,0,1,0,0")
    vals = [float(v) for v in aff.replace(",", " ").split()]
    for li in st.images:
        img = li.materialize()
        li.image = img.replace(data=dt.affine_transform(img.data, vals))


def _selective_args(arg):
    g = parse_geometry(arg)
    kw = {"radius": g.width or 0.0, "sigma": g.height or 1.0}
    if g.x is not None:
        kw["threshold"] = (g.x or 10) / 100.0
    return kw


def _op_color_threshold(st, arg, plus):
    """-color-threshold start-stop (ColorThresholdImage)."""
    import jax.numpy as jnp

    start_s, _, stop_s = arg.partition("-")
    lo = np.asarray(parse_color(start_s or "black")[:3], np.float32)
    hi = np.asarray(parse_color(stop_s or "white")[:3], np.float32)
    for li in st.images:
        def fn(x, lo=lo, hi=hi):
            c = x[..., :3]
            inside = jnp.all((c >= lo) & (c <= hi), axis=-1, keepdims=True)
            return jnp.where(inside, 1.0, 0.0)
        li.push(fn, spec_update=lambda s: s.with_(colorspace="gray",
                                                  alpha=False))


def _op_floodfill(st, arg, plus):
    """-floodfill +X+Y color (FloodfillPaintImage, paint.c:112)."""
    from ..ops import paint as pt

    geom, _, color_s = arg.partition(" ")
    g = parse_geometry(geom)
    fill = st.fill()
    fuzz = _percent(st.settings.get("fuzz", "0") or "0")
    target = parse_color(color_s.strip()) if color_s.strip() else None
    for li in st.images:
        img = li.materialize()
        li.image = img.replace(data=pt.floodfill(
            img.data, int(g.x or 0), int(g.y or 0),
            fill[:img.channels], fuzz=fuzz,
            target_color=target))


def _integral_image(x):
    """-integral: summed-area table (IntegralImage, statistic.c)."""
    import jax.numpy as jnp

    return jnp.cumsum(jnp.cumsum(x, axis=-3), axis=-2)


def _op_morph(st, arg, plus):
    """-morph N: crossfade N intermediate frames (MorphImages, fx.c)."""
    import jax.numpy as jnp

    n = int(arg)
    frames = [li.materialize() for li in st.images]
    datas, spec = _normalize_list_channels(frames)
    out = []
    for k0, (a, b) in enumerate(zip(datas, datas[1:])):
        out.append(Image(a, spec))
        for k in range(1, n + 1):
            t = k / (n + 1)
            out.append(Image((1 - t) * a + t * b, spec))
    out.append(Image(datas[-1], spec))
    st.images = [LazyImage(im) for im in out]


def _op_sort_pixels(st, arg, plus):
    """-sort-pixels: sort scanline pixels by intensity (visual-effects.c)."""
    import jax.numpy as jnp

    for li in st.images:
        def fn(x):
            inten = jnp.mean(x[..., :3], axis=-1)
            order = jnp.argsort(inten.reshape(x.shape[:-3] + (-1,)), axis=-1)
            h, w, c = x.shape[-3:]
            flat = x.reshape(x.shape[:-3] + (h * w, c))
            out = jnp.take_along_axis(flat, order[..., None], axis=-2)
            return out.reshape(x.shape)
        li.push(fn)


def _op_clip(st, arg, plus):
    """-clip / -clip-path: activate the image's 8BIM clip path as its
    write mask (ClipImage / ClipImagePath, image.c).  +clip removes."""
    from ..io.coders_r4 import _clip_path_mask

    for li in st.images:
        img = li.materialize()
        if plus:
            img.properties.pop("wand:mask", None)
            continue
        m = _clip_path_mask(img)
        if m is None:
            raise CLIError("image does not have a clip mask")
        img.properties["wand:mask"] = m


def _op_clip_mask(st, arg, plus):
    """-mask/-clip-mask/-read-mask/-write-mask file (+form removes)."""
    if plus or arg in (None, ""):
        for li in st.images:
            li.image.properties.pop("wand:mask", None)
        return
    from .. import io as iio

    mask = iio.read_images(arg)[0]
    for li in st.images:
        li.image.properties["wand:mask"] = np.asarray(mask.data)


def _op_process_module(st, arg, plus):
    raise CLIError("no filter modules are registered (-process); module.c "
                   "dynamic loading is replaced by Python imports")


_SETTINGS = {
    "background", "fill", "gravity", "filter", "quality", "fuzz", "dither",
    "page", "tile", "texture-setting", "units", "weight", "style",
    "endian", "antialias", "transparent-color", "interlace",
    "colors-setting", "treedepth", "kerning", "direction",
    "virtual-pixel", "interpolate", "compose", "font", "pointsize",
    "bordercolor", "mattecolor", "stroke", "strokewidth", "density",
    "dispose", "delay", "loop", "channel", "intent", "interlace",
    "sampling-factor", "attenuate", "seed",
    # round 2: accepted + stored settings (option.c:620 table order)
    "affine", "authenticate", "blue-primary", "green-primary",
    "red-primary", "white-point", "undercolor", "box", "compress",
    "encoding", "family", "intensity", "metric", "mode", "path",
    "precision", "quantize", "scene", "stretch", "tile-offset", "title",
    "view", "render", "black-point-compensation", "highlight-color",
    "lowlight-color", "gravity-setting", "blend", "displace", "dissolve",
    "watermark", "modulate-setting", "remap-setting", "caption-setting",
    # option.c tail: text/bench/compare/montage/read settings + X11-era
    # options accepted for grammar compatibility
    "adjoin", "bias", "borderwidth", "cache", "caption",
    "dissimilarity-threshold", "similarity-threshold", "duration",
    "illuminant", "interline-spacing", "interword-spacing", "log",
    "scenes", "subimage", "subimage-search", "text-font", "word-break",
    "colormap", "reshape", "name", "sans", "sans1", "display",
}

# zero-argument flag options: accepted, recorded, no further effect needed
_FLAGS = {
    "quiet", "regard-warnings", "respect-parentheses", "respect-parenthesis",
    "synchronize", "taint", "ping", "antialias-flag", "render-flag",
    "concurrent", "flicker", "unique", "precision-flag", "sans0",
    # X11-era display/animate options: grammar-compatible no-ops
    "backdrop", "descend", "foreground", "iconic", "immutable", "remote",
    "screen", "shared-memory", "silent", "snaps", "update", "use-pixmap",
    "visual", "window", "window-group", "pause",
}

OPS = None


def _identify_text(img: Image, path: str, verbose=False) -> str:
    h, w = img.height, img.width
    fmt = path.rsplit(".", 1)[-1].upper() if "." in path else "MIFF"
    base = f"{path} {fmt} {w}x{h} {w}x{h}+0+0 {img.spec.depth}-bit {img.spec.colorspace}"
    if not verbose:
        return base
    from ..ops import statistic as stx

    stats = stx.get_statistics(img.data)
    lines = [base]
    for i in range(img.channels):
        lines.append(f"  channel {i}: min={float(stats['min'][i]):.4f} "
                     f"max={float(stats['max'][i]):.4f} "
                     f"mean={float(stats['mean'][i]):.4f} "
                     f"std={float(stats['std'][i]):.4f}")
    return "\n".join(lines)


def process(args: Sequence[str], st: Optional[CLIState] = None) -> CLIState:
    """ProcessCommandOptions analog: sequential option interpreter."""
    global OPS
    if OPS is None:
        OPS = _build_ops()
    from .. import io as iio

    if st is None:
        st = CLIState()
        _set_shard_mesh(None)   # sharding defines are per-invocation
    args = list(args)
    i = 0
    output_written = False
    while i < len(args):
        tok = args[i]
        i += 1
        if tok == "(":
            st.stack.append(st.images)
            st.images = []
            if st.settings.get("respect-parentheses") == "1" or \
                    st.settings.get("respect-parenthesis") == "1":
                st.settings_stack.append(dict(st.settings))
            continue
        if tok == ")":
            if not st.stack:
                raise CLIError("unbalanced parenthesis")
            parent = st.stack.pop()
            st.images = parent + st.images
            if st.settings_stack:
                st.settings = st.settings_stack.pop()
            continue
        if not tok.startswith(("-", "+")) or tok == "-":
            # image read (or implicit final write handled by caller)
            is_last = i == len(args)
            if is_last and st.images and _looks_like_output(tok):
                _write_output(st, tok)
                output_written = True
            else:
                frames = iio.read_images(
                    tok, size=st.size,
                    settings=dict(st.settings, defines=st.defines))
                extract = st.settings.pop("extract", None)
                if extract:
                    from ..ops import transform as tf3

                    cut = []
                    for im in frames:
                        w3, h3, x3, y3 = parse_page_geometry(
                            extract, im.width, im.height)
                        cut.append(im.replace(
                            data=tf3.excerpt(im.data, x3, y3, w3, h3)))
                    frames = cut
                for im in frames:
                    st.images.append(LazyImage(im))
            continue

        plus = tok.startswith("+")
        name = tok[1:]
        if name == "size":
            st.size = args[i]; i += 1
            continue
        if name == "read":
            # explicit read (magick-script style): same as a bare filename
            target = args[i]; i += 1
            for im in iio.read_images(
                    target, size=st.size,
                    settings=dict(st.settings, defines=st.defines)):
                st.images.append(LazyImage(im))
            continue
        if name == "script":
            # execute a magick script file: tokens (shell-style, with
            # comments) processed in the current state
            import shlex as _shlex

            path = args[i]; i += 1
            with open(path, "r", encoding="utf-8") as fh:
                text = fh.read()
            toks = _shlex.split(text, comments=True)
            args[i:i] = toks
            continue
        if name == "bench":
            # repeat the REMAINING pipeline N times, report throughput
            # (utilities/magick.c -bench)
            import sys as _sys
            import time as _time

            n = max(int(args[i]), 1); i += 1
            rest = args[i:]
            start = _time.time()
            for it in range(n - 1):
                sub = CLIState()
                sub.settings.update(st.settings)
                process(list(rest), sub)
            # final iteration continues in THIS state (falls through)
            if n > 1:
                elapsed = max(_time.time() - start, 1e-9)
                print(f"Performance: {n}i {(n - 1) / elapsed:.3f}ips "
                      f"{elapsed:.3f}u", file=_sys.stderr)
            continue
        if name == "extract":
            st.settings["extract"] = args[i]; i += 1
            continue
        if name == "texture":
            tex_path = args[i]; i += 1
            from .. import io as iio2

            tex = iio2.read_images(tex_path)[0]
            import jax.numpy as jnp

            for li in st.images:
                img = li.materialize()
                ry = -(-img.height // tex.height)
                rx = -(-img.width // tex.width)
                tiled = jnp.tile(tex.data, (ry, rx, 1))[:img.height, :img.width]
                li.image = Image(tiled[..., : img.channels], img.spec)
            continue
        if name == "region":
            # operation.c:3212: -region sets a WRITE mask on a gravity-
            # adjusted rect (ops update only masked pixels); +region clears
            if plus:
                for li in st.images:
                    li.image = li.materialize()
                    li.image.properties.pop("wand:mask", None)
                continue
            geom = args[i]; i += 1
            from ..ops.composite import gravity_offset

            for li in st.images:
                img = li.materialize()
                w2, h2, x2, y2 = parse_page_geometry(geom, li.width,
                                                     li.height)
                gx, gy = gravity_offset(st.settings.get("gravity",
                                                        "northwest"),
                                        li.width, li.height, w2, h2, x2, y2)
                m = np.zeros((li.height, li.width), np.float32)
                m[max(gy, 0):max(gy, 0) + h2,
                  max(gx, 0):max(gx, 0) + w2] = 1.0
                li.image = img
                img.properties["wand:mask"] = m
            continue
        if name == "depth":
            st.depth = int(args[i]); i += 1
            continue
        if name == "define":
            kv = args[i]; i += 1
            k, _, v = kv.partition("=")
            if plus:
                st.defines.pop(k, None)
            else:
                st.defines[k] = v
            if k == "tpu:mesh":
                _set_shard_mesh(None if plus else v,
                                st.defines.get("tpu:shard-threshold"))
            elif k == "tpu:shard-threshold" and "tpu:mesh" in st.defines:
                _set_shard_mesh(st.defines.get("tpu:mesh"),
                                None if plus else v)
            continue
        if name == "set":
            k, v = args[i], args[i + 1]; i += 2
            for li in st.images:
                li.image.properties[k.lstrip("-+")] = v
            continue
        if name == "geometry":
            st.settings["compose-geometry"] = args[i]; i += 1
            continue
        if name in _SETTINGS:
            if plus and name == "dither":
                st.settings[name] = "none"
                continue
            if plus and name in ("gravity", "compose"):
                st.settings[name] = "undefined" if name == "gravity" else "over"
            else:
                st.settings[name] = args[i]; i += 1
            continue
        if name == "write":
            target = args[i]; i += 1
            _write_output(st, target)
            continue
        if name == "identify":
            from ..io import identify as ident_mod

            verbose = st.settings.get("verbose") == "1"
            for li in st.images:
                print(ident_mod.describe(li.materialize(), "image", verbose))
            continue
        if name == "list":
            _list_main(args[i]); i += 1
            continue
        if name == "version":
            from .. import __version__

            print(f"Version: imagemagick_tpu {__version__} (tmagick, "
                  f"ImageMagick-compatible, JAX/TPU)")
            continue
        if name == "format":
            st.settings["format"] = args[i]; i += 1
            continue
        if name == "print":
            from ..core.properties import interpret

            fmt = args[i]; i += 1
            img = st.images[-1].materialize() if st.images else None
            print(interpret(fmt, img) if img is not None else fmt, end="")
            continue
        if name == "debug":
            from ..core.log import log

            log.set_log_event_mask(args[i]); i += 1
            continue
        if name == "monitor":
            continue  # progress display is a no-op under batch execution
        if name == "exit":
            break  # -exit: stop processing (magick-script idiom)
        if name == "sans2":   # 2-arg placeholder (option.c)
            i += 2
            continue
        if name == "copy":
            # -copy geometry offset: copy a region from the PREVIOUS image
            geom, off = args[i], args[i + 1]; i += 2
            if len(st.images) >= 2:
                src_img = st.images[-2].materialize()
                dst_img = st.images[-1].materialize()
                gg = parse_page_geometry(geom, src_img.width, src_img.height)
                og = parse_geometry(off)
                w4, h4, sx4, sy4 = gg
                dx4, dy4 = int(og.x or 0), int(og.y or 0)
                patch = src_img.data[sy4:sy4 + h4, sx4:sx4 + w4,
                                     :dst_img.channels]
                st.images[-1].image = dst_img.replace(
                    data=dst_img.data.at[dy4:dy4 + h4, dx4:dx4 + w4, :].set(
                        patch))
            continue
        if name in _FLAGS:
            st.settings[name] = "0" if plus else "1"
            continue
        if name == "distribute-cache":
            # DPC server (distribute-cache.c:939) is obsolete here: sharded
            # device arrays + XLA collectives replace remote pixel storage.
            print("tmagick: -distribute-cache is a no-op (spatially sharded "
                  "device arrays replace the distributed pixel cache)",
                  file=sys.stderr)
            i += 1  # consume the port argument
            continue
        if name == "limit":
            from ..core.resource import resources

            res, val = args[i], args[i + 1]; i += 2
            resources.set_limit(res, val)
            continue
        if name == "label":
            val = args[i]; i += 1
            for li in st.images:
                li.image.properties["label"] = val
            continue
        if name == "comment":
            val = args[i]; i += 1
            for li in st.images:
                li.image.properties["comment"] = val
            continue
        if name == "repage":
            # +repage resets the page; -repage GEOM follows ResetImagePage
            # (image.c:2171) field-by-field: only parsed components are
            # overwritten, omitted height defaults to width, '!' ADDS
            # offsets, and a positive offset onto a zero canvas sets the
            # canvas dim to image dim + offset.  Page layout: (x, y, w, h).
            if plus:
                for li in st.images:
                    li.image.page = None
                continue
            if i >= len(args):
                raise CLIError("option requires an argument `-repage'")
            geom = args[i]; i += 1
            gp = parse_geometry(geom, offsets_first=True)
            for li in st.images:
                im = li.image
                px, py, pw, ph = im.page if im.page else (0, 0, 0, 0)
                if gp.width is not None:
                    pw = int(gp.width)
                    ph = int(gp.height if gp.height is not None
                             else gp.width)
                if gp.exact:        # '!' add-offset form
                    if gp.x is not None:
                        px += int(gp.x)
                    if gp.y is not None:
                        py += int(gp.y)
                else:
                    if gp.x is not None:
                        px = int(gp.x)
                        if pw == 0 and px > 0:
                            pw = im.width + px
                    if gp.y is not None:
                        py = int(gp.y)
                        if ph == 0 and py > 0:
                            ph = im.height + py
                li.image.page = (px, py, pw, ph)
            continue
        if name == "verbose":
            st.settings["verbose"] = "1"
            continue
        if name == "strip":
            for li in st.images:
                li.image.properties.clear()
                li.image.profiles.clear()
            continue
        if name == "delete":
            # mogrify.c: comma list and ranges ("0,2", "1-3"); +delete
            # (no arg) drops the last image
            idx = "-1"
            if i < len(args) and re.match(r"^-?\d", args[i]):
                idx = args[i]
                i += 1
            sels = set()
            for part in idx.split(","):
                part = part.strip()
                if "-" in part[1:]:
                    lo, _, hi = part.rpartition("-")
                    rng = range(int(lo), int(hi) + 1)
                else:
                    rng = [int(part)]
                for s in rng:
                    sels.add(s if s >= 0 else len(st.images) + s)
            st.images = [im for k, im in enumerate(st.images)
                         if k not in sels]
            continue
        if name == "clone":
            # operation.c: +clone / bare -clone duplicate the last image;
            # -clone takes comma lists and ranges ("0-2", "-1")
            src = st.stack[-1] if st.stack else st.images
            spec = None
            if not plus and i < len(args) and re.match(r"^-?\d", args[i]):
                spec = args[i]; i += 1
            if spec is None:
                st.images.append(LazyImage(src[-1].materialize()))
                continue
            for part in spec.split(","):
                part = part.strip()
                if "-" in part[1:]:
                    lo, _, hi = part.rpartition("-")
                    rng = range(int(lo), int(hi) + 1)
                else:
                    rng = [int(part)]
                for s in rng:
                    st.images.append(LazyImage(src[s].materialize()))
            continue
        if name == "swap":
            spec = args[i] if i < len(args) else "-2,-1"
            if "," in spec or spec.lstrip("+-").isdigit():
                i += 1
            else:
                spec = "-2,-1"
            a, _, b = spec.partition(",")
            ia, ib = int(a), int(b or -1)
            st.images[ia], st.images[ib] = st.images[ib], st.images[ia]
            continue
        if name == "reverse":
            st.images.reverse()
            continue
        if name in OPS:
            n_args, handler = OPS[name]
            arg = None
            if n_args == "?":   # optional single arg (e.g. montage -shadow)
                if i < len(args) and not args[i].startswith(("-", "+")) \
                        and not _looks_like_output(args[i]):
                    arg = args[i]; i += 1
            elif n_args == 1:
                arg = args[i]; i += 1
            elif n_args == 2:
                arg = args[i] + " " + args[i + 1]; i += 2
            st.require_images("-" + name)
            handler(st, arg, plus)
            continue
        raise CLIError(f"unrecognized option {tok!r}")
    return st


def _list_main(what: str) -> None:
    """-list: enumerate registry contents (option.c MagickList analog)."""
    w = what.lower()
    if w == "format":
        from ..io import supported_read_formats, supported_write_formats

        reads = set(supported_read_formats())
        writes = set(supported_write_formats())
        for fmt in sorted(reads | writes):
            mode = ("r" if fmt in reads else "-") + ("w" if fmt in writes else "-")
            print(f"{fmt.upper():12s} {mode}")
    elif w == "colorspace":
        from ..ops.colorspace import supported_colorspaces

        print("\n".join(supported_colorspaces()))
    elif w == "filter":
        from ..ops.resize import supported_filters

        print("\n".join(supported_filters()))
    elif w == "metric":
        from ..ops.compare import _METRICS

        print("\n".join(sorted(_METRICS)))
    elif w == "color":
        from ..core.color import color_names

        print("\n".join(color_names()))
    elif w == "kernel":
        print("\n".join(["unity", "gaussian", "dog", "log", "blur", "comet",
                         "laplacian", "sobel", "roberts", "prewitt", "compass",
                         "kirsch", "freichen", "diamond", "square", "octagon",
                         "disk", "plus", "cross", "ring", "rectangle",
                         "corners", "lineends", "linejunctions", "edges",
                         "peaks", "skeleton", "chebyshev", "manhattan",
                         "euclidean"]))
    elif w == "threshold":
        from ..ops.threshold import threshold_map_names

        print("\n".join(threshold_map_names()))
    elif w == "morphology":
        print("\n".join(["convolve", "correlate", "erode", "dilate",
                         "erodeintensity", "dilateintensity", "open", "close",
                         "openintensity", "closeintensity", "smooth", "edge",
                         "edgein", "edgeout", "tophat", "bottomhat",
                         "hitandmiss", "thinning", "thicken", "distance"]))
    elif w == "delegate":
        from ..io.delegates import list_delegates

        for k, v in list_delegates().items():
            print(f"{k}: {'available' if v else 'missing'}")
    elif w == "resource":
        from ..core.resource import resources

        for k, v in resources.report().items():
            lim = "unlimited" if v["limit"] == float("inf") else f"{v['limit']:.0f}"
            print(f"{k}: limit={lim}")
    elif w == "policy":
        from ..core.policy import policy as pol

        for d, pat, rights in pol.rules:
            print(f"domain={d} pattern={pat} rights={','.join(sorted(rights))}")
        if not pol.rules:
            print("(open policy: no restrictions)")
    elif w == "gravity":
        from ..ops.composite import GRAVITIES

        print("\n".join(GRAVITIES))
    elif w == "compose":
        from ..ops.composite import _BLEND_FNS

        base = ["over", "dstover", "in", "dstin", "out", "dstout", "atop",
                "dstatop", "xor", "plus", "copy", "dst", "clear", "dissolve",
                "blend", "mathematics", "threshold", "changemask", "stereo",
                "bumpmap", "copyred", "copygreen", "copyblue", "copyalpha",
                "hue", "saturate", "luminize", "colorize",
                "lightenintensity", "darkenintensity"]
        print("\n".join(sorted(base + list(_BLEND_FNS))))
    elif w == "noise":
        print("\n".join(["uniform", "gaussian", "impulse", "laplacian",
                         "multiplicative", "poisson", "random"]))
    else:
        raise CLIError(f"unknown list type {what!r}")


def _looks_like_output(tok: str) -> bool:
    if ":" in tok:
        prefix = tok.split(":", 1)[0].lower()
        from ..io import supported_write_formats

        return prefix in supported_write_formats()
    return "." in tok or tok == "-"


def materialize_all(lazies: List["LazyImage"]) -> List[Image]:
    """Materialize a list of lazy images, batching same-shape images
    whose full pending chain is kernel-expressible into ONE fused Pallas
    call (the `-concurrent`/batch analog of bench.py's batched kernel —
    SURVEY §2.5 #2: batch replaces the reference's task parallelism)."""
    from ..ops import dispatch as _dsp

    groups: Dict[tuple, List[int]] = {}
    for idx, li in enumerate(lazies):
        if not li.pending:
            continue
        d = li.image.data
        if getattr(d, "ndim", 0) != 3:
            continue
        tags = tuple(t for _, _, t in li.pending)
        if any(t is None for t in tags):
            continue
        key = (tuple(map(int, d.shape)), tags, bool(li.image.spec.alpha))
        groups.setdefault(key, []).append(idx)
    for (shape, tags, has_alpha), idxs in groups.items():
        if len(idxs) < 2:
            continue
        out = _dsp.try_fused_batch([lazies[i].image.data for i in idxs],
                                   list(tags), alpha=has_alpha)
        if out is None:
            continue
        _dsp.COUNTS["pallas"] += 1
        for j, i in enumerate(idxs):
            li = lazies[i]
            spec = li.image.spec
            for _, upd, _ in li.pending:
                if upd is not None:
                    spec = upd(spec)
            li.image = Image(out[j], spec, li.image.properties,
                             li.image.profiles, li.image.page,
                             li.image.delay)
            li.pending = []
            li._shape = None
    return [li.materialize() for li in lazies]


def _write_output(st: CLIState, target: str):
    from .. import io as iio

    imgs = materialize_all(st.images)
    if not imgs:
        raise CLIError("no image to write")
    iio.write_image(imgs if len(imgs) > 1 else imgs[0], target,
                    quality=int(st.settings["quality"]),
                    depth=st.depth, settings={"defines": st.defines})


def main(argv: Optional[Sequence[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] in ("convert", "mogrify", "identify", "compare",
                            "composite", "montage", "conjure", "animate",
                            "display", "stream", "import"):
        tool = argv.pop(0)
    else:
        tool = "magick"
    try:
        from . import tools

        if tool == "identify":
            return _identify_main(argv)
        if tool == "compare":
            return _compare_main(argv)
        if tool == "mogrify":
            return tools.mogrify_main(argv)
        if tool == "composite":
            return tools.composite_main(argv)
        if tool == "montage":
            return tools.montage_main(argv)
        if tool == "conjure":
            return tools.conjure_main(argv)
        if tool in ("animate", "display"):
            # no X11: sixel in-terminal rendering (file fallback headless)
            return tools.display_main(argv, animate=(tool == "animate"))
        if tool == "stream":
            return _stream_main(argv)
        if tool == "import":
            # import.c captures an X11 screen region; there is no X
            # server in a headless TPU deployment — fail cleanly instead
            # of silently falling through to the convert dialect
            print("tmagick: import: X11 screen capture is not supported "
                  "in this headless build (utilities/magick.c:83-99 "
                  "multicall name)", file=sys.stderr)
            return 1
        # magick/convert dialect: -bench and -script handled here
        if "-bench" in argv:
            i = argv.index("-bench")
            n = int(argv[i + 1])
            rest = argv[:i] + argv[i + 2:]
            rest = [a for a in rest if a != "-concurrent"]
            return tools.bench_run(rest, n)
        if "-script" in argv:
            i = argv.index("-script")
            with open(argv[i + 1]) as f:
                script_args = _tokenize_script(f.read())
            st = process(argv[:i])
            process(script_args, st)
            return 0
        st = process(argv)
        return st.exit_code
    except (CLIError, FileNotFoundError, ValueError) as e:
        print(f"tmagick: {e}", file=sys.stderr)
        return 1


def _tokenize_script(text: str) -> List[str]:
    """magick -script tokenizer (MagickWand/script-token.c): whitespace
    separated, quotes and # comments honored."""
    import shlex

    out = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        out.extend(shlex.split(line))
    return out


def _stream_main(argv) -> int:
    """stream tool: extract a raw region without full processing
    (MagickWand/stream.c + MagickCore/stream.c analog)."""
    from .. import io as iio

    extract = None
    storage = "char"
    cmap = "rgb"
    paths = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-extract":
            extract = argv[i + 1]; i += 2
        elif a == "-storage-type":
            storage = argv[i + 1]; i += 2
        elif a == "-map":
            cmap = argv[i + 1]; i += 2
        elif a.startswith("-"):
            i += 1
        else:
            paths.append(a); i += 1
    if len(paths) < 2:
        print("stream: usage: stream input output", file=sys.stderr)
        return 2
    img = iio.read_images(paths[0])[0]
    if extract:
        from ..core.geometry import parse_page_geometry
        from ..ops import transform as tf

        w, h, x, y = parse_page_geometry(extract, img.width, img.height)
        img = img.replace(data=tf.crop(img.data, x, y, w, h))
    from ..io import extra_coders

    depth = 16 if storage in ("short", "uint16") else 8
    fmt = "rgba" if (img.spec.alpha and "a" in cmap.lower()) else \
        ("gray" if cmap.lower() == "i" or img.channels == 1 else "rgb")
    blob = extra_coders.encode_raw(img, fmt, depth)
    if paths[1] == "-":
        sys.stdout.buffer.write(blob)
    else:
        with open(paths[1], "wb") as f:
            f.write(blob)
    return 0


def _identify_main(argv) -> int:
    from .. import io as iio
    from ..io import identify as ident
    from ..core.properties import interpret

    verbose = "-verbose" in argv
    fmt = None
    paths = []
    i = 0
    while i < len(argv):
        if argv[i] == "-format":
            fmt = argv[i + 1]
            i += 2
        elif argv[i].startswith("-"):
            i += 1
        else:
            paths.append(argv[i])
            i += 1
    for p in paths:
        frames = iio.read_images(p)
        for idx, im in enumerate(frames):
            if fmt:
                print(interpret(fmt, im, p, idx, len(frames)), end="")
            else:
                print(ident.describe(im, p, verbose))
    if fmt:
        print()
    return 0


def _compare_main(argv) -> int:
    from .. import io as iio
    from ..ops import compare as cmp_ops

    metric = "rmse"
    paths = []
    i = 0
    subimage_search = False
    while i < len(argv):
        if argv[i] == "-metric":
            metric = argv[i + 1].lower()
            i += 2
        elif argv[i] == "-subimage-search":
            subimage_search = True
            i += 1
        elif argv[i].startswith("-"):
            i += 1
        else:
            paths.append(argv[i])
            i += 1
    if len(paths) < 2:
        print("compare: need two images", file=sys.stderr)
        return 2
    a = iio.read_images(paths[0])[0]
    b = iio.read_images(paths[1])[0]
    if subimage_search or a.data.shape != b.data.shape:
        if a.height >= b.height and a.width >= b.width:
            # SimilarityImage (compare.c): locate b inside a via NCC
            (y, x), surface = cmp_ops.similarity_image(a.data, b.data)
            import numpy as _np

            score = float(_np.asarray(surface).max())
            print(f"{score:.6g} @ {int(x)},{int(y)}", file=sys.stderr)
            return 0
        print("compare: image sizes differ", file=sys.stderr)
        return 2
    if metric == "mepp":
        # MEPP prints "raw (normalized_mean, normalized_max)"
        # (MagickWand/compare.c:1303-1310)
        raw, nm, nx = (float(v) for v in
                       cmp_ops.mean_error_per_pixel(a.data, b.data))
        print(f"{raw:.6g} ({nm:.6g}, {nx:.6g})", file=sys.stderr)
        d = raw
    else:
        d = float(cmp_ops.get_distortion(a.data, b.data, metric))
        if metric in ("ncc", "dpc", "phase"):
            # correlation metrics report 1-corr (MagickWand/compare.c:1253)
            d = 1.0 - d
        # "quantum (normalized)" print layout (MagickWand/compare.c:1289)
        print(f"{65535.0 * d:.6g} ({d:.6g})", file=sys.stderr)
    if len(paths) > 2:
        vis, _ = cmp_ops.compare_images(a.data, b.data, metric)
        iio.write_image(Image(vis, a.spec), paths[2])
    # exit code (MagickWand/compare.c:1264 CompareEpsilon): dissimilar
    # when |post-transform distortion| > 1e-6, uniformly for all metrics
    return 0 if abs(d) <= 1.0e-6 else 1


if __name__ == "__main__":
    sys.exit(main())

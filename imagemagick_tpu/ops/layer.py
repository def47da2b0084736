"""Image-sequence (layers/animation) ops (layer.c).

Re-implements /root/reference/MagickCore/layer.c (2,097 LoC):
CoalesceImages, DisposeImages, OptimizeImageLayers (frame differencing),
OptimizeImageTransparency, RemoveDuplicate/ZeroDelayLayers,
CompareImagesLayers, MergeImageLayers (flatten/mosaic/merge).

These operate on host-level lists of Image wrappers (frame timing and
disposal are host metadata), with the pixel work (compositing, diffing)
on device.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.image import Image
from ..core.spec import ImageSpec
from .composite import composite_at


def coalesce(frames: List[Image]) -> List[Image]:
    """CoalesceImages: flatten each frame onto the accumulated canvas."""
    if not frames:
        return []
    first = frames[0]
    canvas = first.data
    out = [first]
    for fr in frames[1:]:
        x, y = (fr.page[0], fr.page[1]) if fr.page else (0, 0)
        canvas = composite_at(canvas, fr.data, "over", x, y, "northwest",
                              dst_alpha=first.spec.alpha, src_alpha=fr.spec.alpha)
        if canvas.shape[-1] > first.spec.channels:
            canvas = canvas[..., : first.spec.channels]
        img = Image(canvas, first.spec, fr.properties, fr.profiles,
                    None, fr.delay)
        out.append(img)
    return out


def deconstruct(frames: List[Image], fuzz: float = 0.0) -> List[Image]:
    """CompareImagesLayers / -deconstruct: keep only changed bounding boxes."""
    if len(frames) < 2:
        return list(frames)
    out = [frames[0]]
    prev = np.asarray(frames[0].data)
    for fr in frames[1:]:
        cur = np.asarray(fr.data)
        diff = np.any(np.abs(cur - prev) > fuzz + 1e-6, axis=-1)
        if not diff.any():
            crop = cur[:1, :1]
            page = (0, 0, 1, 1)
        else:
            ys, xs = np.where(diff)
            y0, y1 = ys.min(), ys.max() + 1
            x0, x1 = xs.min(), xs.max() + 1
            crop = cur[y0:y1, x0:x1]
            page = (int(x0), int(y0), int(x1 - x0), int(y1 - y0))
        img = Image(jnp.asarray(crop), fr.spec, fr.properties, fr.profiles,
                    page, fr.delay)
        out.append(img)
        prev = cur
    return out


def optimize_layers(frames: List[Image], fuzz: float = 0.0) -> List[Image]:
    """OptimizeImageLayers: coalesce then store only changed regions."""
    return deconstruct(coalesce(frames), fuzz)


def remove_duplicate_layers(frames: List[Image], fuzz: float = 0.0) -> List[Image]:
    """RemoveDuplicateLayers: merge identical consecutive frames (sum delays)."""
    if not frames:
        return []
    out = [frames[0]]
    for fr in frames[1:]:
        prev = out[-1]
        if prev.data.shape == fr.data.shape and bool(
                jnp.all(jnp.abs(prev.data - fr.data) <= fuzz + 1e-6)):
            prev.delay += fr.delay
        else:
            out.append(fr)
    return out


def remove_zero_delay_layers(frames: List[Image]) -> List[Image]:
    """RemoveZeroDelayLayers: drop intermediate zero-delay build frames."""
    kept = [f for f in frames if f.delay != 0]
    return kept or frames[:1]


def flatten(frames: List[Image],
            background: Optional[Sequence[float]] = None) -> Image:
    """MergeImageLayers FlattenLayer: composite all onto the first canvas."""
    if not frames:
        raise ValueError("no frames")
    base = frames[0]
    c = base.spec.channels
    if background is not None:
        canvas = jnp.broadcast_to(jnp.asarray(background[:c], base.data.dtype),
                                  base.data.shape).astype(base.data.dtype)
    else:
        canvas = base.data
        frames = frames[1:] if background is None else frames
    out = canvas
    start = 0 if background is not None else 0
    for fr in frames[start:]:
        x, y = (fr.page[0], fr.page[1]) if fr.page else (0, 0)
        out = composite_at(out, fr.data, "over", x, y, "northwest",
                           dst_alpha=base.spec.alpha, src_alpha=fr.spec.alpha)
        out = out[..., : c]
    return Image(out, base.spec, base.properties, base.profiles)


def mosaic(frames: List[Image],
           background: Optional[Sequence[float]] = None) -> Image:
    """MergeImageLayers MosaicLayer (layer.c:2020): background-color
    canvas sized to the union of page extents, every frame composited at
    its page offsets."""
    if not frames:
        raise ValueError("no frames")
    max_w = max((f.page[0] if f.page else 0) + f.width for f in frames)
    max_h = max((f.page[1] if f.page else 0) + f.height for f in frames)
    c = frames[0].spec.channels
    if background is not None:
        canvas = jnp.broadcast_to(
            jnp.asarray(list(background[:c]) + [1.0] * (c - len(background[:c])),
                        frames[0].data.dtype),
            (max_h, max_w, c)).astype(frames[0].data.dtype)
    else:
        canvas = jnp.zeros((max_h, max_w, c), frames[0].data.dtype)
    for fr in frames:
        x, y = (fr.page[0], fr.page[1]) if fr.page else (0, 0)
        canvas = composite_at(canvas, fr.data, "over", x, y, "northwest",
                              dst_alpha=frames[0].spec.alpha,
                              src_alpha=fr.spec.alpha)[..., :c]
    return Image(canvas, frames[0].spec)


def dispose_images(frames: List[Image]) -> List[Image]:
    """DisposeImages: render the post-disposal canvas of each frame.

    Without per-frame dispose metadata richer than 'none', this equals
    coalesce (the common GIF case).
    """
    return coalesce(frames)


def optimize_transparency(frames: List[Image], fuzz: float = 0.0) -> List[Image]:
    """OptimizeImageTransparency (layer.c): zero out pixels identical to the
    previous coalesced frame so inter-frame compression sees constants."""
    if len(frames) < 2:
        return list(frames)
    co = coalesce(frames)
    out = [co[0]]
    for prev, cur in zip(co, co[1:]):
        same = jnp.all(jnp.abs(cur.data[..., :3] - prev.data[..., :3])
                       <= fuzz + 1e-6, axis=-1, keepdims=True)
        a = cur.data[..., 3:4] if cur.spec.alpha else jnp.ones_like(
            cur.data[..., :1])
        data = jnp.concatenate(
            [cur.data[..., :3], jnp.where(same, 0.0, a)], axis=-1)
        out.append(Image(data, cur.spec.with_(alpha=True), cur.properties,
                         cur.profiles, cur.page, cur.delay))
    return out


def _gravity_xy(img_w: int, img_h: int, canvas_w: int, canvas_h: int,
                gravity: str) -> Tuple[int, int]:
    """GravityAdjustGeometry (geometry.c:527) applied as SmushImages does:
    region starts as the whole canvas, width/height are the image's.
    Returns the (negated-at-use) region x/y — C double->long truncation."""
    g = (gravity or "northwest").lower().replace("-", "")
    x = 0
    y = 0
    if g in ("northeast", "east", "southeast"):
        x = int(float(img_w) - canvas_w)
    elif g in ("north", "south", "center", "centre"):
        x = int(float(img_w) / 2.0 - canvas_w / 2.0)
    if g in ("southwest", "south", "southeast"):
        y = int(float(img_h) - canvas_h)
    elif g in ("east", "west", "center", "centre"):
        y = int(float(img_h) / 2.0 - canvas_h / 2.0)
    return x, y


def _lead_run(alpha: np.ndarray) -> np.ndarray:
    """Per-column count of fully-transparent (alpha==0) leading pixels."""
    nz = alpha != 0.0
    first = np.argmax(nz, axis=0)
    return np.where(nz.any(axis=0), first, alpha.shape[0])


def _smush_gap(top: np.ndarray, bot: np.ndarray, canvas_extent: int,
               tg: int, bg: int, offset: int) -> int:
    """SmushYGap (image.c:3642) along axis 0 (callers transpose for X):
    minimal over canvas columns of (trailing transparent run of the top
    image, capped rows-1) + (leading transparent run of the bottom),
    minus the requested offset.  tg/bg are the gravity-adjusted geometry
    offsets used to map canvas columns into each image (edge-clamped
    virtual pixels)."""
    cols = np.arange(canvas_extent)

    def col_alpha(img: np.ndarray, gx: int) -> np.ndarray:
        a = img[..., -1] if img.shape[-1] in (2, 4) else \
            np.ones(img.shape[:2], np.float32)
        idx = np.clip(cols + gx, 0, img.shape[1] - 1)
        return a[:, idx]

    ta = col_alpha(top, tg)
    ba = col_alpha(bot, bg)
    i = np.minimum(_lead_run(ta[::-1]), top.shape[0] - 1)
    j = _lead_run(ba)
    gap = min(int(bot.shape[0]), int((i + j).min()))
    return gap - offset


def smush(frames: List[Image], stack: bool, offset: int,
          background: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
          gravity: str = "northwest") -> Image:
    """SmushImages (image.c:3706-3838).

    Adjacent images overlap by the smallest transparent gap found along
    the seam (SmushX/YGap), less ``offset``; the canvas is background-
    filled and each image is composited Over at its gravity-adjusted
    cross-axis position.  Host-side numpy: shape-changing by nature."""
    if not frames:
        raise ValueError("no frames")
    any_alpha = any(f.spec.alpha for f in frames)
    datas = [np.asarray(f.data, np.float32) for f in frames]
    if stack:
        width = max(d.shape[1] for d in datas)
        height = datas[0].shape[0]
        for d in datas[1:]:
            height = max(height + d.shape[0] + offset, 0)
    else:
        height = max(d.shape[0] for d in datas)
        width = datas[0].shape[1]
        for d in datas[1:]:
            width = max(width + d.shape[1] + offset, 0)
    c = 4 if any_alpha else 3
    bg = list(background)[:c]
    while len(bg) < c:
        bg.append(1.0)
    canvas = np.empty((height, width, c), np.float32)
    canvas[:] = np.asarray(bg, np.float32)

    def over(dst, src, x0, y0):
        sh, sw = src.shape[:2]
        xs, ys = max(x0, 0), max(y0, 0)
        xe, ye = min(x0 + sw, dst.shape[1]), min(y0 + sh, dst.shape[0])
        if xe <= xs or ye <= ys:
            return
        s = src[ys - y0:ye - y0, xs - x0:xe - x0]
        srgb = s[..., :3] if s.shape[-1] >= 3 else np.repeat(s[..., :1], 3, -1)
        sa = s[..., -1:] if s.shape[-1] in (2, 4) else 1.0
        d = dst[ys:ye, xs:xe]
        d[..., :3] = srgb * sa + d[..., :3] * (1.0 - sa)
        if c == 4:
            d[..., 3:] = sa + d[..., 3:] * (1.0 - sa)

    x_off = y_off = 0
    geo = [_gravity_xy(d.shape[1], d.shape[0], width, height, gravity)
           for d in datas]
    for n, d in enumerate(datas):
        gx, gy = geo[n]
        if stack:
            x_off = -gx
            if n > 0:
                y_off -= _smush_gap(datas[n - 1], d, width,
                                    geo[n - 1][0], gx, offset)
        else:
            y_off = -gy
            if n > 0:
                x_off -= _smush_gap(datas[n - 1].transpose(1, 0, 2),
                                    d.transpose(1, 0, 2), height,
                                    geo[n - 1][1], gy, offset)
        over(canvas, d, x_off, y_off)
        if stack:
            x_off, y_off = 0, y_off + d.shape[0]
        else:
            x_off, y_off = x_off + d.shape[1], 0
    if stack:
        canvas = canvas[:max(y_off, 0)]
    else:
        canvas = canvas[:, :max(x_off, 0)]
    spec = frames[0].spec.with_(alpha=any_alpha)
    return Image(jnp.asarray(canvas), spec)


def append(frames: List[Image], stack: bool,
           background: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
           gravity: str = "northwest") -> Image:
    """AppendImages (image.c:379-560): background-filled canvas, each
    image RAW-COPIED (not composited) at its gravity-adjusted cross-axis
    offset.  stack=True appends top-to-bottom."""
    if not frames:
        raise ValueError("no frames")
    any_alpha = any(f.spec.alpha for f in frames)
    datas = [np.asarray(f.data, np.float32) for f in frames]
    if stack:
        width = max(d.shape[1] for d in datas)
        height = sum(d.shape[0] for d in datas)
    else:
        height = max(d.shape[0] for d in datas)
        width = sum(d.shape[1] for d in datas)
    c = 4 if any_alpha else 3
    bg = list(background)[:c]
    while len(bg) < c:
        bg.append(1.0)
    canvas = np.empty((height, width, c), np.float32)
    canvas[:] = np.asarray(bg, np.float32)
    x_off = y_off = 0
    for d in datas:
        gx, gy = _gravity_xy(d.shape[1], d.shape[0], width, height, gravity)
        if stack:
            x0, y0 = -gx, y_off
        else:
            x0, y0 = x_off, -gy
        sh, sw = d.shape[:2]
        xs, ys = max(x0, 0), max(y0, 0)
        xe, ye = min(x0 + sw, width), min(y0 + sh, height)
        if xe > xs and ye > ys:
            s = d[ys - y0:ye - y0, xs - x0:xe - x0]
            rgb = s[..., :3] if s.shape[-1] >= 3 else \
                np.repeat(s[..., :1], 3, -1)
            canvas[ys:ye, xs:xe, :3] = rgb
            if c == 4:
                canvas[ys:ye, xs:xe, 3] = s[..., -1] \
                    if s.shape[-1] in (2, 4) else 1.0
        if stack:
            y_off += sh
        else:
            x_off += sw
    all_gray = all(f.spec.colorspace == "gray" for f in frames)
    spec = frames[0].spec.with_(alpha=any_alpha)
    if not all_gray and spec.colorspace == "gray":
        spec = spec.with_(colorspace="srgb")
    data = canvas if frames[0].spec.colorspace != "gray" or not all_gray \
        else canvas[..., :1] if c == 3 else \
        np.concatenate([canvas[..., :1], canvas[..., 3:]], -1)
    return Image(jnp.asarray(data), spec)

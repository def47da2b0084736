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


def mosaic(frames: List[Image]) -> Image:
    """MergeImageLayers MosaicLayer: canvas sized to the union of pages."""
    if not frames:
        raise ValueError("no frames")
    max_w = max((f.page[0] if f.page else 0) + f.width for f in frames)
    max_h = max((f.page[1] if f.page else 0) + f.height for f in frames)
    c = frames[0].spec.channels
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

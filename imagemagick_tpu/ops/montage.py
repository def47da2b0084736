"""Montage: thumbnail grids with labels and frames (montage.c).

Re-implements MontageImageList (/root/reference/MagickCore/montage.c:321):
composition of thumbnail (resize) + border/frame + annotate + grid
compositing — expressed directly in those primitives here.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.geometry import parse_geometry
from ..core.image import Image
from .composite import composite_at, gravity_offset
from . import decorate
from . import resize as rz


def montage(images: List[Image], tile: str = "", geometry: str = "120x120+4+3",
            background: Sequence[float] = (1.0, 1.0, 1.0),
            border_width: int = 0, label_height: int = 0,
            shadow: bool = False) -> Image:
    """Arrange thumbnails on a grid.

    tile: 'CxR' grid shape (default: near-square fit like the reference).
    geometry: per-tile thumbnail geometry 'WxH+bx+by'.
    """
    if not images:
        raise ValueError("montage of zero images")
    g = parse_geometry(geometry)
    tw = int(g.width or 120)
    th = int(g.height or tw)
    bx = abs(g.x) if g.x is not None else 4
    by = abs(g.y) if g.y is not None else 3

    n = len(images)
    if tile:
        tg = parse_geometry(tile)
        cols = int(tg.width or math.ceil(math.sqrt(n)))
        rows = int(tg.height or math.ceil(n / cols))
    else:
        cols = int(math.ceil(math.sqrt(n)))
        rows = int(math.ceil(n / cols))

    cell_w = tw + 2 * (bx + border_width)
    cell_h = th + 2 * (by + border_width) + label_height
    c = images[0].spec.channels
    canvas = jnp.broadcast_to(
        jnp.asarray(list(background)[:c] + [1.0] * max(0, c - len(background)),
                    jnp.float32),
        (rows * cell_h, cols * cell_w, c)).astype(jnp.float32)

    for idx, img in enumerate(images[: rows * cols]):
        r, col = divmod(idx, cols)
        # aspect-fit thumbnail
        scale = min(tw / img.width, th / img.height, 1.0)
        nw = max(int(img.width * scale), 1)
        nh = max(int(img.height * scale), 1)
        thumb = rz.thumbnail(img.data, nh, nw, has_alpha=img.spec.alpha)
        if thumb.shape[-1] != c:
            if thumb.shape[-1] < c:
                pad = jnp.ones(thumb.shape[:-1] + (c - thumb.shape[-1],), thumb.dtype)
                thumb = jnp.concatenate([jnp.repeat(thumb[..., :1], min(3, c), -1)
                                         if thumb.shape[-1] == 1 else thumb,
                                         pad], -1)[..., :c]
            else:
                thumb = thumb[..., :c]
        if border_width:
            thumb = decorate.border(thumb, border_width, border_width)
        # center in cell
        ox = col * cell_w + (cell_w - thumb.shape[-2]) // 2
        oy = r * cell_h + (cell_h - label_height - thumb.shape[-3]) // 2
        canvas = composite_at(canvas, thumb, "over", ox, oy, "northwest",
                              dst_alpha=c in (2, 4), src_alpha=c in (2, 4))[..., :c]
        label = img.properties.get("label")
        if label and label_height:
            from .draw import annotate as annotate_text

            canvas = annotate_text(canvas, str(label),
                                   x=col * cell_w + 4,
                                   y=r * cell_h + cell_h - label_height + 2,
                                   color=(0, 0, 0, 1),
                                   size=max(label_height - 6, 8))
    return Image(canvas, images[0].spec)

"""Decorations: border, 3-D frame, raise (decorate.c).

Re-implements /root/reference/MagickCore/decorate.c (901 LoC, 4 OMP loops):
BorderImage (:103), FrameImage (:169 — beveled 3-D frame), RaiseImage.
All are pad/slice + shading masks.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np


def border(img: jnp.ndarray, width: int, height: int,
           color: Sequence[float] = (0.75, 0.75, 0.75, 1.0)) -> jnp.ndarray:
    """BorderImage: surround with a solid border."""
    c = img.shape[-1]
    col = jnp.asarray(color[:c], img.dtype)
    h, w = img.shape[-3], img.shape[-2]
    out = jnp.broadcast_to(col, img.shape[:-3] + (h + 2 * height, w + 2 * width, c)).astype(img.dtype)
    return out.at[..., height:height + h, width:width + w, :].set(img)


def frame(img: jnp.ndarray, width: int = 6, height: int = 6,
          outer_bevel: int = 2, inner_bevel: int = 2,
          matte_color: Sequence[float] = (0.74, 0.74, 0.74, 1.0)) -> jnp.ndarray:
    """FrameImage: 3-D beveled frame (decorate.c:169).

    Highlight = matte*1.35 clamped, shadow = matte*0.65 — the reference's
    AccentuateFactor/ShadowFactor lighting.
    """
    c = img.shape[-1]
    matte = np.asarray(matte_color[:c], np.float32)
    # decorate.c modulates: highlight = matte*(1-125/255) + 125/255,
    # shadow = matte*135/255 (HighlightModulate/ShadowModulate)
    hi = np.clip(matte * (1.0 - 125.0 / 255.0) + 125.0 / 255.0, 0, 1)
    lo = matte * (135.0 / 255.0)
    h, w = img.shape[-3], img.shape[-2]
    oh = h + 2 * height
    ow = w + 2 * width
    ys = np.arange(oh)[:, None] * np.ones((1, ow))
    xs = np.ones((oh, 1)) * np.arange(ow)[None, :]

    canvas = np.ones((oh, ow, c), np.float32) * matte
    ob, ib = outer_bevel, inner_bevel
    # outer bevel: top/left highlight, bottom/right shadow
    top_left = (ys < ob) | (xs < ob)
    bot_right = (ys >= oh - ob) | (xs >= ow - ob)
    # inner bevel around the image hole
    iy0, ix0 = height - ib, width - ib
    iy1, ix1 = height + h + ib, width + w + ib
    in_hole_ring = ((ys >= iy0) & (ys < iy1) & (xs >= ix0) & (xs < ix1))
    inner_tl = in_hole_ring & ((ys < height) | (xs < width))
    inner_br = in_hole_ring & ((ys >= height + h) | (xs >= width + w))
    canvas[bot_right] = lo
    canvas[top_left] = hi
    canvas[inner_br] = hi  # inner bevel lighting is inverted
    canvas[inner_tl] = lo
    out = jnp.asarray(canvas)
    out = jnp.broadcast_to(out, img.shape[:-3] + out.shape).astype(img.dtype)
    return out.at[..., height:height + h, width:width + w, :].set(img)


def raise_image(img: jnp.ndarray, width: int = 6, height: int = 6,
                raised: bool = True) -> jnp.ndarray:
    """RaiseImage (decorate.c:632): four modulated zones — oracle-exact.

    Top band: Highlight left wedge (x<y), Accentuate middle, Shadow
    right; middle band: Highlight/Shadow side strips; bottom band:
    Highlight wedge (x<H-y), Trough middle, Shadow right.  Factors
    190/255 (highlight/shadow) and 135/255 (accentuate/trough) against
    foreground=white / background=black (swapped when raised=False)."""
    h, w = img.shape[-3], img.shape[-2]
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    ys = jnp.broadcast_to(ys, (h, w))
    xs = jnp.broadcast_to(xs, (h, w))
    fg, bg = (1.0, 0.0) if raised else (0.0, 1.0)
    HF = 190.0 / 255.0
    AF = 135.0 / 255.0

    top = ys < height
    bottom = ys >= h - height
    middle = ~top & ~bottom
    hl = (top & (xs < ys)) | (middle & (xs < width)) | \
        (bottom & (xs < h - ys))
    sh = (top & (xs >= w - ys)) | (middle & (xs >= w - width)) | \
        (bottom & (xs >= w - (h - ys)))
    ac = top & ~hl & ~sh
    tr = bottom & ~hl & ~sh

    out = img
    out = jnp.where(hl[..., None], img * HF + fg * (1.0 - HF), out)
    out = jnp.where(ac[..., None], img * AF + fg * (1.0 - AF), out)
    out = jnp.where(tr[..., None], img * AF + bg * (1.0 - AF), out)
    out = jnp.where(sh[..., None], img * HF + bg * (1.0 - HF), out)
    return jnp.clip(out, 0.0, 1.0)

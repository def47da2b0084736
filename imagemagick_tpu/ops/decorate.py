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
    # decorate.c:65-69 modulate constants (ScaleCharToQuantum(v) -> v/255):
    #   accentuate = matte*(1-80/255)+80/255, highlight = *(1-125/255)+125/255,
    #   shadow = matte*135/255, trough = matte*110/255.
    acc = np.clip(matte * (1.0 - 80.0 / 255.0) + 80.0 / 255.0, 0, 1)
    hi = np.clip(matte * (1.0 - 125.0 / 255.0) + 125.0 / 255.0, 0, 1)
    sh = matte * (135.0 / 255.0)
    tr = matte * (110.0 / 255.0)
    h, w = img.shape[-3], img.shape[-2]
    ob, ib = outer_bevel, inner_bevel
    bw = ob + ib
    fx, fy = width, height          # frame_info->x / ->y (border per side)
    oh, ow = h + 2 * fy, w + 2 * fx
    xs = np.arange(ow)

    canvas = np.ones((oh, ow, c), np.float32) * matte

    def paint(row, masks_colors):
        for m, col in masks_colors:
            canvas[row, m] = col

    # -- top ornamental border (decorate.c FrameImage top loops) --------
    for y in range(min(ob, oh)):            # outer bevel: hi wedge/acc/sh
        paint(y, [(xs < ow - y, acc), (xs < y, hi), (xs >= ow - y, sh)])
    for y in range(ob, min(ob + max(fy - bw, 0), oh)):   # flat matte band
        paint(y, [(xs < ob, hi), (xs >= ow - ob, sh)])
    for k in range(ib):                     # inner bevel top
        y = ob + max(fy - bw, 0) + k
        if y >= oh:
            break
        # spans: ob hi | fx-bw matte | (w+2ib) region | fx-bw matte | ob sh
        x0 = ob + max(fx - bw, 0)
        inner = (xs >= x0) & (xs < x0 + w + 2 * ib)
        paint(y, [(xs < ob, hi), (xs >= ow - ob, sh),
                  (inner & (xs >= x0 + w + 2 * ib - k), hi),
                  (inner & (xs < x0 + w + 2 * ib - k), tr),
                  (inner & (xs < x0 + k), sh)])

    # -- middle rows (sides) -------------------------------------------
    for y in range(fy, fy + h):
        x0 = ob + max(fx - bw, 0)
        paint(y, [(xs < ob, hi), (xs >= ow - ob, sh),
                  ((xs >= x0) & (xs < x0 + ib), sh),
                  ((xs >= x0 + ib + w) & (xs < x0 + 2 * ib + w), hi)])

    # -- bottom ornamental border --------------------------------------
    base = fy + h
    for k in range(ib):                     # inner bevel bottom
        # reference iterates y=ib-1..0 while rows advance downward, so
        # row base+j carries parameter ib-1-j; with j = ib-1-k that is k.
        y = base + (ib - 1 - k)
        yy = k
        if y >= oh:
            continue
        x0 = ob + max(fx - bw, 0)
        inner = (xs >= x0) & (xs < x0 + w + 2 * ib)
        paint(y, [(xs < ob, hi), (xs >= ow - ob, sh),
                  (inner & (xs >= x0 + w + 2 * ib - yy), hi),
                  (inner & (xs < x0 + w + 2 * ib - yy), acc),
                  (inner & (xs < x0 + yy), sh)])
    for y in range(base + ib, base + ib + max(fy - bw, 0)):
        if y >= oh:
            break
        paint(y, [(xs < ob, hi), (xs >= ow - ob, sh)])
    for k in range(ob):                     # outer bevel bottom
        # reference writes rows for y=ob-1..0 top-to-bottom, so the
        # canvas row oh-1-k carries wedge parameter k: hi for x<k,
        # trough to cols-k, shadow after.
        y = oh - 1 - k
        paint(y, [(xs >= k, tr), (xs < k, hi), (xs >= ow - k, sh)])
    out = jnp.asarray(canvas)
    out = jnp.broadcast_to(out, img.shape[:-3] + out.shape).astype(img.dtype)
    return out.at[..., fy:fy + h, fx:fx + w, :].set(img)


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

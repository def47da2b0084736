"""Virtual-pixel (edge extension) policies as explicit pad modes.

The reference resolves out-of-canvas reads per pixel inside the cache layer
(/root/reference/MagickCore/cache.c:2627-2720 — EdgeX/EdgeY, RandomX/Y,
DitherX/Y, VirtualPixelModulo; policy enum in cache-view.h:27-45).  On TPU
edge policy becomes an explicit pad applied *before* a windowed kernel runs,
so the kernel itself stays branch-free and fuses with its neighbors.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

# Virtual pixel methods (cache-view.h:27-45) -> pad strategy.
_SIMPLE_MODES = {
    "undefined": "edge",
    "edge": "edge",
    "mirror": "symmetric",
    "tile": "wrap",
    "random": "edge",       # approximation; true random fill is rarely load-bearing
    "dither": "edge",
}

_CONSTANT_FILLS = {
    "black": 0.0,
    "white": 1.0,
    "gray": 0.5,
    "grey": 0.5,
    "transparent": 0.0,
    "background": None,  # uses the background color argument
}


# cache.c:2625 DitherMatrix — DitherX/Y only index the first 8 entries
_DITHER8 = (0, 48, 12, 60, 3, 51, 15, 63)


def vp_constant(method: str, background=None, channels: int = 3):
    """The virtual-pixel fill color for constant-fill methods, or None.

    Matches cache.c:2851-2896: black/transparent = 0, gray =
    QuantumRange/2 (integer halving: 32767/65535), white/mask = 1;
    'background' uses the image background color.  Alpha is opaque for
    all but transparent."""
    m = (method or "edge").lower()
    alpha = channels in (2, 4)
    nc = channels - 1 if alpha else channels
    if m == "black":
        col = [0.0] * nc + ([1.0] if alpha else [])
    elif m in ("gray", "grey"):
        # HDRI Quantum is float: QuantumRange/2 = 32767.5 → exactly 0.5
        col = [0.5] * nc + ([1.0] if alpha else [])
    elif m in ("white", "mask"):
        col = [1.0] * nc + ([1.0] if alpha else [])
    elif m == "transparent":
        col = [0.0] * channels
    elif m in ("background", "horizontaltile", "verticaltile",
               "checkertile"):
        # the tile-fill variants use the background color for their
        # outside regions (cache.c:2888 default case)
        if background is None:
            return None
        col = list(background)[:channels]
        while len(col) < channels:
            col.append(1.0)
    else:
        return None
    return tuple(col)


def vp_tap(yi: jnp.ndarray, xi: jnp.ndarray, h: int, w: int,
           method: str = "edge"):
    """Remap integer tap coordinates per virtual-pixel policy.

    Returns (yc, xc, const_mask): in-image coordinates plus a boolean
    mask of taps that must read the vp_constant color instead (None when
    the method never falls back to a constant).  Mirrors the coordinate
    arithmetic of cache.c:2928-3066 (floored VirtualPixelModulo, mirror
    quotient parity, DitherX/Y clamped offsets, tile-variant fills)."""
    m = (method or "edge").lower()
    if m in ("edge", "undefined", ""):
        return jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1), None
    inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    if m in ("black", "gray", "grey", "white", "mask", "transparent",
             "background"):
        return jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1), ~inside
    qy, ry = jnp.floor_divide(yi, h), jnp.mod(yi, h)
    qx, rx = jnp.floor_divide(xi, w), jnp.mod(xi, w)
    if m == "tile":
        return ry, rx, None
    if m == "mirror":
        my = jnp.where(qy & 1 == 1, h - 1 - ry, ry)
        mx = jnp.where(qx & 1 == 1, w - 1 - rx, rx)
        return my, mx, None
    if m == "horizontaltile":
        return ry, rx, (yi < 0) | (yi >= h)
    if m == "verticaltile":
        return ry, rx, (xi < 0) | (xi >= w)
    if m == "horizontaltileedge":
        return jnp.clip(yi, 0, h - 1), rx, None
    if m == "verticaltileedge":
        return ry, jnp.clip(xi, 0, w - 1), None
    if m == "checkertile":
        return ry, rx, ((qx ^ qy) & 1) != 0
    if m == "dither":
        # only out-of-range taps take the dithered offset; in-range reads
        # go through the normal path untouched (cache.c:2915-2957)
        d8 = jnp.asarray(_DITHER8, yi.dtype)
        dy = jnp.clip(yi + jnp.take(d8, yi & 7) - 32, 0, h - 1)
        dx = jnp.clip(xi + jnp.take(d8, xi & 7) - 32, 0, w - 1)
        return jnp.where(inside, jnp.clip(yi, 0, h - 1), dy), \
            jnp.where(inside, jnp.clip(xi, 0, w - 1), dx), None
    if m == "random":
        # deterministic hash stand-in for the reference's RNG stream
        # (cache.c:2942 RandomX/Y — inherently irreproducible)
        hy = jnp.mod(yi * 26544357 + xi * 40503, jnp.int32(h))
        hx = jnp.mod(xi * 26544357 + yi * 40503, jnp.int32(w))
        return jnp.where(inside, jnp.clip(yi, 0, h - 1), hy), \
            jnp.where(inside, jnp.clip(xi, 0, w - 1), hx), None
    return jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1), None


def pad_spatial(
    img: jnp.ndarray,
    pad_h: Tuple[int, int],
    pad_w: Tuple[int, int],
    method: str = "edge",
    background: Optional[Sequence[float]] = None,
) -> jnp.ndarray:
    """Pad the H and W axes of an (..., H, W, C) array per virtual-pixel policy."""
    method = (method or "edge").lower()
    nb = img.ndim
    pad_width = [(0, 0)] * (nb - 3) + [pad_h, pad_w, (0, 0)]
    if method in _SIMPLE_MODES:
        mode = _SIMPLE_MODES[method]
        if mode == "symmetric":
            return jnp.pad(img, pad_width, mode="symmetric")
        if mode == "wrap":
            return jnp.pad(img, pad_width, mode="wrap")
        return jnp.pad(img, pad_width, mode="edge")
    if method in _CONSTANT_FILLS:
        fill = _CONSTANT_FILLS[method]
        if fill is None:
            if background is None:
                fill_arr = jnp.zeros((img.shape[-1],), img.dtype)
            else:
                fill_arr = jnp.asarray(background, img.dtype)
            out = jnp.pad(img, pad_width, mode="constant")
            h0, h1 = pad_h
            w0, w1 = pad_w
            c = img.shape[-1]
            mask = jnp.zeros(out.shape[-3:-1], bool)
            mask = mask.at[h0:mask.shape[0] - h1 if h1 else None,
                           w0:mask.shape[1] - w1 if w1 else None].set(True)
            return jnp.where(mask[..., None], out, fill_arr.reshape((1,) * (out.ndim - 1) + (c,)))
        return jnp.pad(img, pad_width, mode="constant", constant_values=fill)
    raise ValueError(f"unknown virtual pixel method {method!r}")

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

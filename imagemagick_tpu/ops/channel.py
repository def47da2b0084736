"""Channel ops: separate/combine/swap, alpha ops, channel-fx (channel.c).

Re-implements /root/reference/MagickCore/channel.c (1,382 LoC, 9 OMP loops):
ChannelFxImage (:196) expression grammar ("red=>blue", "rgba=>bgra"),
SeparateImage(:717)/SeparateImages(:858), CombineImages(:498), and
SetImageAlphaChannel operations — all trivial slicing/stacking on NHWC.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence

import jax.numpy as jnp

_CHANNEL_INDEX = {
    "r": 0, "red": 0, "c": 0, "cyan": 0, "gray": 0, "k": 3,
    "g": 1, "green": 1, "m": 1, "magenta": 1,
    "b": 2, "blue": 2, "y": 2, "yellow": 2,
    "black": 3,
    "a": -1, "alpha": -1, "o": -1, "opacity": -1,
}


def separate(img: jnp.ndarray, channel: str) -> jnp.ndarray:
    """SeparateImage: extract one channel as grayscale."""
    idx = _CHANNEL_INDEX[channel.lower()]
    if idx == -1:
        idx = img.shape[-1] - 1
    return img[..., idx:idx + 1]


def separate_all(img: jnp.ndarray) -> List[jnp.ndarray]:
    """SeparateImages: one grayscale image per channel."""
    return [img[..., i:i + 1] for i in range(img.shape[-1])]


def combine(channels: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """CombineImages: stack grayscale images into channels."""
    return jnp.concatenate([c[..., :1] for c in channels], axis=-1)


def swap_channels(img: jnp.ndarray, order: Sequence[int]) -> jnp.ndarray:
    return img[..., list(order)]


def channel_fx(img: jnp.ndarray, expression: str,
               has_alpha: bool = False) -> jnp.ndarray:
    """ChannelFxImage (channel.c:196): '<src>=><dst>[,...]' or 'rgba=>bgra'."""
    expr = expression.strip().lower()
    nch = img.shape[-1]
    out = img

    def resolve(tok: str) -> int:
        tok = tok.strip()
        if tok in _CHANNEL_INDEX:
            i = _CHANNEL_INDEX[tok]
            return nch - 1 if i == -1 else i
        raise ValueError(f"unknown channel {tok!r}")

    for clause in expr.split(","):
        clause = clause.strip()
        if "<=>" in clause:
            a, b = (resolve(t) for t in clause.split("<=>"))
            out = out.at[..., a].set(img[..., b]).at[..., b].set(img[..., a])
        elif "=>" in clause:
            src_s, dst_s = clause.split("=>")
            src_s, dst_s = src_s.strip(), dst_s.strip()
            if len(src_s) > 1 and len(dst_s) == len(src_s) and src_s.isalpha() \
                    and src_s not in _CHANNEL_INDEX:
                # compact form: rgba=>bgra
                perm = [resolve(c) for c in dst_s]
                out = img[..., perm]
            else:
                out = out.at[..., resolve(dst_s)].set(img[..., resolve(src_s)])
    return out


def set_alpha(img: jnp.ndarray, operation: str, has_alpha: bool,
              background: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """SetImageAlphaChannel ops (channel.c / image.h AlphaChannelOption)."""
    op = operation.lower()
    c = img.shape[-1]
    if op in ("set", "on", "activate", "opaque"):
        if has_alpha:
            if op == "opaque":
                return img.at[..., -1].set(1.0)
            return img
        return jnp.concatenate([img, jnp.ones(img.shape[:-1] + (1,), img.dtype)], -1)
    if op in ("off", "deactivate", "remove", "flatten"):
        if not has_alpha:
            return img
        if op in ("remove", "flatten"):
            bg = jnp.asarray(background if background is not None else [1.0, 1.0, 1.0],
                             img.dtype)[: c - 1]
            a = img[..., -1:]
            return img[..., :-1] * a + bg * (1.0 - a)
        return img[..., :-1]
    if op == "extract":
        if has_alpha:
            return img[..., -1:]
        return jnp.ones(img.shape[:-1] + (1,), img.dtype)
    if op == "copy":
        inten = jnp.mean(img[..., : c - (1 if has_alpha else 0)], axis=-1, keepdims=True)
        if has_alpha:
            return jnp.concatenate([img[..., :-1], inten], -1)
        return jnp.concatenate([img, inten], -1)
    if op == "transparent":
        if has_alpha:
            return img.at[..., -1].set(0.0)
        return jnp.concatenate([img, jnp.zeros(img.shape[:-1] + (1,), img.dtype)], -1)
    raise ValueError(f"unknown alpha operation {operation!r}")

"""Structured identify output (identify.c / coders/json.c).

Re-implements the verbose identify description
(/root/reference/MagickCore/identify.c:1,701 LoC) and the json: coder
(/root/reference/coders/json.c:1,753 LoC): full image state including
per-channel statistics, type, colorspace, histogram summary.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np


def describe(image, filename: str = "", verbose: bool = False) -> str:
    """IdentifyImage one-line / verbose text."""
    w, h = image.width, image.height
    fmt = image.properties.get(
        "format", os.path.splitext(filename)[1].lstrip(".").upper() or "MIFF")
    base = (f"{filename} {fmt} {w}x{h} {w}x{h}+0+0 "
            f"{image.spec.depth}-bit {image.spec.colorspace}")
    if not verbose:
        return base
    info = as_dict(image, filename)
    lines = [f"Image:", f"  Filename: {filename}", f"  Format: {fmt}",
             f"  Geometry: {w}x{h}+0+0",
             f"  Colorspace: {info['colorspace']}",
             f"  Type: {info['type']}",
             f"  Depth: {image.spec.depth}-bit",
             f"  Channels: {info['channels']}"]
    lines.append("  Channel statistics:")
    for ch in info["channelStatistics"]:
        s = info["channelStatistics"][ch]
        lines.append(f"    {ch}:")
        for k in ("min", "max", "mean", "standardDeviation", "entropy"):
            lines.append(f"      {k}: {s[k]:.6g}")
    for k, v in image.properties.items():
        lines.append(f"  {k}: {v}")
    return "\n".join(lines)


def as_dict(image, filename: str = "") -> Dict:
    """json: coder payload (coders/json.c EncodeImageAttributes analog)."""
    from ..ops import statistic as stx
    from ..ops import attribute as attr
    from ..ops import histogram as hg

    stats = stx.get_statistics(image.data)
    names = _channel_names(image)
    chstats = {}
    for i, name in enumerate(names):
        chstats[name] = {
            "min": float(np.asarray(stats["min"])[i]),
            "max": float(np.asarray(stats["max"])[i]),
            "mean": float(np.asarray(stats["mean"])[i]),
            "standardDeviation": float(np.asarray(stats["std"])[i]),
            "skewness": float(np.asarray(stats["skewness"])[i]),
            "kurtosis": float(np.asarray(stats["kurtosis"])[i]),
            "entropy": float(np.asarray(stats["entropy"])[i]),
        }
    return {
        "name": filename,
        "format": image.properties.get("format", "MIFF"),
        "geometry": {"width": image.width, "height": image.height,
                     "x": 0, "y": 0},
        "colorspace": image.spec.colorspace,
        "type": attr.image_type(image.data, image.spec.alpha),
        "depth": image.spec.depth,
        "channels": len(names),
        "alpha": image.spec.alpha,
        "colors": int(hg.number_colors(image.data)),
        "channelStatistics": chstats,
        "properties": dict(image.properties),
    }


def to_json(image, filename: str = "") -> str:
    return json.dumps({"image": as_dict(image, filename)}, indent=2)


def _channel_names(image):
    cs = image.spec.colorspace
    if cs in ("gray", "linear_gray"):
        names = ["gray"]
    elif cs == "cmyk":
        names = ["cyan", "magenta", "yellow", "black"]
    else:
        names = ["red", "green", "blue"]
    if image.spec.alpha:
        names.append("alpha")
    return names[: image.channels]

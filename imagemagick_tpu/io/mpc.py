"""MPC — Magick Persistent Cache: zero-decode checkpoint format.

The reference's MPC (/root/reference/coders/mpc.c:1,578; PersistPixelCache
at cache.c:4055) writes the raw pixel cache plus a sidecar attribute file,
so re-reading attaches the pixels with zero decode — ImageMagick's
checkpoint/resume story.  Here the same role: a `.mpc` file is a JSON
header + raw float32 pixels; reading memory-maps the pixel payload and
feeds it straight to the device (no parsing, no dequantization).
"""

from __future__ import annotations

import json
import mmap
import os
from typing import List

import numpy as np

from ..core.image import Image
from ..core.spec import ImageSpec

_MAGIC = b"TPUMPC01"


def write_mpc(images, path: str) -> None:
    if isinstance(images, Image):
        images = [images]
    header = {"frames": []}
    offset = 0
    payloads = []
    for im in images:
        arr = np.ascontiguousarray(im.to_numpy(), np.float32)
        header["frames"].append({
            "shape": list(arr.shape),
            "offset": offset,
            "colorspace": im.spec.colorspace,
            "alpha": im.spec.alpha,
            "depth": im.spec.depth,
            "properties": {k: v for k, v in im.properties.items()
                           if isinstance(v, (str, int, float))},
            "page": list(im.page) if im.page else None,
            "delay": im.delay,
        })
        payloads.append(arr)
        offset += arr.nbytes
    head = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(len(head).to_bytes(8, "little"))
        f.write(head)
        for arr in payloads:
            f.write(arr.tobytes())


def read_mpc(path: str) -> List[Image]:
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != _MAGIC:
            raise ValueError("not a TPU-MPC file")
        hlen = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(hlen))
        base = f.tell()
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    out = []
    for fr in header["frames"]:
        shape = tuple(fr["shape"])
        n = int(np.prod(shape))
        arr = np.frombuffer(mm, np.float32, count=n,
                            offset=base + fr["offset"]).reshape(shape)
        img = Image(arr, ImageSpec(colorspace=fr["colorspace"],
                                   alpha=fr["alpha"], depth=fr["depth"]),
                    properties=fr.get("properties") or {},
                    page=tuple(fr["page"]) if fr.get("page") else None,
                    delay=fr.get("delay", 0))
        out.append(img)
    return out

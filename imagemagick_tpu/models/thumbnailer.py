"""The flagship pipeline: corpus-scale thumbnailer (BASELINE config #5).

End-to-end: decode N JPEGs -> Lanczos resize -> watermark composite ->
colorspace -> encode, organized as a producer/consumer pipeline:

  * host threads decode with the native GIL-free codec runtime
    (native/miniio.cpp) into fixed-size staging batches
  * the device runs ONE fused XLA program per batch (resize+composite+
    colorspace), double-buffered against the decode pool
  * encode threads drain finished batches

This replaces the reference's one-image-at-a-time `mogrify` loop
(/root/reference/MagickWand/mogrify.c) with a batched device pipeline —
the architecture SURVEY.md §7 step 9 calls for.

Variable input sizes are handled by letterboxing each decode into the
staging shape (aspect-preserving), so every batch compiles once.
"""

from __future__ import annotations

import concurrent.futures as futures
import io as _io
import os
import time
from dataclasses import dataclass
from typing import Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class ThumbnailerConfig:
    thumb_width: int = 256
    thumb_height: int = 256
    stage_width: int = 1024     # staging canvas (decoded images letterboxed)
    stage_height: int = 1024
    batch_size: int = 32
    quality: int = 87
    grayscale: bool = False
    decode_workers: int = 8
    encode_workers: int = 8


def _decode_to_stage(blob: bytes, sw: int, sh: int) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Decode and letterbox into (sh, sw, 3) uint8; returns (staged, (w, h))."""
    from .. import native

    arr = native.decode_jpeg(blob) if native.available() else None
    if arr is None:
        from PIL import Image as PImage

        pim = PImage.open(_io.BytesIO(blob)).convert("RGB")
        arr = np.asarray(pim)
    h, w = arr.shape[:2]
    # host-side decimation if wildly larger than the stage (cheap stride trick)
    while h > 2 * sh and w > 2 * sw:
        arr = arr[::2, ::2]
        h, w = arr.shape[:2]
    ch, cw = min(h, sh), min(w, sw)
    staged = np.zeros((sh, sw, 3), np.uint8)
    staged[:ch, :cw] = arr[:ch, :cw]
    return staged, (cw, ch)


def make_device_step(cfg: ThumbnailerConfig, watermark: Optional[jnp.ndarray] = None):
    """Build the jitted batch step: (B, SH, SW, 3) u8 + sizes -> (B, th, tw, C) u8.

    On TPU the resize (+ grayscale mix) runs through the fused Pallas
    pipeline kernel (ops/fused_pipeline.py): the staged batch is viewed
    flat (B*SH, SW*3) and converted u8->f32 on device IN that layout, so
    no relayout happens at the kernel boundary; the watermark composites
    onto the small thumbnail afterwards (cheap).  Falls back to the XLA
    op path when the kernel declines the shape.
    """
    from ..ops import colorspace as cs
    from ..ops import composite as comp
    from ..ops import resize as rz
    from ..ops.fused_pipeline import fused_resize_pipeline

    import numpy as _np

    th, tw = cfg.thumb_height, cfg.thumb_width
    gray_mix = _np.asarray([[0.212656, 0.715158, 0.072186]]) \
        if cfg.grayscale and watermark is None else None

    def _finish(y):
        if watermark is not None:
            y = comp.composite_at(y, watermark, "dissolve", 0, 0, "southeast",
                                  src_alpha=watermark.shape[-1] == 4,
                                  args=(35.0,))[..., :3]
            if cfg.grayscale:
                y = cs.convert(y, "srgb", "gray")
        return (jnp.clip(y, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)

    @jax.jit
    def step(staged_u8: jnp.ndarray, sizes: jnp.ndarray):
        b, sh, sw, c = staged_u8.shape
        flat = staged_u8.reshape(b * sh, sw * c).astype(jnp.float32) / 255.0
        y = fused_resize_pipeline(flat, th, tw, "lanczos", 0.0, gray_mix,
                                  in_shape=(b, sh, sw, c))
        if y is None:   # kernel declined: XLA op path
            x = staged_u8.astype(jnp.float32) / 255.0
            y = rz.resize(x, th, tw, "lanczos")
            if cfg.grayscale and watermark is None:
                y = cs.convert(y, "srgb", "gray")
        return _finish(y)

    return step


def run(paths: Sequence[str], out_dir: str,
        cfg: Optional[ThumbnailerConfig] = None,
        watermark_path: Optional[str] = None) -> dict:
    """Thumbnail a corpus; returns timing/throughput stats."""
    cfg = cfg or ThumbnailerConfig()
    os.makedirs(out_dir, exist_ok=True)
    from .. import native

    wm = None
    if watermark_path:
        from .. import io as iio

        wm_img = iio.read_images(watermark_path)[0]
        wm = wm_img.data

    step = make_device_step(cfg, wm)
    sw, sh = cfg.stage_width, cfg.stage_height
    t0 = time.perf_counter()
    n_done = 0
    total_mp = 0.0

    with futures.ThreadPoolExecutor(cfg.decode_workers) as dec_pool, \
            futures.ThreadPoolExecutor(cfg.encode_workers) as enc_pool:

        def decode_one(p):
            with open(p, "rb") as f:
                blob = f.read()
            return _decode_to_stage(blob, sw, sh)

        enc_futures = []
        batch_paths: List[str] = []
        staged_list: List[np.ndarray] = []
        sizes_list: List[Tuple[int, int]] = []

        def flush():
            nonlocal n_done, total_mp
            if not staged_list:
                return
            n = len(staged_list)
            pad = cfg.batch_size - n
            staged = np.stack(staged_list + [staged_list[-1]] * pad)
            sizes = np.asarray(sizes_list + [sizes_list[-1]] * pad, np.int32)
            out = np.asarray(step(jnp.asarray(staged), jnp.asarray(sizes)))
            for i in range(n):
                p = batch_paths[i]
                name = os.path.splitext(os.path.basename(p))[0] + ".jpg"
                dst = os.path.join(out_dir, name)
                arr = out[i]

                def write(arr=arr, dst=dst):
                    blob = native.encode_jpeg(arr if arr.shape[-1] == 3 else
                                              np.repeat(arr, 3, -1)[..., :3],
                                              cfg.quality)
                    if blob is None:
                        from PIL import Image as PImage

                        buf = _io.BytesIO()
                        PImage.fromarray(arr.squeeze()).save(buf, "JPEG",
                                                             quality=cfg.quality)
                        blob = buf.getvalue()
                    with open(dst, "wb") as f:
                        f.write(blob)

                enc_futures.append(enc_pool.submit(write))
                total_mp += sizes[i][0] * sizes[i][1] / 1e6
                n_done += 1
            batch_paths.clear()
            staged_list.clear()
            sizes_list.clear()

        for path, result in zip(paths, dec_pool.map(decode_one, paths)):
            staged, size = result
            batch_paths.append(path)
            staged_list.append(staged)
            sizes_list.append(size)
            if len(staged_list) == cfg.batch_size:
                flush()
        flush()
        for f in enc_futures:
            f.result()

    dt = time.perf_counter() - t0
    return {
        "images": n_done,
        "seconds": round(dt, 3),
        "images_per_sec": round(n_done / dt, 2) if dt > 0 else 0.0,
        "megapixels_per_sec": round(total_mp / dt, 2) if dt > 0 else 0.0,
    }

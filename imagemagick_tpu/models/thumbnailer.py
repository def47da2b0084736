"""The flagship pipeline: corpus-scale thumbnailer (BASELINE config #5).

End-to-end: decode N JPEGs -> Lanczos resize -> watermark composite ->
colorspace -> encode, organized as a producer/consumer pipeline:

  * host threads decode with the native GIL-free codec runtime
    (native/miniio.cpp) straight into the kernel's flat wire layout
    (rows x 128-aligned W*C lanes) — no letterbox canvas, no padding
    upload beyond <=127 lanes per row
  * images are grouped by exact decoded size; each group gets ONE
    compiled program (uniform corpora compile once)
  * device batches are DOUBLE-BUFFERED: while batch k computes and reads
    back, batch k+1 is decoding and uploading (VERDICT r2 #7 — hide the
    host<->device transfer behind compute; through this machine's
    tunnel the upload still caps throughput, see benchmarks.py's
    ceiling note)
  * encode threads drain finished batches

This replaces the reference's one-image-at-a-time `mogrify` loop
(/root/reference/MagickWand/mogrify.c) with a batched device pipeline —
the architecture SURVEY.md §7 step 9 calls for.
"""

from __future__ import annotations

import concurrent.futures as futures
import io as _io
import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class ThumbnailerConfig:
    thumb_width: int = 256
    thumb_height: int = 256
    stage_width: int = 1024     # decimation bound for oversized inputs
    stage_height: int = 1024
    batch_size: int = 32
    quality: int = 87
    grayscale: bool = False
    decode_workers: int = 8
    encode_workers: int = 8
    # DCT-scaled decode (coders/jpeg.c jpeg:size culture): decode at the
    # largest 1/{2,4,8} scale still covering scale_hint_mul x the thumb
    # dims (1.0 = exactly `-define jpeg:size=WxH`), so the Lanczos pass
    # always downsamples.  Cuts host->device bytes ~4x on 2-4x-larger
    # sources — the dominant cost through a slow transfer link.
    dct_scale_hint: bool = True
    scale_hint_mul: float = 1.0
    # in-flight device batches before the oldest is drained; >=3 lets
    # batch k's readback overlap k+1's upload and k+2's staging
    inflight_depth: int = 3


def _align(x: int, m: int) -> int:
    return -(-x // m) * m


def _decode_flat(blob: bytes, max_w: int, max_h: int,
                 min_w: int = 0, min_h: int = 0
                 ) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Decode into the flat wire layout: (h8, wcp) u8 with the image's
    (h, w, 3) bytes row-major in the top-left and zero pad to the
    8-row / 128-lane alignment.  Returns (flat, (w, h)).  min_w/min_h > 0
    request a DCT-scaled decode covering at least that size."""
    from .. import native

    arr = None
    if native.available():
        arr = (native.decode_jpeg_scaled(blob, min_w, min_h)
               if min_w and min_h else native.decode_jpeg(blob))
    if arr is None:
        from PIL import Image as PImage

        pim = PImage.open(_io.BytesIO(blob))
        if min_w and min_h:
            pim.draft("RGB", (min_w, min_h))    # PIL's DCT-scale hint
        pim = pim.convert("RGB")
        arr = np.asarray(pim)
    h, w = arr.shape[:2]
    # host-side decimation if wildly larger than the bound (stride trick)
    while h > 2 * max_h and w > 2 * max_w:
        arr = arr[::2, ::2]
        h, w = arr.shape[:2]
    h8 = _align(h, 8)
    wcp = _align(w * 3, 128)
    flat = np.zeros((h8, wcp), np.uint8)
    flat[:h, :w * 3] = arr.reshape(h, w * 3)
    return flat, (w, h)


def make_flat_step(cfg: ThumbnailerConfig, h: int, w: int,
                   watermark: Optional[jnp.ndarray] = None):
    """Jitted batch step for ONE source size: (B, h8, wcp) u8 flat ->
    (B, th, tw, C) u8.  The resize (+ gray mix) runs through the fused
    Pallas kernel on the flat layout (born in the wire layout — no
    relayout at the kernel boundary); XLA op fallback otherwise."""
    from ..ops import colorspace as cs
    from ..ops import composite as comp
    from ..ops import resize as rz
    from ..ops.fused_pipeline import fused_linear_pipeline
    from ..ops.resize import resize_matrix

    th, tw = cfg.thumb_height, cfg.thumb_width
    gray_mix = np.asarray([[0.212656, 0.715158, 0.072186]]) \
        if cfg.grayscale and watermark is None else None
    h8 = _align(h, 8)
    wcp = _align(w * 3, 128)
    Mv = resize_matrix(h, th, "lanczos").astype(np.float64).T
    Mv = np.pad(Mv, ((0, 0), (0, h8 - h)))      # pad rows contribute 0
    Mw = resize_matrix(w, tw, "lanczos").astype(np.float64).T

    def _finish(y):
        if watermark is not None:
            y = comp.composite_at(y, watermark, "dissolve", 0, 0,
                                  "southeast",
                                  src_alpha=watermark.shape[-1] == 4,
                                  args=(35.0,))[..., :3]
            if cfg.grayscale:
                y = cs.convert(y, "srgb", "gray")
        return (jnp.clip(y, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)

    @jax.jit
    def step(staged_u8: jnp.ndarray):
        b = staged_u8.shape[0]
        flat = staged_u8.reshape(b * h8, wcp).astype(jnp.float32) / 255.0
        y = fused_linear_pipeline(flat, [(Mv, Mw)], 3, mix=gray_mix,
                                  in_shape=(b, h8, w, 3), winc_pad=wcp)
        if y is None:   # kernel declined: XLA op path on the true region
            x = flat.reshape(b, h8, wcp)[:, :h, :w * 3].reshape(b, h, w, 3)
            y = rz.resize(x, th, tw, "lanczos")
            if cfg.grayscale and watermark is None:
                y = cs.convert(y, "srgb", "gray")
        return _finish(y)

    return step


def run(paths: Sequence[str], out_dir: str,
        cfg: Optional[ThumbnailerConfig] = None,
        watermark_path: Optional[str] = None) -> dict:
    """Thumbnail a corpus; returns timing/throughput stats.

    Pipeline: decode pool -> per-size batches -> double-buffered device
    steps -> encode pool.  `overlap_s` in the stats reports how much
    device time was hidden behind decode.
    """
    cfg = cfg or ThumbnailerConfig()
    os.makedirs(out_dir, exist_ok=True)
    from .. import native

    wm = None
    if watermark_path:
        from .. import io as iio

        wm_img = iio.read_images(watermark_path)[0]
        wm = wm_img.data

    steps: Dict[Tuple[int, int], object] = {}

    def step_for(h, w):
        key = (h, w)
        if key not in steps:
            steps[key] = make_flat_step(cfg, h, w, wm)
        return steps[key]

    t0 = time.perf_counter()
    n_done = 0
    total_mp = 0.0
    drain_wait = 0.0
    staged_bytes = 0

    with futures.ThreadPoolExecutor(cfg.decode_workers) as dec_pool, \
            futures.ThreadPoolExecutor(cfg.encode_workers) as enc_pool:

        def decode_one(p):
            with open(p, "rb") as f:
                blob = f.read()
            mw = int(cfg.thumb_width * cfg.scale_hint_mul) \
                if cfg.dct_scale_hint else 0
            mh = int(cfg.thumb_height * cfg.scale_hint_mul) \
                if cfg.dct_scale_hint else 0
            return _decode_flat(blob, cfg.stage_width, cfg.stage_height,
                                mw, mh)

        enc_futures = []
        # per-size pending batches
        pend: Dict[Tuple[int, int], Tuple[List[str], List[np.ndarray]]] = {}
        inflight: List[Tuple[object, List[str]]] = []

        def write_thumb(arr, dst):
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

        def drain_one():
            nonlocal n_done, drain_wait
            out_dev, bpaths = inflight.pop(0)
            tw0 = time.perf_counter()
            out = np.asarray(out_dev)     # sync point (device readback)
            drain_wait += time.perf_counter() - tw0
            for i, p in enumerate(bpaths):
                name = os.path.splitext(os.path.basename(p))[0] + ".jpg"
                enc_futures.append(enc_pool.submit(
                    write_thumb, out[i], os.path.join(out_dir, name)))
                n_done += 1

        def submit(key):
            nonlocal staged_bytes
            bpaths, flats = pend.pop(key)
            staged = np.stack(flats)
            staged_bytes += staged.nbytes
            # Pass the HOST array straight into the jitted step: the
            # jit-argument transfer path moves bytes ~40x faster through
            # this machine's tunnel than an explicit device_put
            # (jnp.asarray) — measured 13 vs 0.35 MB/s (CLAUDE.md round-2
            # notes).  Same TPU behavior either way; strictly better here.
            out_dev = step_for(*key)(staged)
            # Start the device->host copy NOW so the readback streams
            # behind the next batches' decode+upload instead of starting
            # cold inside drain_one's blocking np.asarray.
            try:
                out_dev.copy_to_host_async()
            except Exception:   # noqa: BLE001 - optional fast path
                pass
            inflight.append((out_dev, bpaths))
            # deep pipeline: keep inflight_depth batches queued so batch
            # k's readback overlaps k+1's upload and k+2's staging
            while len(inflight) >= max(cfg.inflight_depth, 1) + 1:
                drain_one()

        for path, (flat, (w, h)) in zip(paths,
                                        dec_pool.map(decode_one, paths)):
            key = (h, w)
            bpaths, flats = pend.setdefault(key, ([], []))
            bpaths.append(path)
            flats.append(flat)
            total_mp += w * h / 1e6
            if len(flats) == cfg.batch_size:
                submit(key)
        for key in list(pend):
            submit(key)
        while inflight:
            drain_one()
        for f in enc_futures:
            f.result()

    dt = time.perf_counter() - t0
    return {
        "images": n_done,
        "seconds": round(dt, 3),
        "images_per_sec": round(n_done / dt, 2) if dt > 0 else 0.0,
        "megapixels_per_sec": round(total_mp / dt, 2) if dt > 0 else 0.0,
        "device_drain_wait_s": round(drain_wait, 3),
        # fraction of wall time the host pipeline (decode/stage/encode)
        # ran WITHOUT blocking on the device — the double-buffering win;
        # 1.0 = device time fully hidden behind host work
        "overlap_efficiency": round(1.0 - drain_wait / dt, 3)
        if dt > 0 else 0.0,
        # actual host->device staging volume (DCT-scaled decode stages
        # the REDUCED size, not the source size — see _decode_flat)
        "staged_MB": round(staged_bytes / 1e6, 2),
        "size_groups": len(steps),
    }

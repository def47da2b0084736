"""Color quantization: k-means, posterize, remap, error-diffusion (quantize.c).

Re-implements /root/reference/MagickCore/quantize.c (4,123 LoC):
QuantizeImage (:3260, octree classify/reduce/assign), KmeansImage (:2483),
PosterizeImage, RemapImage, plus Floyd-Steinberg error diffusion (:391
region) and Riemersma Hilbert-curve dithering.

TPU formulation: color reduction is k-means (the reference's KmeansImage;
its octree is a CPU pointer structure — k-means on the MXU dominates it at
any size).  Error diffusion is inherently a sequential scan; we run it as a
``lax.scan`` over rows with the within-row dependency handled by a serial
fori_loop over columns on-device — correct FS semantics without host
fallback (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def posterize(img: jnp.ndarray, levels: int, dither=False,
              key=None) -> jnp.ndarray:
    """PosterizeImage (quantize.c:2236): reduce to `levels` per channel.

    The reference dithers by default with the Riemersma method
    (quantize.c:1688 — Hilbert-curve error diffusion), which is
    inherently host-sequential; `dither=True`/"riemersma" runs the
    native riemersma.cpp kernel.  "ordered" keeps the o8x8 threshold-map
    alternative; the native path falls back to plain rounding if the
    toolchain is unavailable.
    """
    n = max(levels - 1, 1)
    if dither == "ordered":
        from .threshold import ordered_dither

        return ordered_dither(img, "o8x8", levels)
    if dither:
        from .. import native

        fn = native.floyd_steinberg_posterize \
            if dither in ("floydsteinberg", "fs") \
            else native.riemersma_posterize
        arr = np.asarray(img, np.float32)
        batched = arr.ndim == 4
        frames = arr if batched else arr[None]
        outs = []
        ok = True
        for f in frames:
            o = fn(f, levels)
            if o is None:
                ok = False
                break
            outs.append(o)
        if ok:
            out = np.stack(outs) if batched else outs[0]
            return jnp.asarray(out)
    return jnp.round(img * n) / n


def kmeans(img: jnp.ndarray, n_colors: int = 16, max_iters: int = 20,
           tolerance: float = 1e-4, key=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KmeansImage (quantize.c:2483): returns (palette, labels).

    Initialization: evenly-spaced samples of the sorted-by-luma pixels (a
    deterministic k-means++ stand-in).  Distance computation is one big
    (N, K) matmul — MXU food.
    """
    c = img.shape[-1]
    flat = img.reshape(-1, c)
    n = flat.shape[0]
    luma = jnp.mean(flat, axis=-1)
    order = jnp.argsort(luma)
    take = jnp.linspace(0, n - 1, n_colors).astype(jnp.int32)
    centers = flat[order[take]]

    def step(carry, _):
        centers, _prev = carry
        # squared distances via expansion: |x|² - 2 x·c + |c|²
        x2 = jnp.sum(flat * flat, axis=1, keepdims=True)
        c2 = jnp.sum(centers * centers, axis=1)[None, :]
        xc = flat @ centers.T
        d2 = x2 - 2.0 * xc + c2
        labels = jnp.argmin(d2, axis=1)
        one_hot = jax.nn.one_hot(labels, n_colors, dtype=flat.dtype)
        counts = jnp.sum(one_hot, axis=0)
        sums = one_hot.T @ flat
        new_centers = jnp.where(counts[:, None] > 0,
                                sums / jnp.maximum(counts[:, None], 1.0),
                                centers)
        shift = jnp.max(jnp.abs(new_centers - centers))
        return (new_centers, shift), None

    (centers, _), _ = lax.scan(step, (centers, jnp.float32(1.0)), None,
                               length=max_iters)
    x2 = jnp.sum(flat * flat, axis=1, keepdims=True)
    c2 = jnp.sum(centers * centers, axis=1)[None, :]
    d2 = x2 - 2.0 * (flat @ centers.T) + c2
    labels = jnp.argmin(d2, axis=1).reshape(img.shape[:-1])
    return centers, labels


def kmeans_quantize(img: jnp.ndarray, n_colors: int = 16,
                    max_iters: int = 20) -> jnp.ndarray:
    palette, labels = kmeans(img, n_colors, max_iters)
    return palette[labels]


def kmeans_reference(img: jnp.ndarray, n_colors: int,
                     max_iters: int = 300, tolerance: float = 1e-4,
                     seed_palette=None) -> jnp.ndarray:
    """KmeansImage (quantize.c:2352-2854), reference-exact.

    Seeds the clusters from the octree quantizer at the derived depth
    (quantize.c:2543 ``for (depth=1; n != 0; depth++) n>>=2``), then
    iterates: assign by first-strictly-smaller squared RGB distance in
    normalized units, recompute means (empty clusters collapse to black
    via PerceptibleReciprocal(0)), and stop when the summed assignment
    distortion changes by <= tolerance.  Small images run host-side in
    f64 so the distortion-delta stop decision matches the reference
    bit-for-bit; large ones use the device MXU path."""
    from .. import native

    c = img.shape[-1]
    arr = np.asarray(img, np.float32)
    if seed_palette is None:
        depth, m = 1, int(n_colors)
        while m != 0:
            m >>= 2
            depth += 1
        q = native.octree_quantize(arr[..., :3] if c >= 3 else arr,
                                   int(n_colors), dither="none",
                                   tree_depth=depth)
        if q is None:
            centers = np.asarray(kmeans(img, n_colors)[0], np.float64)[:, :3]
        else:
            centers = np.asarray(q[1], np.float64)[:, :3]
    else:
        centers = np.asarray(seed_palette, np.float64)[:, :3]
    flat = arr.reshape(-1, c)[:, :3].astype(np.float64)
    n = flat.shape[0]
    if n <= (1 << 20):
        prev = 0.0
        labels = np.zeros(n, np.int64)
        for _ in range(int(max_iters)):
            d2 = ((flat[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
            labels = np.argmin(d2, axis=1)
            mind = d2[np.arange(n), labels]
            distortion = float(mind.sum())
            k = centers.shape[0]
            counts = np.bincount(labels, minlength=k).astype(np.float64)
            sums = np.zeros((k, 3), np.float64)
            np.add.at(sums, labels, flat)
            centers = np.where(counts[:, None] > 0,
                               sums / np.maximum(counts[:, None], 1.0), 0.0)
            if abs(distortion - prev) <= tolerance:
                break
            prev = distortion
        out3 = centers[labels].reshape(img.shape[:-1] + (3,))
        out3 = jnp.asarray(out3.astype(np.float32))
    else:
        cj = jnp.asarray(centers, jnp.float32)
        fj = jnp.asarray(flat, jnp.float32)
        prev = 0.0
        k = centers.shape[0]
        labels = None
        for _ in range(int(max_iters)):
            d2 = (jnp.sum(fj * fj, 1, keepdims=True)
                  - 2.0 * fj @ cj.T + jnp.sum(cj * cj, 1)[None, :])
            labels = jnp.argmin(d2, axis=1)
            oh = jax.nn.one_hot(labels, k, dtype=jnp.float32)
            counts = jnp.sum(oh, axis=0)
            sums = oh.T @ fj
            distortion = float(jnp.sum(jnp.min(d2, axis=1)))
            cj = jnp.where(counts[:, None] > 0,
                           sums / jnp.maximum(counts[:, None], 1.0), 0.0)
            if abs(distortion - prev) <= tolerance:
                break
            prev = distortion
        out3 = jnp.take(cj, labels, axis=0).reshape(img.shape[:-1] + (3,))
    if c > 3:
        return jnp.concatenate([out3, img[..., 3:]], -1)
    if c < 3:
        return out3[..., :c]
    return out3


def remap(img: jnp.ndarray, palette: jnp.ndarray,
          dither: bool = False) -> jnp.ndarray:
    """RemapImage: snap each pixel to the nearest palette entry."""
    if dither:
        return floyd_steinberg(img, palette)
    c = img.shape[-1]
    flat = img.reshape(-1, c)
    pal = palette.reshape(-1, c)
    x2 = jnp.sum(flat * flat, axis=1, keepdims=True)
    p2 = jnp.sum(pal * pal, axis=1)[None, :]
    d2 = x2 - 2.0 * (flat @ pal.T) + p2
    labels = jnp.argmin(d2, axis=1)
    return pal[labels].reshape(img.shape)


def _nearest(pixel: jnp.ndarray, palette: jnp.ndarray) -> jnp.ndarray:
    d2 = jnp.sum((palette - pixel[None, :]) ** 2, axis=1)
    return palette[jnp.argmin(d2)]


def floyd_steinberg(img: jnp.ndarray, palette: jnp.ndarray) -> jnp.ndarray:
    """Floyd-Steinberg error diffusion (quantize.c:391 region).

    Serpentine scan like the reference.  Row loop is a lax.scan; the
    within-row loop is a fori_loop carrying the running right-propagated
    error — sequential by nature, but fully on-device.

    Error weights: right 7/16; next row left 3/16, center 5/16, right 1/16.
    """
    if img.ndim == 4:
        return jax.vmap(lambda im: floyd_steinberg(im, palette))(img)
    h, w, c = img.shape
    pal = palette.reshape(-1, c)

    def row_fn(carry, inp):
        below_err, direction = carry
        row = inp + below_err  # (w, c)

        def col_fn(i, state):
            row_out, right_err, next_err = state
            j = jnp.where(direction > 0, i, w - 1 - i)
            old = row[j] + right_err
            new = _nearest(jnp.clip(old, 0.0, 1.0), pal)
            err = old - new
            row_out = row_out.at[j].set(new)
            right_err = err * (7.0 / 16.0)
            jl = jnp.clip(j - direction, 0, w - 1)
            jr = jnp.clip(j + direction, 0, w - 1)
            next_err = next_err.at[jl].add(err * (3.0 / 16.0))
            next_err = next_err.at[j].add(err * (5.0 / 16.0))
            next_err = next_err.at[jr].add(err * (1.0 / 16.0))
            return row_out, right_err, next_err

        row_out, _, next_err = lax.fori_loop(
            0, w, col_fn,
            (jnp.zeros_like(row), jnp.zeros((c,), img.dtype), jnp.zeros_like(row)))
        return (next_err, -direction), row_out

    (_, _), rows = lax.scan(row_fn, (jnp.zeros((w, c), img.dtype),
                                     jnp.int32(1)), img)
    return rows


def _hilbert_order(order: int) -> np.ndarray:
    """Flat visit order of a 2^order x 2^order Hilbert curve (host-side)."""
    n = 1 << order
    # iterative d2xy conversion
    idx = np.arange(n * n)
    rx = np.zeros_like(idx)
    ry = np.zeros_like(idx)
    x = np.zeros_like(idx)
    y = np.zeros_like(idx)
    t = idx.copy()
    s = 1
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f, y_f = x.copy(), y.copy()
        x[swap], y[swap] = y_f[swap], x_f[swap]
        x[flip] = s - 1 - x[flip]
        y[flip] = s - 1 - y[flip]
        x = x + s * rx
        y = y + s * ry
        t //= 4
        s *= 2
    return y * n + x


def riemersma(img: jnp.ndarray, palette: jnp.ndarray,
              history: int = 16) -> jnp.ndarray:
    """Riemersma Hilbert-curve dithering (quantize.c:391 region).

    Pixels are visited in Hilbert order; quantization error decays
    exponentially along the curve (the reference's weighted history).  The
    traversal order is precomputed host-side; the error-carrying walk is a
    single lax.scan over the curve — sequential like the reference, but one
    fused on-device program.
    """
    if img.ndim == 4:
        return jax.vmap(lambda im: riemersma(im, palette, history))(img)
    h, w, c = img.shape
    side_order = max(int(np.ceil(np.log2(max(h, w, 2)))), 1)
    side = 1 << side_order
    order = _hilbert_order(side_order)
    ys, xs = np.divmod(order, side)
    keep = (ys < h) & (xs < w)
    ys, xs = ys[keep], xs[keep]
    flat_idx = jnp.asarray(ys * w + xs, jnp.int32)
    pixels = img.reshape(-1, c)[flat_idx]  # pixels in Hilbert order
    pal = palette.reshape(-1, c)
    decay = float(np.exp(np.log(1.0 / history) / max(history - 1, 1)))

    def step(err, px):
        v = jnp.clip(px + err, 0.0, 1.0)
        d2 = jnp.sum((pal - v[None, :]) ** 2, axis=1)
        new = pal[jnp.argmin(d2)]
        err_new = (v - new) + err * decay
        return err_new, new

    _, out_seq = lax.scan(step, jnp.zeros((c,), img.dtype), pixels)
    out = img.reshape(-1, c).at[flat_idx].set(out_seq)
    return out.reshape(h, w, c)


def ordered_posterize(img: jnp.ndarray, levels: int = 2,
                      map_name: str = "o8x8") -> jnp.ndarray:
    from .threshold import ordered_dither

    return ordered_dither(img, map_name, levels)


def unique_colors_count(img: jnp.ndarray, bits: int = 8) -> jnp.ndarray:
    """Approximate unique color count via quantized hashing (histogram.c
    UniqueImageColors analog, device-side)."""
    q = jnp.clip((img * ((1 << bits) - 1) + 0.5).astype(jnp.uint32), 0, (1 << bits) - 1)
    c = img.shape[-1]
    key = jnp.zeros(img.shape[:-1], jnp.uint32)
    for i in range(min(c, 3)):
        key = key * (1 << bits) + q[..., i]
    flat = jnp.sort(key.reshape(-1))
    return 1 + jnp.sum(flat[1:] != flat[:-1])


def compress_colormap(palette: jnp.ndarray, labels: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CompressImageColormap analog: drop unused palette entries (host-side)."""
    pal = np.asarray(palette)
    lab = np.asarray(labels)
    used = np.unique(lab)
    remapping = np.zeros(pal.shape[0], np.int32)
    remapping[used] = np.arange(used.size)
    return jnp.asarray(pal[used]), jnp.asarray(remapping[lab])

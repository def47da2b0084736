"""Paint ops: flood fill, opaque/transparent paint, oil paint (paint.c).

Re-implements /root/reference/MagickCore/paint.c (1,299 LoC, 5 OMP loops):
FloodfillPaintImage (:112), OpaquePaintImage (:927), TransparentPaintImage,
OilPaintImage, GradientImage.

Flood fill is the data-dependent one: the reference runs a scanline stack
walk; here it is iterative mask dilation gated by the fuzz-match predicate
inside a lax.while_loop — converges in O(diameter) fused steps, each a
cheap 4-neighbor max.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _fuzz_match(img: jnp.ndarray, target: jnp.ndarray, fuzz: float) -> jnp.ndarray:
    """IsFuzzyEquivalencePixel analog: squared-distance fuzz compare."""
    d2 = jnp.mean((img - target) ** 2, axis=-1)
    return d2 <= (fuzz * fuzz + 1e-12)


def opaque_paint(img: jnp.ndarray, target_color: Sequence[float],
                 fill_color: Sequence[float], fuzz: float = 0.0,
                 invert: bool = False) -> jnp.ndarray:
    """OpaquePaintImage: recolor pixels fuzz-matching the target."""
    t = jnp.asarray(target_color, img.dtype)[: img.shape[-1]]
    f = jnp.asarray(fill_color, img.dtype)[: img.shape[-1]]
    m = _fuzz_match(img, t, fuzz)
    if invert:
        m = ~m
    return jnp.where(m[..., None], f, img)


def transparent_paint(img: jnp.ndarray, target_color: Sequence[float],
                      alpha: float = 0.0, fuzz: float = 0.0,
                      invert: bool = False) -> jnp.ndarray:
    """TransparentPaintImage: set alpha where color fuzz-matches (needs alpha ch)."""
    t = jnp.asarray(target_color, img.dtype)[: img.shape[-1] - 1]
    m = _fuzz_match(img[..., :-1], t, fuzz)
    if invert:
        m = ~m
    new_a = jnp.where(m, alpha, img[..., -1])
    return jnp.concatenate([img[..., :-1], new_a[..., None]], axis=-1)


def floodfill(img: jnp.ndarray, x: int, y: int, fill_color: Sequence[float],
              fuzz: float = 0.0, max_iters: Optional[int] = None,
              target_color: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """FloodfillPaintImage (paint.c:112): 4-connected fill from a seed.

    Mask propagation: seed -> repeat (dilate ∧ matchable) until fixpoint.
    The flood target is the explicit ``target_color`` when given (the CLI
    ``-floodfill geometry color`` form, mogrify.c) else the seed pixel
    (the MVG ``color x,y floodfill`` form, draw.c).
    """
    h, w = img.shape[-3], img.shape[-2]
    if target_color is not None:
        target = jnp.asarray(target_color, img.dtype)[: img.shape[-1]]
    else:
        target = img[..., y, x, :]
    matchable = _fuzz_match(img, target, fuzz)  # (..., H, W)
    seed = jnp.zeros(img.shape[:-1], bool).at[..., y, x].set(True)

    def dilate4(m):
        up = jnp.pad(m[..., 1:, :], [(0, 0)] * (m.ndim - 2) + [(0, 1), (0, 0)])
        dn = jnp.pad(m[..., :-1, :], [(0, 0)] * (m.ndim - 2) + [(1, 0), (0, 0)])
        lf = jnp.pad(m[..., :, 1:], [(0, 0)] * (m.ndim - 2) + [(0, 0), (0, 1)])
        rt = jnp.pad(m[..., :, :-1], [(0, 0)] * (m.ndim - 2) + [(0, 0), (1, 0)])
        return m | up | dn | lf | rt

    def cond(state):
        mask, changed, it = state
        return changed & (it < (max_iters or (h + w)))

    def body(state):
        mask, _, it = state
        grown = dilate4(mask) & matchable
        return grown, jnp.any(grown != mask), it + 1

    mask, _, _ = lax.while_loop(cond, body, (seed & matchable, jnp.bool_(True), 0))
    f = jnp.asarray(fill_color, img.dtype)[: img.shape[-1]]
    return jnp.where(mask[..., None], f, img)


def oil_paint(img: jnp.ndarray, radius: float = 3.0, sigma: float = 0.0,
              levels: int = 256) -> jnp.ndarray:
    """OilPaintImage (paint.c:709): windowed mode of the pixel INTENSITY
    over NumberPaintBins=256 char bins; the winning bin's color is the
    mean of its contributors (the reference keeps one contributor —
    indistinguishable at 1/256 bin width).  Window from
    GetOptimalKernelWidth2D(radius, sigma)."""
    from ..core.virtual_pixel import pad_spatial
    from .blur import optimal_kernel_width_2d

    k = optimal_kernel_width_2d(radius, sigma)
    r = (k - 1) // 2
    lead = img.shape[:-3]
    h, w, c = img.shape[-3:]
    x = img.reshape((-1, h, w, c))
    if c >= 3:
        inten = (0.212656 * x[..., :1] + 0.715158 * x[..., 1:2] +
                 0.072186 * x[..., 2:3])
    else:
        inten = x[..., :1]
    q = jnp.clip((jnp.clip(inten, 0.0, 1.0) * 255.0 + 0.5)
                 .astype(jnp.int32), 0, levels - 1)
    xp = pad_spatial(x, (r, r), (r, r), "edge")
    qp = pad_spatial(q.astype(jnp.float32), (r, r), (r, r), "edge").astype(jnp.int32)

    # The reference scans the window in row-major order keeping a running
    # strict max: j updates whenever a bin's incremented count EXCEEDS
    # the best so far, and the output copies that exact pixel — so the
    # winner is the first bin to reach the final max, represented by its
    # last scan-order contributor.  Replicated step-for-step.
    counts = jnp.zeros(x.shape[:-1] + (levels,), jnp.float32)
    best_count = jnp.zeros(x.shape[:-1], jnp.float32)
    best_color = x
    for dy in range(k):
        for dx in range(k):
            nq = lax.dynamic_slice(qp, (0, dy, dx, 0), q.shape)[..., 0]
            nx = lax.dynamic_slice(xp, (0, dy, dx, 0), x.shape)
            oh = jax.nn.one_hot(nq, levels, dtype=jnp.float32)
            counts = counts + oh
            cur = jnp.take_along_axis(counts, nq[..., None], axis=-1)[..., 0]
            upd = cur > best_count
            best_count = jnp.where(upd, cur, best_count)
            best_color = jnp.where(upd[..., None], nx, best_color)
    return best_color.reshape(img.shape)


def gradient_image(height: int, width: int, start: Sequence[float],
                   stop: Sequence[float], gradient_type: str = "linear",
                   angle: float = 0.0) -> jnp.ndarray:
    """GradientImage (paint.c): linear/radial two-stop gradient canvas."""
    c1 = jnp.asarray(start, jnp.float32)
    c2 = jnp.asarray(stop, jnp.float32)
    yy = jnp.linspace(0.0, 1.0, height)[:, None]
    xx = jnp.linspace(0.0, 1.0, width)[None, :]
    if gradient_type == "radial":
        t = jnp.sqrt((yy - 0.5) ** 2 + (xx - 0.5) ** 2) / math.sqrt(0.5)
    else:
        th = math.radians(angle)
        t = yy * math.cos(th) + xx * math.sin(th)
        t = (t - t.min()) / jnp.maximum(t.max() - t.min(), 1e-12)
    t = jnp.clip(t, 0.0, 1.0)[..., None]
    return c1 * (1.0 - t) + c2 * t

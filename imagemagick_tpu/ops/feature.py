"""Feature detection: Canny, Hough lines, mean-shift, Haralick features.

Re-implements /root/reference/MagickCore/feature.c (2,343 LoC, 9 OMP loops):
CannyEdgeImage (:239), HoughLineImage, MeanShiftImage, GetImageFeatures
(GLCM texture metrics).

Canny's hysteresis (a data-dependent flood) runs as bounded label
propagation; the Hough accumulator is a scatter-add over (rho, theta) bins;
mean-shift is a fixed-point window iteration — all single fused programs.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import blur as bl
from .enhance import grayscale


def canny_edge(img: jnp.ndarray, radius: float = 0.0, sigma: float = 1.0,
               lower_percent: float = 0.1, upper_percent: float = 0.3,
               hysteresis_iters: int = 64) -> jnp.ndarray:
    """CannyEdgeImage (feature.c:239) — reference-exact formulation:

    1) separable 1-D-rule gaussian smooth ("blur:RxS;blur:RxS+90")
    2) 2x2 half-pixel gradient: dx = 0.5*(-I00+I01-I10+I11),
       dy = 0.5*(I00+I01-I10-I11) on the luma
    3) orientation from slope dy/dx with tan(22.5)/tan(67.5) knees,
       non-max suppression against the two oriented neighbors
       (suppress on strict <, OOB neighbors = 0)
    4) thresholds lower/upper = percent*(max-min)+min of the NMS map,
       hysteresis growth of the strong set through the weak set.
    """
    gray = grayscale(img) if img.shape[-1] >= 3 else img
    smooth = bl.blur(gray, radius, sigma)[..., 0]
    # 2x2 gradient at (y, x) over rows y..y+1, cols x..x+1 (edge pad)
    I = jnp.pad(smooth, [(0, 0)] * (smooth.ndim - 2) + [(0, 1), (0, 1)],
                mode="edge")
    h, w = smooth.shape[-2], smooth.shape[-1]
    I00 = I[..., :h, :w]
    I01 = I[..., :h, 1:w + 1]
    I10 = I[..., 1:h + 1, :w]
    I11 = I[..., 1:h + 1, 1:w + 1]
    dx = 0.5 * (-I00 + I01 - I10 + I11)
    dy = 0.5 * (I00 + I01 - I10 - I11)
    mag = jnp.hypot(dx, dy)

    eps = 1e-15
    slope = dy / jnp.where(jnp.abs(dx) < eps, jnp.inf, dx)
    # orientation classes (feature.c:155): 0 = N/S, 1 = NW/SE, 2 = E/W,
    # 3 = NE/SW; dx ~ 0 -> 0
    o = jnp.where(
        jnp.abs(dx) < eps, 0,
        jnp.where(slope < 0.0,
                  jnp.where(slope < -2.41421356237, 0,
                            jnp.where(slope < -0.414213562373, 1, 2)),
                  jnp.where(slope > 2.41421356237, 0,
                            jnp.where(slope > 0.414213562373, 3, 2))))

    def shift0(m, dy_, dx_):
        """Shifted view with zero pad (matrix OOB reads as empty)."""
        p = jnp.pad(m, [(0, 0)] * (m.ndim - 2) + [(1, 1), (1, 1)])
        return p[..., 1 + dy_:1 + dy_ + h, 1 + dx_:1 + dx_ + w]

    na = jnp.select([o == 0, o == 1, o == 2],
                    [shift0(mag, -1, 0), shift0(mag, -1, -1),
                     shift0(mag, 0, -1)], shift0(mag, 1, -1))
    nb = jnp.select([o == 0, o == 1, o == 2],
                    [shift0(mag, 1, 0), shift0(mag, 1, 1),
                     shift0(mag, 0, 1)], shift0(mag, -1, 1))
    nms = jnp.where((mag < na) | (mag < nb), 0.0, mag)

    mn = jnp.min(nms)
    mx = jnp.max(nms)
    lo = lower_percent * (mx - mn) + mn
    hi = upper_percent * (mx - mn) + mn
    strong = nms >= hi
    weak = nms >= lo

    def body(i, s):
        grown = s | (shift0(s, 1, 0) | shift0(s, -1, 0) | shift0(s, 0, 1) |
                     shift0(s, 0, -1) | shift0(s, 1, 1) | shift0(s, 1, -1) |
                     shift0(s, -1, 1) | shift0(s, -1, -1))
        return grown & weak

    final = lax.fori_loop(0, hysteresis_iters, body, strong)
    return final.astype(img.dtype)[..., None]


def hough_accumulator(edges: jnp.ndarray, n_theta: int = 180,
                      n_rho: int = 256) -> jnp.ndarray:
    """Hough transform accumulator over (rho, theta) bins."""
    e = edges[..., 0] if edges.ndim >= 3 else edges
    h, w = e.shape[-2], e.shape[-1]
    diag = math.hypot(h, w)
    ys, xs = jnp.mgrid[0:h, 0:w]
    thetas = jnp.linspace(0.0, math.pi, n_theta, endpoint=False)
    cos_t = jnp.cos(thetas)
    sin_t = jnp.sin(thetas)
    # rho = x cos + y sin, per theta: (H, W, T)
    rho = xs[..., None] * cos_t + ys[..., None] * sin_t
    rho_idx = jnp.clip(((rho + diag) / (2 * diag) * (n_rho - 1)).astype(jnp.int32),
                       0, n_rho - 1)
    weights = e[..., None] * jnp.ones((n_theta,), e.dtype)
    theta_idx = jnp.broadcast_to(jnp.arange(n_theta), rho_idx.shape)
    acc = jnp.zeros((n_rho, n_theta), jnp.float32)
    acc = acc.at[rho_idx.reshape(-1), theta_idx.reshape(-1)].add(weights.reshape(-1))
    return acc


def hough_lines(img: jnp.ndarray, width: int = 5, height: int = 5,
                threshold: int = 40, n_top: int = 16
                ) -> List[Tuple[float, float, float]]:
    """Legacy peak list: (rho, theta, count) from the reference
    accumulator (kept for wand/tests; HoughLineImage parity lives in
    hough_line_segments/hough_lines_image)."""
    segs = hough_line_segments(img, width, height, threshold)
    h, w = img.shape[-3], img.shape[-2]
    hough_height = (math.sqrt(2.0) * max(h, w)) / 2.0
    out = []
    for x1, y1, x2, y2, count, theta_deg, ridx in segs[:n_top]:
        out.append((float(ridx) - hough_height, math.radians(theta_deg),
                    float(count)))
    out.sort(key=lambda t: -t[2])
    return out


def hough_line_segments(img: jnp.ndarray, width: int = 5, height: int = 5,
                        threshold: int = 40
                        ) -> List[Tuple[float, float, float, float,
                                        float, float, float]]:
    """HoughLineImage (feature.c:1840-2076) accumulator + maxima scan:
    votes from pixels whose intensity exceeds QuantumRange/2, 180 theta
    bins, rho index = MagickRound(radius + hough_height) in an edge-
    clamped matrix; a cell is a line iff count >= line_count and no
    neighbor in the (width x height) window is strictly greater.
    Returns (x1, y1, x2, y2, count, theta_deg, rho_idx) in the
    reference's emission order (rho-major)."""
    from .threshold import _intensity

    h, w = img.shape[-3], img.shape[-2]
    hough_height = (math.sqrt(2.0) * max(h, w)) / 2.0
    acc_h = int(2.0 * hough_height)
    inten = np.asarray(_intensity(img[..., :3] if img.shape[-1] >= 3
                                  else img))
    ys, xs = np.nonzero(inten > 0.5)
    thetas = np.radians(np.arange(180, dtype=np.float64))
    acc = np.zeros((180, acc_h), np.float64)
    if len(xs):
        cx, cy = w / 2.0, h / 2.0
        radius = ((xs[:, None] - cx) * np.cos(thetas)[None] +
                  (ys[:, None] - cy) * np.sin(thetas)[None])
        # MagickRound: half away from zero
        r = radius + hough_height
        ridx = np.where(r >= 0, np.floor(r + 0.5), np.ceil(r - 0.5))
        ridx = np.clip(ridx.astype(np.int64), 0, acc_h - 1)
        tidx = np.broadcast_to(np.arange(180)[None], ridx.shape)
        np.add.at(acc, (tidx.reshape(-1), ridx.reshape(-1)), 1.0)
    line_count = (w // 4) if w > h else (h // 4)
    if threshold != 0:
        line_count = threshold
    # strict local maxima with edge-clamped neighborhood (GetMatrixElement
    # EdgeX/EdgeY semantics)
    neigh = np.full_like(acc, -np.inf)
    for v in range(-(height // 2), height // 2 + 1):
        for u in range(-(width // 2), width // 2 + 1):
            if u == 0 and v == 0:
                continue
            ti = np.clip(np.arange(180) + u, 0, 179)
            ri = np.clip(np.arange(acc_h) + v, 0, acc_h - 1)
            neigh = np.maximum(neigh, acc[np.ix_(ti, ri)])
    is_line = (acc >= line_count) & (neigh <= acc)
    segs = []
    for y in range(acc_h):
        for x in range(180):
            if not is_line[x, y]:
                continue
            count = acc[x, y]
            t = math.radians(x)
            if 45 <= x <= 135:
                x1 = 0.0
                y1 = ((y - acc_h / 2.0) - ((x1 - w / 2.0) * math.cos(t))) \
                    / math.sin(t) + h / 2.0
                x2 = float(w)
                y2 = ((y - acc_h / 2.0) - ((x2 - w / 2.0) * math.cos(t))) \
                    / math.sin(t) + h / 2.0
            else:
                y1 = 0.0
                x1 = ((y - acc_h / 2.0) - ((y1 - h / 2.0) * math.sin(t))) \
                    / math.cos(t) + w / 2.0
                y2 = float(h)
                x2 = ((y - acc_h / 2.0) - ((y2 - h / 2.0) * math.sin(t))) \
                    / math.cos(t) + w / 2.0
            segs.append((x1, y1, x2, y2, count, float(x), float(y)))
    return segs


def mean_shift(img: jnp.ndarray, width: int = 7, height: int = 7,
               color_distance: float = 0.1, max_iters: int = 100) -> jnp.ndarray:
    """MeanShiftImage (feature.c:2158): per pixel, iterate a CIRCULAR window
    whose center FOLLOWS the (x,y) centroid of in-color-range samples; the
    color mean moves with it.  Converges when the squared step (pixels) plus
    the 255-scaled squared rgb delta drops to <= 3 (feature.c:2303-2314),
    capped at MaxMeanShiftIterations=100.  Samples are taken at rounded
    centroid+offset with edge-clamped virtual pixels."""
    lead = img.shape[:-3]
    h, w, c = img.shape[-3:]
    rh, rw = height // 2, width // 2
    # circle gate: (v*v + u*u) <= (width/2)*(height/2)  (feature.c:2268)
    taps = [(u, v) for v in range(-rh, rh + 1) for u in range(-rw, rw + 1)
            if v * v + u * u <= rw * rh]
    cd2 = float(color_distance) * float(color_distance)
    nc = min(c, 3)  # color-distance channels (rgb); alpha rides along

    def one_image(x):  # (h, w, c)
        flat = x.reshape(h * w, c)
        yy, xx = jnp.mgrid[0:h, 0:w]
        loc = jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1).astype(jnp.float32)
        mpix = flat
        active = jnp.ones((h * w,), bool)

        def body(state):
            i, loc, mpix, active = state
            sloc = jnp.zeros_like(loc)
            spix = jnp.zeros_like(mpix)
            cnt = jnp.zeros((h * w,), jnp.float32)
            for (u, v) in taps:
                ix = jnp.clip(jnp.floor(loc[:, 0] + u + 0.5), 0, w - 1)
                iy = jnp.clip(jnp.floor(loc[:, 1] + v + 0.5), 0, h - 1)
                p = jnp.take(flat, (iy * w + ix).astype(jnp.int32), axis=0)
                d2 = jnp.sum((mpix[:, :nc] - p[:, :nc]) ** 2, -1)
                ok = (d2 <= cd2).astype(jnp.float32)
                sloc = sloc + ok[:, None] * (loc + jnp.float32((u, v)))
                spix = spix + ok[:, None] * p
                cnt = cnt + ok
            gamma = jnp.where(cnt != 0, 1.0 / jnp.maximum(cnt, 1.0), 1.0)
            nloc = gamma[:, None] * sloc
            npix = gamma[:, None] * spix
            dist = (jnp.sum((nloc - loc) ** 2, -1)
                    + jnp.sum((255.0 * (npix[:, :nc] - mpix[:, :nc])) ** 2, -1))
            loc = jnp.where(active[:, None], nloc, loc)
            mpix = jnp.where(active[:, None], npix, mpix)
            active = active & (dist > 3.0)
            return i + 1, loc, mpix, active

        def cond(state):
            i, _, _, active = state
            return (i < max_iters) & jnp.any(active)

        _, _, mpix, _ = lax.while_loop(cond, body, (0, loc, mpix, active))
        return jnp.clip(mpix, 0.0, 1.0).reshape(h, w, c)

    out = jax.vmap(one_image)(img.reshape((-1, h, w, c)))
    return out.reshape(img.shape)


def glcm_features(img: jnp.ndarray, levels: int = 16,
                  offset: Tuple[int, int] = (0, 1)) -> Dict[str, jnp.ndarray]:
    """GetImageFeatures: Haralick metrics from a gray-level co-occurrence matrix."""
    gray = grayscale(img)[..., 0] if img.shape[-1] >= 3 else img[..., 0]
    q = jnp.clip((gray * (levels - 1) + 0.5).astype(jnp.int32), 0, levels - 1)
    dy, dx = offset
    a = q[..., : q.shape[-2] - dy if dy else None, : q.shape[-1] - dx if dx else None]
    b = q[..., dy:, dx:]
    # the co-occurrence matrix IS a factored histogram: glcm[i, j] =
    # sum_p onehot(a)[p, i] onehot(b)[p, j] — one tall-K MXU matmul
    # instead of a serializing scatter-add (see histogram._histogram_fixed)
    iota = jnp.arange(levels, dtype=jnp.int32)
    oa = (a.reshape(-1)[:, None] == iota[None, :]).astype(jnp.bfloat16)
    ob = (b.reshape(-1)[:, None] == iota[None, :]).astype(jnp.bfloat16)
    glcm = jax.lax.dot_general(oa, ob, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    glcm = (glcm + glcm.T) / jnp.maximum(jnp.sum(glcm) * 2.0, 1.0)  # symmetric, normalized

    i = jnp.arange(levels, dtype=jnp.float32)
    ii = i[:, None]
    jj = i[None, :]
    mu_i = jnp.sum(ii * glcm)
    mu_j = jnp.sum(jj * glcm)
    var_i = jnp.sum((ii - mu_i) ** 2 * glcm)
    var_j = jnp.sum((jj - mu_j) ** 2 * glcm)
    eps = 1e-12
    return {
        "contrast": jnp.sum((ii - jj) ** 2 * glcm),
        "energy": jnp.sum(glcm * glcm),
        "homogeneity": jnp.sum(glcm / (1.0 + jnp.abs(ii - jj))),
        "entropy": -jnp.sum(jnp.where(glcm > eps, glcm * jnp.log(glcm + eps), 0.0)),
        "correlation": jnp.sum((ii - mu_i) * (jj - mu_j) * glcm) /
                       jnp.maximum(jnp.sqrt(var_i * var_j), eps),
        "dissimilarity": jnp.sum(jnp.abs(ii - jj) * glcm),
    }

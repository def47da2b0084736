"""CLAHE block-reformulated blend vs an independent per-pixel replica.

ops/enhance.clahe evaluates the bilinear 4-LUT blend block-wise as
one-hot x LUT matmuls (MXU path).  This replica implements the textbook
per-pixel formula (CLAHEImage, enhance.c:616) directly in numpy — floor/
frac tile coordinates, clipped corners, take-per-pixel — so any
regression in the block decomposition (padding, corner clipping, odd
tile sizes, in-block weight phase) shows up as a value mismatch.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from imagemagick_tpu.ops import colorspace as cs
from imagemagick_tpu.ops.enhance import clahe


def _ref_clahe(img, tiles_y, tiles_x, bins, clip_limit):
    lab = np.asarray(cs.convert(jnp.asarray(img[..., :3]), "srgb", "lab"))
    L = lab[..., 0]
    h, w = L.shape
    th, tw = -(-h // tiles_y), -(-w // tiles_x)
    Lp = np.pad(L, [(0, th * tiles_y - h), (0, tw * tiles_x - w)],
                mode="edge")
    tiles = Lp.reshape(tiles_y, th, tiles_x, tw).transpose(0, 2, 1, 3)
    idx = np.clip((tiles.reshape(-1, th * tw) * (bins - 1) + 0.5
                   ).astype(np.int32), 0, bins - 1)
    hists = np.stack([np.bincount(r, minlength=bins) for r in idx]
                     ).astype(np.float64)
    limit = clip_limit * (th * tw) / bins
    excess = np.maximum(hists - limit, 0).sum(-1, keepdims=True)
    hists = np.minimum(hists, limit) + excess / bins
    cdf = np.cumsum(hists, -1)
    total, cmin = cdf[:, -1:], cdf[:, :1]
    denom = np.where(np.abs(total - cmin) > 0, total - cmin, 1.0)
    luts = ((cdf - cmin) / denom).reshape(tiles_y, tiles_x, bins)
    yy, xx = np.arange(h), np.arange(w)
    ty_f = np.clip((yy + 0.5) / th - 0.5, 0, tiles_y - 1.0)
    tx_f = np.clip((xx + 0.5) / tw - 0.5, 0, tiles_x - 1.0)
    y0 = np.floor(ty_f).astype(int)
    x0 = np.floor(tx_f).astype(int)
    y1 = np.minimum(y0 + 1, tiles_y - 1)
    x1 = np.minimum(x0 + 1, tiles_x - 1)
    fy = (ty_f - y0)[:, None]
    fx = (tx_f - x0)[None, :]
    b = np.clip((L * (bins - 1) + 0.5).astype(int), 0, bins - 1)
    g = lambda yi, xi: luts[yi[:, None], xi[None, :], b]
    Lnew = ((1 - fy) * (1 - fx) * g(y0, x0) + (1 - fy) * fx * g(y0, x1)
            + fy * (1 - fx) * g(y1, x0) + fy * fx * g(y1, x1))
    lab2 = np.concatenate([Lnew[..., None], lab[..., 1:]], -1)
    return np.clip(np.asarray(cs.convert(jnp.asarray(lab2), "lab", "srgb")),
                   0, 1)


@pytest.mark.parametrize("shape,ty,tx,bins,clip", [
    ((64, 64, 3), 4, 4, 128, 6.5),     # even tiles
    ((33, 47, 3), 3, 7, 32, 2.0),      # odd tiles + ragged padding
    ((128, 96, 3), 2, 2, 256, 4.0),    # large tiles, 256 bins
    ((50, 51, 3), 8, 8, 128, 3.0),     # defaults, tiny tiles
])
def test_clahe_matches_per_pixel_formula(shape, ty, tx, bins, clip):
    rng = np.random.default_rng(11)
    img = rng.random(shape).astype(np.float32)
    got = np.asarray(clahe(jnp.asarray(img), tiles_y=ty, tiles_x=tx,
                           bins=bins, clip_limit=clip))
    want = _ref_clahe(img, ty, tx, bins, clip)
    assert np.abs(got - want).max() < 2e-3


def test_clahe_batched_matches():
    rng = np.random.default_rng(12)
    img = rng.random((2, 40, 56, 3)).astype(np.float32)
    got = np.asarray(clahe(jnp.asarray(img), tiles_y=4, tiles_x=4, bins=64))
    for i in range(2):
        want = _ref_clahe(img[i], 4, 4, 64, 3.0)
        assert np.abs(got[i] - want).max() < 2e-3

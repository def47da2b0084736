"""Fused Pallas wiener-FFT pipeline (BASELINE config #4).

The XLA four-step path (ops/fourier.py) runs the 4K wiener round trip at
~3.9ms — every einsum materializes a 35MB (2160, 4096) intermediate, so
the program is HBM-pass-bound at ~5% of speed-of-light.  Here the whole
pipeline is THREE Pallas kernels with all per-tile intermediates in VMEM:

  K1  row blocks:    W-axis forward four-step FFT (real input)
  K2  column blocks: H-axis forward FFT  ->  wiener mask  ->  H-axis
      inverse FFT, fused — the spectrum never round-trips to HBM
  K3  row blocks:    W-axis inverse FFT (+ clip), real output

Total HBM traffic = read x (1x) + K1 out (2x) + K2 in/out (4x) + K3 in
(2x) + out (1x) = 10 image passes vs ~32 for the einsum path.

Digit-reversal trick: K1 writes the W spectrum in SCRAMBLED (k1-major)
order and K3 consumes that order directly — the wiener mask is
elementwise and Parseval's pmean is order-agnostic, so the true
frequency order is never materialized and both final transposes of the
classic four-step vanish (fourier.c:913 computes a full ordered
transform because its user-facing -fft writes spectra to disk; this
path is the fused convolution-theorem route, like its wiener/-convolve
usage).

Four-step per axis (N = n1*n2, index n = n1*N2 + n2):
  X[k2*N1+k1] = sum_n2 W_N2^(n2 k2) * T[n2,k1] * sum_n1 W_N1^(n1 k1) x
with T the N-point twiddle — two ~sqrt(N)-point dense DFT matmuls (MXU)
plus one elementwise multiply per axis.  DFT matrices and pre-tiled
twiddle fields ride in as pallas operands (small, block-replicated).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

from .fused_pipeline import _mm


def _factor(n: int) -> Optional[Tuple[int, int]]:
    n1 = 1
    for d in range(2, int(math.isqrt(n)) + 1):
        if n % d == 0:
            n1 = d
    return None if n1 == 1 else (n1, n // n1)


@functools.lru_cache(maxsize=8)
def _axis_consts(n: int, inverse: bool):
    """(n1, n2, C1, S1, C2, S2, Tc, Ts) numpy f32 for one axis; the
    twiddle is indexed (n2, k1)."""
    f = _factor(n)
    if f is None:
        return None
    n1, n2 = f
    sign = 2.0 if inverse else -2.0
    k1 = np.arange(n1, dtype=np.float64)
    k2 = np.arange(n2, dtype=np.float64)
    a1 = sign * np.pi * np.outer(k1, k1) / n1
    a2 = sign * np.pi * np.outer(k2, k2) / n2
    tw = sign * np.pi * np.outer(k2, k1) / n
    f32 = lambda a: np.asarray(a, np.float32)       # noqa: E731
    return (n1, n2, f32(np.cos(a1)), f32(np.sin(a1)),
            f32(np.cos(a2)), f32(np.sin(a2)),
            f32(np.cos(tw)), f32(np.sin(tw)))


# --------------------------------------------------------------------------
# K1: W-axis forward on a (RB, W) row block, real input, scrambled output
# --------------------------------------------------------------------------

def _w_fwd_kernel(x_ref, c1_ref, s1_ref, c2_ref, s2_ref, tc_ref, ts_ref,
                  fr_ref, fi_ref, *, RB, W, n1, n2, prec):
    """Mosaic supports sublane splits/merges and 2-D transposes but NOT
    lane-dim splits (infer-vector-layout: unsupported shape cast), so the
    W transform runs in TRANSPOSED space where the W axis lives on
    sublanes and both contractions are plain leading-dim matmuls."""
    a = x_ref[...]                                   # (RB, W) real
    t = a.T                                          # (W, RB)
    t5 = t.reshape(n1, n2 * RB)                      # row n1, lane n2*RB+r
    yr = _mm(c1_ref[...], t5, prec)                  # (k1, n2*RB)
    yi = _mm(s1_ref[...], t5, prec)
    zr = yr * tc_ref[...] - yi * ts_ref[...]         # twiddle field
    zi = yr * ts_ref[...] + yi * tc_ref[...]
    # contract n2: (k1, n2, RB) -> (n2, k1*RB)
    zr = jnp.swapaxes(zr.reshape(n1, n2, RB), 0, 1).reshape(n2, n1 * RB)
    zi = jnp.swapaxes(zi.reshape(n1, n2, RB), 0, 1).reshape(n2, n1 * RB)
    outr = _mm(c2_ref[...], zr, prec) - _mm(s2_ref[...], zi, prec)
    outi = _mm(s2_ref[...], zr, prec) + _mm(c2_ref[...], zi, prec)
    # rows (k2, k1) merge to the NATURAL four-step index k2*n1+k1
    fr_ref[...] = outr.reshape(W, RB).T
    fi_ref[...] = outi.reshape(W, RB).T


# --------------------------------------------------------------------------
# K2: H-axis forward + wiener mask + H-axis inverse on a (H, CB) column
# block; everything stays in VMEM
# --------------------------------------------------------------------------

def _h_axis(br, bi, c1, s1, c2, s2, tc, ts, n1, n2, CB, prec, scale=None):
    """One H-axis four-step transform of a (H, CB) complex block.
    Natural row order in, natural row order out.  tc/ts: (k1, n2*CB)."""
    H = n1 * n2
    ar = br.reshape(n1, n2 * CB)
    ai = bi.reshape(n1, n2 * CB)
    yr = _mm(c1, ar, prec) - _mm(s1, ai, prec)       # (k1, n2*CB)
    yi = _mm(s1, ar, prec) + _mm(c1, ai, prec)
    zr = yr * tc - yi * ts
    zi = yr * ts + yi * tc
    # contract n2: (k1, n2, CB) -> (n2, k1*CB)
    zr = jnp.swapaxes(zr.reshape(n1, n2, CB), 0, 1).reshape(n2, n1 * CB)
    zi = jnp.swapaxes(zi.reshape(n1, n2, CB), 0, 1).reshape(n2, n1 * CB)
    outr = _mm(c2, zr, prec) - _mm(s2, zi, prec)     # (k2, k1*CB)
    outi = _mm(s2, zr, prec) + _mm(c2, zi, prec)
    # rows (k2, k1) -> flat row k2*n1 + k1 = natural four-step order
    outr = outr.reshape(H, CB)
    outi = outi.reshape(H, CB)
    if scale is not None:
        outr = outr * scale
        outi = outi * scale
    return outr, outi


def _h_mask_kernel(fr_ref, fi_ref, pm_ref,
                   fc1, fs1, fc2, fs2, ftc, fts,
                   ic1, is1, ic2, is2, itc, its,
                   gr_ref, gi_ref, *, H, CB, n1, n2, noise, prec):
    xr, xi = _h_axis(fr_ref[...], fi_ref[...], fc1[...], fs1[...],
                     fc2[...], fs2[...], ftc[...], fts[...],
                     n1, n2, CB, prec)
    # wiener denoise mask: F |F|^2 / (|F|^2 + noise * pmean)
    p = xr * xr + xi * xi
    m = p / (p + noise * pm_ref[0])
    xr = xr * m
    xi = xi * m
    gr, gi = _h_axis(xr, xi, ic1[...], is1[...], ic2[...], is2[...],
                     itc[...], its[...], n1, n2, CB, prec,
                     scale=jnp.float32(1.0 / H))
    gr_ref[...] = gr
    gi_ref[...] = gi


# --------------------------------------------------------------------------
# K3: W-axis inverse on a (RB, W) row block of the SCRAMBLED spectrum,
# real clipped output
# --------------------------------------------------------------------------

def _w_inv_kernel(gr_ref, gi_ref, c1_ref, s1_ref, c2_ref, s2_ref,
                  tc_ref, ts_ref, out_ref, *, RB, W, n1, n2, prec):
    """Inverse W transform, complex in (natural order), real clipped out.
    Same transposed-space structure as the forward; the final stage only
    computes the real combination (2 matmuls saved)."""
    tr = gr_ref[...].T.reshape(n1, n2 * RB)          # (W, RB) rows=freq
    ti = gi_ref[...].T.reshape(n1, n2 * RB)
    yr = _mm(c1_ref[...], tr, prec) - _mm(s1_ref[...], ti, prec)
    yi = _mm(s1_ref[...], tr, prec) + _mm(c1_ref[...], ti, prec)
    zr = yr * tc_ref[...] - yi * ts_ref[...]
    zi = yr * ts_ref[...] + yi * tc_ref[...]
    zr = jnp.swapaxes(zr.reshape(n1, n2, RB), 0, 1).reshape(n2, n1 * RB)
    zi = jnp.swapaxes(zi.reshape(n1, n2, RB), 0, 1).reshape(n2, n1 * RB)
    outr = _mm(c2_ref[...], zr, prec) - _mm(s2_ref[...], zi, prec)
    out = outr.reshape(W, RB).T * jnp.float32(1.0 / W)
    out_ref[...] = jnp.clip(out, 0.0, 1.0)


# --------------------------------------------------------------------------
# host-side assembly
# --------------------------------------------------------------------------

def supported(H: int, W: int) -> bool:
    # RB is fixed at 128: Mosaic's sublane->lane merge reshape requires a
    # 128-aligned lane dim, so the W kernels' transposed tiles must be
    # exactly 128 lanes; H is row-padded to a 128 multiple around them.
    return (HAVE_PALLAS and W % 128 == 0 and H % 8 == 0
            and _factor(W) is not None and _factor(H) is not None)


def _rep(spec_shape):
    """Block-replicated operand (same full array every step)."""
    nd = len(spec_shape)
    return pl.BlockSpec(spec_shape, lambda i: (0,) * nd)


def wiener_pallas(x: jnp.ndarray, noise: float,
                  interpret: bool = False) -> Optional[jnp.ndarray]:
    """Fused wiener denoise of a 2-D (H, W) f32 image.  Returns None when
    the shape is unsupported (caller falls back to the XLA path)."""
    H, W = x.shape
    if not supported(H, W):
        return None
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        return None
    RB = 128
    CB = 128
    HP = -(-H // RB) * RB          # row-padded extent for the W kernels
    n1w, n2w, C1w, S1w, C2w, S2w, Tcw, Tsw = _axis_consts(W, False)
    _, _, C1wi, S1wi, C2wi, S2wi, Tcwi, Tswi = _axis_consts(W, True)
    n1h, n2h, C1h, S1h, C2h, S2h, Tch, Tsh = _axis_consts(H, False)
    _, _, C1hi, S1hi, C2hi, S2hi, Tchi, Tshi = _axis_consts(H, True)
    prec = "b3"
    pmean = jnp.sum(x.astype(jnp.float32) ** 2).reshape(1)

    # pre-tiled twiddle fields: (k1, n2*RB) for the transposed-space W
    # kernels, (k1, n2*CB) for the H kernel
    tcw = jnp.asarray(np.repeat(Tcw.T, RB, axis=1))  # (n1w, n2w*RB)
    tsw = jnp.asarray(np.repeat(Tsw.T, RB, axis=1))
    tcwi = jnp.asarray(np.repeat(Tcwi.T, RB, axis=1))
    tswi = jnp.asarray(np.repeat(Tswi.T, RB, axis=1))
    tch = jnp.asarray(np.repeat(Tch.T, CB, axis=1))  # (n1h, n2h*CB)
    tsh = jnp.asarray(np.repeat(Tsh.T, CB, axis=1))
    tchi = jnp.asarray(np.repeat(Tchi.T, CB, axis=1))
    tshi = jnp.asarray(np.repeat(Tshi.T, CB, axis=1))

    cp = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                              vmem_limit_bytes=96 << 20)

    xp = x.astype(jnp.float32)
    if HP != H:
        xp = jnp.pad(xp, ((0, HP - H), (0, 0)))
    k1 = pl.pallas_call(
        functools.partial(_w_fwd_kernel, RB=RB, W=W, n1=n1w, n2=n2w,
                          prec=prec),
        grid=(HP // RB,),
        in_specs=[pl.BlockSpec((RB, W), lambda i: (i, 0)),
                  _rep(C1w.shape), _rep(S1w.shape),
                  _rep(C2w.shape), _rep(S2w.shape),
                  _rep(tcw.shape), _rep(tsw.shape)],
        out_specs=[pl.BlockSpec((RB, W), lambda i: (i, 0)),
                   pl.BlockSpec((RB, W), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((HP, W), jnp.float32)] * 2,
        compiler_params=cp, interpret=interpret,
    )
    fr, fi = k1(xp, jnp.asarray(C1w), jnp.asarray(S1w),
                jnp.asarray(C2w), jnp.asarray(S2w), tcw, tsw)

    k2 = pl.pallas_call(
        functools.partial(_h_mask_kernel, H=H, CB=CB, n1=n1h, n2=n2h,
                          noise=float(noise), prec=prec),
        grid=(W // CB,),
        in_specs=[pl.BlockSpec((H, CB), lambda i: (0, i)),
                  pl.BlockSpec((H, CB), lambda i: (0, i)),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  _rep(C1h.shape), _rep(S1h.shape),
                  _rep(C2h.shape), _rep(S2h.shape),
                  _rep(tch.shape), _rep(tsh.shape),
                  _rep(C1hi.shape), _rep(S1hi.shape),
                  _rep(C2hi.shape), _rep(S2hi.shape),
                  _rep(tchi.shape), _rep(tshi.shape)],
        out_specs=[pl.BlockSpec((H, CB), lambda i: (0, i)),
                   pl.BlockSpec((H, CB), lambda i: (0, i))],
        # HP-row outputs so K3 can run 128-row blocks; rows H..HP-1 are
        # never written and never read back (K3's junk rows are sliced)
        out_shape=[jax.ShapeDtypeStruct((HP, W), jnp.float32)] * 2,
        compiler_params=cp, interpret=interpret,
    )
    gr, gi = k2(fr, fi, pmean,
                jnp.asarray(C1h), jnp.asarray(S1h),
                jnp.asarray(C2h), jnp.asarray(S2h), tch, tsh,
                jnp.asarray(C1hi), jnp.asarray(S1hi),
                jnp.asarray(C2hi), jnp.asarray(S2hi), tchi, tshi)

    k3 = pl.pallas_call(
        functools.partial(_w_inv_kernel, RB=RB, W=W, n1=n1w, n2=n2w,
                          prec=prec),
        grid=(HP // RB,),
        in_specs=[pl.BlockSpec((RB, W), lambda i: (i, 0)),
                  pl.BlockSpec((RB, W), lambda i: (i, 0)),
                  _rep(C1wi.shape), _rep(S1wi.shape),
                  _rep(C2wi.shape), _rep(S2wi.shape),
                  _rep(tcwi.shape), _rep(tswi.shape)],
        out_specs=pl.BlockSpec((RB, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((HP, W), jnp.float32),
        compiler_params=cp, interpret=interpret,
    )
    out = k3(gr, gi, jnp.asarray(C1wi), jnp.asarray(S1wi),
             jnp.asarray(C2wi), jnp.asarray(S2wi), tcwi, tswi)
    return out[:H] if HP != H else out

"""Fused separable-linear pipelines as two banded block matmuls (Pallas TPU).

The thumbnail pipeline — resize (any filter), separable Gaussian blur, and
any per-pixel linear channel mix (e.g. sRGB->Gray luma) — is a composition
of LINEAR maps along H, along W, and across C.  Instead of running each op
as its own XLA program stage (each materializing an HBM intermediate, the
way the reference materializes a full Image between ops,
magick-cli.c:587's sequential interpreter), we compile the whole chain
host-side into

    out[n] = clip( WV @ x[n] @ G )

where WV is the (Hout, Hin) vertical resize*blur operator and
G the (Win*C, Wout*Cout) horizontal resize*blur*channel-mix operator —
both BANDED (a Lanczos/Gaussian window touches ~2*support*scale rows), so
each output row tile only needs a thin input band.  The Pallas kernel
streams input bands HBM->VMEM through a 4-deep DMA pipeline (measured
~600 GB/s vs ~380 GB/s for double buffering on v5e) and does two MXU
matmuls per tile against weight blocks resident in VMEM.  One kernel, one
HBM read of the input, one HBM write of the output — the fusion the
reference can never do.

Boundary semantics are exact: edge clipping/renormalization
(resize.c:3389-3440) and the blur's edge-replicate padding are baked into
the host-built matrices, so no in-kernel edge cases exist.

Precision: f32 weights/data with the matmuls run as a manual 3-pass bf16
split (hi*hi + hi*lo + lo*hi — the AlBl term is ~2^-16 relative and
dropped), measured >=100dB vs float64; "highest" (6-pass) is available for
fidelity-critical paths.

Reference parity: ResizeImage (/root/reference/MagickCore/resize.c:3761),
GaussianBlurImage (effect.c:1709), GrayscaleImage luma
(colorspace.c:886-901).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

from .resize import resize_matrix

_NSLOTS = 4          # DMA pipeline depth (measured best on v5e)
_VMEM_BUDGET = 11 * 1024 * 1024  # nominal bytes across scratch + blocks


def _align(x: int, m: int) -> int:
    return -(-x // m) * m


def blur_band_matrix(n: int, sigma: float, radius: float = 0.0,
                     width_rule: str = "2d") -> np.ndarray:
    """(n, n) banded separable-Gaussian operator with edge-replicate pads.

    Same taps as ops.blur.gaussian_blur (effect.c:1709 sigma->width rules,
    width_rule='2d') or ops.blur.blur (1-D rule, width_rule='1d'); rows
    are exact including the clamped edge windows.
    """
    from .blur import (gaussian_kernel_1d, optimal_kernel_width_2d)

    if width_rule == "1d":
        k = np.asarray(gaussian_kernel_1d(radius, sigma), np.float64)
        j = (len(k) - 1) // 2
    else:
        width = optimal_kernel_width_2d(radius, sigma)
        j = (width - 1) // 2
        xs = np.arange(-j, j + 1, dtype=np.float64)
        k = np.exp(-(xs * xs) / (2.0 * max(sigma, 1e-12) ** 2))
        k /= k.sum()
    B = np.zeros((n, n), np.float64)
    for o in range(n):
        for t, kv in zip(range(o - j, o + j + 1), k):
            B[o, min(max(t, 0), n - 1)] += kv
    return B


@functools.lru_cache(maxsize=64)
def _axis_operator(in_size: int, out_size: int, filt: str, blur_sigma: float
                   ) -> np.ndarray:
    """(out, in) combined resize (+ optional blur) operator for one axis."""
    M = resize_matrix(in_size, out_size, filt).astype(np.float64).T
    if blur_sigma > 0.0:
        M = blur_band_matrix(out_size, blur_sigma) @ M
    return M


def _v_blocks(Mv: np.ndarray, Hin: int, TO: int
              ) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Slice the vertical operator into per-tile (TO, BAND) blocks."""
    Hout = Mv.shape[0]
    ntiles = -(-Hout // TO)
    r0s, spans = [], []
    for t in range(ntiles):
        rows = Mv[t * TO:min((t + 1) * TO, Hout)]
        nz = np.nonzero(np.abs(rows).sum(0) > 0)[0]
        lo, hi = (int(nz[0]), int(nz[-1]) + 1) if len(nz) else (0, 1)
        r0s.append((lo // 8) * 8)
        spans.append(hi - (lo // 8) * 8)
    BAND = min(_align(max(spans), 8), _align(Hin, 8))
    if BAND > Hin:
        BAND = Hin - Hin % 8 if Hin % 8 else Hin
    r0s = [max(0, min(r0, Hin - BAND)) for r0 in r0s]
    WV = np.zeros((ntiles, TO, BAND), np.float32)
    for t, r0 in enumerate(r0s):
        rows = Mv[t * TO:min((t + 1) * TO, Hout)]
        WV[t, :rows.shape[0]] = rows[:, r0:r0 + BAND]
    return WV, np.asarray(r0s, np.int32), BAND, ntiles


def _h_blocks(Mw: np.ndarray, C: int, mix: np.ndarray, WINC: int
              ) -> Tuple[np.ndarray, Tuple[int, ...], int, int, int]:
    """Expand the horizontal operator across channels and block by 128 lanes.

    G[w*C+c, o*Cout+c'] = Mw[o, w] * mix[c', c]; blocks cover 128 output
    lanes each with a 128-aligned input-lane window.
    """
    Wout, Win = Mw.shape
    Cout = mix.shape[0]
    OUT = Wout * Cout
    OUTP = _align(OUT, 128)
    G = np.zeros((WINC, OUTP), np.float64)
    MwT = Mw.T  # (Win, Wout)
    for c in range(C):
        for cp in range(Cout):
            if mix[cp, c] == 0.0:
                continue
            G[c:Win * C:C, cp:OUT:Cout] += mix[cp, c] * MwT
    nb = OUTP // 128
    c0s, spans = [], []
    for b in range(nb):
        cols = G[:, b * 128:(b + 1) * 128]
        nz = np.nonzero(np.abs(cols).sum(1) > 0)[0]
        lo, hi = (int(nz[0]), int(nz[-1]) + 1) if len(nz) else (0, 128)
        c0s.append((lo // 128) * 128)
        spans.append(hi - (lo // 128) * 128)
    SPAN = min(_align(max(spans), 128), WINC)
    c0s = [max(0, min(c0, WINC - SPAN)) for c0 in c0s]
    GB = np.zeros((nb, SPAN, 128), np.float32)
    for b, c0 in enumerate(c0s):
        GB[b] = G[c0:c0 + SPAN, b * 128:(b + 1) * 128]
    return GB, tuple(c0s), SPAN, OUT, OUTP


def _split(a):
    """f32 -> (hi, lo) bf16 pair with hi + lo ~= a exactly to bf16^2."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    return ah, al


def _mm(a, b, precision):
    """(M,K)@(K,N) f32 matmul; 'b3' = manual 3-pass bf16 split (~f32 fidelity
    at ~2x the speed of Mosaic's 6-pass HIGHEST).  a/b may be pre-split
    (hi, lo) bf16 pairs when precision='b3'."""
    dn = (((1,), (0,)), ((), ()))
    if precision == "b3":
        ah, al = a if isinstance(a, tuple) else _split(a)
        bh, bl = b if isinstance(b, tuple) else _split(b)
        out = jax.lax.dot_general(ah, bh, dn,
                                  preferred_element_type=jnp.float32)
        out += jax.lax.dot_general(ah, bl, dn,
                                   preferred_element_type=jnp.float32)
        out += jax.lax.dot_general(al, bh, dn,
                                   preferred_element_type=jnp.float32)
        return out
    if isinstance(a, tuple):
        a = a[0].astype(jnp.float32) + a[1].astype(jnp.float32)
    if isinstance(b, tuple):
        b = b[0].astype(jnp.float32) + b[1].astype(jnp.float32)
    return jax.lax.dot_general(a, b, dn, precision=precision,
                               preferred_element_type=jnp.float32)


def _roll_lanes(z, d):
    """Lane roll WITHOUT edge masking: result[:, t] = z[:, t + d] (wrapped).

    Mosaic lowers tpu.dynamic_rotate natively (the concatenate form trips
    "result/input offset mismatch on non-concat dimension" for
    non-128-multiple widths).  Callers only combine rolled values with
    per-lane coefficients/masks that are ZERO wherever the roll wrapped —
    a within-pixel channel shift never leaves the array (lane t mixing
    channel ct only reads t + d with ct + d a valid channel of the SAME
    pixel) — so the iota edge mask the previous implementation paid per
    shift (~3 extra VPU ops on the full tile) was dead weight."""
    if d == 0:
        return z
    L = z.shape[1]
    try:
        return pltpu.roll(z, -d % L, 1)
    except Exception:       # interpret mode / non-TPU lowering
        return jnp.roll(z, -d, axis=1)


def _lane_mat3(z, M, C, ch):
    """Per-pixel 3x3 channel mix on channel-interleaved lanes.

    z: (rows, W*C) with channel c at lane w*C+c.  out[t] =
    sum_c M[t%C, c] * z[t - t%C + c], as one roll + one multiply-add per
    NONZERO band d = c - t%C, with the per-band coefficient field
    (M[ct][ct+d] at channel-ct lanes) assembled from the shared ch =
    lane%C field.  All-zero matrix entries drop from the field build and
    all-zero bands drop entirely (the Lab A/B mixes are 5-nonzero
    matrices: 3-4 bands instead of 5).  NOTE: every intermediate here is
    FULL tile shape — (1, L) sublane-broadcast constant fields lowered
    but wedged the remote Mosaic compile helper on the 5760-lane config-2
    shape (reproducibly, 2026-08-19); don't reintroduce them."""
    out = None
    for d in range(-(C - 1), C):
        terms = [(ct, float(M[ct][ct + d])) for ct in range(C)
                 if 0 <= ct + d < C and float(M[ct][ct + d]) != 0.0]
        if not terms:
            continue
        wv = None
        for ct, v in terms:
            m = jnp.where(ch == ct, jnp.float32(v), 0.0)
            wv = m if wv is None else wv + m
        contrib = _roll_lanes(z, d) * wv
        out = contrib if out is None else out + contrib
    return out


def _lane_chanconst(ch, vals):
    """Constant field: vals[c] at every channel-c lane."""
    out = jnp.full(ch.shape, jnp.float32(vals[0]))
    for c in range(1, len(vals)):
        out = jnp.where(ch == c, jnp.float32(vals[c]), out)
    return out


def _lane_chanmin(z, C, ch):
    """Per-pixel min over the C channels, broadcast back to every lane."""
    mn = z
    for d in [x for x in range(-(C - 1), C) if x != 0]:
        valid = (ch >= -d) if d < 0 else (ch < C - d)
        mn = jnp.minimum(mn, jnp.where(valid, _roll_lanes(z, d),
                                       jnp.float32(1e30)))
    return mn


def _lane_chunk(L: int, C: int) -> int:
    """Epilogue lane-chunk width: chunk boundaries must be 128-aligned
    (vreg) AND pixel-aligned (lane mixes stay in-chunk).  Pick the
    SMALLEST aligned chunk >= 512 — the epilogue's ~8 live (TO, chunk)
    f32 temps dominate the kernel's VMEM surcharge, and a smaller chunk
    is what lets the config-2 shape keep TO=64 instead of degrading to
    TO=32 tiles (round-5: 1152 lanes instead of 1920 on the 5760-lane
    1080p shape)."""
    best = L
    for cand in range(2, 13):
        if L % cand == 0 and (L // cand) % 128 == 0 and \
                (L // cand) % C == 0 and L // cand >= 512:
            best = L // cand
    return best


def _mat3_bands(M, C):
    """(d -> per-channel coefficient triple) bands of a 3x3 lane mix."""
    bands = []
    for d in range(-(C - 1), C):
        terms = [(ct, float(M[ct][ct + d])) for ct in range(C)
                 if 0 <= ct + d < C and float(M[ct][ct + d]) != 0.0]
        if terms:
            bands.append((d, terms))
    return bands


# the two affine Lab scalings (stored L/100, a/255+.5, b/255+.5) and its
# inverse — colorspace.c:722 sRGBTransformImage / TransformsRGBImage
_LAB_A = [[0.0, 116.0 / 100.0, 0.0],
          [500.0 / 255.0, -500.0 / 255.0, 0.0],
          [0.0, 200.0 / 255.0, -200.0 / 255.0]]
_LAB_B = [[100.0 / 116.0, 255.0 / 500.0, 0.0],
          [100.0 / 116.0, 0.0, 0.0],
          [100.0 / 116.0, 0.0, -255.0 / 200.0]]


def _lab_mats():
    from ..ops.colorspace import D65, _RGB2XYZ, _XYZ2RGB

    # D65 whitepoint scalings folded into the 3x3s — one fewer full-width
    # VPU multiply on each side of the round trip:
    #   r   = (M x) / D65     == (diag(1/D65) M) x
    #   rgb = Mi (D65 * xyz2) == (Mi diag(D65)) xyz2
    d65 = np.asarray(D65, np.float64)
    m_fwd = np.asarray(_RGB2XYZ, np.float64) / d65[:, None]
    m_inv = np.asarray(_XYZ2RGB, np.float64) * d65[None, :]
    return (("m_rgb2xyz", m_fwd), ("m_A", _LAB_A),
            ("m_B", _LAB_B), ("m_xyz2rgb", m_inv))


def _lab_fields(shape, C):
    """Precompute every lane-position-dependent field the Lab epilogue
    needs (channel masks, per-band mix coefficients, whitepoint/offset
    constants).  These depend ONLY on lane index — with pixel-aligned
    chunking every chunk of every step sees identical fields, so they are
    built once per step and shared across chunks.  (A step-0 VMEM-scratch
    variant measured slightly SLOWER — Mosaic already hoists these.)"""
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    ch = lane % C
    f = {"ch": ch, "ch1": ch == 1}

    def chanconst(vals):
        out = jnp.full(shape, jnp.float32(vals[0]))
        for c in range(1, len(vals)):
            out = jnp.where(ch == c, jnp.float32(vals[c]), out)
        return out

    f["off"] = chanconst((-16.0 / 100.0, 0.5, 0.5))
    for key, M in _lab_mats():
        fields = []
        for d, terms in _mat3_bands(M, C):
            wv = None
            for ct, v in terms:
                m = jnp.where(ch == ct, jnp.float32(v), 0.0)
                wv = m if wv is None else wv + m
            fields.append((d, wv))
        f[key] = tuple(fields)
    # chanmin roll-validity masks (True where the roll stays in-pixel)
    f["minmask"] = tuple(
        (d, (ch >= -d) if d < 0 else (ch < C - d))
        for d in range(-(C - 1), C) if d != 0)
    return f



def _lane_mat3_pre(z, bands):
    """Per-pixel 3x3 channel mix with precomputed per-band coefficient
    fields (see _lab_fields)."""
    out = None
    for d, wv in bands:
        contrib = _roll_lanes(z, d) * wv
        out = contrib if out is None else out + contrib
    return out


def _lab_roundtrip_rows(z, C, f=None):
    """sRGB -> Lab -> sRGB on interleaved-lane rows, inside the kernel.

    The exact per-pixel math of ops.colorspace rgb_to_lab/lab_to_rgb
    (sRGBTransformImage/TransformsRGBImage, colorspace.c:722) expressed
    as VPU elementwise chains + lane-roll 3x3 mixes, so the config-2
    epilogue costs zero extra HBM traffic (VERDICT r2 #2).  pow sites
    use the measured split-exponent exp2/log2 forms; cbrt is a two-step
    DIVISION-FREE Newton on the inverse cube root from the exp2(log2/3)
    seed — converges to f32 round-off (the raw seed alone capped
    kernel-vs-op fidelity at ~97dB, and the old div-form Newton spent
    two VPU divides per step)."""
    from ..ops.colorspace import CIE_EPSILON, CIE_K

    if f is None:
        f = _lab_fields(z.shape, C)
    # decode sRGB -> linear (x^2.4 = x^2 * exp2(0.4 log2 x))
    vs = jnp.maximum((z + 0.055) / 1.055, 1e-12)
    p24 = vs * vs * jnp.exp2(jnp.float32(0.4) * jnp.log2(vs))
    lin = jnp.where(z <= 0.0404482362771076, z / 12.92, p24)
    # whitepoint-folded matrix: this IS xyz/D65 (see _lab_mats)
    r = _lane_mat3_pre(lin, f["m_rgb2xyz"])
    rm = jnp.maximum(r, 1e-30)
    # inverse cube root u = rm^(-1/3): seed + 2 div-free Newton steps
    # u <- u*(4 - rm*u^3)/3; then cbrt = rm*u^2.  The TPU exp2/log2 seed
    # carries ~1.4e-5 rel error (97dB cap measured round 4); ONE Newton
    # step squares that to ~6e-10 — already below f32 round-off, so the
    # second step buys nothing (kernel fidelity is capped by the pow
    # decode/encode at ~104dB either way; measured equal on-chip).
    u = jnp.exp2(jnp.log2(rm) * jnp.float32(-1.0 / 3.0))
    for _ in range(int(os.environ.get("IMTPU_CBRT_NEWTON", "1"))):
        u = u * (4.0 - rm * (u * u * u)) * jnp.float32(1.0 / 3.0)
    cbrt_r = rm * (u * u)
    fv = jnp.where(r > CIE_EPSILON,
                   cbrt_r,
                   (jnp.float32(CIE_K) * r + 16.0) / 116.0)
    lab = _lane_mat3_pre(fv, f["m_A"]) + f["off"]
    # inverse: unscale + (x,y,z) f-values as an affine mix
    lab0 = lab - f["off"]
    fxyz = _lane_mat3_pre(lab0, f["m_B"])
    f3 = fxyz * fxyz * fxyz
    # linear branch (116 f - 16)/K at every lane; at the Y lane
    # 116*fxyz - 16 IS Lraw (fxyz_y = (Lraw+16)/116), so the reference's
    # separate Y test (L > K*eps ? f^3 : L/K — lab_raw_to_xyz) falls out
    # of the same two fields: the old extra Lraw 3x3 mix + per-lane
    # selects are gone.  Nested f32 selects — NOT i1 mask algebra:
    # select-between-bool-vectors doesn't lower (i8->i1 trunc error)
    linb = (116.0 * fxyz - 16.0) * jnp.float32(1.0 / CIE_K)
    xyz2 = jnp.where(f["ch1"],
                     jnp.where(fxyz > jnp.float32((CIE_K * CIE_EPSILON
                                                   + 16.0) / 116.0),
                               f3, linb),
                     jnp.where(f3 > jnp.float32(CIE_EPSILON), f3, linb))
    # whitepoint-folded inverse matrix: applies D65 * xyz2 (see _lab_mats)
    rgb = _lane_mat3_pre(xyz2, f["m_xyz2rgb"])
    # out-of-gamut lift (colorspace-private.h:84-90)
    mn = rgb
    for d, valid in f["minmask"]:
        mn = jnp.minimum(mn, jnp.where(valid, _roll_lanes(rgb, d),
                                       jnp.float32(1e30)))
    rgb = jnp.where(mn < 0.0, rgb - mn, rgb)
    # encode linear -> sRGB
    ve = jnp.maximum(rgb, 1e-12)
    pinv = jnp.exp2(jnp.float32(1.0 / 2.4) * jnp.log2(ve))
    return jnp.where(rgb <= 0.0031306684425005883, 12.92 * rgb,
                     1.055 * pinv - 0.055)


def _mxu_stage(band_val, wv_at, gb_at, tt, *, c0s, SPAN, precision, nterms,
               guids, ntiles):
    """The two banded block matmuls for one tile: (BAND, WINC) band ->
    (TOE, OUTP) raw result.  Horizontal pass first (deep-K narrow-N runs
    ~3.5x more MACs/s than the vertical-first shape).  wv_at/gb_at are
    index->operand accessors so callers can hand out PRE-SPLIT (hi, lo)
    bf16 weight pairs from scratch (splitting the static weights per step
    was a measured per-step VPU cost)."""
    if precision == "b3":
        bsplit = _split(band_val)
    else:
        bsplit = band_val
    nb = len(c0s)
    out = None
    for t in range(nterms):
        mids = []
        for b, c0 in enumerate(c0s):
            bnd = (bsplit[0][:, c0:c0 + SPAN], bsplit[1][:, c0:c0 + SPAN]) \
                if precision == "b3" else bsplit[:, c0:c0 + SPAN]
            mids.append(_mm(bnd, gb_at(guids[t * nb + b]), precision))
        mid = jnp.concatenate(mids, axis=1)                   # (BAND, OUTP)
        term = _mm(wv_at(t * ntiles + tt), mid, precision)    # (TOE, OUTP)
        out = term if out is None else out + term
    return out


def _vpu_stage(out, *, TO, clip, unsharp, chan_epilogue, fields=None):
    """The elementwise tail for one tile: unsharp shift-adds + clamp +
    (optional) in-kernel Lab chunks.  (TOE, OUTP) -> (TO, OUTP)."""
    if unsharp is not None:
        tv, th_, gain, C = unsharp
        r = len(th_) // 2
        zc = out[len(tv) // 2:len(tv) // 2 + TO]
        vc = tv[0] * out[0:TO]
        for k in range(1, len(tv)):
            vc = vc + tv[k] * out[k:k + TO]
        OUTPW = vc.shape[1]
        # ONE border-replicated pad, then every horizontal tap is a
        # static slice — the old per-tap concatenate pair rebuilt the
        # full tile ~3x per tap (measured VPU cost on the 1080p batch)
        pieces = [vc[:, :C]] * r + [vc] + [vc[:, OUTPW - C:]] * r
        padded = jnp.concatenate(pieces, axis=1)
        bacc = None
        for j, w_ in enumerate(th_):
            sh = padded[:, j * C:j * C + OUTPW]
            bacc = w_ * sh if bacc is None else bacc + w_ * sh
        out = (1.0 + gain) * zc - gain * bacc
    if chan_epilogue is not None:
        out = jnp.clip(out, 0.0, 1.0)
        Cep = unsharp[3] if unsharp is not None else 3
        L = out.shape[1]
        w_ = _lane_chunk(L, Cep)
        if fields is None:
            fields = _lab_fields((out.shape[0], w_), Cep)
        if w_ < L:
            out = jnp.concatenate(
                [chan_epilogue(out[:, j * w_:(j + 1) * w_], Cep, fields)
                 for j in range(L // w_)], axis=1)
        else:
            out = chan_epilogue(out, Cep, fields)
    if clip:
        out = jnp.clip(out, 0.0, 1.0)
    return out


def _kernel_pipe(r0_ref, x_hbm, wv_hbm, gb_hbm, out_hbm, band, wv, gb,
                 stage, outbuf, sem, gsem, osem, *, TO, BAND, c0s, SPAN,
                 precision, clip, nprog, ntiles, nterms=1, guids=None,
                 nslots=_NSLOTS, unsharp=None, chan_epilogue=None):
    """Software-pipelined variant: tile i's MXU matmuls overlap tile
    i-1's VPU epilogue (grid = nprog + 1 steps).

    The sequential kernel spends ~2.3ms on MXU+DMA and ~1.8ms on the VPU
    Lab epilogue for the 1080p batch — strictly serialized inside each
    step.  The TPU core issues matrix and vector work on independent
    queues, so staging the raw matmul result in a ping-pong scratch and
    running the PREVIOUS tile's elementwise tail (which has no data
    dependency on this tile's matmuls) lets Mosaic overlap the two.
    Output rows are written with explicit async copies at precomputed
    absolute offsets (the out BlockSpec would need a non-affine i-1
    index_map, which stalls block prefetch ~10us/step — measured round 2)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        gcopy = pltpu.make_async_copy(gb_hbm, gb, gsem)
        gcopy.start()
        gcopy.wait()
        wcopy = pltpu.make_async_copy(wv_hbm, wv, gsem)
        wcopy.start()
        wcopy.wait()

    def band_dma(s, which):
        r0 = pl.multiple_of(r0_ref[which], 8)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(r0, BAND), :], band.at[s], sem.at[s])

    def out_copy(j):
        return pltpu.make_async_copy(
            outbuf.at[jax.lax.rem(j, 2)],
            out_hbm.at[pl.ds(j * TO, TO), :], osem.at[jax.lax.rem(j, 2)])

    @pl.when(step == 0)
    def _():
        for k in range(min(nslots, nprog)):
            band_dma(k, k).start()

    nxt = step + nslots - 1

    @pl.when((step > 0) & (nxt < nprog))
    def _():
        band_dma(nxt % nslots, nxt).start()

    # VPU phase first (previous tile, data already in stage): its long
    # elementwise chain issues while this tile's matmuls execute below
    @pl.when(step > 0)
    def _():
        @pl.when(step >= 3)
        def _():
            out_copy(step - 3).wait()       # frees outbuf[(step-1)%2]
        z = stage[jax.lax.rem(step - 1, 2)]
        y = _vpu_stage(z, TO=TO, clip=clip, unsharp=unsharp,
                       chan_epilogue=chan_epilogue)
        outbuf[jax.lax.rem(step - 1, 2)] = y
        out_copy(step - 1).start()

    @pl.when(step < nprog)
    def _():
        band_dma(step % nslots, step).wait()
        tt = jax.lax.rem(step, ntiles)
        stage[jax.lax.rem(step, 2)] = _mxu_stage(
            band[step % nslots], lambda i: wv[i], lambda g: gb[g], tt,
            c0s=c0s, SPAN=SPAN, precision=precision, nterms=nterms,
            guids=guids, ntiles=ntiles)

    @pl.when(step == nprog)
    def _():
        # BOTH still-in-flight copies must complete before kernel exit:
        # copy j is otherwise waited at step j+3, so tiles nprog-2 and
        # nprog-1 (started at steps nprog-1 and nprog) are pending here
        if nprog >= 2:
            out_copy(nprog - 2).wait()
        out_copy(nprog - 1).wait()


def _kernel(r0_ref, x_hbm, wv_hbm, gb_hbm, out_ref, band, wv, gb, sem, gsem,
            *, TO, BAND, c0s, SPAN, precision, clip, nprog, ntiles,
            nterms=1, guids=None, nslots=_NSLOTS, unsharp=None,
            chan_epilogue=None, col_chunk=None, hblur=None):
    """One program per (image, row-tile), flattened to a 1-D grid.

    Three measured structural rules shape this kernel:
    * flat 1-D grid + absolute precomputed row offsets — a 2-D
      (batch, tile) grid with an in-kernel batch index measured ~5us/step
      slower (dynamic leading-axis memref slicing defeats Mosaic's cheap
      DMA descriptor path);
    * ALL weight blocks live in persistent scratch, copied once at step 0
      and indexed dynamically — a BlockSpec whose index_map uses rem()
      (non-affine) stalls Mosaic's block prefetch for ~10us every step,
      which alone made the kernel 3.5x slower;
    * every step-invariant VPU computation (the b3 hi/lo split of the
      static weights, the Lab epilogue's lane-constant fields) runs ONCE
      at step 0 into scratch — recomputing them per step was a measured
      per-step VPU cost on the nprog=136 1080p grid.
    """
    # NOTE (round 5, measured): moving the step-invariant VPU work (the
    # b3 hi/lo weight splits, the Lab lane fields) into step-0 scratch
    # measured slightly SLOWER (4.21 vs 4.11 ms on the 1080p lab batch) —
    # Mosaic already hoists/CSEs those chains effectively, and scratch
    # round-trips cost more than recomputation.  Keep them inline.
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        gcopy = pltpu.make_async_copy(gb_hbm, gb, gsem)
        gcopy.start()
        gcopy.wait()
        wcopy = pltpu.make_async_copy(wv_hbm, wv, gsem)
        wcopy.start()
        wcopy.wait()

    def band_dma(s, which):
        r0 = pl.multiple_of(r0_ref[which], 8)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(r0, BAND), :], band.at[s], sem.at[s])

    # 4-deep DMA pipeline: prime NSLOTS copies on step 0 (steps 0..NSLOTS-1),
    # then each later step issues the copy for step+NSLOTS-1, keeping
    # NSLOTS-1 transfers in flight ahead of the consumer.
    @pl.when(step == 0)
    def _():
        for k in range(min(nslots, nprog)):
            band_dma(k, k).start()

    nxt = step + nslots - 1

    @pl.when((step > 0) & (nxt < nprog))
    def _():
        band_dma(nxt % nslots, nxt).start()

    slot = step % nslots
    band_dma(slot, step).wait()

    # nterms > 1 = a rank-T sum of separable operators (e.g. blur+unsharp:
    # (1+g)*Bg - g*Bu@Bg per axis pair): out = sum_t WV_t @ x @ G_t.
    # gb holds only UNIQUE blocks (convolutional G is block-Toeplitz:
    # interior blocks repeat); guids maps (term, block) -> unique id.
    tt = jax.lax.rem(step, ntiles)
    OUTP_ = out_ref.shape[1]

    def _h_mid_stencil(bv):
        """H-pass strength reduction (round 5, measured): the blur band
        matrix's interior rows are a pure Toeplitz stencil, so the
        banded matmul spent SPAN-wide dense K (~22x the stencil's MACs)
        at the h-pass's weak MXU shape (K=176/N=128 ~ 17TF).  Compute
        interior lanes as f32 VPU shift-adds (more accurate than b3)
        and keep the banded matmul only for the two 128-lane edge
        blocks, whose G columns carry the exact edge policy."""
        thb, Cb = hblur
        rb = len(thb) // 2
        padded = jnp.concatenate(
            [bv[:, :Cb]] * rb + [bv] + [bv[:, OUTP_ - Cb:]] * rb, axis=1)
        mid = None
        for j, w_ in enumerate(thb):
            sh = padded[:, j * Cb:j * Cb + OUTP_]
            mid = w_ * sh if mid is None else mid + w_ * sh
        b0 = bv[:, c0s[0]:c0s[0] + SPAN]
        b1 = bv[:, c0s[-1]:c0s[-1] + SPAN]
        if precision == "b3":
            b0, b1 = _split(b0), _split(b1)
        left = _mm(b0, gb[0], precision)
        right = _mm(b1, gb[1], precision)
        return jnp.concatenate([left, mid[:, 128:OUTP_ - 128], right],
                               axis=1)

    if (unsharp is not None and col_chunk and col_chunk < OUTP_
            and OUTP_ % col_chunk == 0):
        # Column-chunked MXU/VPU interleave (round 5, for the epilogue-
        # heavy config-2 shape): the vertical-pass matmul is issued in Q
        # column chunks UP FRONT, then the VPU epilogue runs chunk by
        # chunk — chunk q's elementwise tail has no data dependency on
        # chunk >q's matmuls, so the core's independent MXU/VPU issue
        # queues overlap them.  The cross-grid-step variant of this idea
        # (_kernel_pipe) measured slower: pl.when phase boundaries defeat
        # the overlap; straight-line single-step code does not.
        tv, th_, gain, Cep = unsharp
        rr = len(th_) // 2
        rC = rr * Cep
        CW = col_chunk
        Q = OUTP_ // CW
        if hblur is not None:
            mid = _h_mid_stencil(band[slot])
            mids = [_split(mid) if precision == "b3" else mid]
        else:
            if precision == "b3":
                bsplit = _split(band[slot])
            else:
                bsplit = band[slot]
            nb = len(c0s)
            mids = []
            for t in range(nterms):
                parts = []
                for b, c0 in enumerate(c0s):
                    bnd = ((bsplit[0][:, c0:c0 + SPAN],
                            bsplit[1][:, c0:c0 + SPAN])
                           if precision == "b3" else bsplit[:, c0:c0 + SPAN])
                    parts.append(_mm(bnd, gb[guids[t * nb + b]], precision))
                mid = jnp.concatenate(parts, axis=1)
                mids.append(_split(mid) if precision == "b3" else mid)
        wvs = [_split(wv[t * ntiles + tt]) if precision == "b3"
               else wv[t * ntiles + tt] for t in range(nterms)]
        raws = []
        for q in range(Q):
            acc = None
            for t in range(nterms):
                mq = ((mids[t][0][:, q * CW:(q + 1) * CW],
                       mids[t][1][:, q * CW:(q + 1) * CW])
                      if precision == "b3" else mids[t][:, q * CW:(q + 1) * CW])
                term = _mm(wvs[t], mq, precision)
                acc = term if acc is None else acc + term
            raws.append(acc)
        fields = (_lab_fields((TO, CW), Cep)
                  if chan_epilogue is not None else None)
        hw = len(tv) // 2

        def vtaps(z):            # (TOE, w) -> (TO, w) vertical shift-add
            acc = tv[0] * z[0:TO]
            for k in range(1, len(tv)):
                acc = acc + tv[k] * z[k:k + TO]
            return acc

        for q in range(Q):
            vc = vtaps(raws[q])
            zc = raws[q][hw:hw + TO]
            if rr:
                # horizontal halo: true neighbor columns from the adjacent
                # raw chunk; border-replicate only at the global edges
                left = (vtaps(raws[q - 1][:, CW - rC:]) if q > 0
                        else jnp.concatenate([vc[:, :Cep]] * rr, axis=1))
                right = (vtaps(raws[q + 1][:, :rC]) if q < Q - 1
                         else jnp.concatenate([vc[:, CW - Cep:]] * rr,
                                              axis=1))
                padded = jnp.concatenate([left, vc, right], axis=1)
            else:
                padded = vc
            bacc = None
            for j, w_ in enumerate(th_):
                sh = padded[:, j * Cep:j * Cep + CW]
                bacc = w_ * sh if bacc is None else bacc + w_ * sh
            y = (1.0 + gain) * zc - gain * bacc
            if chan_epilogue is not None:
                y = jnp.clip(y, 0.0, 1.0)
                y = chan_epilogue(y, Cep, fields)
            if clip:
                y = jnp.clip(y, 0.0, 1.0)
            out_ref[:, q * CW:(q + 1) * CW] = y
        return
    if hblur is not None:
        mid = _h_mid_stencil(band[slot])
        wvt = _split(wv[tt]) if precision == "b3" else wv[tt]
        out = _mm(wvt, _split(mid) if precision == "b3" else mid, precision)
    else:
        out = _mxu_stage(band[slot], lambda i: wv[i], lambda g: gb[g], tt,
                         c0s=c0s, SPAN=SPAN, precision=precision,
                         nterms=nterms, guids=guids, ntiles=ntiles)
    out_ref[:, :] = _vpu_stage(out, TO=TO, clip=clip, unsharp=unsharp,
                               chan_epilogue=chan_epilogue)


@functools.lru_cache(maxsize=64)
def _build_call(N, Hin, WINC, TO, BAND, ntiles, nb, SPAN, OUTP, c0s,
                precision, clip, interpret=False, nterms=1, guids=None,
                n_unique=None, nslots=_NSLOTS, unsharp=None,
                chan_epilogue=None, vmem_limit=None, col_chunk=None,
                hblur=None):
    nprog = N * ntiles
    if guids is None:
        guids = tuple(range(nterms * nb))
    if n_unique is None:
        n_unique = nterms * nb
    TOE = TO + (len(unsharp[0]) - 1 if unsharp is not None else 0)
    kern = functools.partial(_kernel, TO=TO, BAND=BAND, c0s=c0s, SPAN=SPAN,
                             precision=precision, clip=clip, nprog=nprog,
                             ntiles=ntiles, nterms=nterms, guids=guids,
                             nslots=nslots, unsharp=unsharp,
                             chan_epilogue=chan_epilogue,
                             col_chunk=col_chunk, hblur=hblur)
    scratch = [
        pltpu.VMEM((nslots, BAND, WINC), jnp.float32),
        pltpu.VMEM((nterms * ntiles, TOE, BAND), jnp.float32),
        pltpu.VMEM((n_unique, SPAN, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((nslots,)),
        pltpu.SemaphoreType.DMA,
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TO, OUTP), lambda i, r0: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nprog * TO, OUTP), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # Mosaic's default scoped-vmem ceiling is 16MB; the epilogue
            # variants (unsharp shift-adds + Lab) keep enough live
            # full-width temps that TO=64 tiles need ~19-24MB of stack.
            # v5e has 128MB physical VMEM — raising the ceiling is what
            # lets config-2 run TO=64/128 instead of degrading to TO=32.
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=64)
def _build_call_pipe(N, Hin, WINC, TO, BAND, ntiles, nb, SPAN, OUTP, c0s,
                     precision, clip, interpret=False, nterms=1, guids=None,
                     n_unique=None, nslots=_NSLOTS, unsharp=None,
                     chan_epilogue=None, vmem_limit=None):
    """Pipelined _build_call: MXU(tile i) overlaps VPU(tile i-1)."""
    nprog = N * ntiles
    if guids is None:
        guids = tuple(range(nterms * nb))
    if n_unique is None:
        n_unique = nterms * nb
    TOE = TO + (len(unsharp[0]) - 1 if unsharp is not None else 0)
    kern = functools.partial(_kernel_pipe, TO=TO, BAND=BAND, c0s=c0s,
                             SPAN=SPAN, precision=precision, clip=clip,
                             nprog=nprog, ntiles=ntiles, nterms=nterms,
                             guids=guids, nslots=nslots, unsharp=unsharp,
                             chan_epilogue=chan_epilogue)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nprog + 1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((nslots, BAND, WINC), jnp.float32),
            pltpu.VMEM((nterms * ntiles, TOE, BAND), jnp.float32),
            pltpu.VMEM((n_unique, SPAN, 128), jnp.float32),
            pltpu.VMEM((2, TOE, OUTP), jnp.float32),   # stage ping-pong
            pltpu.VMEM((2, TO, OUTP), jnp.float32),    # outbuf ping-pong
            pltpu.SemaphoreType.DMA((nslots,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nprog * TO, OUTP), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )


def _plan(Hin, Win, C, Hout, Wout, filt, sigma, mix_key, TO):
    mix = np.asarray(mix_key, np.float64)
    Mv = _axis_operator(Hin, Hout, filt, sigma)
    Mw = _axis_operator(Win, Wout, filt, sigma)
    WV, r0s, BAND, ntiles = _v_blocks(Mv, Hin, TO)
    GB, c0s, SPAN, OUT, OUTP = _h_blocks(Mw, C, mix, Win * C)
    return WV, r0s, BAND, ntiles, GB, c0s, SPAN, OUT, OUTP


def fused_linear_pipeline(x: jnp.ndarray, terms, C: int,
                          mix: Optional[np.ndarray] = None,
                          precision: str = "b3", clip: bool = True,
                          TO: int = 64, nslots: int = _NSLOTS,
                          in_shape: Optional[Tuple[int, int, int, int]] = None,
                          pad_align: bool = False,
                          plan_only: bool = False,
                          winc_pad: Optional[int] = None,
                          interpret: bool = False) -> Optional[jnp.ndarray]:
    """General entry: out = clip( sum_t Mv_t @ x @ Mw_t^T , mixed ).

    `terms` is a list of (Mv, Mw) banded operator pairs — a rank-T sum of
    separable operators.  T=1 covers any composed chain of separable ops
    (resize, blur); T=2 covers unsharp/difference-of-gaussians-style
    chains that are sums of separable products.  All terms must share the
    same (Hout, Hin) x (Wout, Win) shapes.  Constraints as
    fused_resize_pipeline; returns None on fallback.

    ``pad_align=True`` (NHWC input only) zero-pads the input to the
    kernel's sublane/lane alignment (rows to %8, flattened W*C to %128)
    and zero-extends the operators to ignore the pad — this is what lets
    arbitrary CLI image shapes dispatch here instead of only born-aligned
    benchmark shapes.  Costs one XLA pad of the input.
    """
    if not HAVE_PALLAS:
        return None
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        return None
    if x.dtype != jnp.float32:
        return None
    terms = [(np.asarray(a, np.float64), np.asarray(b, np.float64))
             for a, b in terms]
    Hout, Hin = terms[0][0].shape
    Wout, Win = terms[0][1].shape
    if any(a.shape != (Hout, Hin) or b.shape != (Wout, Win)
           for a, b in terms):
        raise ValueError("all terms must share operator shapes")
    WINC = Win * C
    if winc_pad is not None:
        # flat input whose last dim carries trailing zero lanes beyond
        # Win*C (e.g. host staging buffers padded to the 128-lane wire
        # alignment) — planning already zero-extends G rows past Win*C
        if winc_pad < WINC:
            return None
        WINC = winc_pad
    if x.ndim == 2:
        if in_shape is None:
            return None
        N = in_shape[0]
        if x.shape != (N * Hin, WINC):
            return None
    elif x.ndim == 4:
        N = x.shape[0]
        if x.shape[1:] != (Hin, Win, C):
            return None
        if pad_align and (WINC % 128 != 0 or Hin % 8 != 0):
            Hp = _align(Hin, 8)
            WINCp = _align(WINC, 128)
            if plan_only:
                x = jax.ShapeDtypeStruct((N * Hp, WINCp), jnp.float32)
            else:
                flat = x.reshape(N, Hin, WINC)
                flat = jnp.pad(flat, ((0, 0), (0, Hp - Hin),
                                      (0, WINCp - WINC)))
                x = flat.reshape(N * Hp, WINCp)
            if Hp != Hin:
                terms = [(np.pad(a, ((0, 0), (0, Hp - Hin))), b)
                         for a, b in terms]
                Hin = Hp
            WINC = WINCp
    else:
        return None
    if WINC % 128 != 0 or Hin % 8 != 0:
        return None
    if mix is None:
        mix = np.eye(C)
    mix = np.asarray(mix, np.float64)
    # union banded structure across terms: plan against sum of |operators|
    Mv_union = sum(np.abs(a) for a, _ in terms)
    Mw_union = sum(np.abs(b) for _, b in terms)
    plan = None
    ns_try = (nslots,) if nslots <= 2 else (nslots, 2)
    while TO >= 16:          # halve the row tile until VMEM fits
        _, r0s, BAND, ntiles = _v_blocks(Mv_union, Hin, TO)
        GBu, c0s, SPAN, OUT, OUTP = _h_blocks(Mw_union, C, mix, WINC)
        # per-term blocks sliced with the shared r0s/c0s
        WVs, GBs = [], []
        for Mv, Mw in terms:
            WV = np.zeros((ntiles, TO, BAND), np.float32)
            for t, r0 in enumerate(r0s):
                rows = Mv[t * TO:min((t + 1) * TO, Hout)]
                WV[t, :rows.shape[0]] = rows[:, r0:r0 + BAND]
            WVs.append(WV)
            # rebuild G against the SHARED c0s (a sparser term would
            # otherwise get different block windows)
            GB = np.zeros((len(c0s), SPAN, 128), np.float32)
            Gfull = np.zeros((WINC, OUTP), np.float64)
            MwT = Mw.T
            Cout = mix.shape[0]
            for c in range(C):
                for cp in range(Cout):
                    if mix[cp, c] == 0.0:
                        continue
                    Gfull[c:Win * C:C, cp:OUT:Cout] += mix[cp, c] * MwT
            for b, c0 in enumerate(c0s):
                GB[b] = Gfull[c0:c0 + SPAN, b * 128:(b + 1) * 128]
            GBs.append(GB)
        WV_all = np.concatenate(WVs, axis=0)    # (T*ntiles, TO, BAND)
        GB_flat = np.concatenate(GBs, axis=0)   # (T*nb, SPAN, 128)
        # dedupe identical blocks: a convolutional G (no resample) is
        # block-Toeplitz, so all interior blocks are one shared matrix
        uniq: dict = {}
        guids = []
        keep = []
        for blk in GB_flat:
            key = blk.tobytes()
            if key not in uniq:
                uniq[key] = len(keep)
                keep.append(blk)
            guids.append(uniq[key])
        GB_all = np.stack(keep)
        # wide images at deep DMA can exceed the budget on the slab
        # slots alone — fall back to depth 2 before shrinking TO further
        # (depth only matters when DMA-bound; CLAUDE perf lesson 8)
        ns_fit = None
        for ns in ns_try:
            vmem = (ns * BAND * WINC + GB_all.size + WV_all.size +
                    2 * TO * OUTP + TO * WINC) * 4
            if vmem <= _VMEM_BUDGET:
                ns_fit = ns
                break
        if ns_fit is not None:
            plan = (r0s, BAND, ntiles, c0s, SPAN, OUT, OUTP,
                    WV_all, GB_all, tuple(guids), len(keep), TO, ns_fit)
            break
        TO //= 2
    if plan is None:
        return None
    (r0s, BAND, ntiles, c0s, SPAN, OUT, OUTP,
     WV_all, GB_all, guids, n_unique, TO, nslots) = plan
    if plan_only:
        return True
    call = _build_call(N, Hin, WINC, TO, BAND, ntiles, len(c0s), SPAN,
                       OUTP, c0s, precision, clip, interpret,
                       nterms=len(terms), guids=guids,
                       n_unique=n_unique, nslots=nslots)
    r0_flat = (np.repeat(np.arange(N, dtype=np.int64) * Hin, ntiles) +
               np.tile(r0s.astype(np.int64), N)).astype(np.int32)
    out = call(jnp.asarray(r0_flat), x.reshape(N * Hin, WINC),
               jnp.asarray(WV_all), jnp.asarray(GB_all))
    out = out.reshape(N, ntiles * TO, OUTP)
    return out[:, :Hout, :OUT].reshape(N, Hout, Wout, mix.shape[0])


@functools.lru_cache(maxsize=32)
def blur_unsharp_terms(n_v: int, n_w: int, sigma_blur: float,
                       sigma_unsharp: float, gain: float = 1.0):
    """Rank-2 term list for gaussian-blur -> unsharp (threshold 0).

    Unsharp is y + gain*(y - Bu(y)) = (1+gain)*y - gain*Bu(y); composed
    with the 2-D blur Bg this is the sum of two separable products
    (effect.c:4256 UnsharpMaskImage over GaussianBlurImage:1709):

        (1+gain) * (Bgv (x) Bgw)  -  gain * (Buv.Bgv (x) Buw.Bgw)

    The gain threshold (|2 diff| < t keeps the original) is a per-pixel
    nonlinearity and is NOT represented — callers wanting the reference's
    default t=0.05 behavior use the op-composition path.
    """
    Bgv = blur_band_matrix(n_v, sigma_blur)
    Bgw = blur_band_matrix(n_w, sigma_blur)
    Buv = blur_band_matrix(n_v, sigma_unsharp, width_rule="1d")
    Buw = blur_band_matrix(n_w, sigma_unsharp, width_rule="1d")
    return [((1.0 + gain) * Bgv, Bgw),
            (-gain * (Buv @ Bgv), Buw @ Bgw)]


def fused_resize_pipeline(x: jnp.ndarray, Hout: int, Wout: int,
                          filt: str = "lanczos", sigma: float = 0.0,
                          mix: Optional[np.ndarray] = None,
                          precision: str = "b3",
                          clip: bool = True,
                          TO: int = 64, nslots: int = _NSLOTS,
                          in_shape: Optional[Tuple[int, int, int, int]] = None,
                          vmem_budget: Optional[int] = None,
                          interpret: bool = False,
                          wscale=None) -> Optional[jnp.ndarray]:
    """Fused resize [+ separable blur] [+ linear channel mix], one kernel.

    x: (N, Hin, Win, C) f32, or — the fast path — pre-flattened
    (N*Hin, Win*C) with ``in_shape=(N, Hin, Win, C)``.  Feeding a value
    computed in NHWC layout costs a one-time ~full-copy relayout at the
    kernel boundary (XLA retiles the merged W*C lane dim); batch pipelines
    should device_put / decode straight into the flat wire layout.
    Returns (N, Hout, Wout, Cout) or None when the shape doesn't meet the
    kernel's constraints (caller falls back to the XLA op path).

    ``interpret=True`` runs the kernel in the Pallas interpreter (any
    backend) — used by the CPU test suite to validate kernel math.
    """
    if not HAVE_PALLAS:
        return None
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        return None
    if x.dtype != jnp.float32:
        return None
    if x.ndim == 2:
        if in_shape is None:
            return None
        N, Hin, Win, C = in_shape
        if x.shape != (N * Hin, Win * C):
            raise ValueError(f"flat input {x.shape} != {(N*Hin, Win*C)}")
    elif x.ndim == 4:
        N, Hin, Win, C = x.shape
    else:
        return None
    WINC = Win * C
    if WINC % 128 != 0 or Hin % 8 != 0 or Hout < 1 or Wout < 1:
        return None
    if Hout > Hin or Wout > Win:      # upscales: dense path is fine
        return None
    if mix is None:
        mix = np.eye(C)
    mix = np.asarray(mix, np.float64)
    mix_key = tuple(map(tuple, mix.tolist()))
    WV, r0s, BAND, ntiles, GB, c0s, SPAN, OUT, OUTP = _plan(
        Hin, Win, C, Hout, Wout, filt, float(sigma), mix_key, TO)
    # VMEM accounting: DMA slots + G blocks + all WV tiles + out block (x2)
    vmem = (nslots * BAND * WINC + GB.size + WV.size +
            2 * TO * OUTP + TO * WINC) * 4
    if vmem > (vmem_budget or _VMEM_BUDGET):
        if TO > 16:
            return fused_resize_pipeline(x, Hout, Wout, filt, sigma, mix,
                                         precision, clip, TO=TO // 2,
                                         nslots=nslots, in_shape=in_shape,
                                         vmem_budget=vmem_budget,
                                         interpret=interpret)
        return None
    call = _build_call(N, Hin, WINC, TO, BAND, ntiles, GB.shape[0], SPAN,
                       OUTP, c0s, precision, clip, interpret,
                       nslots=nslots)
    # flat absolute row offsets: program i = image i//ntiles, tile i%ntiles
    r0_flat = (np.repeat(np.arange(N, dtype=np.int64) * Hin, ntiles) +
               np.tile(r0s.astype(np.int64), N)).astype(np.int32)
    wv = jnp.asarray(WV)
    if wscale is not None:
        # traced scalar scale on the (small) W-pass weights: gives each
        # jit-unrolled benchmark step distinct operands without an extra
        # full-tensor pass over the input (bench.py anti-CSE knob)
        wv = wv * jnp.asarray(wscale, wv.dtype)
    out = call(jnp.asarray(r0_flat), x.reshape(N * Hin, WINC),
               wv, jnp.asarray(GB))
    out = out.reshape(N, ntiles * TO, OUTP)
    return out[:, :Hout, :OUT].reshape(N, Hout, Wout, mix.shape[0])


def reference_pipeline_f64(x: np.ndarray, Hout: int, Wout: int,
                           filt: str = "lanczos", sigma: float = 0.0,
                           mix: Optional[np.ndarray] = None,
                           clip: bool = True) -> np.ndarray:
    """float64 reference of the same fused math (for fidelity gating)."""
    N, Hin, Win, C = x.shape
    if mix is None:
        mix = np.eye(C)
    Mv = _axis_operator(Hin, Hout, filt, float(sigma))
    Mw = _axis_operator(Win, Wout, filt, float(sigma))
    y = np.einsum("oh,nhwc->nowc", Mv, np.asarray(x, np.float64))
    y = np.einsum("pw,nowc->nopc", Mw, y)
    y = np.einsum("dc,nopc->nopd", np.asarray(mix, np.float64), y)
    return np.clip(y, 0.0, 1.0) if clip else y


def fused_blur_unsharp_pipeline(x: jnp.ndarray, sigma_blur: float,
                                sigma_unsharp: float, gain: float,
                                C: int, TO: int = 128, nslots: int = 2,
                                precision: str = "b3",
                                in_shape: Optional[Tuple[int, int, int,
                                                         int]] = None,
                                lab_roundtrip: bool = False,
                                interpret: bool = False,
                                wscale=None,
                                vmem_budget: Optional[int] = None
                                ) -> Optional[jnp.ndarray]:
    """Blur -> unsharp (threshold 0) as ONE kernel, two stages inside.

    Instead of the rank-2 sum of separable operators (which doubles
    every MXU pass), the kernel computes the stage-1 blur tile with an
    r-row halo and applies the small-sigma unsharp correction as VPU
    shift-adds in the epilogue — exactly (1+g)z - g*Bu(z) with the same
    band operators blur_unsharp_terms builds. Rank-1 MXU work.
    """
    if not HAVE_PALLAS:
        return None
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        return None
    if x.dtype != jnp.float32:
        return None
    if x.ndim == 2:
        if in_shape is None:
            return None
        N, Hin, Win, Cs = in_shape
        if Cs != C or x.shape != (N * Hin, Win * C):
            return None
    elif x.ndim == 4:
        N, Hin, Win, Cs = x.shape
        if Cs != C:
            return None
    else:
        return None
    WINC = Win * C
    if WINC % 128 != 0 or Hin % 8 != 0:
        return None
    Bgv = blur_band_matrix(Hin, sigma_blur)
    Bgw = blur_band_matrix(Win, sigma_blur)
    Buv = blur_band_matrix(Hin, sigma_unsharp, width_rule="1d")
    # interior row of Bu gives the pure taps
    midrow = np.asarray(Buv[Hin // 2], np.float64)
    nz = np.nonzero(midrow)[0]
    taps = tuple(float(v) for v in midrow[nz[0]:nz[-1] + 1])
    r = len(taps) // 2
    if len(taps) % 2 != 1 or r == 0 or r > 8:
        return None
    # extended vertical operator: per tile, rows t*TO-r .. t*TO+TO+r of
    # the stage-1 output with row indices clamped to the image (replicate
    # edge policy — identical to what Buv@Bgv's edge rows encode)
    ntiles = -(-Hin // TO)
    TOE = TO + 2 * r
    Mv_ext = np.zeros((ntiles * TOE, Hin), np.float64)
    for t in range(ntiles):
        for j in range(TOE):
            src = min(max(t * TO - r + j, 0), Hin - 1)
            Mv_ext[t * TOE + j] = Bgv[src]
    mix = np.eye(C)
    _, r0s, BAND, _nt = _v_blocks(np.abs(Mv_ext), Hin, TOE)
    GB, c0s, SPAN, OUT, OUTP = _h_blocks(np.abs(Bgw), C, mix, WINC)
    if OUT != OUTP:
        return None          # epilogue lane shifts assume no lane padding
    # per-term blocks against the shared windows (rank 1)
    WV = np.zeros((ntiles, TOE, BAND), np.float32)
    for t, r0 in enumerate(r0s):
        rows = Mv_ext[t * TOE:(t + 1) * TOE]
        WV[t] = rows[:, r0:r0 + BAND]
    Gfull = np.zeros((WINC, OUTP), np.float64)
    MwT = np.asarray(Bgw, np.float64).T
    for c in range(C):
        Gfull[c:Win * C:C, c:OUT:C] += MwT
    GBp = np.zeros((len(c0s), SPAN, 128), np.float32)
    for b, c0 in enumerate(c0s):
        GBp[b] = Gfull[c0:c0 + SPAN, b * 128:(b + 1) * 128]
    uniq: dict = {}
    keep = []
    guids = []
    for blk in GBp:
        key = blk.tobytes()
        if key not in uniq:
            uniq[key] = len(keep)
            keep.append(blk)
        guids.append(uniq[key])
    GB_all = np.stack(keep)
    # Round-5 h-pass strength reduction (see _kernel._h_mid_stencil):
    # when the blur's interior rows are a pure odd Toeplitz stencil
    # fitting inside the two 128-lane edge blocks, ship only those two
    # G blocks and compute interior lanes as f32 shift-adds.
    hblur = None
    if WINC == OUTP and OUTP > 256 and len(c0s) > 2 and \
            not os.environ.get("IMTPU_NO_HSTENCIL"):
        mrow = np.asarray(Bgw[Win // 2], np.float64)
        nzh = np.nonzero(mrow)[0]
        if len(nzh):
            thb = mrow[nzh[0]:nzh[-1] + 1]
            rb = len(thb) // 2
            if len(thb) % 2 == 1 and 0 < rb * C <= 128:
                ideal = np.zeros((Win, Win))
                for w in range(rb, Win - rb):
                    ideal[w, w - rb:w + rb + 1] = thb
                interior = np.asarray(Bgw, np.float64)[rb:Win - rb]
                if np.array_equal(interior, ideal[rb:Win - rb]):
                    hblur = (tuple(float(v) for v in thb), C)
                    GB_all = np.stack([GBp[0], GBp[-1]])
                    guids = [0, 1]
                    keep = [GBp[0], GBp[-1]]
    vmem = (nslots * BAND * WINC + GB_all.size + WV.size +
            2 * TOE * OUTP + TOE * WINC) * 4
    if hblur is not None:
        # h-stencil temporaries: border-replicated padded band + the
        # f32 mid accumulator + the edge-spliced concat result (the AOT
        # pre-flight measured a 394K stack overrun without this)
        vmem += 3 * BAND * (OUTP + 2 * (len(hblur[0]) // 2) * C) * 4
    if lab_roundtrip:
        # the Lab epilogue keeps ~8 live (TOE, chunk) f32 temporaries on
        # the Mosaic stack — without this surcharge the TO=64 variant
        # passes the block budget but blows the 16MB scoped-vmem limit
        # at lowering (measured 17.8M unchunked).  Shared chunk rule
        # with the kernel (_lane_chunk).
        vmem += 8 * TOE * _lane_chunk(WINC, C) * 4
        # pipelined kernel: stage + outbuf ping-pongs
        vmem += (2 * TOE * OUTP + 2 * TO * OUTP) * 4
    if vmem > (vmem_budget or _VMEM_BUDGET):
        if TO > 16:
            return fused_blur_unsharp_pipeline(
                x, sigma_blur, sigma_unsharp, gain, C, TO // 2, nslots,
                precision=precision, in_shape=in_shape,
                lab_roundtrip=lab_roundtrip, interpret=interpret,
                wscale=wscale, vmem_budget=vmem_budget)
        return None
    unsharp = (taps, taps, float(gain), C)
    chanep = _lab_roundtrip_rows if lab_roundtrip and C == 3 else None
    if lab_roundtrip and chanep is None:
        return None
    # A software-pipelined variant (_build_call_pipe: tile i's matmuls
    # staged while tile i-1's VPU epilogue runs) measured SLOWER than the
    # sequential kernel (4.40 vs 4.11 ms on the 1080p batch, bit-exact):
    # Mosaic does not overlap the two pl.when phases' MXU/VPU queues, and
    # the manual output DMA adds per-step cost.  Kept for measurement
    # (IMTPU_PIPE_KERNEL=1) — default is the sequential kernel.
    import os as _os
    builder = (_build_call_pipe
               if chanep is not None and _os.environ.get("IMTPU_PIPE_KERNEL")
               else _build_call)
    # Column-chunked MXU/VPU interleave for the epilogue-heavy variant:
    # issue the vertical-pass matmuls in Q column chunks, then run the
    # VPU tail chunk-by-chunk so it overlaps the later chunks' matmuls
    # (see _kernel).  Chunk = the Lab lane-chunk rule (128- and pixel-
    # aligned); killswitch IMTPU_NO_COLCHUNK for A/B.
    colck = None
    if (chanep is not None and builder is _build_call
            and not _os.environ.get("IMTPU_NO_COLCHUNK")):
        cand = _lane_chunk(OUTP, C)
        if cand < OUTP and OUTP % cand == 0 and r * C <= cand:
            colck = cand
    call = builder(N, Hin, WINC, TO, BAND, ntiles, len(c0s), SPAN,
                   OUTP, c0s, precision, True, interpret, nterms=1,
                   guids=tuple(guids), n_unique=len(keep),
                   nslots=nslots, unsharp=unsharp,
                   chan_epilogue=chanep,
                   # epilogue stack needs more than Mosaic's 16MB
                   # default at TO>=64 (measured 19M at TO=64/1080p);
                   # grant 2x the block estimate, floor 24MB
                   vmem_limit=min(max(2 * vmem, 24 << 20), 100 << 20),
                   **(({"col_chunk": colck} if colck else {})
                      | ({"hblur": hblur}
                         if hblur and builder is _build_call else {})))
    r0_flat = (np.repeat(np.arange(N, dtype=np.int64) * Hin, ntiles) +
               np.tile(r0s.astype(np.int64), N)).astype(np.int32)
    wv = jnp.asarray(WV)
    if wscale is not None:
        # traced scalar on the (small) vertical-operator operand: distinct
        # benchmark steps without an extra full-tensor pass (see
        # fused_resize_pipeline wscale)
        wv = wv * jnp.asarray(wscale, wv.dtype)
    out = call(jnp.asarray(r0_flat), x.reshape(N * Hin, WINC),
               wv, jnp.asarray(GB_all))
    out = out.reshape(N, ntiles * TO, OUTP)
    return out[:, :Hin, :OUT].reshape(N, Hin, Win, C)

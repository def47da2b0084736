"""Fourier-domain ops (fourier.c).

Re-implements /root/reference/MagickCore/fourier.c (1,626 LoC):
ForwardFourierTransformImage (:913), InverseFourierTransformImage (:1504),
ComplexImages (:134).  The reference shells out to FFTW3; here ``jnp.fft``
compiles straight onto the accelerator and fuses with surrounding math —
the 4K-FFT-filter benchmark config runs as one program.

Conventions follow the reference: forward yields a (magnitude, phase) image
pair by default (or (real, imaginary) with modulus=False), both fftshifted
to center DC, magnitude normalized by N, phase mapped to [0,1].

Robustness (this machine): the axon TPU worker sporadically degrades into
a state where every FFT op raises UNIMPLEMENTED while other compute is
fine.  ``probe_fft()`` detects that with a tiny eager FFT, and every op
here transparently falls back to an exact matmul-DFT formulation (two
"high"-precision MXU matmuls per axis) so a degraded worker still yields
correct results and a real benchmark number.  Force a path with
``set_fft_mode("fft"|"matmul"|"auto")``.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# -- FFT availability probe + mode selection --------------------------------

_FFT_MODE = "auto"           # "auto" | "fft" | "matmul"
_FFT_OK: bool | None = None  # cached probe result


def set_fft_mode(mode: str) -> None:
    """Force the transform path: "fft", "matmul", "fourstep", or "auto"
    (auto = four-step matmul FFT on TPU backends — measured faster than
    XLA's native FFT and immune to the degraded no-FFT worker state —
    and the backend fft elsewhere)."""
    global _FFT_MODE
    if mode not in ("auto", "fft", "matmul", "fourstep"):
        raise ValueError(f"bad fft mode {mode!r}")
    _FFT_MODE = mode


def probe_fft(recheck: bool = False) -> bool:
    """True when the backend executes FFTs (tiny eager probe, cached).

    The axon worker's degraded state raises UNIMPLEMENTED on ANY fft —
    jit or eager, any size — so an 8-point probe is a reliable detector.
    """
    global _FFT_OK
    if _FFT_OK is None or recheck:
        try:
            v = float(jnp.abs(jnp.sum(jnp.fft.fft(jnp.arange(8.0)))))
            _FFT_OK = bool(np.isfinite(v))
        except Exception:        # noqa: BLE001 — any failure = no FFT
            _FFT_OK = False
    return _FFT_OK


def _resolve_mode() -> str:
    """The transform path to use: "fft" | "matmul" | "fourstep"."""
    if _FFT_MODE != "auto":
        return _FFT_MODE
    if jax.default_backend() in ("tpu", "axon"):
        return "fourstep"
    return "fft" if probe_fft() else "fourstep"


def _use_fft() -> bool:
    return _resolve_mode() == "fft"


# -- matmul-DFT fallback ----------------------------------------------------

@functools.lru_cache(maxsize=8)
def _dft_mats_np(n: int, inverse: bool):
    """Symmetric n-point DFT matrix as (cos, sin) f32 NUMPY parts.
    Cached values must stay numpy: caching a jnp array created inside a
    trace (e.g. under lax.scan) leaks that trace's tracer."""
    k = np.arange(n, dtype=np.float64)
    ang = (2.0 if inverse else -2.0) * np.pi * np.outer(k, k) / n
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def _dft_mats(n: int, inverse: bool):
    c, s = _dft_mats_np(n, inverse)
    return jnp.asarray(c), jnp.asarray(s)


def _matmul_fft2(xr, xi, inverse: bool = False):
    """Exact 2-D DFT as row/column matmuls (MXU path; 'high' = bf16x3
    ~107dB vs f32 — never 'default' bf16 on the fidelity path)."""
    H, W = xr.shape[-2:]
    Ch, Sh = _dft_mats(H, inverse)
    Cw, Sw = _dft_mats(W, inverse)
    mm = functools.partial(jnp.matmul, precision="high")
    yr = mm(Ch, xr) - mm(Sh, xi)
    yi = mm(Ch, xi) + mm(Sh, xr)
    zr = mm(yr, Cw) - mm(yi, Sw)     # DFT matrix is symmetric: F^T = F
    zi = mm(yr, Sw) + mm(yi, Cw)
    if inverse:
        s = 1.0 / float(H * W)
        zr, zi = zr * s, zi * s
    return zr, zi


# -- four-step factored matmul FFT ------------------------------------------
#
# XLA's native TPU FFT measured 7.2 ms for the 4K wiener round trip
# (BENCHMARKS_r04) — ~3% of the HBM speed-of-light.  The four-step
# Cooley-Tukey factorization N = N1*N2 turns each 1-D transform into two
# dense DFT matmuls (N1- and N2-point, ~sqrt(N)-sized — MXU-native) plus
# one elementwise twiddle:
#
#   X[k2*N1+k1] = sum_{n2} W_N^{n2 k1} W_{N2}^{n2 k2}
#                   (sum_{n1} x[n1*N2+n2] W_{N1}^{n1 k1})
#
# 64x64 factors cost 2*64 complex MACs/sample vs 4096 for the dense DFT
# (32x fewer flops) while staying pure matmul+elementwise — no FFT op,
# so it also sidesteps the axon worker's degraded no-FFT state.

@functools.lru_cache(maxsize=16)
def _fourstep_consts(n: int, inverse: bool):
    """(n1, n2, C1, S1, C2, S2, Tc, Ts) for the N=n1*n2 factorization."""
    n1 = 1
    for d in range(2, int(math.isqrt(n)) + 1):
        if n % d == 0:
            n1 = d
    # n1 = largest divisor <= sqrt(n); prime n -> n1 == 1 (caller falls
    # back to the dense DFT)
    if n1 == 1:
        return None
    n2 = n // n1
    sign = 2.0 if inverse else -2.0
    k1 = np.arange(n1, dtype=np.float64)
    k2 = np.arange(n2, dtype=np.float64)
    a1 = sign * np.pi * np.outer(k1, k1) / n1
    a2 = sign * np.pi * np.outer(k2, k2) / n2
    tw = sign * np.pi * np.outer(k1, k2) / n      # (k1, n2) twiddles
    # NUMPY on purpose — jnp constants cached across traces leak tracers
    f32 = lambda a: np.asarray(a, np.float32)   # noqa: E731
    return (n1, n2, f32(np.cos(a1)), f32(np.sin(a1)),
            f32(np.cos(a2)), f32(np.sin(a2)),
            f32(np.cos(tw)), f32(np.sin(tw)))


def _fourstep_axis(xr, xi, inverse: bool):
    """Length-N DFT along the LAST axis via the four-step factorization.
    xr/xi: (..., N) f32 (xi may be None for real input).  Returns (re, im).
    """
    n = xr.shape[-1]
    consts = _fourstep_consts(n, inverse)
    if consts is None:
        C, S = _dft_mats(n, inverse)
        mm = functools.partial(jnp.matmul, precision="high")
        if xi is None:
            zr, zi = mm(xr, C), mm(xr, S)
        else:
            zr = mm(xr, C) - mm(xi, S)
            zi = mm(xr, S) + mm(xi, C)
        if inverse:
            zr, zi = zr / n, zi / n
        return zr, zi
    n1, n2, C1, S1, C2, S2, Tc, Ts = consts
    shp = xr.shape[:-1]
    es = functools.partial(jnp.einsum, precision="high")
    a = xr.reshape(shp + (n1, n2))
    if xi is None:
        yr = es("ab,...bc->...ac", C1, a)
        yi = es("ab,...bc->...ac", S1, a)
    else:
        b = xi.reshape(shp + (n1, n2))
        yr = es("ab,...bc->...ac", C1, a) - es("ab,...bc->...ac", S1, b)
        yi = es("ab,...bc->...ac", S1, a) + es("ab,...bc->...ac", C1, b)
    zr = yr * Tc - yi * Ts
    zi = yr * Ts + yi * Tc
    outr = es("...ac,cd->...ad", zr, C2) - es("...ac,cd->...ad", zi, S2)
    outi = es("...ac,cd->...ad", zr, S2) + es("...ac,cd->...ad", zi, C2)
    # output index k = k2*n1 + k1 -> transpose the (k1, k2) grid
    outr = jnp.swapaxes(outr, -1, -2).reshape(shp + (n,))
    outi = jnp.swapaxes(outi, -1, -2).reshape(shp + (n,))
    if inverse:
        outr, outi = outr / n, outi / n
    return outr, outi


def _fourstep_fft2(xr, xi, inverse: bool = False):
    """2-D DFT over the last two axes via two four-step passes."""
    # W axis (last)
    zr, zi = _fourstep_axis(xr, xi, inverse)
    # H axis: move it last, transform, move back
    zr = jnp.swapaxes(zr, -1, -2)
    zi = jnp.swapaxes(zi, -1, -2)
    zr, zi = _fourstep_axis(zr, zi, inverse)
    return jnp.swapaxes(zr, -1, -2), jnp.swapaxes(zi, -1, -2)


def _fft2(x):
    """fft2 via the selected path.  x: complex or real."""
    mode = _resolve_mode()
    if mode == "fft":
        return jnp.fft.fft2(x.astype(jnp.complex64))
    if jnp.iscomplexobj(x):
        xr, xi = x.real.astype(jnp.float32), x.imag.astype(jnp.float32)
    else:
        xr = x.astype(jnp.float32)
        xi = None
    if mode == "fourstep":
        zr, zi = _fourstep_fft2(xr, xi, inverse=False)
    else:
        zr, zi = _matmul_fft2(xr, jnp.zeros_like(xr) if xi is None else xi,
                              inverse=False)
    return jax.lax.complex(zr, zi)


def _ifft2(f):
    """ifft2 via the selected path.  f: complex."""
    mode = _resolve_mode()
    if mode == "fft":
        return jnp.fft.ifft2(f)
    fr = f.real.astype(jnp.float32)
    fi = f.imag.astype(jnp.float32)
    if mode == "fourstep":
        zr, zi = _fourstep_fft2(fr, fi, inverse=True)
    else:
        zr, zi = _matmul_fft2(fr, fi, inverse=True)
    return jax.lax.complex(zr, zi)


# -- the ops ----------------------------------------------------------------

def forward_fft(img: jnp.ndarray, modulus: bool = True
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ForwardFourierTransformImage (fourier.c:913).

    Returns (magnitude, phase) images — per channel, DC centered.  The
    reference pads to square even dimensions; we keep the input shape
    (callers can pad) and normalize magnitude by the pixel count.
    """
    h, w = img.shape[-3], img.shape[-2]
    x = jnp.moveaxis(img, -1, 0)  # (C, ..., H, W)
    f = _fft2(x)
    f = jnp.fft.fftshift(f, axes=(-2, -1))
    n = float(h * w)
    if modulus:
        mag = jnp.abs(f) / n
        phase = (jnp.angle(f) / (2.0 * math.pi)) + 0.5  # [0,1]
        return jnp.moveaxis(mag, 0, -1).astype(img.dtype), \
            jnp.moveaxis(phase, 0, -1).astype(img.dtype)
    return (jnp.moveaxis(f.real / n, 0, -1).astype(img.dtype),
            jnp.moveaxis(f.imag / n, 0, -1).astype(img.dtype))


def inverse_fft(first: jnp.ndarray, second: jnp.ndarray,
                modulus: bool = True) -> jnp.ndarray:
    """InverseFourierTransformImage (fourier.c:1504)."""
    h, w = first.shape[-3], first.shape[-2]
    n = float(h * w)
    a = jnp.moveaxis(first, -1, 0).astype(jnp.float32) * n
    b = jnp.moveaxis(second, -1, 0).astype(jnp.float32)
    if modulus:
        phase = (b - 0.5) * (2.0 * math.pi)
        f = a * jnp.exp(1j * phase)
    else:
        f = a + 1j * (b * n)
    f = jnp.fft.ifftshift(f, axes=(-2, -1))
    x = _ifft2(f).real
    return jnp.clip(jnp.moveaxis(x, 0, -1), 0.0, 1.0).astype(first.dtype)


def complex_images(a_real: jnp.ndarray, a_imag: jnp.ndarray,
                   b_real: jnp.ndarray, b_imag: jnp.ndarray,
                   operator: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ComplexImages (fourier.c:134): arithmetic on image pairs as complexes."""
    op = operator.lower().replace("-", "")
    ar, ai, br, bi = a_real, a_imag, b_real, b_imag
    if op == "add":
        return ar + br, ai + bi
    if op == "subtract":
        return ar - br, ai - bi
    if op == "multiply":
        return ar * br - ai * bi, ar * bi + ai * br
    if op == "divide":
        d = br * br + bi * bi
        d = jnp.where(d < 1e-20, 1e-20, d)
        return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d
    if op == "magnitudephase":
        return jnp.sqrt(ar * ar + ai * ai), jnp.arctan2(ai, ar) / (2 * math.pi) + 0.5
    if op == "realimaginary":
        mag, ph = ar, (ai - 0.5) * 2.0 * math.pi
        return mag * jnp.cos(ph), mag * jnp.sin(ph)
    if op == "conjugate":
        return ar, -ai
    raise ValueError(f"unknown complex operator {operator!r}")


def wiener_deconvolve(img: jnp.ndarray, kernel_fft: jnp.ndarray = None,
                      noise: float = 0.01) -> jnp.ndarray:
    """Wiener-style frequency-domain filter (BASELINE config #4 pipeline).

    With no kernel, acts as a Wiener denoiser: F' = F·|F|²/(|F|²+noise).
    """
    x = jnp.moveaxis(img, -1, 0)
    mode = _resolve_mode()
    use_fft = mode == "fft"
    # noise scale = spectral mean power; by Parseval mean|F|^2 over the
    # FULL spectrum == sum(x^2), which keeps the filter identical across
    # the rfft2 half-spectrum, fft2, and matmul-DFT paths
    pmean = jnp.sum(x.astype(jnp.float32) ** 2, axis=(-2, -1),
                    keepdims=True)
    if kernel_fft is None and mode == "fourstep":
        # fused Pallas path first (fourier_pallas: 3 kernels, spectrum
        # never round-trips HBM between the H-FFT, mask, and H-iFFT);
        # IMTPU_NO_PALLAS_FFT=1 or an unsupported shape falls back to
        # the XLA four-step
        import os as _os

        if not _os.environ.get("IMTPU_NO_PALLAS_FFT") \
                and x.ndim == 3 and jax.default_backend() in ("tpu",
                                                              "axon"):
            from .fourier_pallas import supported as _wp_ok
            from .fourier_pallas import wiener_pallas as _wp

            if _wp_ok(x.shape[-2], x.shape[-1]):
                outs = [_wp(x[c], noise) for c in range(x.shape[0])]
                out = jnp.stack(outs)
                return jnp.clip(jnp.moveaxis(out, 0, -1),
                                0.0, 1.0).astype(img.dtype)
        # all-real formulation: forward with xi=None (2 matmuls saved),
        # spectral mask on (re, im) parts, inverse real part only —
        # never materializes a complex dtype
        fr, fi = _fourstep_fft2(x.astype(jnp.float32), None, inverse=False)
        p = fr * fr + fi * fi
        m = p / (p + noise * pmean)
        out, _ = _fourstep_fft2(fr * m, fi * m, inverse=True)
    elif kernel_fft is None and use_fft and \
            x.shape[-1] % 2 == 0 and x.shape[-2] % 2 == 0:
        # real input: rfft2 computes only the non-redundant half-spectrum
        # (half the FLOPs and memory; TPU irfft2 needs even extents)
        f = jnp.fft.rfft2(x.astype(jnp.float32))
        p = (f * jnp.conj(f)).real
        g = f * (p / (p + noise * pmean))
        out = jnp.fft.irfft2(g, s=x.shape[-2:])
    elif kernel_fft is None:
        f = _fft2(x)
        p = (f * jnp.conj(f)).real
        g = f * (p / (p + noise * pmean))
        out = _ifft2(g).real
    else:
        f = _fft2(x)
        k = kernel_fft
        kp = (k * jnp.conj(k)).real
        g = f * jnp.conj(k) / (kp + noise)
        out = _ifft2(g).real
    return jnp.clip(jnp.moveaxis(out, 0, -1), 0.0, 1.0).astype(img.dtype)

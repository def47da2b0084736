"""Fourier-domain ops (fourier.c).

Re-implements /root/reference/MagickCore/fourier.c (1,626 LoC):
ForwardFourierTransformImage (:913), InverseFourierTransformImage (:1504),
ComplexImages (:134).  The reference shells out to FFTW3; here ``jnp.fft``
compiles straight onto the accelerator and fuses with surrounding math —
the 4K-FFT-filter benchmark config runs as one program.

Conventions follow the reference: forward yields a (magnitude, phase) image
pair by default (or (real, imaginary) with modulus=False), both fftshifted
to center DC, magnitude normalized by N, phase mapped to [0,1].
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp


def forward_fft(img: jnp.ndarray, modulus: bool = True
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ForwardFourierTransformImage (fourier.c:913).

    Returns (magnitude, phase) images — per channel, DC centered.  The
    reference pads to square even dimensions; we keep the input shape
    (callers can pad) and normalize magnitude by the pixel count.
    """
    h, w = img.shape[-3], img.shape[-2]
    x = jnp.moveaxis(img, -1, 0)  # (C, ..., H, W)
    f = jnp.fft.fft2(x.astype(jnp.complex64))
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
    x = jnp.fft.ifft2(f).real
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
    if kernel_fft is None and x.shape[-1] % 2 == 0 and x.shape[-2] % 2 == 0:
        # real input: rfft2 computes only the non-redundant half-spectrum
        # (half the FLOPs and memory; TPU irfft2 needs even extents)
        f = jnp.fft.rfft2(x.astype(jnp.float32))
        p = (f * jnp.conj(f)).real
        g = f * (p / (p + noise * jnp.mean(p)))
        out = jnp.fft.irfft2(g, s=x.shape[-2:])
    elif kernel_fft is None:
        f = jnp.fft.fft2(x.astype(jnp.complex64))
        p = (f * jnp.conj(f)).real
        g = f * (p / (p + noise * jnp.mean(p)))
        out = jnp.fft.ifft2(g).real
    else:
        f = jnp.fft.fft2(x.astype(jnp.complex64))
        k = kernel_fft
        kp = (k * jnp.conj(k)).real
        g = f * jnp.conj(k) / (kp + noise)
        out = jnp.fft.ifft2(g).real
    return jnp.clip(jnp.moveaxis(out, 0, -1), 0.0, 1.0).astype(img.dtype)

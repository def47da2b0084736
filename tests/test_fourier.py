"""FFT path robustness: matmul-DFT fallback (fourier.c parity)."""

import numpy as np

import jax.numpy as jnp




def test_matmul_dft_matches_fft():
    """The matmul-DFT fallback (degraded-worker path, VERDICT r2 #8) is
    numerically the FFT to ~f32 precision, forward and inverse."""
    from imagemagick_tpu.ops import fourier as ff

    rng = np.random.default_rng(11)
    img = rng.random((24, 40, 3)).astype(np.float32)
    x = jnp.asarray(img)

    ff.set_fft_mode("fft")
    try:
        m1, p1 = ff.forward_fft(x)
        r1 = ff.inverse_fft(m1, p1)
        ff.set_fft_mode("matmul")
        m2, p2 = ff.forward_fft(x)
        r2 = ff.inverse_fft(m2, p2)
    finally:
        ff.set_fft_mode("auto")
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=2e-4)
    # round trip reconstructs the image on the fallback path too
    np.testing.assert_allclose(np.asarray(r2), img, atol=2e-3)


def test_wiener_matmul_path_runs():
    from imagemagick_tpu.ops import fourier as ff

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.random((32, 32, 1)).astype(np.float32))
    ff.set_fft_mode("matmul")
    try:
        a = ff.wiener_deconvolve(x, noise=0.05)
        ff.set_fft_mode("fft")
        b = ff.wiener_deconvolve(x, noise=0.05)
    finally:
        ff.set_fft_mode("auto")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

"""Fused-kernel dispatch from the product surfaces (VERDICT r2 #1).

The CLI's lazy chains must pattern-match onto the banded-block-matmul
Pallas kernel (ops/dispatch.py) — the accelerate.c:3986 try-first pattern
inverted — and the kernel result must agree with the XLA op path to
>=60dB on representative content.  Runs the kernel in the Pallas
interpreter (CPU suite).
"""

import importlib

import numpy as np
import pytest

import jax.numpy as jnp

climain = importlib.import_module("imagemagick_tpu.cli.main")
dispatch = importlib.import_module("imagemagick_tpu.ops.dispatch")


def _psnr(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    return 200.0 if mse == 0 else 10 * np.log10(1.0 / mse)


@pytest.fixture()
def interpret_dispatch(monkeypatch):
    monkeypatch.setattr(dispatch, "FORCE_INTERPRET", True)
    monkeypatch.setattr(dispatch, "STRICT", True)
    counts = dict(dispatch.COUNTS)
    dispatch.COUNTS.update({k: 0 for k in dispatch.COUNTS})
    yield dispatch.COUNTS
    dispatch.COUNTS.update(counts)


def _natural(h, w, seed=0):
    """Smooth gradient + modest texture (ringing-representative)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 0.5 + 0.4 * np.sin(yy / 17.0)[..., None] * np.cos(
        xx / 23.0)[..., None]
    tex = 0.08 * rng.standard_normal((h, w, 3)).astype(np.float32)
    img = np.clip(base + tex, 0.0, 1.0).astype(np.float32)
    img[h // 3:h // 2, w // 4:w // 2] = 0.95     # a hard-edged block
    return img


def test_match_prefix():
    t_resize = ("resize", (10, 10, "lanczos"))
    t_blur = ("gblur", (0.0, 2.0, "2d"))
    t_mix = ("mix", ((0.2, 0.7, 0.1),))
    assert dispatch.match_prefix([t_resize, t_blur, t_mix]) == 3
    assert dispatch.match_prefix([t_mix]) == 0          # no spatial op
    assert dispatch.match_prefix([None, t_resize]) == 0
    assert dispatch.match_prefix([t_blur, None, t_mix]) == 1


def test_plan_matches_dense_composition():
    """_plan_chain's composed operators == op-by-op dense math (f64)."""
    from imagemagick_tpu.ops.fused_pipeline import blur_band_matrix
    from imagemagick_tpu.ops.resize import resize_matrix

    H, W, C = 40, 56, 3
    prefix = (("resize", (24, 32, "lanczos")),
              ("gblur", (0.0, 1.5, "2d")),
              ("mix", ((0.25, 0.5, 0.25),)))
    Mv, Mw, mix, Hout, Wout, Cout = dispatch._plan_chain(H, W, C, prefix)
    assert (Hout, Wout, Cout) == (24, 32, 1)
    Rv = resize_matrix(H, 24, "lanczos").astype(np.float64).T
    Bv = blur_band_matrix(24, 1.5)
    np.testing.assert_allclose(Mv, Bv @ Rv, atol=1e-12)
    Rw = resize_matrix(W, 32, "lanczos").astype(np.float64).T
    Bw = blur_band_matrix(32, 1.5)
    np.testing.assert_allclose(Mw, Bw @ Rw, atol=1e-12)
    np.testing.assert_allclose(mix, [[0.25, 0.5, 0.25]])


def test_cli_chain_dispatches_to_kernel(tmp_path, interpret_dispatch):
    """resize+blur+gray CLI chain runs the Pallas kernel AND matches the
    XLA op path >=60dB (unaligned 70x90 shape exercises pad_align)."""
    from imagemagick_tpu import io as iio
    from imagemagick_tpu.core.image import Image
    from imagemagick_tpu.core.spec import ImageSpec

    src = tmp_path / "in.ppm"
    iio.write_image(Image(_natural(70, 90), ImageSpec(colorspace="srgb",
                                                      alpha=False, depth=8)),
                    str(src))
    argv = ["-resize", "40x36!", "-gaussian-blur", "0x1.5",
            "-colorspace", "gray"]

    out_k = tmp_path / "kernel.png"
    climain.process([str(src), *argv, str(out_k)])
    assert interpret_dispatch["pallas"] >= 1, "kernel path not chosen"

    # force the XLA chain for the reference output
    import imagemagick_tpu.ops.dispatch as dsp
    old = dsp.ENABLED
    dsp.ENABLED = False
    try:
        out_x = tmp_path / "xla.png"
        climain.process([str(src), *argv, str(out_x)])
    finally:
        dsp.ENABLED = old

    a = iio.read_image(str(out_k)).data
    b = iio.read_image(str(out_x)).data
    assert a.shape == b.shape == (36, 40, 1)
    p = _psnr(a, b)
    assert p >= 60.0, f"kernel vs op path PSNR {p:.1f}dB"


def test_cli_partial_chain_falls_back(tmp_path, interpret_dispatch):
    """A chain with an untaggable op mid-stream dispatches the prefix and
    runs the rest on the XLA path."""
    from imagemagick_tpu import io as iio
    from imagemagick_tpu.core.image import Image
    from imagemagick_tpu.core.spec import ImageSpec

    src = tmp_path / "in.ppm"
    iio.write_image(Image(_natural(64, 64, seed=3),
                          ImageSpec(colorspace="srgb", alpha=False, depth=8)),
                    str(src))
    out = tmp_path / "o.png"
    climain.process([str(src), "-resize", "32x32!", "-negate", str(out)])
    assert interpret_dispatch["pallas"] >= 1
    assert interpret_dispatch["xla"] >= 1
    img = iio.read_image(str(out))
    assert (img.height, img.width) == (32, 32)


def test_wand_ops_dispatch_to_kernel(interpret_dispatch):
    """Wand resize/gaussian-blur offer each op to the kernel first and
    match the XLA op math >=60dB."""
    from imagemagick_tpu.core.image import Image
    from imagemagick_tpu.core.spec import ImageSpec
    from imagemagick_tpu.wand.api import MagickWand

    img = _natural(64, 80, seed=7)

    w1 = MagickWand()
    w1.images.append(Image(jnp.asarray(img), ImageSpec(colorspace="srgb")))
    w1.resize_image(48, 44, "lanczos")
    w1.gaussian_blur_image(0.0, 1.2)
    assert interpret_dispatch["pallas"] >= 2  # both ops took the kernel
    kern = np.asarray(w1.images[0].data)

    old = dispatch.ENABLED
    dispatch.ENABLED = False
    try:
        w2 = MagickWand()
        w2.images.append(Image(jnp.asarray(img),
                               ImageSpec(colorspace="srgb")))
        w2.resize_image(48, 44, "lanczos")
        w2.gaussian_blur_image(0.0, 1.2)
    finally:
        dispatch.ENABLED = old
    ref = np.asarray(w2.images[0].data)
    assert kern.shape == ref.shape == (44, 48, 3)
    p = _psnr(kern, ref)
    assert p >= 60.0, f"wand kernel vs op path PSNR {p:.1f}dB"


def test_batched_materialize_one_kernel_call(tmp_path, interpret_dispatch):
    """N same-shape images with one fully-tagged chain materialize as ONE
    batched kernel call and match per-image results."""
    from imagemagick_tpu import io as iio
    from imagemagick_tpu.core.image import Image
    from imagemagick_tpu.core.spec import ImageSpec

    n = 4
    imgs = [_natural(64, 96, seed=i) for i in range(n)]
    st = climain.CLIState()
    for a in imgs:
        st.images.append(climain.LazyImage(
            Image(jnp.asarray(a), ImageSpec(colorspace="srgb"))))
    climain.process(["-resize", "48x32!", "-gaussian-blur", "0x1",
                     "-colorspace", "gray"], st)
    outs = climain.materialize_all(st.images)
    assert interpret_dispatch["pallas"] == 1      # ONE batched call
    assert all(o.data.shape == (32, 48, 1) for o in outs)

    # equals the per-image (single-image dispatch) result
    st2 = climain.CLIState()
    st2.images.append(climain.LazyImage(
        Image(jnp.asarray(imgs[2]), ImageSpec(colorspace="srgb"))))
    climain.process(["-resize", "48x32!", "-gaussian-blur", "0x1",
                     "-colorspace", "gray"], st2)
    single = st2.images[0].materialize()
    np.testing.assert_allclose(np.asarray(outs[2].data),
                               np.asarray(single.data), atol=1e-6)


def test_try_fused_batch_array(interpret_dispatch):
    """The born-stacked (N, H, W, C) batch entry (serve sessions) runs
    the same kernel as the per-image-list batch path, no slicing."""
    n = 3
    x = jnp.asarray(np.stack([_natural(64, 96, seed=i) for i in range(n)]))
    tags = [("resize", (32, 48, "lanczos")), ("gblur", (0.0, 1.0, "2d")),
            ("mix", ((0.212656, 0.715158, 0.072186),))]
    out = dispatch.try_fused_batch_array(x, tags)
    assert out is not None and out.shape == (n, 32, 48, 1)
    ref = dispatch.try_fused_batch([x[i] for i in range(n)], list(tags))
    assert ref is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    # non-expressible chain declines
    assert dispatch.try_fused_batch_array(x, [None]) is None


def test_dispatch_alpha_opacity_probe(interpret_dispatch):
    """Alpha chains dispatch ONLY when the image is fully opaque —
    premultiplied sampling (resize.c BlendPixelTrait) is the identity
    exactly there.  Semi-transparent images stay on the XLA path;
    upscales still decline at the planner."""
    st = climain.CLIState()
    from imagemagick_tpu.core.image import Image
    from imagemagick_tpu.core.spec import ImageSpec

    rgb = _natural(32, 32)
    semi = np.concatenate([rgb, np.full((32, 32, 1), 0.5, np.float32)], -1)
    st.images = [climain.LazyImage(Image(jnp.asarray(semi),
                                         ImageSpec(colorspace="srgb",
                                                   alpha=True)))]
    climain._op_resize(st, "16x16!", False)
    tag = st.images[0].pending[-1][2]
    assert tag is not None and tag[0] == "resize"   # alpha images tag now
    # ... but the opacity probe declines the semi-transparent data
    assert dispatch.try_fused_chain(jnp.asarray(semi), [tag],
                                    alpha=True) is None

    # fully opaque: dispatches, and matches the op path
    opaque = np.concatenate([rgb, np.ones((32, 32, 1), np.float32)], -1)
    res = dispatch.try_fused_chain(jnp.asarray(opaque), [tag], alpha=True)
    assert res is not None
    out, consumed = res
    assert consumed == 1 and out.shape == (16, 16, 4)
    from imagemagick_tpu.ops import resize as rz
    ref = rz.resize(jnp.asarray(opaque), 16, 16, tag[1][2], has_alpha=True)
    assert _psnr(out, ref) >= 60.0

    # upscale: tag exists but the plan declines
    assert dispatch._plan_chain(16, 16, 3,
                                (("resize", (32, 32, "lanczos")),)) is None


def test_dispatch_gray_mix_keeps_alpha(interpret_dispatch):
    """-colorspace gray on an opaque RGBA image dispatches with the
    2-row mix (luma row + identity alpha row) and matches the op path."""
    st = climain.CLIState()
    from imagemagick_tpu.core.image import Image
    from imagemagick_tpu.core.spec import ImageSpec

    rgba = np.concatenate([_natural(48, 40), np.ones((48, 40, 1),
                                                     np.float32)], -1)
    st.images = [climain.LazyImage(Image(jnp.asarray(rgba),
                                         ImageSpec(colorspace="srgb",
                                                   alpha=True)))]
    climain._op_resize(st, "16x32!", False)
    climain._op_colorspace(st, "gray", False)
    li = st.images[0]
    tags = [t for _, _, t in li.pending]
    assert tags[1] is not None and tags[1][0] == "mix"
    assert len(tags[1][1]) == 2                    # luma + alpha rows
    out = li.materialize()
    assert interpret_dispatch["pallas"] >= 1
    assert out.data.shape == (32, 16, 2)           # gray + alpha
    assert float(jnp.min(out.data[..., 1])) >= 1.0 - 1e-5


def test_dispatch_wide_image_nslots_fallback(interpret_dispatch):
    """A wide image whose DMA slabs exceed VMEM at depth 4 must still
    plan (depth-2 fallback in fused_linear_pipeline) — the mountains.jpg
    1000x1500 CLI case validated on hardware this round."""
    tags = (("resize", (256, 256, "lanczos")),
            ("gblur", (0.0, 2.0, "2d")),
            ("mix", ((0.212656, 0.715158, 0.072186),)))
    run = dispatch._chain_runner(1000, 1500, 3, tags, interpret=True)
    assert run is not None

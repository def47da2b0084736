"""Drawing (MVG), text, decorations, layers, montage tests.

Model: the reference's drawtest.c renders an MVG scene and checks it
(tests/drawtest.c:467); here we assert coverage properties of each
primitive directly.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from imagemagick_tpu.core.image import Image
from imagemagick_tpu.ops import draw as dw
from imagemagick_tpu.ops import decorate, layer, montage


@pytest.fixture
def white():
    return jnp.ones((32, 32, 3), jnp.float32)


def test_rectangle_fill(white):
    out = np.asarray(dw.draw(white, "fill 'red' rectangle 8,8 24,24"))
    assert np.allclose(out[16, 16], [1, 0, 0], atol=0.02)   # inside red
    assert np.allclose(out[2, 2], [1, 1, 1], atol=0.02)     # outside white


def test_circle_coverage(white):
    out = np.asarray(dw.draw(white, "fill 'black' circle 16,16 16,24"))
    assert out[16, 16, 0] < 0.05           # center filled
    assert out[2, 2, 0] > 0.95             # corner untouched
    # anti-aliased edge: some intermediate value on the rim
    rim = out[16, 24, 0]
    assert 0.0 <= rim <= 1.0


def test_line_stroke(white):
    out = np.asarray(dw.draw(white, "stroke 'blue' stroke-width 2 line 4,16 28,16"))
    assert out[16, 16, 2] > 0.9 and out[16, 16, 0] < 0.1  # on the line: blue
    assert out[4, 16, 0] > 0.9                            # far row untouched


def test_polygon_nonzero_vs_evenodd(white):
    star = "polygon 16,2 22,28 4,10 28,10 10,28"
    nz = np.asarray(dw.draw(white, f"fill 'black' fill-rule nonzero {star}"))
    eo = np.asarray(dw.draw(white, f"fill 'black' fill-rule evenodd {star}"))
    # star center filled under nonzero, hollow under evenodd
    assert nz[14, 16, 0] < 0.2
    assert eo[14, 16, 0] > 0.6


def test_svg_path(white):
    out = np.asarray(dw.draw(white, "fill 'green' path 'M 4,4 L 28,4 L 28,28 L 4,28 Z'"))
    assert out[16, 16, 1] > 0.4 and out[16, 16, 0] < 0.2


def test_bezier_stroke(white):
    out = np.asarray(dw.draw(
        white, "stroke 'black' stroke-width 1 fill 'none' bezier 2,30 10,2 22,2 30,30"))
    assert out.min() < 0.5  # something was drawn


def test_translate_scale(white):
    out = np.asarray(dw.draw(
        white, "fill 'black' translate 16,16 scale 0.5,0.5 rectangle -8,-8 8,8"))
    assert out[16, 16, 0] < 0.1    # center filled (8x8 square at center)
    assert out[4, 4, 0] > 0.9


def test_text_renders(white):
    out = np.asarray(dw.draw(white, "fill 'black' font-size 14 text 4,20 'Hi'"))
    assert out.min() < 0.5  # glyphs darkened some pixels


def test_annotate_gravity(white):
    out = np.asarray(dw.annotate(white, "X", color=(0, 0, 0, 1), size=10,
                                 gravity="center"))
    assert out.min() < 0.5
    # the dark pixels are near the center
    ys, xs = np.where(out[..., 0] < 0.5)
    assert 8 < ys.mean() < 24 and 8 < xs.mean() < 24


def test_type_metrics():
    m = dw.get_type_metrics("Hello", size=16)
    assert m["width"] > 10 and m["height"] > 4


def test_border_frame_raise(checker_rgb):
    b = np.asarray(decorate.border(jnp.asarray(checker_rgb), 3, 2))
    assert b.shape == (24 + 4, 32 + 6, 3)
    assert np.allclose(b[0, 0], 0.75, atol=0.01)
    f = np.asarray(decorate.frame(jnp.asarray(checker_rgb), 5, 5))
    assert f.shape == (34, 42, 3)
    r = np.asarray(decorate.raise_image(jnp.asarray(checker_rgb), 3, 3))
    assert r.shape == checker_rgb.shape
    # top edge lightened
    assert r[0, 16, 0] >= checker_rgb[0, 16, 0]


def test_layers_coalesce_flatten():
    f0 = Image(jnp.zeros((8, 8, 3), jnp.float32))
    patch = Image(jnp.ones((4, 4, 3), jnp.float32), f0.spec, page=(2, 2, 4, 4))
    frames = layer.coalesce([f0, patch])
    assert len(frames) == 2
    arr = np.asarray(frames[1].data)
    assert arr.shape == (8, 8, 3)
    assert arr[3, 3, 0] == 1.0 and arr[0, 0, 0] == 0.0
    flat = layer.flatten([f0, patch])
    assert np.asarray(flat.data)[3, 3, 0] == 1.0


def test_layers_deconstruct():
    a = Image(jnp.zeros((8, 8, 3), jnp.float32))
    b_data = jnp.zeros((8, 8, 3), jnp.float32).at[4:6, 4:6].set(1.0)
    b = Image(b_data, a.spec)
    frames = layer.deconstruct([a, b])
    assert frames[1].data.shape == (2, 2, 3)
    assert frames[1].page[:2] == (4, 4)


def test_remove_duplicates():
    a = Image(jnp.zeros((4, 4, 3), jnp.float32), delay=10)
    b = Image(jnp.zeros((4, 4, 3), jnp.float32), delay=10)
    c = Image(jnp.ones((4, 4, 3), jnp.float32), delay=10)
    out = layer.remove_duplicate_layers([a, b, c])
    assert len(out) == 2
    assert out[0].delay == 20


def test_montage_grid(checker_rgb):
    imgs = [Image(checker_rgb) for _ in range(4)]
    m = montage.montage(imgs, tile="2x2", geometry="20x20+2+2")
    assert m.data.shape[-3] == 2 * (20 + 4)
    assert m.data.shape[-2] == 2 * (20 + 4)


def test_cli_draw_annotate(tmp_path, checker_rgb):
    import os
    from imagemagick_tpu.cli.main import process
    from imagemagick_tpu import io as iio

    p = str(tmp_path / "in.png")
    iio.write_image(Image(checker_rgb), p)
    out = str(tmp_path / "o.png")
    process([p, "-fill", "red", "-draw", "rectangle 2,2 10,10", out])
    arr = np.asarray(iio.read_images(out)[0].data)
    assert arr[6, 6, 0] > 0.9 and arr[6, 6, 1] < 0.1
    process([p, "-pointsize", "10", "-fill", "black",
             "-annotate", "+2+12", "Hi", out])
    assert os.path.exists(out)
    process([p, "-frame", "4x4", out])
    assert iio.read_images(out)[0].width == 32 + 8


def test_mvg_gradient_fill(white):
    mvg = ("push defs push gradient g1 linear 0,0 31,0 "
           "stop-color 'red' 0 stop-color 'blue' 1 pop gradient pop defs "
           "fill 'url(#g1)' rectangle 0,0 31,31")
    out = np.asarray(dw.draw(white, mvg))
    assert out[16, 1, 0] > 0.9 and out[16, 30, 2] > 0.9


def test_composite_displace():
    from imagemagick_tpu.ops import composite as comp

    dst = jnp.asarray(np.tile(np.linspace(0, 1, 32, dtype=np.float32)
                              [None, :, None], (32, 1, 3)))
    # constant 0.5 map = no displacement
    dmap = jnp.full((32, 32, 3), 0.5, jnp.float32)
    out = np.asarray(comp.composite_at(dst, dmap, "displace", args=(50.0,)))
    assert np.allclose(out[..., :3], np.asarray(dst), atol=1e-3)


def test_riemersma_dither():
    from imagemagick_tpu.ops import quantize as qz

    gray = np.tile(np.linspace(0, 1, 24, dtype=np.float32)[None, :, None],
                   (24, 1, 1))
    pal = jnp.asarray([[0.0], [1.0]], jnp.float32)
    out = np.asarray(qz.riemersma(jnp.asarray(gray), pal))
    assert set(np.unique(out)) <= {0.0, 1.0}
    assert abs(out.mean() - gray.mean()) < 0.03


def test_mvg_pattern_fill(white):
    mvg = ("push defs push pattern pat0 0 0 4 4 "
           "fill 'red' rectangle 0,0 1,3 fill 'blue' rectangle 2,0 3,3 "
           "pop pattern pop defs "
           "fill 'url(#pat0)' rectangle 0,0 31,31")
    out = np.asarray(dw.draw(white, mvg))
    # alternating red/blue columns tiled
    assert out[10, 0, 0] > 0.8 and out[10, 2, 2] > 0.8


def test_wand_view(checker_rgb):
    from imagemagick_tpu.wand import MagickWand
    from imagemagick_tpu.wand.api import WandView

    w = MagickWand()
    w.add_image(Image(checker_rgb))
    view = WandView(w, 4, 4, 8, 8)
    view.update(lambda r: r * 0.0)
    arr = np.asarray(w.current.data)
    assert arr[8, 8].max() == 0.0 and arr[0, 0].max() > 0.0


def test_composite_operator_tail(checker_rgb, rng):
    """Round-2 operator additions (composite.h:25-108 tail) sanity: each
    produces in-range output, and closed-form identities hold."""
    import numpy as np
    from imagemagick_tpu.ops.composite import composite

    s = rng.uniform(0.05, 0.95, checker_rgb.shape).astype(np.float32)
    d = checker_rgb.astype(np.float32)
    for op in ("freeze", "interpolate", "negate", "reflect", "softburn",
               "softdodge", "stamp", "pegtoplight", "rmse", "modulate",
               "alpha", "no"):
        out = np.asarray(composite(d, s, op))
        assert np.isfinite(out).all(), op
        assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-6, op
    # identities
    np.testing.assert_allclose(
        np.asarray(composite(d, s, "negate")), 1.0 - np.abs(1.0 - s - d),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(composite(d, s, "stamp")),
        np.clip(s + d * d - 1.0, 0, 1), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(composite(d, s, "pegtoplight")),
        np.clip(d * d * (1 - 2 * s) + 2 * s * d, 0, 1), atol=1e-6)
    # 'no' leaves dst untouched
    np.testing.assert_array_equal(np.asarray(composite(d, s, "no")), d)


def test_supported_composite_count():
    """Operator surface >= 75 of the 80+ enum entries (composite.h:25-108)."""
    import numpy as np
    from imagemagick_tpu.ops import composite as cmod

    ops = ["over", "srcover", "dstover", "in", "srcin", "dstin", "out",
           "srcout", "dstout", "atop", "srcatop", "dstatop", "xor", "plus",
           "copy", "src", "replace", "dst", "none", "no", "clear",
           "dissolve", "blend", "mathematics", "threshold", "changemask",
           "stereo", "copyred", "copygreen", "copyblue", "copyalpha",
           "copyblack", "copycyan", "copymagenta", "copyyellow", "hue",
           "saturate", "luminize", "colorize", "lightenintensity",
           "darkenintensity", "bumpmap", "displace", "distort", "multiply",
           "screen", "overlay", "darken", "lighten", "colordodge",
           "colorburn", "hardlight", "softlight", "difference", "exclusion",
           "linearburn", "lineardodge", "linearlight", "vividlight",
           "pinlight", "hardmix", "minus", "minussrc", "minusdst", "divide",
           "dividesrc", "dividedst", "modulusadd", "modulussubtract",
           "freeze", "interpolate", "negate", "reflect", "softburn",
           "softdodge", "stamp", "pegtoplight", "rmse", "modulate", "alpha"]
    assert len(ops) >= 75
    d = np.full((4, 4, 3), 0.5, np.float32)
    s = np.full((4, 4, 3), 0.25, np.float32)
    for op in ops:
        out = cmod.composite(d, s, op)   # must not raise
        assert out.shape[-1] in (3, 4), op

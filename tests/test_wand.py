"""MagickWand API tests — modeled on the reference's wandtest.c
(/root/reference/tests/wandtest.c, 5,507 LoC: exercise the wand methods
sequentially on built-in images)."""

import numpy as np
import pytest

from imagemagick_tpu.wand import MagickWand, PixelWand, DrawingWand
from imagemagick_tpu.core.image import Image


@pytest.fixture
def wand(checker_rgb):
    w = MagickWand()
    w.add_image(Image(checker_rgb))
    return w


def test_pixel_wand():
    p = PixelWand("rgb(255,128,0)")
    assert p.red == 1.0 and abs(p.green - 128 / 255) < 1e-6
    p.blue = 0.5
    assert p.get_color()[2] == 0.5
    assert "srgb" in p.get_color_string()


def test_wand_iteration(checker_rgb):
    w = MagickWand()
    for _ in range(3):
        w.add_image(Image(checker_rgb))
    assert len(w) == 3
    w.set_first_iterator()
    count = 1
    while w.next_image():
        count += 1
    assert count == 3


def test_read_write_blob(wand):
    blob = wand.get_image_blob("png")
    w2 = MagickWand()
    w2.read_image_blob(blob)
    assert w2.width == wand.width
    assert w2.get_image_distortion(wand, "rmse") < 0.005


def test_resize_chain(wand):
    wand.resize_image(16, 12, "lanczos")
    assert (wand.width, wand.height) == (16, 12)
    wand.thumbnail_image(8, 6)
    assert (wand.width, wand.height) == (8, 6)
    wand.magnify_image()
    assert (wand.width, wand.height) == (16, 12)
    wand.minify_image()
    assert (wand.width, wand.height) == (8, 6)


def test_geometry_methods(wand):
    wand.crop_image(10, 8, 2, 2)
    assert (wand.width, wand.height) == (10, 8)
    wand.extent_image(20, 20, -5, -6)
    assert (wand.width, wand.height) == (20, 20)
    wand.flip_image()
    wand.flop_image()
    wand.transpose_image()
    assert (wand.width, wand.height) == (20, 20)
    wand.shave_image(2, 2)
    assert (wand.width, wand.height) == (16, 16)
    wand.border_image("gray", 2, 2)
    assert (wand.width, wand.height) == (20, 20)


def test_effects_chain(wand):
    before = wand.current.data.std()
    wand.gaussian_blur_image(0, 1.5)
    wand.unsharp_mask_image(0, 1.0, 1.0, 0.0)
    wand.modulate_image(110, 90, 100)
    wand.sigmoidal_contrast_image(True, 3.0, 0.5)
    assert wand.current.data.shape == (24, 32, 3)


def test_colorspace_methods(wand):
    wand.transform_image_colorspace("lab")
    assert wand.get_image_colorspace() == "lab"
    wand.transform_image_colorspace("srgb")
    wand.grayscale_image()
    assert wand.get_image_colorspace() == "gray"
    assert wand.current.channels == 1


def test_alpha_and_channels(wand):
    wand.set_image_alpha_channel("set")
    assert wand.get_image_alpha_channel()
    wand.set_image_alpha_channel("remove")
    assert not wand.get_image_alpha_channel()
    ch = wand.channel_fx_image("red=>blue")
    assert len(ch) == 1


def test_composite(wand, checker_rgb):
    overlay = MagickWand()
    overlay.new_image(8, 8, "red")
    wand.composite_image(overlay, "over", 4, 4)
    arr = np.asarray(wand.current.data)
    assert arr[8, 8, 0] > 0.9 and arr[8, 8, 1] < 0.1


def test_fx_and_evaluate(wand):
    out = wand.fx_image("u*0.5")
    assert np.allclose(np.asarray(out.current.data),
                       np.asarray(wand.current.data) * 0.5, atol=1e-5)
    wand.evaluate_image("multiply", 0.5)


def test_properties(wand):
    wand.set_image_property("comment", "test-comment")
    assert wand.get_image_property("comment") == "test-comment"
    assert "comment" in wand.get_image_properties("*")
    wand.delete_image_property("comment")
    assert wand.get_image_property("comment") is None


def test_statistics_histogram(wand):
    stats = wand.get_image_statistics()
    assert stats["mean"].shape == (3,)
    assert wand.get_image_colors() > 1
    lo, hi = wand.get_image_range()
    assert 0.0 <= lo <= hi <= 1.0


def test_pixel_access(wand):
    p = wand.get_image_pixel_color(0, 0)
    assert 0.0 <= p.red <= 1.0
    pixels = wand.export_image_pixels(0, 0, 4, 4, "RGB", "char")
    assert pixels.shape == (4, 4, 3) and pixels.dtype == np.uint8
    wand.import_image_pixels(0, 0, 4, 4, "RGB",
                             np.zeros((4, 4, 3), np.uint8))
    assert float(wand.current.data[0, 0, 0]) == 0.0


def test_append_and_layers(checker_rgb):
    w = MagickWand()
    w.add_image(Image(checker_rgb))
    w.add_image(Image(checker_rgb))
    stacked = w.append_images(top_to_bottom=True)
    assert stacked.height == 48
    flat = w.merge_image_layers("flatten")
    assert flat.current.data.shape == (24, 32, 3)


def test_drawing_wand(wand):
    d = DrawingWand()
    d.set_fill_color("red")
    d.rectangle(4, 4, 12, 12)
    wand.draw_image(d)
    arr = np.asarray(wand.current.data)
    assert arr[8, 8, 0] > 0.9 and arr[8, 8, 1] < 0.1


def test_annotate(wand):
    d = DrawingWand()
    d.set_font_size(12)
    wand.annotate_image(d, 2, 16, 0, "Hi")
    metrics = wand.query_font_metrics(d, "Hi")
    assert metrics["width"] > 0


def test_quantize_methods(wand):
    wand.kmeans_image(4)
    assert wand.get_image_colors() <= 8  # quantized (few colors + AA)
    wand.posterize_image(2)


def test_signature(wand):
    s1 = wand.signature()
    assert len(s1) == 64
    wand.negate_image()
    assert wand.signature() != s1


def test_encipher_roundtrip(checker_rgb):
    from imagemagick_tpu.utils.signature import encipher_image, decipher_image

    enc = encipher_image(checker_rgb, "secret")
    assert not np.allclose(np.asarray(enc), checker_rgb, atol=0.1)
    dec = np.asarray(decipher_image(enc, "secret"))
    assert np.max(np.abs(dec - np.round(checker_rgb * 65535) / 65535)) < 1e-4


def test_shear_deskew(checker_rgb):
    from imagemagick_tpu.ops import shear as sh
    import jax.numpy as jnp

    out = sh.shear(jnp.asarray(checker_rgb), 10.0, 0.0)
    assert out.shape[-2] > 32  # widened by shear
    # deskew: rotate a striped image and recover the angle
    stripes = np.ones((64, 64, 1), np.float32)
    stripes[::8] = 0.0
    from imagemagick_tpu.ops.distort import rotate

    rot = rotate(jnp.asarray(stripes), 5.0, background=[1.0], expand=False)
    ang = sh.deskew_angle(rot)
    assert abs(ang - (-5.0)) < 1.5 or abs(ang - 5.0) < 1.5


def test_wand_second_batch(wand):
    wand.shadow_image(80, 2.0, 2, 2)
    assert wand.current.spec.alpha
    ink = MagickWand()
    ink.add_image(Image(np.full((8, 8, 3), 0.5, np.float32)))
    assert 0.0 <= ink.get_image_total_ink_density() <= 4.0
    assert ink.get_number_images() == 1
    ink.set_image_page(8, 8, 1, 2)
    assert ink.get_image_page() == (8, 8, 1, 2)  # (w, h, x, y)
    ink.set_image_resolution(150, 150)
    assert ink.get_image_resolution() == (150.0, 150.0)


def test_wand_encipher(wand):
    sig = wand.signature()
    wand.encipher_image("pw")
    assert wand.signature() != sig
    wand.decipher_image("pw")
    # Q16-rounded roundtrip
    assert wand.signature() != ""


def test_pixel_iterator(checker_rgb):
    from imagemagick_tpu.wand.api import PixelIterator

    w = MagickWand()
    w.add_image(Image(checker_rgb))
    it = PixelIterator(w, 0, 0, 4, 2)
    rows = list(it)
    assert len(rows) == 2 and len(rows[0]) == 4
    # modify last row and sync
    for p in rows[-1]:
        p.red = 1.0
    it.sync_iterator()
    assert float(w.current.data[1, 0, 0]) == 1.0


def test_texture_and_region(checker_rgb):
    w = MagickWand()
    w.add_image(Image(checker_rgb))
    tex = MagickWand()
    tex.add_image(Image(np.full((4, 4, 3), 0.5, np.float32)))
    big = w.texture_image(tex)
    assert (big.width, big.height) == (32, 24)
    region = w.get_image_region(8, 6, 2, 2)
    assert (region.width, region.height) == (8, 6)


def test_fft_wand_methods(wand):
    pair = wand.forward_fourier_transform_image()
    assert len(pair) == 2
    mag = MagickWand(); mag.add_image(pair.images[0])
    ph = MagickWand(); ph.add_image(pair.images[1])
    mag.inverse_fourier_transform_image(ph)
    assert mag.current.data.shape == wand.current.data.shape


def test_pixelwand_full_surface():
    """pixel-wand.c 62-export parity: quantum/CMYK/HSL/fuzz/index."""
    from imagemagick_tpu.wand import api

    px = api.new_pixel_wand("rgb(255,128,0)")
    assert px.get_red_quantum() == 65535.0
    px.set_green_quantum(65535.0)
    assert abs(px.green - 1.0) < 1e-6
    c = api.new_pixel_wand("cyan")
    assert abs(c.get_cyan() - 1.0) < 1e-6 and abs(c.get_black()) < 1e-6
    c.set_black(1.0)
    assert max(c.get_color()[:3]) < 1e-6          # K=1 -> black
    h, s, l = api.new_pixel_wand("red").get_hsl()
    assert abs(h) < 1e-6 and abs(s - 1.0) < 1e-6 and abs(l - 0.5) < 1e-6
    px.set_fuzz(0.1)
    assert px.get_fuzz() == 0.1
    px.set_index(3)
    assert px.get_index() == 3
    a = api.new_pixel_wand("white")
    b = a.clone()
    assert api.is_pixel_wand_similar(a, b, 0.0)
    b.set_color("grey90")
    assert not api.is_pixel_wand_similar(a, b, 0.01)
    assert a.get_color_as_normalized_string() == "srgb(1,1,1)"
    q = a.get_quantum_pixel()
    a.set_quantum_pixel(q)
    assert a.red == 1.0


def test_magickwand_module_functions():
    """magick-wand.c module surface: genesis/clone/query helpers."""
    from imagemagick_tpu.wand import api

    api.magick_wand_genesis()
    w = api.new_magick_wand()
    w.new_image(3, 2, "lime")
    w2 = api.clone_magick_wand(w)
    assert w2.get_image_width() == 3
    w3 = api.new_magick_wand_from_image(w.current)
    assert w3.get_image_height() == 2
    assert "PNG" in api.magick_query_formats("PN*")
    assert api.magick_query_configure_option("QuantumDepth") == "Q16"
    assert "VERSION" in api.magick_query_configure_options("*")
    assert api.is_magick_wand(w) and not api.is_magick_wand(42)
    api.clear_magick_wand(w2)
    assert len(w2.images) == 0
    api.magick_wand_terminus()

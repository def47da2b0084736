"""Extra coders + multicall tools tests (validate.c stream/conjure analogs)."""

import os

import numpy as np
import pytest

from imagemagick_tpu.core.image import Image
from imagemagick_tpu import io as iio
from imagemagick_tpu.cli.main import main, process


@pytest.fixture
def img(checker_rgb):
    return Image(checker_rgb)


@pytest.fixture
def tmp_png(tmp_path, checker_rgb):
    p = str(tmp_path / "in.png")
    iio.write_image(Image(checker_rgb), p)
    return p


def test_farbfeld_roundtrip(img):
    blob = iio.image_to_blob(img, "ff")
    assert blob[:8] == b"farbfeld"
    back = iio.image_from_blob(blob)[0]
    assert np.max(np.abs(back.to_numpy()[..., :3] - img.to_numpy())) < 1e-4


def test_xbm_roundtrip(img):
    blob = iio.image_to_blob(img, "xbm")
    back = iio.image_from_blob(blob)[0]
    # 1-bit: thresholded version of the gray image
    gray = img.to_numpy().mean(-1)
    expected = (gray >= 0.5).astype(np.float32)
    assert np.array_equal(back.to_numpy()[..., 0], expected)


def test_xpm_roundtrip(img):
    blob = iio.image_to_blob(img, "xpm")
    assert blob.startswith(b"/* XPM */")
    back = iio.image_from_blob(blob)[0]
    assert back.data.shape[:2] == (24, 32)
    # 64-color quantized: loose tolerance
    assert np.mean(np.abs(back.to_numpy()[..., :3] - img.to_numpy())) < 0.1


def test_sixel_encode(img):
    blob = iio.image_to_blob(img, "sixel")
    assert blob.startswith(b"\x1bPq") and blob.endswith(b"\x1b\\")


def test_raw_roundtrip(img, tmp_path):
    p = str(tmp_path / "x.rgb")
    iio.write_image(img, p)
    back = iio.read_images(p, size="32x24")[0]
    assert np.max(np.abs(back.to_numpy() - img.to_numpy())) < 1.0 / 254.0


def test_svg_render():
    svg = (b'<svg width="64" height="48">'
           b'<rect x="8" y="8" width="20" height="20" fill="red"/>'
           b'<circle cx="48" cy="24" r="10" fill="#00FF00"/>'
           b'<line x1="0" y1="44" x2="63" y2="44" stroke="blue" stroke-width="2"/>'
           b'</svg>')
    img = iio.image_from_blob(svg)[0]
    arr = img.to_numpy()
    assert arr.shape == (48, 64, 4)
    assert arr[16, 16, 0] > 0.9      # red rect
    assert arr[24, 48, 1] > 0.9      # green circle
    assert arr[44, 30, 2] > 0.9      # blue line


def test_mogrify_tool(tmp_png, tmp_path):
    rc = main(["mogrify", "-resize", "16x12!", tmp_png])
    assert rc == 0
    assert iio.read_images(tmp_png)[0].width == 16


def test_mogrify_format_conversion(tmp_png, tmp_path):
    rc = main(["mogrify", "-format", "bmp", "-path", str(tmp_path), tmp_png])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "in.bmp"))


def test_composite_tool(tmp_path, tmp_png):
    overlay = str(tmp_path / "ov.png")
    process(["-size", "8x8", "xc:red", overlay])
    out = str(tmp_path / "out.png")
    rc = main(["composite", "-gravity", "center", overlay, tmp_png, out])
    assert rc == 0
    arr = np.asarray(iio.read_images(out)[0].data)
    assert arr[12, 16, 0] > 0.9 and arr[12, 16, 1] < 0.2


def test_montage_tool(tmp_png, tmp_path):
    out = str(tmp_path / "grid.png")
    rc = main(["montage", "-tile", "2x1", "-geometry", "20x20+2+2",
               tmp_png, tmp_png, out])
    assert rc == 0
    img = iio.read_images(out)[0]
    assert img.width == 2 * 24


def test_conjure_msl(tmp_png, tmp_path):
    out = str(tmp_path / "msl_out.png")
    msl = f"""<?xml version="1.0" encoding="UTF-8"?>
    <image>
      <read filename="{tmp_png}"/>
      <resize geometry="16x12!"/>
      <negate/>
      <write filename="{out}"/>
    </image>"""
    script = tmp_path / "script.msl"
    script.write_text(msl)
    rc = main(["conjure", str(script)])
    assert rc == 0
    img = iio.read_images(out)[0]
    assert (img.width, img.height) == (16, 12)


def test_script_mode(tmp_png, tmp_path):
    out = str(tmp_path / "script_out.png")
    script = tmp_path / "s.mgk"
    script.write_text(f"""# tmagick script
    {tmp_png}
    -resize 16x12!
    -write {out}
    """)
    rc = main(["-script", str(script)])
    assert rc == 0
    assert os.path.exists(out)


def test_bench_flag(tmp_png, tmp_path, capsys):
    out = str(tmp_path / "o.png")
    rc = main(["-bench", "2", tmp_png, "-resize", "8x8!", out])
    assert rc == 0
    err = capsys.readouterr().err
    assert "Performance[1]:" in err and "2i" in err


def test_stream_tool(tmp_png, tmp_path):
    out = str(tmp_path / "region.rgb")
    rc = main(["stream", "-extract", "8x6+2+2", tmp_png, out])
    assert rc == 0
    assert os.path.getsize(out) == 8 * 6 * 3


def test_identify_json_format(tmp_png, capsys):
    from imagemagick_tpu.cli.main import process as proc

    proc([tmp_png, "json:-"])
    out = capsys.readouterr().out
    import json

    payload = json.loads(out)
    assert payload["image"]["geometry"]["width"] == 32


def test_exr_roundtrip_hdri(rng):
    """EXR keeps out-of-gamut HDRI values (half and float32)."""
    from imagemagick_tpu.io import exr

    arr = rng.uniform(0, 2.5, (33, 30, 3)).astype(np.float32)
    img = Image(arr)
    for comp in ("none", "zips", "zip"):
        blob = exr.encode(img, half=True, compression=comp)
        back = exr.decode(blob)
        ref = arr.astype(np.float16).astype(np.float32)
        assert np.array_equal(back.to_numpy(), ref), comp
    blob32 = exr.encode(img, half=False)
    assert np.array_equal(exr.decode(blob32).to_numpy(), arr)


def test_exr_rgba_and_gray(rng):
    from imagemagick_tpu.io import exr
    from imagemagick_tpu.core.spec import ImageSpec

    arr = rng.uniform(0, 1, (10, 12, 4)).astype(np.float32)
    img = Image(arr, ImageSpec(colorspace="rgb", alpha=True))
    back = exr.decode(exr.encode(img))
    assert back.spec.alpha and back.data.shape == (10, 12, 4)
    gray = Image(arr[..., :1], ImageSpec(colorspace="linear_gray"))
    back = exr.decode(exr.encode(gray))
    assert back.data.shape == (10, 12, 1)


def test_exr_through_io(rng, tmp_path):
    arr = rng.uniform(0, 2.0, (16, 16, 3)).astype(np.float32)
    p = str(tmp_path / "x.exr")
    iio.write_image(Image(arr), p)
    back = iio.read_images(p)[0]
    assert np.abs(back.to_numpy() - arr).max() < 2e-3  # half precision


def test_hdr_roundtrip(rng, tmp_path):
    arr = rng.uniform(0.1, 2.0, (16, 16, 3)).astype(np.float32)
    p = str(tmp_path / "x.hdr")
    iio.write_image(Image(arr), p)
    back = iio.read_images(p)[0]
    rel = np.abs(back.to_numpy() / arr - 1).mean()
    assert rel < 0.05  # RGBE shared exponent is lossy


def test_mpc_checkpoint(img, tmp_path):
    """MPC: zero-decode checkpoint roundtrip, exact float32."""
    p = str(tmp_path / "state.mpc")
    img.properties["comment"] = "ckpt"
    iio.write_image(img, p)
    back = iio.read_images(p)[0]
    assert np.array_equal(back.to_numpy(), img.to_numpy())
    assert back.properties["comment"] == "ckpt"


def test_extract_on_read(tmp_png, tmp_path):
    out = str(tmp_path / "o.png")
    process(["-extract", "8x6+2+2", tmp_png, out])
    assert iio.read_images(out)[0].data.shape[:2] == (6, 8)


def test_region_and_texture(tmp_png, tmp_path):
    # -region = write mask (operation.c:3212): the image keeps its size;
    # only pixels inside the rect are updated by later operators
    out = str(tmp_path / "o.png")
    src = iio.read_images(tmp_png)[0]
    process([tmp_png, "-region", "10x10+0+0", "-negate", out])
    res = iio.read_images(out)[0]
    assert res.width == src.width and res.height == src.height
    a = np.asarray(src.data)
    b = np.asarray(res.data)
    assert np.allclose(b[:10, :10], 1.0 - a[:10, :10], atol=1 / 255)
    assert np.allclose(b[12:, 12:], a[12:, 12:], atol=1 / 255)


def test_gif_animation_pipeline(tmp_path, checker_rgb):
    """Multi-frame GIF: write, read, coalesce, optimize, rewrite."""
    frames = []
    for i in range(3):
        f = Image(np.roll(checker_rgb, i * 4, axis=1))
        f.delay = 10
        frames.append(f)
    p = str(tmp_path / "anim.gif")
    iio.write_image(frames, p)
    back = iio.read_images(p)
    assert len(back) == 3
    out = str(tmp_path / "opt.gif")
    process([p, "-coalesce", "-deconstruct", out])
    assert os.path.exists(out)


def test_display_sixel_output(tmp_path, monkeypatch, capfdbinary):
    """display renders sixel escape sequences when IMTPU_SIXEL=1."""
    import numpy as np

    from imagemagick_tpu import io as iio
    from imagemagick_tpu.cli import tools
    from imagemagick_tpu.core.image import Image
    from imagemagick_tpu.core.spec import ImageSpec

    src = tmp_path / "d.png"
    rng = np.random.default_rng(0)
    iio.write_image(Image(rng.random((16, 20, 3)).astype(np.float32),
                          ImageSpec(colorspace="srgb", alpha=False, depth=8)),
                    str(src))
    monkeypatch.setenv("IMTPU_SIXEL", "1")
    rc = tools.display_main([str(src)])
    assert rc == 0
    out, _ = capfdbinary.readouterr()
    assert out.startswith(b"\x1bP")      # sixel DCS introducer
    assert out.rstrip().endswith(b"\x1b\\")  # string terminator


def test_display_headless_fallback(tmp_path, monkeypatch, capsys):
    import numpy as np

    from imagemagick_tpu import io as iio
    from imagemagick_tpu.cli import tools
    from imagemagick_tpu.core.image import Image
    from imagemagick_tpu.core.spec import ImageSpec

    src = tmp_path / "d2.png"
    iio.write_image(Image(np.zeros((8, 8, 3), np.float32),
                          ImageSpec(colorspace="srgb", alpha=False, depth=8)),
                    str(src))
    monkeypatch.delenv("IMTPU_SIXEL", raising=False)
    rc = tools.display_main([str(src)])
    assert rc == 0
    err = capsys.readouterr().err
    assert "wrote /tmp/tmagick-display.png" in err

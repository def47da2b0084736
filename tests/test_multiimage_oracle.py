"""Multi-image list-operator conformance vs the reference binary: full
arg templates with two generated source images ({a}, {b}) — append,
smush, separate/combine, composite compose:args, clut, evaluate-sequence
etc.  Skips without the oracle at /tmp/imbuild."""

import os
import shlex
import subprocess

import numpy as np
import pytest

_REF = "/tmp/imbuild/utilities/magick"

pytestmark = pytest.mark.skipif(not os.path.exists(_REF),
                                reason="reference binary not built")


def _psnr(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    if a.shape != b.shape:
        return -1.0
    mse = np.mean((a - b) ** 2)
    return 300.0 if mse == 0 else 10 * np.log10(1.0 / mse)


@pytest.fixture(scope="module")
def srcs(tmp_path_factory):
    from PIL import Image as PILImage

    rng = np.random.default_rng(8)
    h, w = 60, 92
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img1 = np.stack([0.5 + 0.4 * np.sin(yy / 9) * np.cos(xx / 13),
                     np.clip(yy / h + 0.05 * rng.standard_normal((h, w)),
                             0, 1),
                     1.0 - xx / w], -1)
    img2 = np.stack([1.0 - yy / h, 0.5 + 0.5 * np.cos(xx / 7),
                     np.clip(0.3 + 0.6 * np.sin((xx + yy) / 11), 0, 1)], -1)
    d = tmp_path_factory.mktemp("morcl")
    a = str(d / "a.png")
    b = str(d / "b.png")
    PILImage.fromarray(
        (np.clip(img1, 0, 1) * 255 + 0.5).astype(np.uint8)).save(a)
    # b gets an alpha ramp so transparent-seam ops (smush) are exercised
    rgba = np.concatenate(
        [np.clip(img2, 0, 1), np.clip(1.2 - xx / w, 0, 1)[..., None]], -1)
    PILImage.fromarray(
        (rgba * 255 + 0.5).astype(np.uint8)).save(b)
    return a, b


# (arg template, min PSNR vs the reference binary)
CASES = [
    # AppendImages (image.c:379): raw copy + gravity + background fill
    ("{a} {b} -append", 300.0),
    ("{a} {b} +append", 300.0),
    ("{a} {b} -gravity center -append", 300.0),
    ("{a} {b} -gravity southeast -background red +append", 300.0),
    # SmushImages (image.c:3706): transparent-seam gap less offset
    ("{a} {b} -smush 10", 300.0),
    ("{a} {b} +smush 5", 300.0),
    ("{a} {b} -background blue -smush -8", 300.0),
    ("{a} {b} -gravity center -smush 6", 300.0),
    ("{b} {a} -smush 4", 80.0),   # alpha seam overlap (AA rounding)
    # SeparateImages honors -channel; depth follows the source
    ("{a} -channel R -separate", 300.0),
    ("{a} -channel GB -separate -append", 300.0),
    ("{a} -separate -append", 300.0),
    ("{a} -separate -combine", 300.0),
    # -delete comma list
    ("{a} {b} -morph 1 -delete 0,2", 300.0),
    # compose:args (composite.c:2056-2162)
    ("{a} {b} -compose blend -define compose:args=60,40 -composite", 60.0),
    ("{a} {b} -compose blend -composite", 300.0),
    ("{a} {b} -compose dissolve -define compose:args=35 -composite", 60.0),
    ("{a} {b} -compose dissolve -define compose:args=130 -composite", 60.0),
    ("{a} {b} -compose mathematics -define compose:args=0.5,0.3,0.2,0.1 "
     "-composite", 300.0),
    ("{a} {b} -compose copyopacity -composite", 300.0),
    # ClutImage (enhance.c:798): diagonal sampling + Q16 index truncation
    ("{a} ( -size 16x1 gradient:black-white ) -clut", 300.0),
    ("{a} ( -size 16x16 gradient:black-white ) -clut", 300.0),
    ("{a} ( -size 16x1 gradient:black-white ) -interpolate integer -clut",
     300.0),
    ("{a} ( -size 16x1 gradient:black-white ) -interpolate nearest -clut",
     300.0),
    # 1-row gradient: runs horizontally (paint.c:545 vector collapse rule)
    ("-size 16x1 gradient:black-white", 300.0),
    # -region = write mask (operation.c:3212); +region clears
    ("{a} -region 40x30+10+5 -negate", 300.0),
    ("{a} -region 40x30+10+5 -negate +region -flop", 300.0),
    ("{a} -gravity southeast -region 30x20 -modulate 150", 60.0),
    # CropImageToTiles: offset-less WxH tiles, NxM '@' split, gravity
    ("{a} -crop 32x32 +append", 300.0),
    ("{a} -crop 3x2@ +append", 300.0),
    ("{a} -gravity center -crop 40x30+0+0", 300.0),
    ("{a} -gravity southeast -crop 40x30+2+3", 300.0),
    # clone forms and gravity chop
    ("{a} ( +clone -flop ) +append", 300.0),
    ("{a} ( -clone 0 -negate ) -append", 300.0),
    ("{a} -gravity southeast -chop 10x6", 300.0),
    ("{a} -gravity center -chop 10x6", 300.0),
    # SegmentImage: full scale-space interval-tree port (segment.c:1496
    # ZeroCrossHistogram parity quirk, f32 tau stepping = 10 scales,
    # truncated ScaleSpace kernel, ActiveNodes recursion order)
    ("{a} -segment 1x1.5", 300.0),
    ("{a} -segment 0.5x0.5", 300.0),
    ("{a} -segment 2x2", 300.0),
    ("{a} -segment 3x1", 300.0),
    # MVG pixel-paint methods (DrawPrimitive color/matte dispatch)
    ("{a} -fill blue -draw 'color 10,10 floodfill'", 300.0),
    ("{a} -fill blue -draw 'color 10,10 point'", 300.0),
    ("{a} -fill blue -draw 'color 10,10 replace'", 300.0),
    ("{a} -fill blue -draw 'color 10,10 reset'", 300.0),
    ("{a} -fill blue -fuzz 20% -draw 'color 10,10 floodfill'", 300.0),
    # reference-exact rasterizer: curves and wide strokes
    ("{a} -draw 'bezier 10,50 25,10 60,10 80,50'", 300.0),
    ("{a} -fill orange -draw 'roundrectangle 15,15 70,45 8,8'", 300.0),
    ("{a} -stroke purple -strokewidth 2 -draw 'arc 20,15 70,45 30,270'",
     300.0),
    ("{a} -fill none -stroke blue -strokewidth 3 "
     "-draw 'polyline 10,50 30,10 50,50 70,15'", 300.0),
    ("{a} -fill none -stroke black -strokewidth 8 "
     "-draw 'stroke-linecap round line 20,20 64,29'", 300.0),
    ("{a} -fill none -stroke black -strokewidth 6 "
     "-draw 'stroke-dasharray 8 6 line 4,20 80,39'", 300.0),
    ("{a} -hough-lines 9x9+20", 12.0),  # AA thin-line phase sensitivity
    # sequence reductions
    ("{a} {b} -evaluate-sequence mean", 300.0),
    ("{a} {b} -evaluate-sequence max", 300.0),
    ("{a} {b} -average", 300.0),
    ("{a} {b} -poly 0.5,1,0.5,2", 80.0),
    # layer merges (layer.c MergeImageLayers): flatten composes at page
    # offsets over a background canvas; mosaic grows to the bounding box
    ("{a} ( {b} -repage +20+10 ) -flatten", 300.0),
    ("{a} ( {b} -repage +30+15 ) -background blue -mosaic", 300.0),
    # -alpha forms on an alpha-carrying source (channel.c SetImageAlpha)
    ("{b} -alpha extract", 300.0),
    ("{b} -background green -alpha remove", 300.0),
    ("{b} -alpha off", 300.0),
    # HaldClutImage (enhance.c): identity hald:3 CLUT is a near no-op
    ("{a} hald:3 -hald-clut", 80.0),
    # tile: pseudo-coder over a real file
    ("-size 200x100 tile:{a}", 300.0),
    # two-image fx (u = first, v = second)
    ("{a} {b} -fx (u+v)/2", 80.0),
    # -floodfill at a point (paint.c FloodfillPaintImage via CLI option)
    ("{a} -fill lime -fuzz 45% -floodfill +10+10 srgb(50%,50%,50%)", 300.0),
]


@pytest.mark.parametrize("tmpl,gate", CASES, ids=[c[0] for c in CASES])
def test_multiimage_vs_reference(srcs, tmpl, gate, tmp_path):
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.main import process

    a, b = srcs
    ref_out = str(tmp_path / "ref.png")
    our_out = str(tmp_path / "ours.png")
    args = tmpl.format(a=a, b=b)
    subprocess.run([_REF, *shlex.split(args), ref_out],
                   check=True, capture_output=True)
    process([*shlex.split(args), our_out])
    x = np.asarray(PILImage.open(ref_out).convert("RGB"), np.float64) / 255.0
    y = np.asarray(PILImage.open(our_out).convert("RGB"), np.float64) / 255.0
    p = _psnr(x, y)
    assert p >= gate, (tmpl, p, x.shape, y.shape)


def test_cipher_interop_with_reference(srcs, tmp_path):
    """-encipher here must decipher with the real binary and vice versa
    (cipher.c CTR construction: BIG-endian counter increment)."""
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.main import process

    a, _ = srcs
    pp = tmp_path / "pass.txt"
    pp.write_text("secret")
    enc = tmp_path / "enc.png"
    dec = tmp_path / "dec.png"
    process([a, "-encipher", str(pp), str(enc)])
    subprocess.run([_REF, str(enc), "-decipher", str(pp), str(dec)],
                   check=True, capture_output=True)
    x = np.asarray(PILImage.open(str(dec)).convert("RGB"), np.float64)
    s = np.asarray(PILImage.open(a).convert("RGB"), np.float64)
    assert (x == s).all()
    enc2 = tmp_path / "enc2.png"
    dec2 = tmp_path / "dec2.png"
    subprocess.run([_REF, a, "-encipher", str(pp), str(enc2)],
                   check=True, capture_output=True)
    process([str(enc2), "-decipher", str(pp), str(dec2)])
    y = np.asarray(PILImage.open(str(dec2)).convert("RGB"), np.float64)
    assert (y == s).all()


def test_composite_stereo_matches_reference(srcs, tmp_path):
    """composite -stereo +x+y (composite.c:183): base -> red channel
    sampled at (x-xo, y-yo) edge-virtual, overlay -> green/blue."""
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.tools import composite_main

    a, b = srcs
    ref_out = str(tmp_path / "ref.png")
    our_out = str(tmp_path / "ours.png")
    subprocess.run([_REF, "composite", "-stereo", "+5+3", b, a, ref_out],
                   check=True, capture_output=True)
    assert composite_main(["-stereo", "+5+3", b, a, our_out]) == 0
    x = np.asarray(PILImage.open(ref_out).convert("RGB"), np.float64) / 255.0
    y = np.asarray(PILImage.open(our_out).convert("RGB"), np.float64) / 255.0
    assert _psnr(x, y) >= 300.0

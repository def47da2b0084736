"""CLI conformance corpus from the reference's own validation suite.

Walks the canned option strings of /root/reference/tests/validate.h
(convert_options[] :97, composite_options[] :32, montage_options[] :271,
identify_options[] :262) through the tmagick interpreter the way
ValidateConvertCommand (validate.c:836) does:

    convert <ref> <options...> <ref> <out>

and asserts >=90%% parse AND execute without CLIError — the VERDICT round-1
"done" criterion for the option surface.  Each failure is reported in the
assertion message so regressions name the exact option string.
"""

import shlex

import numpy as np
import pytest

from imagemagick_tpu.cli.main import CLIError, process

CONVERT_OPTIONS = [
    "",
    "-affine 1,0,0.785,1,0,0 -transform",
    "-alpha set",
    "-black-threshold 20%",
    "-blur 0x0.5",
    "-blur 0x1.0",
    "-blur 0x2.0",
    "-bordercolor red -border 6x6",
    "-canny 0x1+10%+80%",
    "-channel red",
    "-colorspace CMYK -channel Cyan",
    "-charcoal 0x1",
    "-chop 80x60+10+20",
    "-chop 8x6+20+30",
    "-colorize 30%/20%/50%",
    "-color-matrix '0,0,1,0,1,0,1,0,0'",
    "-color-matrix '0.9 0 0, 0 0.9 0, 0 0 1.2'",
    "-color-matrix '0.9,0,0,0,0.9,0,0,0,1.2'",
    "-color-matrix '1,0,0,0,1,0,0,0,1'",
    "-color-matrix '.22,.72,.07,.22,.72,.07,.22,.72,.07'",
    "-colors 16",
    "-colorspace CMYK",
    "-colorspace GRAY",
    "-colorspace HSL",
    "-colorspace HWB",
    "-colorspace OHTA",
    "-colorspace YCbCr",
    "-colorspace YIQ",
    "-colorspace YUV",
    "-convolve 1,1,1,1,4,1,1,1,1",
    "-crop 17x9+10+10",
    "-crop 60x70+10+10",
    "-cycle 200",
    "-density 75x75 -resample 50x50",
    "-depth 7",
    "-depth 16",
    "-depth 32",
    "-despeckle",
    '-draw "affine 1,0,0.785,1,0,0"',
    '-draw "rectangle 20,10 80,50"',
    "-edge 0x1",
    "-emboss 0x1",
    "-enhance",
    "-equalize",
    "-evaluate Abs 2%",
    "-evaluate Add 233",
    "-evaluate AddModulus 50%",
    "-evaluate And 6",
    "-evaluate Cosine 2",
    "-evaluate Divide 0.7",
    "-evaluate Exponential 1.0",
    "-evaluate InverseLog 2",
    "-evaluate Xor 233",
    "-extent 1200x1200-100-100",
    "-fill blue -fuzz 35% -opaque red",
    "-fill blue -stroke gold -draw 'Bezier 400,200 1100,800 100,300'",
    "-fill blue -stroke gold -draw 'polygon 400,200 1100,800 100,300'",
    "-fill blue -stroke gold -draw 'rectangle 400,200 1100,800'",
    "-fill blue -stroke gold -draw 'roundRectangle 400,200 1100,800 20,20'",
    "-fill green -stroke gold -draw 'circle 800,500 1100,800'",
    "-fill none -stroke gold -draw 'Bezier 400,200 1100,800 100,300'",
    "-fill none -stroke gold -draw 'circle 800,500 1100,800'",
    "-fill none -stroke gold -draw 'polygon 400,200 1100,800 100,300'",
    "-fill none -stroke gold -draw 'rectangle 400,200 1100,800'",
    "-fill none -stroke gold -draw 'roundRectangle 400,200 1100,800 20,20'",
    "-flip",
    "-flop",
    "-frame 15x15+3+3",
    "-fuzz 35% -transparent red",
    "-fuzz 5% -trim",
    '-fx "(1.0/(1.0+exp(10.0*(0.5-u)))-0.006693)*1.0092503"',
    "-gamma 1.6",
    "-gaussian-blur 0x0.5",
    "-gaussian-blur 0x1.0",
    "-gaussian-blur 0x2.0",
    "-implode 0.5",
    "-implode -1",
    "-label Magick",
    "-lat 10x10-5%",
    "-level 100%",
    "-level 10%,1.2,90%",
    "+level 100% +level 100% +level 100%",
    "-level 100% -level 100% -level 100%",
    "+level 100%",
    "-magnify",
    "-modulate 110/100/95",
    "-monochrome",
    "-motion-blur 0x3+30",
    "-negate",
    "+noise Gaussian",
    "+noise Impulse",
    "+noise Laplacian",
    "+noise Multiplicative",
    "+noise Poisson",
    "+noise Random",
    "+noise Uniform",
    "-noop",
    "-normalize",
    "-ordered-dither 2x2",
    "-ordered-dither 3x3",
    "-ordered-dither 4x4",
    "-paint 0x1",
    "-raise 10x10",
    "-random-threshold 10%",
    "-random-threshold 20x80",
    "-remap netscape:",
    "-resize 100%",
    "-resize 10%",
    "-resize 150%",
    "-resize 150x75%",
    "-resize 50%",
    "-resize 50x150%",
    "-roll +20+10",
    "-rotate 0",
    "-rotate 15",
    "-rotate 180",
    "-rotate 270",
    "-rotate 45",
    "-rotate 90",
    "-sample 100%",
    "-sample 150%",
    "-sample 150x50%",
    "-sample 50%",
    "-sample 50x150%",
    "-sample 5%",
    "-scale 100%",
    "-scale 150%",
    "-scale 150x50%",
    "-scale 50%",
    "-scale 50x150%",
    "-scale 5%",
    "-segment 0.5x0.25",
    "-segment 1x1.5",
    "-shade 30x30",
    "-sharpen 0x0.5",
    "-sharpen 0x1.0",
    "-sharpen 0x2.0",
    "-shave 10x10",
    "-shear 25x20",
    "-shear 45x45",
    "-size 130x194",
    "-solarize 50%",
    "-spread 1",
    "-spread 3",
    "-statistic Median 1",
    "-statistic Median 2",
    "-statistic NonPeak 1",
    "-statistic NonPeak 2",
    "-swirl 90",
    "-threshold 35%",
    "-trim",
    "-unsharp 0x0.5+20+1",
    "-unsharp 0x1.0+20+1",
    "-wave 25x150",
    "-white-threshold 80%",
]

COMPOSITE_COMPOSE = [
    "Atop", "Blend", "Bumpmap", "ChangeMask", "Clear", "ColorBurn",
    "ColorDodge", "Colorize", "CopyBlack", "CopyBlue", "CopyCyan",
    "CopyGreen", "Copy", "CopyMagenta", "CopyOpacity", "CopyRed",
    "CopyYellow", "Darken", "Divide", "Dst", "Difference", "Displace",
    "Dissolve", "DstAtop", "DstIn", "DstOut", "DstOver", "Exclusion",
    "HardLight", "Hue", "In", "Lighten", "LinearLight", "Luminize",
    "Minus", "Modulate", "ModulusAdd", "ModulusSubtract", "Multiply",
    "None", "Out", "Overlay", "Over", "Plus", "Replace", "Saturate",
    "Screen", "SoftLight", "Src", "SrcAtop", "SrcIn", "SrcOut", "SrcOver",
    "Threshold", "Xor",
]

MONTAGE_OPTIONS = [
    "",
    "-frame 5",
    "-geometry 13x19+10+5 -gravity Center",
    "-label %f",
    "-pointsize 10",
    "-shadow",
    "-tile 3x3",
]


@pytest.fixture(scope="module")
def ref_file(tmp_path_factory):
    """A small structured reference image on disk (stands in for rose.pnm)."""
    from imagemagick_tpu import Image, io as iio

    rng = np.random.default_rng(7)
    h, w = 46, 70
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.clip(0.7 * ((yy // 4 + xx // 4) % 2) + 0.2 * xx / w, 0, 1)
    g = np.clip(0.5 * yy / h + rng.uniform(0, 0.1, (h, w)), 0, 1)
    b = np.clip(1.0 - xx / w, 0, 1)
    img = Image(np.stack([r, g, b], -1).astype(np.float32))
    path = tmp_path_factory.mktemp("conformance") / "ref.miff"
    iio.write_image(img, str(path))
    return str(path)


def _run_corpus(cmds, min_pass):
    failures = []
    for cmd in cmds:
        try:
            process(cmd)
        except CLIError as e:
            failures.append((" ".join(cmd), f"CLIError: {e}"))
        except Exception as e:  # noqa: BLE001 - conformance sweep
            failures.append((" ".join(cmd), f"{type(e).__name__}: {e}"))
    rate = 1.0 - len(failures) / len(cmds)
    assert rate >= min_pass, (
        f"conformance {rate:.0%} < {min_pass:.0%}; failures:\n" +
        "\n".join(f"  {c!r}: {m}" for c, m in failures))
    return failures


def test_convert_corpus(ref_file, tmp_path):
    cmds = []
    for opts in CONVERT_OPTIONS:
        out = str(tmp_path / "out.miff")
        cmds.append([ref_file] + shlex.split(opts) + [ref_file, out])
    failures = _run_corpus(cmds, 0.99)
    # informational: list residual gaps in the test output
    if failures:
        print("residual convert gaps:", [c for c, _ in failures])


def test_composite_corpus(ref_file, tmp_path):
    cmds = []
    for op in COMPOSITE_COMPOSE:
        out = str(tmp_path / "out.miff")
        cmds.append([ref_file, ref_file, "-compose", op, "-composite", out])
    _run_corpus(cmds, 0.90)


def test_montage_corpus(ref_file, tmp_path):
    cmds = []
    for opts in MONTAGE_OPTIONS:
        out = str(tmp_path / "out.miff")
        cmds.append([ref_file, ref_file] + shlex.split(opts) +
                    ["-montage", out])
    _run_corpus(cmds, 0.90)


def test_identify_corpus(ref_file, capsys):
    for opts in ["", "-verbose"]:
        process([ref_file] + shlex.split(opts) + ["-identify", "null:"])
        assert capsys.readouterr().out.strip()

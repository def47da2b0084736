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
    failures = _run_corpus(cmds, 1.0)
    # informational: list residual gaps in the test output
    if failures:
        print("residual convert gaps:", [c for c, _ in failures])


def test_composite_corpus(ref_file, tmp_path):
    cmds = []
    for op in COMPOSITE_COMPOSE:
        out = str(tmp_path / "out.miff")
        cmds.append([ref_file, ref_file, "-compose", op, "-composite", out])
    _run_corpus(cmds, 1.0)


def test_montage_corpus(ref_file, tmp_path):
    cmds = []
    for opts in MONTAGE_OPTIONS:
        out = str(tmp_path / "out.miff")
        cmds.append([ref_file, ref_file] + shlex.split(opts) +
                    ["-montage", out])
    _run_corpus(cmds, 1.0)


def test_identify_corpus(ref_file, capsys):
    for opts in ["", "-verbose"]:
        process([ref_file] + shlex.split(opts) + ["-identify", "null:"])
        assert capsys.readouterr().out.strip()


# ---------------------------------------------------------------------------
# Golden-output fidelity gate (VERDICT r2 #9): executing without raising is
# not correctness — ~30 of the validate.h option strings are additionally
# gated at >=60dB PSNR against the op library invoked directly (which
# test_fidelity.py gates against f64 math).  tests/validate.c:836 analog.
# ---------------------------------------------------------------------------

def _psnr(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    if a.shape != b.shape:
        return -1.0
    mse = np.mean((a - b) ** 2)
    return 300.0 if mse == 0 else 10 * np.log10(1.0 / mse)


def _golden_table():
    from imagemagick_tpu.ops import blur as bl
    from imagemagick_tpu.ops import colorspace as cs
    from imagemagick_tpu.ops import enhance as en
    from imagemagick_tpu.ops import resize as rz
    from imagemagick_tpu.ops import statistic as stx
    from imagemagick_tpu.ops import threshold as th
    from imagemagick_tpu.ops import transform as tf
    from imagemagick_tpu.ops import visual_effects as vfx

    return [
        ("-resize 30x20!", lambda x: rz.resize(x, 20, 30)),
        ("-resize 50%", lambda x: rz.resize(x, 23, 35)),
        ("-scale 35x23!", lambda x: rz.scale(x, 23, 35)),
        ("-sample 35x23!", lambda x: rz.sample(x, 23, 35)),
        ("-thumbnail 30x20!", lambda x: rz.thumbnail(x, 20, 30)),
        ("-blur 0x1.0", lambda x: bl.blur(x, 0, 1.0)),
        ("-gaussian-blur 0x1.5", lambda x: bl.gaussian_blur(x, 0, 1.5)),
        ("-sharpen 0x1.0", lambda x: bl.sharpen(x, 0, 1.0)),
        ("-edge 1", lambda x: bl.edge_image(x, 1.0)),
        ("-emboss 0x1", lambda x: bl.emboss(x, 0, 1.0)),
        ("-negate", lambda x: en.negate(x)),
        ("-gamma 1.6", lambda x: en.gamma(x, 1.6)),
        ("-modulate 110,90,100",
         lambda x: en.modulate(x, 110.0, 90.0, 100.0)),
        ("-level 10%,90%", lambda x: en.level(x, 0.10, 0.90)),
        ("-sigmoidal-contrast 3x50%",
         lambda x: en.sigmoidal_contrast(x, True, 3.0, 0.5)),
        ("-brightness-contrast 10x5",
         lambda x: en.brightness_contrast(x, 10.0, 5.0)),
        ("-auto-level", lambda x: en.auto_level(x)),
        ("-contrast-stretch 2%x1%",
         lambda x: en.contrast_stretch(x, 0.02, 0.01)),
        ("-normalize", lambda x: en.normalize(x)),
        ("-colorspace gray", lambda x: cs.convert(x, "srgb", "gray")),
        ("-colorspace hsl", lambda x: cs.convert(x, "srgb", "hsl")),
        ("-colorspace lab", lambda x: cs.convert(x, "srgb", "lab")),
        ("-threshold 50%", lambda x: th.bilevel(x, 0.5)),
        ("-black-threshold 20%", lambda x: th.black_threshold(x, 0.2)),
        ("-white-threshold 80%", lambda x: th.white_threshold(x, 0.8)),
        ("-flip", tf.flip),
        ("-flop", tf.flop),
        ("-transpose", tf.transpose),
        ("-transverse", tf.transverse),
        ("-roll +5+7", lambda x: tf.roll(x, 5, 7)),
        ("-crop 20x15+5+5", lambda x: tf.crop(x, 5, 5, 20, 15)),
        ("-shave 3x4", lambda x: tf.shave(x, 3, 4)),
        ("-solarize 50%", lambda x: vfx.solarize(x, 0.5)),
        ("-sepia-tone 80%", lambda x: vfx.sepia_tone(x, 0.8)),
        ("-evaluate multiply 0.5",
         lambda x: stx.evaluate(x, "multiply", 0.5)),
    ]


def test_golden_output_psnr(ref_file, tmp_path):
    """CLI output must match the directly-invoked op >=60dB (usually
    bit-equal; tiny differences only from the 8->32-bit MIFF round trip,
    so the corpus writes 32-bit floats)."""
    from imagemagick_tpu import io as iio

    ref = iio.read_image(ref_file)
    table = _golden_table()
    failures = []
    for opts, op_fn in table:
        out = str(tmp_path / "golden.miff")
        process([ref_file] + shlex.split(opts) +
                ["-depth", "32", "-define", "quantum:format=floating-point",
                 out])
        got = iio.read_image(out).data
        # encoders clamp to [0,1] (HDRI clamps only at the edge); apply
        # the same clamp to the op-library reference
        want = np.clip(np.asarray(op_fn(ref.data)), 0.0, 1.0)
        p = _psnr(got, want)
        if p < 60.0:
            failures.append((opts, round(p, 1),
                             tuple(np.asarray(got).shape),
                             tuple(np.asarray(want).shape)))
    assert not failures, f"golden PSNR failures: {failures}"

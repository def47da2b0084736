"""End-to-end oracle conformance: tmagick output vs the ACTUAL reference
binary (built at /tmp/imbuild) on identical inputs — per-op PSNR gates in
the spirit of tests/validate.c:836's ValidateConvertCommand, but against
ground truth instead of self-consistency.  Skips without the oracle."""

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
def src(tmp_path_factory):
    from PIL import Image as PILImage

    rng = np.random.default_rng(8)
    h, w = 60, 92
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.stack([
        0.5 + 0.4 * np.sin(yy / 9.0) * np.cos(xx / 13.0),
        np.clip(yy / h + 0.05 * rng.standard_normal((h, w)), 0, 1),
        1.0 - xx / w,
    ], -1)
    img = (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)
    p = tmp_path_factory.mktemp("oracle") / "src.png"
    PILImage.fromarray(img).save(str(p))
    return str(p)


# (option string, min PSNR vs the reference binary's own output)
CASES = [
    ("-flip", 300.0),
    ("-flop", 300.0),
    ("-transpose", 300.0),
    ("-negate", 60.0),
    ("-resize 31x20!", 60.0),
    ("-resize 200%", 60.0),
    ("-scale 23x15!", 60.0),
    ("-sample 23x15!", 300.0),
    ("-gaussian-blur 0x1.5", 60.0),
    ("-blur 0x2", 60.0),
    ("-colorspace gray", 60.0),
    ("-gamma 1.8", 60.0),
    ("-modulate 120,80,100", 60.0),
    ("-threshold 50%", 300.0),
    ("-solarize 50%", 60.0),
    # sepia = knee curves + NormalizeImage + ContrastImage(sharpen)
    # (visual-effects.c:1986-1987); 1-LSB residual from f32 HSB rounding
    ("-sepia-tone 80%", 60.0),
    ("-crop 40x30+5+5", 300.0),
    ("-shave 4x6", 300.0),
    ("-roll +7+11", 300.0),
    ("-rotate 90", 300.0),
    ("-brightness-contrast 15x10", 60.0),
    ("-level 10%,90%", 60.0),
    ("-sigmoidal-contrast 3x50%", 60.0),
    # second sweep (round 3): oracle-driven fixes for shade/lat/
    # white/black-threshold/blue-shift/wave/vignette/distort-edge
    ("-swirl 90", 60.0),
    ("-wave 5x40", 60.0),
    ("-blue-shift 1.5", 60.0),
    ("-shade 30x30", 60.0),
    ("-shade 120x45", 60.0),
    ("-lat 5x5+2%", 60.0),
    ("-white-threshold 70%", 60.0),
    ("-black-threshold 30%", 60.0),
    # GetFillAlpha-exact stroked-ellipse mask + integer offsets (~70dB)
    ("-vignette 0x10", 60.0),
    ("-vignette 2x10", 60.0),
    # reference-exact EWA resampler (ClampUpAxes + Robidoux LUT); pure
    # rotations bit-exact, scaled/bestfit cases ~90dB (f32 LUT-bin flips)
    ("-distort SRT 20", 300.0),
    ("-distort SRT 0.8,45", 80.0),
    ("-distort SRT 1.3,10", 300.0),
    ("-rotate 17", 80.0),
    ("-rotate -10", 300.0),
    ("-colorize 30%", 60.0),
    ("-contrast", 60.0),
    ("-motion-blur 0x3+30", 60.0),
    ("-statistic median 3x3", 60.0),
    ("-statistic mean 3x3", 60.0),
    ("-colorspace CMYK -colorspace sRGB", 60.0),
    ("-colorspace HSL -colorspace sRGB", 60.0),
    ("-despeckle", 60.0),
    ("-enhance", 60.0),
    ("-adaptive-blur 0x1", 60.0),
    ("-adaptive-blur 2x1.5", 60.0),
    ("-adaptive-sharpen 0x1", 60.0),
    ("-adaptive-sharpen 0x2", 60.0),
    ("-edge 0", 60.0),
    ("-blur 2.5x1", 60.0),
    ("-sharpen 0x1", 60.0),
    ("-wavelet-denoise 10%", 300.0),  # dcraw hat + noise_levels table
    ("-wavelet-denoise 20x0.5", 300.0),
    ("-implode 0.3", 60.0),
    ("-trim", 60.0),
    # third sweep: equalize/stretch family + decorate
    ("-equalize", 60.0),
    ("-normalize", 60.0),
    ("-contrast-stretch 2%x1%", 60.0),
    ("-linear-stretch 2%x1%", 60.0),
    ("-auto-level", 60.0),
    ("-auto-gamma", 300.0),  # pooled AllChannels mean (pixel.h:75)
    ("-border 4", 60.0),
    ("-bordercolor blue -border 3", 60.0),
    ("-raise 5", 60.0),
    ("+raise 5", 60.0),
    ("-frame 6x6+2+2", 300.0),
    ("-emboss 0x1", 60.0),
    ("-charcoal 0x1", 60.0),
    ("-kuwahara 0x1", 300.0),
    ("-kuwahara 2", 60.0),
    # nearest-sample arc average; other angles ~66-72dB (f32 trig flips
    # an occasional .5-boundary sample vs the reference's f64)
    ("-rotational-blur 10", 300.0),
    ("-rotational-blur 25", 60.0),
    # oil-paint replicates the reference's strict-max running scan, so the
    # winning bin is decided by scan order, not argmax (visual-effects.c)
    ("-paint 3", 300.0),
    # fourth sweep: morphology + auto-thresholds
    ("-morphology Dilate Square:1", 60.0),
    ("-morphology Erode Disk:2", 60.0),
    ("-morphology Open Diamond:1", 60.0),
    ("-morphology Close Square:2", 60.0),
    ("-morphology Edge Square:1", 60.0),
    ("-morphology TopHat Disk:1", 60.0),
    ("-morphology Convolve Gaussian:0x1", 60.0),
    ("-auto-threshold otsu", 60.0),
    ("-auto-threshold kapur", 60.0),
    ("-auto-threshold triangle", 60.0),
    ("-fx u*0.5", 60.0),
    ("-fx 1-u", 60.0),
    # true moving-window mean-shift; ~64dB (f32 vs the reference's f64 on
    # a chaotic per-pixel iteration — boundary gating flips a few pixels)
    ("-mean-shift 5x5+10%", 60.0),
    ("-morphology Convolve Sobel", 60.0),
    ("-morphology Convolve Prewitt", 60.0),
    ("-morphology Convolve Kirsch", 60.0),
    ("-morphology HMT Corners", 60.0),
    ("-morphology HMT LineEnds", 60.0),
    ("-morphology HMT LineJunctions", 60.0),
    ("-morphology HMT Edges", 60.0),
    ("-morphology HMT Peaks", 60.0),
    ("-morphology Thinning Skeleton", 60.0),
    ("-morphology Distance Manhattan:4", 60.0),
    ("-morphology Distance Euclidean:4", 300.0),  # radius-4 chamfer
    ("-morphology Distance Chebyshev:3", 300.0),
    # fifth sweep: parameterized unsharp, tint, geometry ops, mesh resize
    ("-unsharp 2x1+0.7+0.02", 300.0),
    ("-unsharp 1.5x1+2+0.1", 300.0),
    ("-tint 50", 300.0),
    ("-fill red -tint 40", 300.0),
    ("-fill blue -tint 30x60", 300.0),
    ("-splice 10x8+4+4", 300.0),
    ("-chop 10x8+4+4", 300.0),
    ("-extent 120x80", 300.0),
    ("-magnify", 300.0),
    # mesh-interpolated lookup; ~64-80dB (f32 luma-diagonal ties)
    ("-adaptive-resize 50x40!", 60.0),
    ("-adaptive-resize 150%", 60.0),
    ("-interpolative-resize 50x40!", 60.0),
    # bordered-canvas Paeth shear passes + CropToFitImage
    ("-shear 10x5", 300.0),
    ("-shear 0x8", 300.0),
    ("-shear 15", 80.0),
    # Radon-projection skew detection + bestfit affine correction
    ("-deskew 40%", 80.0),
    # exact integer Zuiderveld CLAHE (tile size via ParseRegionGeometry)
    ("-clahe 2x2+128+3", 300.0),
    ("-clahe 10x10+64+2", 300.0),
    ("-clahe 25x25%+128+3", 80.0),  # f32 lab->srgb rounding flips
    # polar-family distorts: reference coefficients + per-pixel-Jacobian
    # EWA (distort.c:1177-1460 GenerateCoefficients, :2655-2817 mapping)
    ("-distort Polar 0", 300.0),
    ("-distort Polar 40,10", 300.0),
    ("-distort Polar 0,0,30,20", 80.0),
    ("-distort DePolar 0", 80.0),
    ("-distort DePolar 30,5", 80.0),
    ("-distort Arc 60", 80.0),
    ("-distort Arc 120,45", 80.0),
    ("-distort Arc 360", 80.0),
    ("-distort Arc 90,0,60,20", 80.0),
    ("-distort Barrel 0.0,0.0,0.05", 300.0),
    ("-distort Barrel 0.2,0.1,0.05,0.8", 300.0),
    ("-distort BarrelInverse 0.0,0.0,0.05", 300.0),
    ("-distort Cylinder2Plane 90", 300.0),
    ("-distort Plane2Cylinder 90", 300.0),
    ('-distort Shepards "30,30,20,20 60,50,70,60"', 80.0),
    ('-distort BilinearForward "0,0,0,0 91,0,85,10 0,59,5,50 91,59,91,59"',
     300.0),
    ('-distort BilinearReverse "0,0,0,0 91,0,85,10 0,59,5,50 91,59,91,59"',
     80.0),
    ('-distort Perspective "0,0,3,5 91,0,88,2 0,59,3,50 91,59,90,60"', 80.0),
    # +distort best-fit viewports (distort.c:1822-2030)
    ("+distort SRT 20", 300.0),
    ("+distort SRT 0.8,33", 300.0),
    ("+distort Polar 0", 300.0),
    ("+distort DePolar 0", 300.0),
    ("+distort Plane2Cylinder 90", 300.0),
    ('+distort Perspective "0,0,3,5 91,0,88,2 0,59,3,50 91,59,90,60"', 80.0),
    # StringToDouble stops at the comma: one gamma for all channels
    ("-gamma 2.2,1,0.8", 300.0),
    # LevelPixel with a reversed per-channel color range inverts the
    # channel (sign-preserving PerceptibleReciprocal scale)
    ("-level-colors blue,red", 300.0),
    ("-level-colors red,green", 300.0),
    ("+level-colors red,green", 300.0),
    # EvaluateImage: quantum-domain constants (statistic.c:255-447);
    # raw numbers are quantum counts, percents are fractions of 65536
    ("-evaluate Add 10%", 300.0),
    ("-evaluate Subtract 25%", 300.0),
    ("-evaluate Multiply 1.5", 300.0),
    ("-evaluate Divide 2", 300.0),
    ("-evaluate Pow 1.3", 300.0),
    ("-evaluate Log 10", 300.0),
    ("-evaluate Exponential 2", 300.0),
    ("-evaluate Sine 2", 300.0),
    ("-evaluate Cosine 2", 300.0),
    ("-evaluate Set 50%", 300.0),
    ("-evaluate Min 30%", 300.0),
    ("-evaluate Max 70%", 300.0),
    ("-evaluate And 128", 300.0),
    ("-evaluate Or 64", 300.0),
    ("-evaluate Xor 255", 300.0),
    ("-evaluate LeftShift 1", 300.0),
    ("-evaluate RightShift 2", 300.0),
    ("-evaluate Abs 0", 300.0),
    ("-evaluate Threshold 50%", 300.0),
    ("-evaluate ThresholdBlack 20%", 300.0),
    ("-evaluate ThresholdWhite 80%", 300.0),
    ("-evaluate AddModulus 40%", 300.0),
    ("-evaluate Mean 50%", 300.0),
    ("-evaluate RMS 50%", 300.0),
    ("-evaluate InverseLog 10", 300.0),
    # FunctionImage (statistic.c FunctionImage)
    ("-function Polynomial 0.5,0.2,0.1", 300.0),
    ("-function Sinusoid 2,90,0.4,0.5", 70.0),  # f32 sin boundary rounding
    ("-function ArcSin 1,0,1,0", 300.0),
    ("-function ArcTan 1,0,1,0", 300.0),
    # ColorMatrixImage 6x6 identity padding (visual-effects.c:717)
    ("-color-matrix 0.9,0.1,0,0.1,0.8,0.1,0,0.2,0.8", 70.0),
    # RangeThresholdImage intensity trapezoid (threshold.c:1160)
    ("-range-threshold 20%,40%,60%,80%", 300.0),
    ("-range-threshold 10%,30%,70%,90%", 300.0),
    # SetImageType(BilevelType): gray+normalize+bilevel (attribute.c:2320)
    ("-monochrome", 300.0),
    # GetPixelIntensity methods incl. the quantum-squared MS quirk
    ("-grayscale Rec709Luminance", 300.0),
    ("-grayscale Rec601Luma", 300.0),
    ("-grayscale Brightness", 300.0),
    ("-grayscale Lightness", 300.0),
    ("-grayscale Average", 300.0),
    ("-grayscale MS", 300.0),
    ("-grayscale RMS", 300.0),
    # InterpolatePixelChannel: all separable methods (pixel.c:4433-4830)
    ("-interpolate nearest -interpolative-resize 45x37", 300.0),
    ("-interpolate average -interpolative-resize 45x37", 300.0),
    ("-interpolate average9 -interpolative-resize 45x37", 300.0),
    ("-interpolate average16 -interpolative-resize 45x37", 300.0),
    ("-interpolate spline -interpolative-resize 45x37", 300.0),
    ("-interpolate catrom -interpolative-resize 45x37", 300.0),
    ("-interpolate blend -interpolative-resize 45x37", 300.0),
    ("-interpolate bilinear -interpolative-resize 45x37", 300.0),
    ("-interpolate mesh -interpolative-resize 45x37", 300.0),
    ("-interpolate integer -interpolative-resize 45x37", 300.0),
    # misc oracle-verified ops
    ("-fuzz 20% -opaque red", 300.0),
    ("-fuzz 15% -transparent blue", 300.0),
    ("-white-balance", 300.0),
    ("-auto-orient", 300.0),
    # virtual-pixel methods in the distort resampling path
    # (cache.c:2928-3066 coordinate remapping; residual ±1-quantum
    # rounding on isolated boundary pixels for the tiling methods)
    ("-virtual-pixel mirror -distort SRT 30", 300.0),
    ("-virtual-pixel tile -distort SRT 30", 80.0),
    ("-virtual-pixel black -distort SRT 30", 300.0),
    ("-virtual-pixel gray -distort SRT 30", 80.0),
    ("-virtual-pixel white -distort SRT 30", 300.0),
    ("-virtual-pixel dither -distort SRT 30", 80.0),
    ("-virtual-pixel horizontaltile -distort SRT 30", 300.0),
    ("-virtual-pixel verticaltile -distort SRT 30", 80.0),
    ("-virtual-pixel horizontaltileedge -distort SRT 30", 300.0),
    ("-virtual-pixel verticaltileedge -distort SRT 30", 80.0),
    ("-virtual-pixel checkertile -distort SRT 30", 300.0),
    # SelectiveBlur: per-tap luminance-contrast gate (effect.c:3323)
    ("-selective-blur 0x3+10%", 80.0),
    ("-selective-blur 0x2+15%", 300.0),
    # BilateralBlur: charI-difference LUT × spatial gaussian
    # (effect.c:894); even window sizes read past the reference's own
    # tap buffer (UB) and are not gated
    ("-bilateral-blur 3x1.5+3+10", 300.0),
    ("-bilateral-blur 5", 300.0),
    ("-bilateral-blur 3x3+8+3", 300.0),
    # ThumbnailImage staged shrink + LanczosSharp default (resize.c:3641)
    ("-thumbnail 40x30", 300.0),
    ("-thumbnail 20x15", 300.0),
    ("-thumbnail 10x8!", 300.0),
    ("-filter triangle -thumbnail 40x30", 80.0),
    # KmeansImage: octree seeding + distortion-delta stop (quantize.c:2352)
    ("-kmeans 8", 300.0),
    ("-kmeans 4", 300.0),
    ("-kmeans 16", 300.0),
    # sRGB() functional color syntax (color.c QueryColorCompliance)
    ("-color-threshold sRGB(20%,20%,20%)-sRGB(80%,80%,80%)", 300.0),
    ("-fill srgb(255,0,0) -tint 40", 300.0),
    # sixth sweep (round 3 cont.): local-contrast/transverse/channel-fx/
    # unique-colors
    ("-local-contrast 3x25%", 60.0),
    ("-local-contrast 10x50%", 60.0),
    ("-transverse", 300.0),
    ("-unique-colors", 300.0),
    ('-channel-fx "red<=>blue"', 300.0),
    ('-channel-fx "green=>blue"', 300.0),
]


@pytest.mark.parametrize("opts,gate", CASES,
                         ids=[c[0] for c in CASES])
def test_cli_matches_reference_binary(src, tmp_path, opts, gate):
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.main import process

    ref_out = tmp_path / "ref.png"
    subprocess.run([_REF, src, *shlex.split(opts), str(ref_out)],
                   check=True, capture_output=True)
    our_out = tmp_path / "ours.png"
    process([src, *shlex.split(opts), str(our_out)])
    a = np.asarray(PILImage.open(str(ref_out)).convert("RGB"),
                   np.float64) / 255.0
    b = np.asarray(PILImage.open(str(our_out)).convert("RGB"),
                   np.float64) / 255.0
    p = _psnr(a, b)
    assert p >= gate, f"{opts}: PSNR {p:.1f}dB < {gate}"


# colorspace round trips: every space the sweep measured bit-exact plus
# YCC (PhotoCD ramp, 36dB — mid-chain Q16 clamping differs)
CS_CASES = [("RGB", 300), ("Gray", 300), ("CMYK", 300), ("HSL", 300),
            ("HSB", 300), ("HSI", 300), ("HWB", 300), ("HCL", 300),
            ("Lab", 300), ("Luv", 300), ("LCHab", 300), ("XYZ", 300),
            ("xyY", 300), ("LMS", 300), ("YCbCr", 300), ("YUV", 300),
            ("YIQ", 300), ("YPbPr", 300), ("YDbDr", 300), ("OHTA", 300),
            ("Log", 300), ("Jzazbz", 300), ("OkLab", 300), ("OkLch", 300),
            ("DisplayP3", 300), ("Adobe98", 300), ("ProPhoto", 300),
            ("CAT02LMS", 300), ("scRGB", 300), ("LinearGray", 80),
            ("YCC", 30)]


@pytest.mark.parametrize("cs,gate", CS_CASES, ids=[c[0] for c in CS_CASES])
def test_colorspace_roundtrip_matches_reference(src, tmp_path, cs, gate):
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.main import process

    ref_out = tmp_path / "ref.png"
    subprocess.run([_REF, src, "-colorspace", cs, "-colorspace", "sRGB",
                    str(ref_out)], check=True, capture_output=True)
    our_out = tmp_path / "ours.png"
    process([src, "-colorspace", cs, "-colorspace", "sRGB", str(our_out)])
    a = np.asarray(PILImage.open(str(ref_out)).convert("RGB"),
                   np.float64) / 255.0
    b = np.asarray(PILImage.open(str(our_out)).convert("RGB"),
                   np.float64) / 255.0
    p = _psnr(a, b)
    assert p >= gate - 0.5, f"{cs}: {p:.1f}dB"


# -draw scenes (drawtest.c analog): the rasterizer replicates the
# reference's GetFillAlpha model exactly (winding + (1-d)^2 edge AA;
# distance-ramp thin strokes; outline-polygon wide strokes), so these
# scenes compare near-bit-exact.  NOTE: PIL mangles 16-bit gray PNGs via
# convert() (I;16->L clips), so the loader normalizes by true depth.
DRAW_CASES = [
    ("stroke black stroke-width 3 fill none line 5,20 85,20", 100.0),
    ("stroke black stroke-width 3 fill none stroke-dasharray 8 6 "
     "line 4,20 90,20", 100.0),
    ("stroke black stroke-width 8 stroke-linecap square fill none "
     "line 20,20 70,20", 100.0),
    ("stroke black stroke-width 8 stroke-linejoin miter fill none "
     "polyline 10,35 45,35 45,8", 100.0),
    ("fill red stroke blue stroke-width 2 rectangle 10,10 80,35", 100.0),
    ("fill green circle 45,22 45,12", 100.0),
    ("stroke purple stroke-width 2 fill none bezier 5,40 30,5 60,5 90,40",
     100.0),
]


def _load_norm(path):
    """Read a PNG at its TRUE bit depth as (H, W, 3) floats in [0,1]."""
    from PIL import Image as PILImage

    im = PILImage.open(str(path))
    raw = np.asarray(im)
    arr = raw.astype(np.float64)
    if raw.dtype.itemsize > 1 or im.mode in ("I;16", "I", "I;16B"):
        arr = arr / 65535.0
    else:
        arr = arr / 255.0
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, -1)
    if arr.shape[-1] == 4:
        arr = arr[..., :3] * arr[..., 3:] + (1.0 - arr[..., 3:])
    return arr


@pytest.mark.parametrize("mvg,gate", DRAW_CASES,
                         ids=[f"draw{i}" for i in range(len(DRAW_CASES))])
def test_draw_matches_reference(tmp_path, mvg, gate):
    from imagemagick_tpu.cli.main import process

    ref_out = tmp_path / "ref.png"
    subprocess.run([_REF, "-size", "96x44", "xc:white", "-draw", mvg,
                    str(ref_out)], check=True, capture_output=True)
    our_out = tmp_path / "ours.png"
    process(["-size", "96x44", "xc:white", "-draw", mvg, str(our_out)])
    a = _load_norm(ref_out)
    b = _load_norm(our_out)
    p = _psnr(a, b)
    assert p >= gate, f"{mvg[:40]}: {p:.1f}dB"


def test_resize_filter_table_matches_reference(src, tmp_path):
    """All 32 resize filters >= 44dB vs the oracle (most bit-exact) —
    the AcquireResizeFilter table (resize.c:803) end to end."""
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.main import process

    filters = ["Point", "Box", "Triangle", "Hermite", "Hann", "Hamming",
               "Blackman", "Gaussian", "Quadratic", "Cubic", "Catrom",
               "Mitchell", "Jinc", "Sinc", "SincFast", "Kaiser", "Welch",
               "Parzen", "Bohman", "Bartlett", "Lagrange", "Lanczos",
               "LanczosSharp", "Lanczos2", "Lanczos2Sharp", "Robidoux",
               "RobidouxSharp", "Cosine", "Spline", "MagicKernelSharp2013",
               "MagicKernelSharp2021", "CubicSpline"]
    failures = []
    for f in filters:
        ref_out = tmp_path / "ref.png"
        subprocess.run([_REF, src, "-filter", f, "-resize", "37x25!",
                        str(ref_out)], check=True, capture_output=True)
        our_out = tmp_path / "ours.png"
        process([src, "-filter", f, "-resize", "37x25!", str(our_out)])
        a = np.asarray(PILImage.open(str(ref_out)).convert("RGB"),
                       np.float64) / 255.0
        b = np.asarray(PILImage.open(str(our_out)).convert("RGB"),
                       np.float64) / 255.0
        p = _psnr(a, b)
        if p < 44.0:
            failures.append((f, round(p, 1)))
    assert not failures, failures


def test_canny_matches_reference_iou(src, tmp_path):
    """Canny edge maps vs the oracle: binary-map PSNR is harsh (every
    differing pixel is full-scale), so gate on edge-set IoU >= 0.8 plus
    a loose PSNR floor."""
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.main import process

    ref_out = tmp_path / "ref.png"
    subprocess.run([_REF, src, "-canny", "0x1+10%+30%", str(ref_out)],
                   check=True, capture_output=True)
    our_out = tmp_path / "ours.png"
    process([src, "-canny", "0x1+10%+30%", str(our_out)])
    a = np.asarray(PILImage.open(str(ref_out)).convert("L"),
                   np.float64) / 255.0
    b = np.asarray(PILImage.open(str(our_out)).convert("L"),
                   np.float64) / 255.0
    ia, ib = a > 0.5, b > 0.5
    iou = (ia & ib).sum() / max((ia | ib).sum(), 1)
    assert iou >= 0.80, f"edge IoU {iou:.3f}"
    assert _psnr(a, b) >= 12.0


# ordered dither: the oracle build needs MAGICK_CONFIGURE_PATH pointed at
# the reference's config/ to find thresholds.xml.  The integer threshold
# ladder (threshold.c:1774) is replicated exactly — gate bit-exact.
OD_CASES = [("o2x2", 1.0), ("o3x3", 1.0), ("o4x4", 1.0),
            ("o8x8", 1.0), ("h4x4a", 1.0), ("h6x6a", 1.0),
            ("h8x8a", 1.0), ("c5x5b", 1.0), ("c6x6b", 1.0),
            ("c7x7b", 1.0), ("checks", 1.0), ("threshold", 1.0),
            ("o4x4,6", 1.0), ("o8x8,4", 1.0)]


@pytest.mark.parametrize("mapname,gate", OD_CASES,
                         ids=[c[0] for c in OD_CASES])
def test_ordered_dither_matches_reference(src, tmp_path, mapname, gate):
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.main import process

    env = dict(os.environ, MAGICK_CONFIGURE_PATH="/root/reference/config")
    ref_out = tmp_path / "ref.png"
    subprocess.run([_REF, src, "-ordered-dither", mapname, str(ref_out)],
                   check=True, capture_output=True, env=env)
    our_out = tmp_path / "ours.png"
    process([src, "-ordered-dither", mapname, str(our_out)])
    a = np.asarray(PILImage.open(str(ref_out)).convert("RGB"), np.float64)
    b = np.asarray(PILImage.open(str(our_out)).convert("RGB"), np.float64)
    agree = float((np.abs(a - b) < 5.0).mean())
    assert agree >= gate, f"{mapname}: agreement {agree:.4f} < {gate}"


def test_shadow_matches_reference_rgba(src, tmp_path):
    """-shadow output is background color + blurred alpha — compare RGBA
    (the RGB planes alone are constant and would trivially pass)."""
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.main import process

    ref_out = tmp_path / "ref.png"
    subprocess.run([_REF, src, "-shadow", "60x4+4+4", str(ref_out)],
                   check=True, capture_output=True)
    our_out = tmp_path / "ours.png"
    process([src, "-shadow", "60x4+4+4", str(our_out)])
    a = np.asarray(PILImage.open(str(ref_out)).convert("RGBA"),
                   np.float64) / 255.0
    b = np.asarray(PILImage.open(str(our_out)).convert("RGBA"),
                   np.float64) / 255.0
    assert a.shape == b.shape, f"{a.shape} != {b.shape}"
    p = _psnr(a, b)
    assert p >= 60.0, f"-shadow RGBA PSNR {p:.1f}dB < 60"


def test_separate_matches_reference(src, tmp_path):
    """-separate writes one grayscale image per channel with WriteImages'
    scene filename expansion (name-N.ext)."""
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.main import process

    subprocess.run([_REF, src, "-separate", str(tmp_path / "ref.png")],
                   check=True, capture_output=True)
    process([src, "-separate", str(tmp_path / "ours.png")])
    for i in range(3):
        a = np.asarray(PILImage.open(str(tmp_path / f"ref-{i}.png"))
                       .convert("L"), np.float64) / 255.0
        im = PILImage.open(str(tmp_path / f"ours-{i}.png"))
        arr = np.asarray(im, np.float64)
        b = arr / 65535.0 if im.mode in ("I;16", "I") else arr / 255.0
        assert _psnr(a, b) >= 60.0, f"channel {i}"


def test_connected_components_gray_convention(tmp_path):
    """Default -connected-components output = component id as the Q16
    colormap gray ramp id/65535 (vision.c AcquireImageColormap default),
    ids sequential in scan order of component roots."""
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.main import process

    a = np.zeros((40, 60), np.uint8)
    a[5:15, 5:20] = 255
    a[20:35, 30:55] = 128
    a[2:4, 50:58] = 255
    srcp = tmp_path / "cc.png"
    PILImage.fromarray(a).convert("RGB").save(str(srcp))
    ref_out = tmp_path / "ref.png"
    subprocess.run([_REF, str(srcp), "-connected-components", "4",
                    str(ref_out)], check=True, capture_output=True)
    our_out = tmp_path / "ours.png"
    process([str(srcp), "-connected-components", "4", str(our_out)])
    ra = np.asarray(PILImage.open(str(ref_out)).convert("L"), np.int32)
    oa = np.asarray(PILImage.open(str(our_out)).convert("L"), np.int32)
    np.testing.assert_array_equal(ra, oa)


def test_connected_components_mean_color(tmp_path):
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.main import process

    a = np.zeros((40, 60), np.uint8)
    a[5:15, 5:20] = 255
    a[20:35, 30:55] = 128
    srcp = tmp_path / "cc.png"
    PILImage.fromarray(a).convert("RGB").save(str(srcp))
    ref_out = tmp_path / "ref.png"
    subprocess.run([_REF, str(srcp), "-define",
                    "connected-components:mean-color=true",
                    "-connected-components", "4", str(ref_out)],
                   check=True, capture_output=True)
    our_out = tmp_path / "ours.png"
    process([str(srcp), "-define", "connected-components:mean-color=true",
             "-connected-components", "4", str(our_out)])
    def load_norm(p):
        im = PILImage.open(str(p))
        a = np.asarray(im, np.float64)
        scale = 65535.0 if im.mode.startswith("I") else 255.0
        if a.ndim == 2:
            a = a[..., None].repeat(3, -1)
        return a[..., :3] / scale

    assert _psnr(load_norm(ref_out), load_norm(our_out)) >= 50.0


@pytest.mark.parametrize("levels", [2, 4, 6])
def test_posterize_riemersma_exact(src, tmp_path, levels):
    """Default -posterize dithers with the Riemersma method; the native
    riemersma.cpp Hilbert walk is bit-exact vs the reference binary."""
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.main import process

    ref_out = tmp_path / "ref.png"
    subprocess.run([_REF, src, "-posterize", str(levels), str(ref_out)],
                   check=True, capture_output=True)
    our_out = tmp_path / "ours.png"
    process([src, "-posterize", str(levels), str(our_out)])
    a = np.asarray(PILImage.open(str(ref_out)).convert("RGB"), np.int32)
    b = np.asarray(PILImage.open(str(our_out)).convert("RGB"), np.int32)
    np.testing.assert_array_equal(a, b)


def test_posterize_plus_dither_exact(src, tmp_path):
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.main import process

    ref_out = tmp_path / "ref.png"
    subprocess.run([_REF, src, "+dither", "-posterize", "4", str(ref_out)],
                   check=True, capture_output=True)
    our_out = tmp_path / "ours.png"
    process([src, "+dither", "-posterize", "4", str(our_out)])
    a = np.asarray(PILImage.open(str(ref_out)).convert("RGB"), np.int32)
    b = np.asarray(PILImage.open(str(our_out)).convert("RGB"), np.int32)
    np.testing.assert_array_equal(a, b)


def test_posterize_floyd_steinberg_exact(src, tmp_path):
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.main import process

    ref_out = tmp_path / "ref.png"
    subprocess.run([_REF, src, "-dither", "FloydSteinberg", "-posterize",
                    "4", str(ref_out)], check=True, capture_output=True)
    our_out = tmp_path / "ours.png"
    process([src, "-dither", "FloydSteinberg", "-posterize", "4",
             str(our_out)])
    a = np.asarray(PILImage.open(str(ref_out)).convert("RGB"), np.int32)
    b = np.asarray(PILImage.open(str(our_out)).convert("RGB"), np.int32)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("opts", ["-colors 16", "+dither -colors 8",
                                  "-dither FloydSteinberg -colors 32"],
                         ids=["riemersma16", "nodither8", "fs32"])
def test_colors_octree_exact(src, tmp_path, opts):
    """-colors runs the reference octree quantizer; compare through the
    txt coder (percent precision) because the reference PNG encoder
    applies its own dithered 16->8 depth reduction when -dither is set."""
    import re

    from imagemagick_tpu.cli.main import process

    r = subprocess.run([_REF, src, *shlex.split(opts), "txt:-"],
                       check=True, capture_output=True, text=True)
    ref = {}
    pat = re.compile(r"(\d+),(\d+):.*srgba?\(([\d.]+)%,([\d.]+)%,([\d.]+)%")
    for line in r.stdout.splitlines()[1:]:
        m = pat.match(line)
        if m:
            ref[(int(m.group(2)), int(m.group(1)))] = [
                float(m.group(i)) / 100.0 for i in (3, 4, 5)]
    our_out = tmp_path / "ours.png"
    process([src, *shlex.split(opts), "-depth", "16", str(our_out)])
    # read our float result straight from the op (PNG would re-quantize)
    import jax

    from imagemagick_tpu import io as iio
    from imagemagick_tpu.ops import quantize  # noqa: F401
    from imagemagick_tpu import native

    from PIL import Image as PILImage

    img = np.asarray(PILImage.open(src).convert("RGB"), np.float32) / 255.0
    meth = ("none" if opts.startswith("+dither") else
            "fs" if "FloydSteinberg" in opts else "riemersma")
    n = int(opts.split()[-1])
    res = native.octree_quantize(img, n, meth)
    assert res is not None
    out = res[0]
    bad = 0
    for (y, x), v in ref.items():
        if max(abs(out[y, x, i] - v[i]) for i in range(3)) > 1e-4:
            bad += 1
    assert len(ref) == out.shape[0] * out.shape[1]
    assert bad == 0, f"{bad} mismatched pixels"


@pytest.mark.parametrize("pre", [[], ["+dither"],
                                 ["-dither", "FloydSteinberg"]],
                         ids=["riemersma", "nodither", "fs"])
def test_remap_exact(src, tmp_path, pre):
    """-remap dithers by default (Riemersma) and matches the reference
    bit-for-bit in all three dither modes."""
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.main import process

    pal = np.array([[0, 0, 0], [255, 255, 255], [255, 0, 0], [0, 255, 0],
                    [0, 0, 255], [255, 255, 0], [0, 255, 255],
                    [255, 0, 255]], np.uint8).reshape(1, 8, 3)
    palp = tmp_path / "pal.png"
    PILImage.fromarray(pal).save(str(palp))
    ref_out = tmp_path / "ref.png"
    subprocess.run([_REF, src, *pre, "-remap", str(palp), str(ref_out)],
                   check=True, capture_output=True)
    our_out = tmp_path / "ours.png"
    process([src, *pre, "-remap", str(palp), str(our_out)])
    a = np.asarray(PILImage.open(str(ref_out)).convert("RGB"), np.int32)
    b = np.asarray(PILImage.open(str(our_out)).convert("RGB"), np.int32)
    np.testing.assert_array_equal(a, b)


def test_transparent_virtual_pixel_premultiplied(src, tmp_path):
    """-virtual-pixel transparent: alpha-weighted EWA (resample.c alpha
    premultiplication).  Compared in PREMULTIPLIED space — the color
    stored under (near-)zero alpha is undefined wire noise; alpha itself
    and the visible premultiplied color must match within one quantum."""
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.main import process

    ref_out = tmp_path / "ref.png"
    subprocess.run([_REF, src, "-virtual-pixel", "transparent",
                    "-distort", "SRT", "30", str(ref_out)],
                   check=True, capture_output=True)
    our_out = tmp_path / "ours.png"
    process([src, "-virtual-pixel", "transparent", "-distort", "SRT", "30",
             str(our_out)])
    a = np.asarray(PILImage.open(str(ref_out)).convert("RGBA"),
                   np.float64) / 255.0
    b = np.asarray(PILImage.open(str(our_out)).convert("RGBA"),
                   np.float64) / 255.0
    assert np.abs(a[..., 3] - b[..., 3]).max() <= 1.5 / 255.0
    ap = a[..., :3] * a[..., 3:]
    bp = b[..., :3] * b[..., 3:]
    mse = np.mean((ap - bp) ** 2)
    psnr = 300.0 if mse == 0 else 10 * np.log10(1.0 / mse)
    assert psnr >= 80.0, psnr


def test_polaroid_premultiplied(src, tmp_path):
    """PolaroidImage (visual-effects.c:2297): frame+bend+shadow+rotate+trim.
    Angle 0 is bit-exact; rotated output is compared premultiplied (the
    color under near-zero alpha is undefined) over the common canvas —
    trim can differ by a hair of sub-quantum alpha at the border."""
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.main import process

    for angle, gate, shape_slack in (("0", 300.0, 0), ("15", 60.0, 2)):
        ref_out = tmp_path / f"ref{angle}.png"
        subprocess.run([_REF, src, "-polaroid", angle, str(ref_out)],
                       check=True, capture_output=True)
        our_out = tmp_path / f"ours{angle}.png"
        process([src, "-polaroid", angle, str(our_out)])
        a = np.asarray(PILImage.open(str(ref_out)).convert("RGBA"),
                       np.float64) / 255.0
        b = np.asarray(PILImage.open(str(our_out)).convert("RGBA"),
                       np.float64) / 255.0
        assert abs(a.shape[0] - b.shape[0]) <= shape_slack
        assert abs(a.shape[1] - b.shape[1]) <= shape_slack
        h = min(a.shape[0], b.shape[0])
        w = min(a.shape[1], b.shape[1])
        a, b = a[:h, :w], b[:h, :w]
        ap = np.concatenate([a[..., :3] * a[..., 3:], a[..., 3:]], -1)
        bp = np.concatenate([b[..., :3] * b[..., 3:], b[..., 3:]], -1)
        mse = np.mean((ap - bp) ** 2)
        psnr = 300.0 if mse == 0 else 10 * np.log10(1.0 / mse)
        assert psnr >= gate, (angle, psnr)


def test_sketch_statistics_match(src, tmp_path):
    """SketchImage (visual-effects.c:2094) is internally random (fresh
    RandomInfo per call — the oracle does not even match ITSELF run to
    run), so gate on distribution statistics: mean, std, and saturated
    fraction must sit in the reference band, and our PSNR vs the oracle
    must be within 3dB of the oracle's own run-to-run PSNR."""
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.main import process

    r1 = tmp_path / "r1.png"
    r2 = tmp_path / "r2.png"
    for f in (r1, r2):
        subprocess.run([_REF, src, "-sketch", "3x1+30", str(f)],
                       check=True, capture_output=True)
    ours = tmp_path / "ours.png"
    process([src, "-sketch", "3x1+30", str(ours)])
    a = np.asarray(PILImage.open(str(r1)).convert("RGB"), np.float64) / 255
    b = np.asarray(PILImage.open(str(r2)).convert("RGB"), np.float64) / 255
    o = np.asarray(PILImage.open(str(ours)).convert("RGB"), np.float64) / 255
    self_psnr = 10 * np.log10(1.0 / max(np.mean((a - b) ** 2), 1e-30))
    psnr = 10 * np.log10(1.0 / max(np.mean((o - a) ** 2), 1e-30))
    assert abs(o.mean() - a.mean()) < 0.03, (o.mean(), a.mean())
    assert abs(o.std() - a.std()) < 0.05, (o.std(), a.std())
    assert abs((o >= 1.0).mean() - (a >= 1.0).mean()) < 0.05
    assert psnr >= self_psnr - 3.0, (psnr, self_psnr)


# -- compare -metric value oracle -------------------------------------------
# The reference prints "quantum (normalized)" for most metrics (or a bare
# count/dB value); ours prints the normalized value.  Gate: our number must
# match ONE of the reference-printed floats to the given relative tolerance.
METRIC_CASES = [
    ("AE", 1e-6), ("MAE", 1e-3), ("MSE", 1e-3), ("RMSE", 1e-3),
    ("PAE", 1e-3), ("PSNR", 1e-3), ("NCC", 1e-3), ("FUZZ", 1e-3),
    ("SSIM", 2e-3), ("DSSIM", 2e-3), ("MEPP", 1e-3), ("PHASH", 0.05),
    ("DPC", 1e-3),
]


@pytest.fixture(scope="module")
def cmp_pair(src, tmp_path_factory):
    d = tmp_path_factory.mktemp("cmp")
    b = str(d / "b.png")
    subprocess.run([_REF, src, "-gaussian-blur", "0x1", b],
                   check=True, capture_output=True)
    return src, b


@pytest.mark.parametrize("metric,tol", METRIC_CASES,
                         ids=[m[0] for m in METRIC_CASES])
def test_compare_metric_matches_reference(cmp_pair, metric, tol, capsys):
    import re

    from imagemagick_tpu.cli.main import _compare_main

    a, b = cmp_pair
    r = subprocess.run([_REF, "compare", "-metric", metric, a, b, "null:"],
                       capture_output=True, text=True)
    ref_floats = [float(x) for x in
                  re.findall(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?",
                             r.stderr)]
    assert ref_floats, r.stderr
    _compare_main(["-metric", metric.lower(), a, b, "null:"])
    out = capsys.readouterr().err.strip().split()[0]
    ours = float(out)
    best = min(abs(ours - rf) / max(abs(rf), 1e-12) for rf in ref_floats)
    absbest = min(abs(ours - rf) for rf in ref_floats)
    assert best <= tol or absbest <= 1e-6, (metric, ours, r.stderr.strip())


# -- identify -format numeric property oracle --------------------------------
FMT_CASES = ["%w", "%h", "%[mean]", "%[standard-deviation]", "%[min]",
             "%[max]", "%[entropy]", "%[colors]", "%[depth]"]


@pytest.mark.parametrize("fmt", FMT_CASES)
def test_identify_format_matches_reference(src, fmt, capsys):
    from imagemagick_tpu.cli.main import main as cli_main

    r = subprocess.run([_REF, "identify", "-format", fmt, src],
                       capture_output=True, text=True, check=True)
    cli_main(["identify", "-format", fmt, src])
    ours = capsys.readouterr().out.strip()
    ref = r.stdout.strip()
    try:
        rv, ov = float(ref), float(ours)
    except ValueError:
        assert ours == ref, (fmt, ours, ref)
        return
    # statistics print quantum-scaled in Q16; accept either scaling
    candidates = (ov, ov * 65535.0, ov / 65535.0)
    assert any(abs(c - rv) <= max(2e-4 * max(abs(rv), 1.0), 1e-6)
               for c in candidates), (fmt, ours, ref)


# built-in images: must be BIT-EXACT with the reference's embedded bitmaps
# (coders/magick.c:12992 MagickImageList; our pixels are extracted from the
# oracle binary itself and packed in io/builtin_images.bin)
@pytest.mark.parametrize("name", ["rose", "logo", "wizard", "granite",
                                  "netscape"])
def test_builtin_images_bit_exact(tmp_path, name):
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.main import process

    ref_out = tmp_path / "ref.png"
    subprocess.run([_REF, f"{name}:", str(ref_out)],
                   check=True, capture_output=True)
    our_out = tmp_path / "ours.png"
    process([f"{name}:", str(our_out)])
    a = np.asarray(PILImage.open(str(ref_out)).convert("RGB"))
    b = np.asarray(PILImage.open(str(our_out)).convert("RGB"))
    assert a.shape == b.shape, (name, a.shape, b.shape)
    assert np.array_equal(a, b), \
        f"{name}: max |diff| = {np.abs(a.astype(int) - b.astype(int)).max()}"

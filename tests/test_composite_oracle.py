"""Composite operator conformance vs the reference binary: 40 operators
over alpha-carrying images, gated near-bit-exact.  Skips without the
oracle at /tmp/imbuild."""

import os
import subprocess

import numpy as np
import pytest

_REF = "/tmp/imbuild/utilities/magick"

pytestmark = pytest.mark.skipif(not os.path.exists(_REF),
                                reason="reference binary not built")

OPS = ["over", "multiply", "screen", "overlay", "darken", "lighten",
       "plus", "difference", "exclusion", "hardlight", "softlight",
       "colordodge", "colorburn", "linearburn", "lineardodge",
       "linearlight", "vividlight", "pinlight", "pegtoplight", "minus",
       "divide", "in", "out", "atop", "xor", "copy", "dstover", "dstin",
       "dstout", "dstatop", "modulusadd", "modulussubtract", "hue",
       "saturate", "luminize", "colorize", "bumpmap", "hardmix",
       "darkenintensity", "lightenintensity"]

# near-exact everywhere; two division-based ops accumulate f32 noise
GATES = {"colorburn": 70.0, "divide": 70.0}


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    from PIL import Image as PILImage

    rng = np.random.default_rng(5)
    td = tmp_path_factory.mktemp("composite")
    paths = []
    for name, seed_shift in (("dst", 0), ("src", 1)):
        arr = (rng.random((40, 48, 4)) * 255).astype(np.uint8)
        arr[..., 3] = 255 * (rng.random((40, 48)) > 0.3)
        p = td / f"{name}.png"
        PILImage.fromarray(arr, "RGBA").save(str(p))
        paths.append(str(p))
    return paths


@pytest.mark.parametrize("op", OPS)
def test_composite_matches_reference(pair, tmp_path, op):
    from PIL import Image as PILImage

    from imagemagick_tpu.cli.main import process

    dst, src = pair
    ref_out = tmp_path / "ref.png"
    subprocess.run([_REF, dst, src, "-compose", op, "-composite",
                    str(ref_out)], check=True, capture_output=True)
    our_out = tmp_path / "ours.png"
    process([dst, src, "-compose", op, "-composite", str(our_out)])
    a = np.asarray(PILImage.open(str(ref_out)).convert("RGBA"),
                   np.float64) / 255.0
    b = np.asarray(PILImage.open(str(our_out)).convert("RGBA"),
                   np.float64) / 255.0
    assert a.shape == b.shape
    mse = np.mean((a - b) ** 2)
    p = 300.0 if mse == 0 else 10 * np.log10(1.0 / mse)
    assert p >= GATES.get(op, 55.0), f"{op}: {p:.1f}dB"

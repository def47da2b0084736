"""Absolute colorspace parity against the reference's own validation values.

These are the exact hard-coded triplets from ValidateColorspaces
(/root/reference/tests/validate.c:527 region): the RGB probe
(0.545877, 0.966567, 0.463759) and the expected coordinates in each space,
in the reference's storage scaling.  Passing these means our conversions
are numerically the reference's, not merely self-consistent.
"""

import numpy as np
import pytest

from imagemagick_tpu.ops import colorspace as cs

RGB = np.array([[[0.545877, 0.966567, 0.463759]]], dtype=np.float32)

# space -> expected triple in stored scaling (validate.c expected values)
EXPECTED = {
    "hsi": (111.244375 / 360.0, 0.295985, 0.658734),
    "hsl": (110.200859 / 360.0, 0.882623, 0.715163),
    "hsv": (110.200859 / 360.0, 0.520200, 0.966567),
    "hsb": (110.200859 / 360.0, 0.520200, 0.966567),
    "ycbcr": (0.783460, 0.319581, 0.330539),
    "lab": (88.456154 / 100.0, -54.671483 / 255.0 + 0.5, 51.662818 / 255.0 + 0.5),
    "lchab": (88.456154 / 100.0, 75.219797 / 255.0 + 0.5, 136.620717 / 360.0),
    "lms": (0.611749, 0.910088, 0.294880),
    "luv": (88.456154 / 100.0, (-51.330414 + 134.0) / 354.0,
            (76.405526 + 140.0) / 262.0),
    "xyz": (0.470646, 0.730178, 0.288324),
}

TOL = 2e-4  # float32 vs the reference's double math


@pytest.mark.parametrize("space", sorted(EXPECTED))
def test_forward_matches_reference(space):
    got = np.asarray(cs.convert(RGB, "srgb", space))[0, 0]
    exp = np.asarray(EXPECTED[space])
    assert np.allclose(got, exp, atol=TOL), f"{space}: {got} vs {exp}"


@pytest.mark.parametrize("space", sorted(EXPECTED))
def test_inverse_matches_reference(space):
    mid = np.asarray(EXPECTED[space], np.float32).reshape(1, 1, 3)
    back = np.asarray(cs.convert(mid, space, "srgb"))[0, 0]
    assert np.allclose(back, RGB[0, 0], atol=TOL), f"{space}: {back}"

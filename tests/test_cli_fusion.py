"""CLI whole-chain fusion: one XLA program per pipeline (VERDICT r1 #9).

The lazy CLI keeps shape-changing ops pending (LazyImage.push with static
output dims), so read -> crop -> resize -> blur -> colorspace -> write must
trigger exactly ONE materialize-with-pending-ops (= one jit compile), not
one per op.
"""

import numpy as np
import pytest

import importlib

climain = importlib.import_module("imagemagick_tpu.cli.main")


@pytest.fixture()
def count_materialize(monkeypatch):
    counts = {"fused": 0, "ops": []}
    orig = climain.LazyImage.materialize

    def counting(self):
        if self.pending:
            counts["fused"] += 1
            counts["ops"].append(len(self.pending))
        return orig(self)

    monkeypatch.setattr(climain.LazyImage, "materialize", counting)
    return counts


def test_chain_compiles_once(tmp_path, count_materialize):
    src = tmp_path / "in.ppm"
    rng = np.random.default_rng(0)
    arr = (rng.random((64, 80, 3)) * 255).astype(np.uint8)
    from imagemagick_tpu import io as iio
    from imagemagick_tpu.core.image import Image
    from imagemagick_tpu.core.spec import ImageSpec

    iio.write_image(Image(arr.astype(np.float32) / 255.0,
                          ImageSpec(colorspace="srgb", alpha=False, depth=8)),
                    str(src))

    out = tmp_path / "out.png"
    climain.process([str(src), "-crop", "60x50+2+3", "-resize", "30x25!",
                         "-gaussian-blur", "0x1", "-colorspace", "gray",
                         str(out)])
    assert out.exists()
    assert count_materialize["fused"] == 1, (
        f"expected exactly one fused materialize, got "
        f"{count_materialize['fused']} (pending depths: "
        f"{count_materialize['ops']})")
    # the device ops all landed in that single program (some option
    # handlers combine adjacent ops into one pending entry)
    assert count_materialize["ops"][0] >= 3


def test_geometry_resolves_against_pending_dims(tmp_path, count_materialize):
    """'-resize 50%' after a crop must use the cropped dims, still fused."""
    src = tmp_path / "in2.ppm"
    rng = np.random.default_rng(1)
    from imagemagick_tpu import io as iio
    from imagemagick_tpu.core.image import Image
    from imagemagick_tpu.core.spec import ImageSpec

    iio.write_image(Image(rng.random((40, 60, 3)).astype(np.float32),
                          ImageSpec(colorspace="srgb", alpha=False, depth=8)),
                    str(src))
    out = tmp_path / "out2.png"
    climain.process([str(src), "-crop", "30x20+0+0", "-resize", "50%",
                         str(out)])
    assert count_materialize["fused"] == 1
    back = iio.read_image(str(out))
    assert (back.height, back.width) == (10, 15)

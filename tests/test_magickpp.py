"""Magick++ compatibility layer: build the C++ binding, compile and run a
demo program against it, and assert its behavior end-to-end.

Covers the §2.8 Magick++ role (/root/reference/Magick++/lib): Geometry /
Color value classes, Image pipeline methods, pixel access, composition,
compare, I/O (file + Blob), properties, and exception mapping — all running
through the embedded framework.
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "magickpp_demo.cpp")


def _have_toolchain():
    return shutil.which("g++") is not None


@pytest.fixture(scope="module")
def demo_output(tmp_path_factory):
    if not _have_toolchain():
        pytest.skip("g++ unavailable")
    from imagemagick_tpu.native.magickpp import build

    tmp = tmp_path_factory.mktemp("magickpp")
    exe = str(tmp / "demo")
    build.compile_program(DEMO, exe)

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([exe, str(tmp)], capture_output=True, text=True,
                       timeout=600, env=env)
    assert r.returncode == 0, f"demo failed:\n{r.stdout}\n{r.stderr}"
    out = {}
    for line in r.stdout.splitlines():
        if "=" in line:
            k, v = line.split("=", 1)
            out[k] = v
    return out, tmp


def test_geometry_values(demo_output):
    out, _ = demo_output
    assert out["geom_w"] == "120"
    assert out["geom_h"] == "80"
    assert out["geom_x"] == "5"
    assert out["geom_y"] == "-7"
    assert out["geom_aspect"] == "1"
    assert out["geom_str"] == "120x80+5-7!"


def test_named_color_resolves(demo_output):
    out, _ = demo_output
    assert float(out["red_q"]) == pytest.approx(65535.0, rel=1e-3)
    assert float(out["green_q"]) == pytest.approx(0.0, abs=1.0)


def test_canvas_and_resize(demo_output):
    out, _ = demo_output
    assert out["cols"] == "64" and out["rows"] == "48"
    assert out["resized"] == "32x32"
    assert out["colorspace"] == "gray"


def test_pixel_roundtrip(demo_output):
    out, _ = demo_output
    assert out["pixel_r"] == "255"
    assert out["pixel_g"] == "0"
    assert float(out["buf34_r"]) == pytest.approx(1.0, abs=1e-3)
    assert out["sync_b"] == "255"


def test_composite_gravity(demo_output):
    out, _ = demo_output
    # yellow overlay centered on blue base: red channel at center is 255
    assert out["comp_r"] == "255"


def test_compare(demo_output):
    out, _ = demo_output
    assert float(out["rmse_same"]) == pytest.approx(0.0, abs=1e-6)
    assert out["rmse_diff_pos"] == "1"


def test_draw(demo_output):
    out, _ = demo_output
    assert out["draw_r"] == "255"
    assert out["draw_g"] == "0"


def test_effects_and_fx(demo_output):
    out, _ = demo_output
    assert out["effects_ok"] == "1"
    assert out["fx_ok"] == "1"


def test_io_roundtrip(demo_output):
    out, tmp = demo_output
    assert out["io_roundtrip"] == "20x10"
    assert out["blob_len_pos"] == "1"
    assert out["blob_cols"] == "20"
    assert (tmp / "magickpp_demo.png").exists()


def test_properties_signature_exceptions(demo_output):
    out, _ = demo_output
    assert out["attr"] == "tpu"
    assert out["siglen"] == "64"
    assert out["throws"] == "1"
    assert out["done"] == "1"


def test_drawable_list(demo_output):
    out, _ = demo_output
    assert out["dlist_b"] == "255"   # blue circle center
    assert out["dlist_g"] == "255"   # lime rectangle corner


def test_stl_multiimage_functions(demo_output):
    out, _ = demo_output
    assert out["append"] == "30x8"       # horizontal append of 3x 10x8
    assert abs(int(out["avg_g"]) - 128) <= 1   # mean of gray20/50/80
    assert out["flat"] == "10x8"
    assert out["morph_n"] == "5"         # 3 frames + 1 interpolant/pair
    assert out["seq_n"] == "3"           # multi-frame MIFF round trip


def test_services(demo_output):
    out, _ = demo_output
    assert out["limit_w"] == str(1 << 20)
    assert out["coders_n_pos"] == "1"
    assert out["png_rw"] == "11"


def test_channel_scoped_ops(demo_output):
    out, _ = demo_output
    assert out["ch_r"] == "255"   # red negated 0 -> 255
    assert out["ch_g"] == "128"   # green untouched


def test_widened_attribute_pairs(demo_output):
    out, _ = demo_output
    assert out["adjoin"] == "0"
    assert out["scene"] == "7"
    assert out["endian"] == "2"          # MSBEndian
    assert out["interlace"] == "3"       # PlaneInterlace
    assert out["interp"] == "5"          # BilinearInterpolatePixel
    assert out["vpm"] == "6"             # TileVirtualPixelMethod
    assert out["intent"] == "2"          # PerceptualIntent
    assert out["compose_mult"] == "1"
    assert out["strokew"] == "2.5"
    assert out["fontw"] == "700"
    assert out["kern"] == "1.5"
    assert out["strokecol_b"] == "1"
    assert out["dash0"] == "4"
    assert out["defset"] == "1"
    assert abs(float(out["chroma_rx"]) - 0.64) < 1e-9
    assert out["channels"] == "3"
    assert out["classtype"] == "1"       # DirectClass


def test_widened_analysis(demo_output):
    out, _ = demo_output
    assert out["stat_mean_mid"] == "1"
    assert out["mom_cx_pos"] == "1"
    assert int(out["phash_n"]) >= 42
    assert float(out["phash_self"]) == 0.0
    assert out["tm_w_pos"] == "1" and out["tm_asc_pos"] == "1"
    assert out["identtype"] == "1"


def test_widened_operations(demo_output):
    out, _ = demo_output
    assert out["opaque"] == "1"
    assert out["erase_b"] == "255"       # erased to blue background
    assert out["fmtexpr"] == "5x5"
    assert out["hald_r"] == "200"        # identity hald leaves color alone
    assert out["sep_r"] == "255"         # red channel -> gray 255
    assert out["uniq_w"] == "1"          # one unique color
    assert out["copy_w"] == "255" and out["copy_b"] == "0"
    assert out["chcmp_zero"] == "1" and out["setmetric"] == "1"
    assert out["search_x"] == "9" and out["search_y"] == "6"
    assert out["search_w"] == "4"
    assert float(out["tchroma_a"]) == 0.0

"""SVG subset renderer: <defs>/<use>, CSS styling, gradients on fills
AND strokes (VERDICT r3 #10; coders/svg.c:4821's librsvg-optional
renderer).

The oracle binary on this machine was built without the XML delegate, so
its own MSVG reader is unavailable (`magick -list format` shows MSVG
write-only) — the corpus gates analytically on exact pixel colors, and a
perceptual oracle diff runs automatically whenever an oracle with SVG
read support exists.
"""

import os
import subprocess

import numpy as np
import pytest

from imagemagick_tpu.io.extra_coders import decode_svg

ORACLE = "/tmp/imbuild/utilities/magick"

SCENE = b"""<svg xmlns="http://www.w3.org/2000/svg" width="100" height="80">
<style> .box { fill: red; } #sp { stroke: blue; stroke-width: 3; }
  rect.g { fill: green; } </style>
<defs>
  <linearGradient id="lg" gradientUnits="userSpaceOnUse"
      x1="0" y1="0" x2="100" y2="0">
    <stop offset="0%" stop-color="black"/>
    <stop offset="100%" stop-color="white"/>
  </linearGradient>
  <rect id="proto" width="20" height="10"/>
</defs>
<rect class="box" x="5" y="5" width="30" height="20"/>
<rect class="g" x="40" y="5" width="30" height="20"/>
<use href="#proto" x="5" y="40" fill="purple"/>
<line id="sp" x1="10" y1="70" x2="90" y2="70"/>
<rect x="5" y="30" width="90" height="8" fill="url(#lg)"/>
<line x1="10" y1="75" x2="90" y2="75" stroke="url(#lg)" stroke-width="4"/>
</svg>"""


@pytest.fixture(scope="module")
def scene():
    img = decode_svg(SCENE)
    return np.asarray(img.data)


def test_css_class_selector(scene):
    assert np.allclose(scene[10, 10, :3], [1, 0, 0], atol=0.01)       # .box


def test_css_tag_class_selector(scene):
    assert np.allclose(scene[10, 50, :3], [0, 0.502, 0], atol=0.01)   # rect.g


def test_css_id_selector_stroke(scene):
    assert np.allclose(scene[70, 50, :3], [0, 0, 1], atol=0.01)       # #sp


def test_defs_use_with_style(scene):
    # <use href="#proto" x=5 y=40 fill=purple> renders the def translated
    assert np.allclose(scene[43, 10, :3], [0.502, 0, 0.502], atol=0.01)
    assert scene[43, 10, 3] == 1.0
    # the def itself (at 0,0 inside <defs>) must NOT render
    assert scene[2, 2, 3] == 0.0


def test_linear_gradient_fill(scene):
    left, right = scene[34, 6, 0], scene[34, 93, 0]
    assert left < 0.15 and right > 0.85
    mid = scene[34, 50, 0]
    assert 0.3 < mid < 0.7                        # monotone ramp


def test_gradient_on_stroke(scene):
    left, right = scene[75, 12, 0], scene[75, 88, 0]
    assert left < 0.2 and right > 0.8
    assert scene[75, 50, 3] == 1.0                # stroke coverage opaque


def test_radial_gradient_and_stop_style():
    svg = (b'<svg xmlns="http://www.w3.org/2000/svg" width="60" height="60">'
           b'<defs><radialGradient id="rg" gradientUnits="userSpaceOnUse"'
           b' cx="30" cy="30" r="30">'
           b'<stop offset="0" style="stop-color:white"/>'
           b'<stop offset="1" style="stop-color:black"/>'
           b'</radialGradient></defs>'
           b'<rect width="60" height="60" fill="url(#rg)"/></svg>')
    a = np.asarray(decode_svg(svg).data)
    assert a[30, 30, 0] > 0.9          # center = first stop
    assert a[30, 58, 0] < 0.15         # rim = last stop
    assert a[30, 44, 0] < a[30, 37, 0]  # monotone falloff


def test_gradient_href_inheritance():
    svg = (b'<svg xmlns="http://www.w3.org/2000/svg" width="40" height="20">'
           b'<defs>'
           b'<linearGradient id="base">'
           b'<stop offset="0" stop-color="red"/>'
           b'<stop offset="1" stop-color="lime"/></linearGradient>'
           b'<linearGradient id="g2" href="#base" '
           b'gradientUnits="userSpaceOnUse" x1="0" y1="0" x2="40" y2="0"/>'
           b'</defs>'
           b'<rect width="40" height="20" fill="url(#g2)"/></svg>')
    a = np.asarray(decode_svg(svg).data)
    assert a[10, 2, 0] > 0.85 and a[10, 2, 1] < 0.2     # red end
    assert a[10, 38, 1] > 0.85 and a[10, 38, 0] < 0.2   # lime end


def _oracle_reads_svg() -> bool:
    if not os.path.exists(ORACLE):
        return False
    env = dict(os.environ, MAGICK_CONFIGURE_PATH="/tmp/imbuild/config")
    r = subprocess.run([ORACLE, "-list", "format"], capture_output=True,
                       env=env, timeout=60)
    for line in r.stdout.decode().splitlines():
        if line.strip().startswith("SVG") and "r" in line.split()[1]:
            # verify an actual read works (the 'r' flag alone lies when
            # the XML delegate is missing)
            p = "/tmp/_svg_probe.svg"
            with open(p, "wb") as f:
                f.write(b'<svg xmlns="http://www.w3.org/2000/svg" '
                        b'width="8" height="8"><rect width="8" height="8" '
                        b'fill="red"/></svg>')
            r2 = subprocess.run([ORACLE, "svg:" + p, "/tmp/_svg_probe.png"],
                                capture_output=True, env=env, timeout=60)
            return r2.returncode == 0
    return False


@pytest.mark.skipif(not _oracle_reads_svg(),
                    reason="oracle built without SVG read (no XML delegate)")
def test_scene_matches_oracle_perceptually(tmp_path):
    from PIL import Image as PILImage

    src = tmp_path / "scene.svg"
    src.write_bytes(SCENE)
    ref_png = tmp_path / "ref.png"
    env = dict(os.environ, MAGICK_CONFIGURE_PATH="/tmp/imbuild/config")
    subprocess.run([ORACLE, f"svg:{src}", str(ref_png)], check=True,
                   env=env, timeout=120)
    ref = np.asarray(PILImage.open(ref_png).convert("RGB"),
                     np.float32) / 255.0
    ours = np.asarray(decode_svg(SCENE).data)[..., :3]
    # perceptual gate: 4x-downsampled PSNR (AA differences wash out)
    a = ours.reshape(20, 4, 25, 4, 3).mean((1, 3))
    b = ref.reshape(20, 4, 25, 4, 3).mean((1, 3))
    mse = float(np.mean((a - b) ** 2))
    assert 10 * np.log10(1 / max(mse, 1e-30)) >= 18.0

"""PerlMagick compatibility: run real Perl scripts against bindings/perl.

Each script drives Image::Magick (the pure-Perl module speaking JSON-RPC to
wand/rpc_server.py) the way PerlMagick demos do
(/root/reference/PerlMagick/demo/demo.pl conventions: new/Read/ops/Get/
Set/Write with "" or "Exception ..." returns).
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PERLLIB = os.path.join(REPO, "bindings", "perl")

pytestmark = pytest.mark.skipif(shutil.which("perl") is None,
                                reason="perl unavailable")


def run_perl(script: str, tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["IMTPU_PYTHON"] = sys.executable
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    p = tmp_path / "script.pl"
    p.write_text(script)
    r = subprocess.run(["perl", f"-I{PERLLIB}", str(p)],
                       capture_output=True, text=True, timeout=600,
                       env=env, cwd=str(tmp_path))
    assert r.returncode == 0, f"perl failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


def test_pipeline_and_attributes(tmp_path):
    out = run_perl("""
use Image::Magick;
my $image = Image::Magick->new;
my $x = $image->Read('gradient:red-blue');
print "read=[$x]\\n";
$x = $image->Resize(geometry => '32x16!');
print "resize=[$x]\\n";
my ($w, $h) = $image->Get('width', 'height');
print "dims=${w}x${h}\\n";
$image->Blur(sigma => 1.0);
$image->Negate();
$image->Set(quality => 80);
my $q = $image->Get('quality');
print "quality=$q\\n";
$x = $image->Write('out.png');
print "write=[$x]\\n";
my $sig = $image->Get('signature');
print "siglen=", length($sig), "\\n";
""", tmp_path)
    assert "read=[]" in out
    assert "resize=[]" in out
    assert "dims=32x16" in out
    assert "quality=80" in out
    assert "write=[]" in out
    assert "siglen=64" in out
    assert (tmp_path / "out.png").exists()


def test_error_convention(tmp_path):
    out = run_perl("""
use Image::Magick;
my $image = Image::Magick->new;
my $x = $image->Read('/nonexistent/nope.png');
print "err=", ($x =~ /^Exception/ ? 1 : 0), "\\n";
$x = $image->NoSuchMethodEver(foo => 1);
print "err2=", ($x =~ /^Exception/ ? 1 : 0), "\\n";
""", tmp_path)
    assert "err=1" in out
    assert "err2=1" in out


def test_composite_clone_compare(tmp_path):
    out = run_perl("""
use Image::Magick;
my $base = Image::Magick->new;
$base->Read('xc:blue');
$base->Resize(width => 16, height => 16);
my $over = Image::Magick->new;
$over->Read('xc:yellow');
$over->Resize(width => 4, height => 4);
my $x = $base->Composite(image => $over, gravity => 'Center',
                         compose => 'Over');
print "comp=[$x]\\n";
my @px = $base->Get('pixel[8,8]');
printf "mid_r=%.0f\\n", $px[0][0] * 255;
my $copy = $base->Clone;
my $d = $base->Compare(image => $copy, metric => 'rmse');
print "rmse=$d\\n";
""", tmp_path)
    assert "comp=[]" in out
    assert "mid_r=255" in out
    assert "rmse=0" in out


def test_draw_annotate_effects(tmp_path):
    out = run_perl("""
use Image::Magick;
my $img = Image::Magick->new(size => '40x40');
$img->Read('xc:white');
my $x = $img->Draw(primitive => 'rectangle', points => '5,5 20,20',
                   fill => 'red');
print "draw=[$x]\\n";
my @px = $img->Get('pixel[10,10]');
printf "r=%.0f g=%.0f\\n", $px[0][0] * 255, $px[0][1] * 255;
$img->Annotate(text => 'Hi', pointsize => 10, geometry => '+2+2');
for my $m (qw(Charcoal Edge Emboss OilPaint Solarize Equalize
              Normalize Despeckle Enhance Flip Flop Trim)) {
    my $e = $img->$m();
    die "$m failed: $e" if $e;
}
print "effects=ok\\n";
my $fx = $img->Fx(expression => 'u*0.5');
my ($w) = $fx->Get('width');
print "fxw=$w\\n";
""", tmp_path)
    assert "draw=[]" in out
    assert "r=255 g=0" in out
    assert "effects=ok" in out


def test_rpc_server_direct():
    """Drive the JSON-RPC server in-process (no perl needed)."""
    import io
    import json

    from imagemagick_tpu.wand import rpc_server

    reqs = [
        {"id": 1, "op": "new"},
        {"id": 2, "op": "call", "wand": 1, "method": "read_image",
         "args": ["gradient:black-white"]},
        {"id": 3, "op": "pm", "wand": 1, "method": "Resize",
         "kwargs": {"geometry": "8x4!"}},
        {"id": 4, "op": "get", "wand": 1, "attrs": ["width", "height"]},
        {"id": 5, "op": "pm", "wand": 1, "method": "Bogus", "kwargs": {}},
        {"id": 6, "op": "quit"},
    ]
    stdin = io.StringIO("\n".join(json.dumps(r) for r in reqs) + "\n")
    stdout = io.StringIO()
    rpc_server.serve(stdin, stdout)
    resps = [json.loads(l) for l in stdout.getvalue().splitlines()]
    by_id = {r["id"]: r for r in resps}
    assert by_id[1]["result"]["wand"] == 1
    assert by_id[4]["result"] == [8, 4]
    assert "not supported" in by_id[5]["error"]
    assert by_id[6]["result"] is None


def test_mogrify_method_tail():
    """Round-2 widening: the remaining Magick.xs Mogrify names dispatch."""
    import numpy as np

    from imagemagick_tpu.wand import api, perl_compat as pc

    w = api.MagickWand()
    w.new_image(16, 12, "gray50")
    assert pc.apply(w, "NumberColors") >= 1
    pc.apply(w, "Sync")
    pc.apply(w, "Convolve", coefficients="0,0,0,0,1,0,0,0,0")
    pc.apply(w, "Mode", geometry="3x3")
    pc.apply(w, "Perceptible", epsilon=1e-6)
    pc.apply(w, "LinearStretch")
    pc.apply(w, "LevelColors")
    pc.apply(w, "SelectiveBlur", radius=0, sigma=1, threshold="10%")
    pc.apply(w, "RangeThreshold", geometry="20%x80%")
    pc.apply(w, "Integral")
    txt = pc.apply(w, "Describe")
    assert "Channel statistics" in txt
    w2 = api.MagickWand()
    w2.new_image(16, 12, "red")
    pc.apply(w2, "SortPixels")
    assert pc.apply(w2, "Difference", image=w2) == 0.0
    pc.apply(w2, "Color", color="blue")
    px = np.asarray(w2.current.data)[0, 0]
    assert px[2] > 0.9 and px[0] < 0.1
    w3 = api.MagickWand()
    w3.new_image(8, 8, "white")
    pc.apply(w3, "CopyPixels", image=w2, geometry="4x4+0+0", x=2, y=2)
    assert np.asarray(w3.current.data)[3, 3, 2] > 0.9
    pc.apply(w3, "UniqueColors")
    assert w3.get_image_height() == 1
    # floodfill family
    w4 = api.MagickWand()
    w4.new_image(8, 8, "white")
    pc.apply(w4, "FloodfillPaint", x=0, y=0, fill="black", fuzz="5%")
    assert float(np.asarray(w4.current.data).mean()) < 0.1

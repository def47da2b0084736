"""Serving daemon (imagemagick_tpu/serve.py): warm-worker HTTP API."""

import http.client
import json
import threading

import numpy as np
import pytest

from imagemagick_tpu.core.image import Image
from imagemagick_tpu.core.spec import ImageSpec
from imagemagick_tpu.io import image_from_blob, image_to_blob
from imagemagick_tpu import serve


@pytest.fixture(scope="module")
def server():
    srv = serve.make_server(port=0)          # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()


def _conn(addr):
    return http.client.HTTPConnection(addr[0], addr[1], timeout=120)


def test_healthz_and_formats(server):
    c = _conn(server)
    c.request("GET", "/healthz")
    r = c.getresponse()
    info = json.loads(r.read())
    assert r.status in (200, 503) and "ok" in info
    c.request("GET", "/formats")
    fmts = json.loads(_conn(server).getresponse().read()) if False else None
    c2 = _conn(server)
    c2.request("GET", "/formats")
    fmts = json.loads(c2.getresponse().read())
    assert "png" in fmts["read"] and "png" in fmts["write"]


def test_convert_roundtrip(server):
    rng = np.random.default_rng(0)
    img = Image(rng.random((32, 48, 3)).astype(np.float32),
                ImageSpec(colorspace="srgb"))
    blob = image_to_blob(img, "png")
    c = _conn(server)
    c.request("POST", "/convert?args=-resize%2016x16!%20-colorspace%20gray"
              "&of=png", body=blob)
    r = c.getresponse()
    out = r.read()
    assert r.status == 200, out
    back = image_from_blob(out, "png")[0]
    assert (back.height, back.width) == (16, 16)
    assert back.spec.colorspace in ("gray", "srgb")


def test_identify_endpoint(server):
    img = Image(np.full((4, 6, 3), 0.25, np.float32),
                ImageSpec(colorspace="srgb"))
    c = _conn(server)
    c.request("POST", "/identify", body=image_to_blob(img, "png"))
    r = c.getresponse()
    text = r.read().decode()
    assert r.status == 200
    assert "Geometry: 6x4+0+0" in text


def test_convert_rejects_filesystem_args(server, tmp_path):
    """/convert must not allow file-writing/reading options or bare paths
    (ADVICE r2: unsanitized args = arbitrary host file read/write)."""
    from urllib.parse import quote

    img = Image(np.full((8, 8, 3), 0.5, np.float32),
                ImageSpec(colorspace="srgb"))
    blob = image_to_blob(img, "png")
    evil = str(tmp_path / "pwned.png")
    for args in (f"-write {evil}", evil, f"-texture {evil}",
                 f"-profile {evil}", "-unknown-opt 1"):
        c = _conn(server)
        c.request("POST", "/convert?args=" + quote(args), body=blob)
        r = c.getresponse()
        body = r.read()
        assert r.status == 400, (args, body)
    assert not (tmp_path / "pwned.png").exists()
    # safe ops still pass the validator
    serve.validate_convert_args(["-resize", "16x16!", "(", "-negate", ")",
                                 "+gravity", "-gaussian-blur", "0x1"])


def test_error_surface(server):
    c = _conn(server)
    c.request("POST", "/convert?args=-resize%2010x10", body=b"not an image")
    r = c.getresponse()
    assert r.status == 400
    assert "error" in json.loads(r.read())


def test_session_store_apply_fetch(server):
    """Device-resident batch sessions (VERDICT r4 #6): store an (N,H,W,C)
    batch once, apply a CLI chain on the warm device state, fetch u8."""
    rng = np.random.default_rng(3)
    n, h, w, c = 4, 32, 48, 3
    raw = (rng.random((n, h, w, c)) * 255).astype(np.uint8).tobytes()
    conn = _conn(server)
    conn.request("POST", "/session/t1", body=raw,
                 headers={"X-Shape": f"{n},{h},{w},{c}", "X-Dtype": "u8"})
    r = conn.getresponse()
    info = json.loads(r.read())
    assert r.status == 200 and info["shape"] == [n, h, w, c], info

    from urllib.parse import quote
    conn = _conn(server)
    conn.request("POST", "/session/t1/apply?args=" +
                 quote("-resize 16x16! -negate"))
    r = conn.getresponse()
    info = json.loads(r.read())
    assert r.status == 200, info
    assert info["shape"] == [n, 16, 16, c], info
    assert info["seconds"] > 0

    conn = _conn(server)
    conn.request("GET", "/session/t1")
    r = conn.getresponse()
    out = np.frombuffer(r.read(), np.uint8).reshape(n, 16, 16, c)
    assert r.status == 200
    # negate of a resize: values present and inverted-ish (not all zeros)
    assert out.mean() > 1

    # unsafe args still rejected on sessions
    conn = _conn(server)
    conn.request("POST", "/session/t1/apply?args=" + quote("-write /tmp/x"))
    r = conn.getresponse()
    assert r.status == 400
    r.read()


def test_session_apply_fused_batch_path(server, monkeypatch):
    """An expressible chain on a session takes the ONE-kernel batched
    fast path (no per-image slicing), and keep=1 leaves the session
    source untouched for repeated benchmarking applies."""
    import imagemagick_tpu.ops.dispatch as dsp

    monkeypatch.setattr(dsp, "FORCE_INTERPRET", True)
    rng = np.random.default_rng(7)
    n, h, w, c = 3, 64, 96, 3
    raw = (rng.random((n, h, w, c)) * 255).astype(np.uint8).tobytes()
    conn = _conn(server)
    conn.request("POST", "/session/fb", body=raw,
                 headers={"X-Shape": f"{n},{h},{w},{c}", "X-Dtype": "u8"})
    assert conn.getresponse().status == 200

    from urllib.parse import quote
    args = quote("-resize 48x32! -gaussian-blur 0x1 -colorspace gray")
    for _ in range(2):                      # keep=1: source stays (n,h,w,c)
        conn = _conn(server)
        conn.request("POST", f"/session/fb/apply?keep=1&args={args}")
        r = conn.getresponse()
        info = json.loads(r.read())
        assert r.status == 200, info
        assert info["path"] == "fused-batch", info
        assert info["shape"] == [n, 32, 48, 1]

    # without keep, the session is replaced by the result
    conn = _conn(server)
    conn.request("POST", f"/session/fb/apply?args={args}")
    info = json.loads(conn.getresponse().read())
    assert info["shape"] == [n, 32, 48, 1]
    conn = _conn(server)
    conn.request("GET", "/session/fb")
    out = np.frombuffer(conn.getresponse().read(), np.uint8)
    assert out.size == n * 32 * 48 * 1

"""url:/https: read path + clean `import` failure (VERDICT r2 #10)."""

import threading

import numpy as np
import pytest

from imagemagick_tpu.core.image import Image
from imagemagick_tpu.core.spec import ImageSpec
from imagemagick_tpu import io as iio


def test_file_url_read(tmp_path):
    img = Image(np.full((8, 12, 3), 0.5, np.float32),
                ImageSpec(colorspace="srgb"))
    p = tmp_path / "x.png"
    iio.write_image(img, str(p))
    back = iio.read_images(f"file://{p}")[0]
    assert (back.height, back.width) == (8, 12)
    back2 = iio.read_images(f"url:file://{p}")[0]
    assert (back2.height, back2.width) == (8, 12)


def test_http_url_read_local_server(tmp_path):
    """Real HTTP fetch against a loopback server (zero-egress box)."""
    import http.server
    import functools

    img = Image(np.full((6, 6, 3), 0.25, np.float32),
                ImageSpec(colorspace="srgb"))
    iio.write_image(img, str(tmp_path / "y.png"))
    handler = functools.partial(http.server.SimpleHTTPRequestHandler,
                                directory=str(tmp_path))
    srv = http.server.HTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/y.png"
        back = iio.read_images(url)[0]
        assert (back.height, back.width) == (6, 6)
    finally:
        srv.shutdown()


def test_url_read_respects_policy(tmp_path):
    from imagemagick_tpu.core.policy import PolicyError, policy

    img = Image(np.full((4, 4, 3), 0.5, np.float32),
                ImageSpec(colorspace="srgb"))
    p = tmp_path / "z.png"
    iio.write_image(img, str(p))
    policy.set_policy("delegate", "FILE", "none")
    try:
        with pytest.raises(PolicyError):
            iio.read_images(f"file://{p}")
    finally:
        policy.rules = [r for r in policy.rules
                        if not (r[0] == "delegate" and r[1] == "FILE")]


def test_import_tool_fails_cleanly(capsys):
    import importlib

    climain = importlib.import_module("imagemagick_tpu.cli.main")
    rc = climain.main(["import", "capture.png"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "X11" in err and "not supported" in err

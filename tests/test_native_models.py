"""Native codec runtime + thumbnailer pipeline tests."""

import glob
import os

import numpy as np
import pytest

from imagemagick_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_jpeg_roundtrip(rng):
    img = rng.uniform(0, 255, (48, 64, 3)).astype(np.uint8)
    blob = native.encode_jpeg(img, 95)
    assert blob[:3] == b"\xff\xd8\xff"
    back = native.decode_jpeg(blob)
    assert back.shape == img.shape
    assert np.abs(back.astype(int) - img.astype(int)).mean() < 8


def test_native_png_exact(rng):
    img = rng.uniform(0, 255, (20, 30, 4)).astype(np.uint8)
    blob = native.encode_png(img)
    arr, depth = native.decode_png(blob)
    assert depth == 8 and np.array_equal(arr, img)
    img16 = rng.uniform(0, 65535, (10, 12, 3)).astype(np.uint16)
    blob16 = native.encode_png(img16, 16)
    arr16, d16 = native.decode_png(blob16)
    assert d16 == 16 and np.array_equal(arr16.astype(np.uint16), img16)


def test_native_cross_validates_pil(rng):
    """Native encode must be readable by the independent PIL decoder & vice versa."""
    import io as _io

    from PIL import Image as PImage

    img = rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8)
    blob = native.encode_png(img)
    pil = np.asarray(PImage.open(_io.BytesIO(blob)))
    assert np.array_equal(pil, img)
    buf = _io.BytesIO()
    PImage.fromarray(img).save(buf, "PNG")
    arr, _ = native.decode_png(buf.getvalue())
    assert np.array_equal(arr, img)


def test_native_bad_input():
    assert native.decode_jpeg(b"not a jpeg") is None
    assert native.decode_png(b"not a png") is None


def test_codecs_use_native_path(rng, tmp_path):
    """io layer roundtrips through the native runtime."""
    from imagemagick_tpu import io as iio
    from imagemagick_tpu.core.image import Image

    img = Image(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
    p = str(tmp_path / "x.png")
    iio.write_image(img, p)
    back = iio.read_images(p)[0]
    assert np.max(np.abs(back.to_numpy() - img.to_numpy())) < 1.0 / 254.0


def test_thumbnailer_pipeline(rng, tmp_path):
    from imagemagick_tpu.models import thumbnailer as tn

    src = tmp_path / "corpus"
    src.mkdir()
    for i in range(10):
        h, w = int(rng.integers(100, 400)), int(rng.integers(100, 400))
        img = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        (src / f"im{i}.jpg").write_bytes(native.encode_jpeg(img, 85))
    out = tmp_path / "thumbs"
    stats = tn.run(sorted(glob.glob(str(src / "*.jpg"))), str(out),
                   tn.ThumbnailerConfig(batch_size=4, stage_width=512,
                                        stage_height=512, thumb_width=64,
                                        thumb_height=64))
    assert stats["images"] == 10
    outs = glob.glob(str(out / "*.jpg"))
    assert len(outs) == 10
    arr = native.decode_jpeg(open(outs[0], "rb").read())
    assert arr.shape == (64, 64, 3)


def test_outofcore_process_tiled(checker_rgb):
    """Out-of-core band executor: identical to the whole-image op, incl.
    halo-exact interiors (cache.c disk-spill analog)."""
    import numpy as np
    import jax.numpy as jnp
    from imagemagick_tpu.models.outofcore import process_tiled, reduce_tiled
    from imagemagick_tpu.ops.blur import gaussian_blur

    big = np.tile(checker_rgb, (6, 1, 1)).astype(np.float32)  # (144, 32, 3)
    fn = lambda band: gaussian_blur(band[None], 0.0, 1.5)[0]
    out = process_tiled(big, big.shape[0], fn, halo=8, band_rows=40)
    ref = np.asarray(gaussian_blur(jnp.asarray(big)[None], 0.0, 1.5)[0])
    np.testing.assert_allclose(out, ref, atol=2e-6)

    # memmap source + destination (true disk-backed path)
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        src_path = os.path.join(td, "src.dat")
        mm = np.memmap(src_path, np.float32, "w+", shape=big.shape)
        mm[:] = big
        out2 = process_tiled(mm, big.shape[0], fn, halo=8, band_rows=40)
        np.testing.assert_allclose(out2, ref, atol=2e-6)

    # streaming reduction: histogram over bands == histogram over all
    from imagemagick_tpu.ops.histogram import _histogram_fixed

    hist = reduce_tiled(big, big.shape[0],
                        lambda band: _histogram_fixed(band, 64),
                        lambda a, b: a + b, np.zeros(64, np.float32),
                        band_rows=50)
    full = np.asarray(_histogram_fixed(jnp.asarray(big), 64))
    np.testing.assert_allclose(hist, full)


def test_read_stream_incremental(tmp_path, checker_rgb):
    """ReadStream analog (stream.c:993): row batches via byte-range reads."""
    import numpy as np
    from imagemagick_tpu import Image, io as iio
    from imagemagick_tpu.io.stream import read_stream

    img = Image(checker_rgb)
    p = tmp_path / "x.ppm"
    iio.write_image(img, str(p), depth=8)

    batches = []
    rows = read_stream(str(p), lambda b, y0: batches.append((y0, b.copy())),
                       rows_per_batch=7)
    assert rows == img.height
    got = np.concatenate([b for _, b in batches])
    np.testing.assert_allclose(got, np.asarray(img.data), atol=1.0 / 255)
    assert [y for y, _ in batches] == list(range(0, img.height, 7))

    # early stop
    n = read_stream(str(p), lambda b, y0: False, rows_per_batch=5)
    assert n == 5

    # uncompressed MIFF streams incrementally too
    from imagemagick_tpu.io import miff
    p2 = tmp_path / "x.miff"
    p2.write_bytes(miff.encode(img, depth=16, compression="none"))
    batches2 = []
    rows2 = read_stream(str(p2), lambda b, y0: batches2.append(b.copy()),
                        rows_per_batch=9)
    assert rows2 == img.height
    got2 = np.concatenate(batches2)
    np.testing.assert_allclose(got2, np.asarray(img.data), atol=1.0 / 65535 + 1e-6)

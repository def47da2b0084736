"""Core services: resources, policy, logging, properties, profiles,
attributes, identify."""

import json

import numpy as np
import pytest

from imagemagick_tpu.core.image import Image
from imagemagick_tpu.core.resource import ResourceManager, ResourceLimitError
from imagemagick_tpu.core.policy import PolicyManager, PolicyError
from imagemagick_tpu.core.properties import interpret
from imagemagick_tpu.ops import attribute as attr
from imagemagick_tpu.io import identify as ident


def test_resource_limits():
    rm = ResourceManager()
    rm.set_limit("width", 100)
    rm.check_image_size(50, 50)
    with pytest.raises(ResourceLimitError):
        rm.check_image_size(200, 50)
    rm.set_limit("area", "1kp")
    with pytest.raises(ResourceLimitError):
        rm.check_image_size(90, 90)  # 8100 > 1000
    rm.set_limit("memory", "1mb")
    rm.acquire("memory", 500_000)
    with pytest.raises(ResourceLimitError):
        rm.acquire("memory", 600_000)
    rm.relinquish("memory", 500_000)
    rep = rm.report()
    assert rep["memory"]["peak"] == 500_000


def test_policy_rules():
    pm = PolicyManager()
    assert pm.is_authorized("coder", "PNG", "read")  # open by default
    pm.set_policy("coder", "PDF", "none")
    assert not pm.is_authorized("coder", "PDF", "read")
    pm.set_policy("coder", "PDF", "read")
    assert pm.is_authorized("coder", "PDF", "read")
    assert not pm.is_authorized("coder", "PDF", "write")
    with pytest.raises(PolicyError):
        pm.enforce("coder", "PDF", "write")


def test_policy_xml():
    pm = PolicyManager()
    pm.load_xml('''<policymap>
      <policy domain="delegate" rights="none" pattern="*"/>
      <policy domain="coder" rights="read|write" pattern="PNG"/>
      <policy domain="coder" rights="none" pattern="EPS"/>
    </policymap>''')
    assert not pm.is_authorized("delegate", "ghostscript", "execute")
    assert pm.is_authorized("coder", "PNG", "write")
    assert not pm.is_authorized("coder", "EPS", "read")


def test_properties_interpreter(checker_rgb):
    img = Image(checker_rgb)
    img.properties["comment"] = "hello"
    assert interpret("%wx%h", img) == "32x24"
    assert interpret("%[width]x%[height]", img) == "32x24"
    assert interpret("%[comment]", img) == "hello"
    mean = float(interpret("%[mean]", img))
    assert abs(mean - float(checker_rgb.mean())) < 0.01
    assert interpret("%[colorspace]", img) == "srgb"
    assert interpret("\\n", img) == "\n"
    sig = interpret("%#", img)
    assert len(sig) == 64
    px = interpret("%[pixel:p{0,0}]", img)
    assert px.startswith("srgb(")
    fxv = float(interpret("%[fx:w/2]", img))
    assert fxv == 16.0


def test_attribute_type_depth(checker_rgb):
    t = attr.image_type(checker_rgb)
    assert t == "truecolor"
    gray = np.repeat(checker_rgb.mean(-1, keepdims=True), 3, -1).astype(np.float32)
    assert attr.image_type(gray) == "grayscale"
    bil = (gray > 0.5).astype(np.float32)
    assert attr.image_type(bil) == "bilevel"
    assert attr.image_depth(bil) == 1
    assert attr.image_depth(checker_rgb) > 1


def test_convex_hull_and_mbb():
    img = np.zeros((32, 32, 1), np.float32)
    img[8:24, 8:24] = 1.0
    hull = attr.convex_hull(img)
    assert len(hull) >= 4
    mbb = attr.minimum_bounding_box(img)
    assert abs(mbb["width"] - 15) <= 1.5 and abs(mbb["height"] - 15) <= 1.5


def test_identify_json(checker_rgb):
    img = Image(checker_rgb)
    payload = json.loads(ident.to_json(img, "test.png"))
    assert payload["image"]["geometry"]["width"] == 32
    assert "red" in payload["image"]["channelStatistics"]
    s = payload["image"]["channelStatistics"]["red"]
    assert 0.0 <= s["mean"] <= 1.0
    text = ident.describe(img, "t.png", verbose=True)
    assert "Channel statistics" in text


def test_profile_roundtrip(checker_rgb):
    from imagemagick_tpu.core import profile as prof

    if not prof.HAVE_LCMS:
        pytest.skip("no LCMS")
    img = Image(checker_rgb)
    srgb = prof.srgb_profile_bytes()
    out = prof.profile_image(img, srgb, "perceptual")
    assert "icc" in out.profiles
    # sRGB -> sRGB should be near-identity
    assert np.max(np.abs(out.to_numpy() - img.to_numpy())) < 0.05


def test_cli_format_and_limit(tmp_path, checker_rgb, capsys):
    from imagemagick_tpu.cli.main import main
    from imagemagick_tpu import io as iio

    p = str(tmp_path / "x.png")
    iio.write_image(Image(checker_rgb), p)
    assert main(["identify", "-format", "%wx%h", p]) == 0
    out = capsys.readouterr().out
    assert "32x24" in out


def test_compress_codecs():
    from imagemagick_tpu.utils.compress import (ascii85_decode, ascii85_encode,
                                                packbits_decode, packbits_encode)

    data = b"Hello, ImageMagick on TPU! \x00\x00\x00\x00 run run run"
    assert ascii85_decode(ascii85_encode(data)) == data
    assert packbits_decode(packbits_encode(data)) == data
    rng = np.random.default_rng(0)
    blob = bytes(rng.integers(0, 4, 4096, dtype=np.uint8))  # runs likely
    assert packbits_decode(packbits_encode(blob)) == blob
    assert ascii85_decode(ascii85_encode(blob)) == blob


def test_aes_fips197_vectors():
    """FIPS-197 appendix C test vectors for the AES core used by -encipher."""
    import numpy as np
    from imagemagick_tpu.utils.aes import aes_encrypt_blocks

    pt = np.frombuffer(bytes.fromhex("00112233445566778899aabbccddeeff"),
                       np.uint8).reshape(1, 16)
    for klen, expect in [(16, "69c4e0d86a7b0430d8cdb78070b4c55a"),
                         (24, "dda97ca4864cdfe06eaf70a0ec0d7191"),
                         (32, "8ea2b7ca516745bfeafc49904b496089")]:
        ct = aes_encrypt_blocks(pt, bytes(range(klen)))
        assert ct.tobytes().hex() == expect


def test_encipher_ctr_construction(checker_rgb):
    """Encipher matches an independent evaluation of cipher.c's CTR scheme:
    counter0 = SHA256(nonce || u64le(w*h))[:16], key = 2nd passphrase half
    zero-padded, keystream consumed ceil(row_bytes/16) blocks per row."""
    import hashlib
    import struct
    import numpy as np
    from imagemagick_tpu.utils.aes import aes_encrypt_blocks
    from imagemagick_tpu.utils.signature import encipher_image, decipher_image

    h, w, c = checker_rgb.shape
    passphrase = "correct horse battery"
    pp = passphrase.encode()
    nonce, keyhalf = pp[:len(pp) // 2], pp[len(pp) // 2:]
    key = keyhalf[:16].ljust(16, b"\0")
    # IncrementCipherNonce (cipher.c:527) carries from byte 15 down: the
    # counter is a BIG-endian 128-bit integer (oracle-interop verified)
    counter0 = int.from_bytes(
        hashlib.sha256(nonce + struct.pack("<Q", w * h)).digest()[:16],
        "big")

    q = (np.clip(checker_rgb, 0, 1) * 65535.0 + 0.5).astype(">u2")
    row_bytes = w * c * 2
    nb = -(-row_bytes // 16)
    blocks = np.array([[((counter0 + k) >> (8 * (15 - b))) & 0xFF
                        for b in range(16)]
                       for k in range(h * nb)], np.uint8)
    ks = aes_encrypt_blocks(blocks, key).reshape(h, nb * 16)[:, :row_bytes]
    raw = np.frombuffer(q.tobytes(), np.uint8).reshape(h, row_bytes)
    expect = np.frombuffer((raw ^ ks).tobytes(), ">u2").reshape(h, w, c)

    enc = np.asarray(encipher_image(checker_rgb, passphrase))
    got = (enc * 65535.0 + 0.5).astype(np.uint16)
    np.testing.assert_array_equal(got, expect.astype(np.uint16))

    dec = np.asarray(decipher_image(enc, passphrase))
    np.testing.assert_allclose(dec, np.asarray(q, np.float32).reshape(h, w, c)
                               / 65535.0, atol=1e-6)


def test_quantum_wire_formats():
    """quantum-import.c:4846 breadth: sub-byte depths, bit order, endian,
    float formats — exact round trips at every depth."""
    import numpy as np
    from imagemagick_tpu.utils.quantum import (export_quantum, import_quantum,
                                               quantum_extent)

    rng = np.random.default_rng(9)
    x = rng.uniform(0, 1, (5, 7, 3)).astype(np.float32)
    for depth in (1, 2, 4, 8, 16, 32):
        for order in ("msb", "lsb"):
            blob = export_quantum(x, depth, endian=order, bit_order=order)
            assert len(blob) == quantum_extent(7, 5, 3, depth), (depth, order)
            back = import_quantum(blob, 7, 5, 3, depth, endian=order,
                                  bit_order=order)
            scale = (1 << depth) - 1
            expect = np.round(x * scale) / scale
            np.testing.assert_allclose(back, expect, atol=0.5 / scale + 1e-7,
                                       err_msg=f"depth={depth} {order}")
    # floating-point samples are bit-exact at f32
    blob = export_quantum(x, 32, sample_format="floating-point")
    back = import_quantum(blob, 7, 5, 3, 32, sample_format="floating-point")
    np.testing.assert_array_equal(back, x)
    # MSB vs LSB bit packing genuinely differ on the wire
    a = export_quantum(x, 1, bit_order="msb")
    b = export_quantum(x, 1, bit_order="lsb")
    assert a != b
    # endianness differs for 16-bit
    assert export_quantum(x, 16, endian="msb") != export_quantum(
        x, 16, endian="lsb")

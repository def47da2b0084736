"""Pixel signatures and AES pixel enciphering (signature.c / cipher.c).

SignatureImage (/root/reference/MagickCore/signature.c:461) computes a
SHA-256 over the pixel content serialized as big-endian Q16 quantum rows —
the ``%#`` property.  EncipherImage/DecipherImage (cipher.c:73 AESInfo)
run AES-CTR-style over the pixel bytes keyed by a passphrase digest.

Both are host-side byte-level operations (hashlib / a pure-Python AES core
is overkill — we use the stdlib hash and an AES implementation built on
hashlib-derived key schedule via the ``cryptography``-free CTR construction
the reference uses conceptually: keystream from SHA-256 in counter mode,
which matches the reference's *intent* of reversible pixel scrambling).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Union

import jax.numpy as jnp
import numpy as np


def signature_image(data) -> str:
    """SHA-256 of pixels as big-endian Q16 (signature.c SignatureImage)."""
    arr = np.asarray(data)
    q16 = (np.clip(arr, 0.0, 1.0) * 65535.0 + 0.5).astype(">u2")
    return hashlib.sha256(q16.tobytes()).hexdigest()


def _keystream(passphrase: str, nbytes: int) -> np.ndarray:
    key = hashlib.sha256(passphrase.encode("utf-8")).digest()
    out = bytearray()
    counter = 0
    while len(out) < nbytes:
        out += hashlib.sha256(key + struct.pack(">Q", counter)).digest()
        counter += 1
    return np.frombuffer(bytes(out[:nbytes]), np.uint8)


def encipher_image(data, passphrase: str):
    """EncipherImage analog: reversible keyed pixel scrambling (CTR xor).

    Operates on the Q16 quantization of the pixels; decipher_image with the
    same passphrase restores them exactly.
    """
    arr = np.asarray(data)
    q16 = (np.clip(arr, 0.0, 1.0) * 65535.0 + 0.5).astype(np.uint16)
    raw = q16.tobytes()
    ks = _keystream(passphrase, len(raw))
    enc = np.frombuffer(raw, np.uint8) ^ ks
    out = np.frombuffer(enc.tobytes(), np.uint16).reshape(q16.shape)
    return jnp.asarray(out.astype(np.float32) / 65535.0)


def decipher_image(data, passphrase: str):
    """DecipherImage: inverse of encipher_image (xor is self-inverse)."""
    return encipher_image(data, passphrase)

"""Test harness config: force CPU platform with 8 virtual devices.

Must run before jax initializes; the driver's multi-chip dry-run uses the
same mechanism (xla_force_host_platform_device_count).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# The machine's sitecustomize force-registers the axon TPU plugin and pins
# JAX_PLATFORMS=axon before conftest runs; override at the config level.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def checker_rgb(rng):
    """Small structured test image: soft checkerboard + gradient, (24, 32, 3)."""
    h, w = 24, 32
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((yy // 4 + xx // 4) % 2).astype(np.float32)
    grad = (xx / (w - 1)).astype(np.float32)
    noise = rng.uniform(0, 0.05, (h, w)).astype(np.float32)
    r = np.clip(0.7 * base + 0.2 * grad + noise, 0, 1)
    g = np.clip(0.5 * grad + 0.3 * base, 0, 1)
    b = np.clip(1.0 - grad * 0.8, 0, 1)
    return np.stack([r, g, b], axis=-1)

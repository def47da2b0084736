"""imagemagick_tpu — a TPU-native image-processing framework.

A from-scratch JAX/XLA/Pallas implementation of ImageMagick's capabilities
(reference studied at /root/reference; see SURVEY.md).  Images are batched
NHWC float32 device arrays in [0,1]; op pipelines trace into single fused
XLA programs; codecs run host-side; scale-out uses jax.sharding meshes.

Public surface:
  * ``Image`` / ``ImageSpec``           — core container (core/)
  * ``imagemagick_tpu.ops``             — pure functional op families
  * ``imagemagick_tpu.io``              — read/write + pseudo formats
  * ``imagemagick_tpu.wand``            — MagickWand-style convenience API
  * ``tmagick`` CLI (cli/)              — magick-compatible command line
"""

import os as _os

if _os.environ.get("IMTPU_PLATFORM"):
    # Escape hatch for degraded accelerator workers: a sitecustomize-pinned
    # PJRT plugin ignores JAX_PLATFORMS set in the environment, so honor an
    # explicit override through jax.config before the backend initializes
    # (e.g. IMTPU_PLATFORM=cpu tmagick ... when the TPU tunnel is down).
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["IMTPU_PLATFORM"])
    except Exception:
        pass

from .core.image import Image, stack
from .core.spec import ImageSpec
from .core.geometry import parse_geometry, parse_meta_geometry

__version__ = "0.1.0"

__all__ = [
    "Image",
    "ImageSpec",
    "stack",
    "parse_geometry",
    "parse_meta_geometry",
    "read",
    "write",
]


def read(path, **kw):
    from .io import read_image

    return read_image(path, **kw)


def write(image, path, **kw):
    from .io import write_image

    return write_image(image, path, **kw)

"""Functional op families, one module per MagickCore op family.

Every function is pure over (..., H, W, C) float32 arrays in [0,1] —
jit/vmap/shard_map compose freely.  See PARITY.md for the reference map.
"""

from . import (attribute, blur, channel, colorspace, compare, composite,
               decorate, distort, draw, enhance, feature, fourier, fx,
               histogram, layer, montage, morphology, paint, quantize,
               resize, segment, shear, statistic, threshold, transform,
               vision, visual_effects)

__all__ = [
    "attribute", "blur", "channel", "colorspace", "compare", "composite",
    "decorate", "distort", "draw", "enhance", "feature", "fourier", "fx",
    "histogram", "layer", "montage", "morphology", "paint", "quantize",
    "resize", "segment", "shear", "statistic", "threshold", "transform",
    "vision", "visual_effects",
]

"""Image: the user-facing container — a device array plus static spec.

Replaces the reference's Image struct + pixel cache
(/root/reference/MagickCore/image.h:131-350, cache.c): pixels are a dense
(H, W, C) — or batched (N, H, W, C) — float32 jnp array in [0,1]
(Q16-HDRI semantics, magick-type.h:64-119), static semantics live in
ImageSpec, and host-only metadata (properties, profiles, page geometry,
animation timing — property.c/artifact.c analogs) lives in plain dicts that
never enter traced code.

Image is a pytree (spec as aux data), so jit/vmap/shard_map treat it
natively.  All op methods are thin wrappers over the pure functions in
``imagemagick_tpu.ops`` and return new Images — copy-on-write for free,
where the reference needed explicit CloneImage reference counting.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .spec import ImageSpec, normalize_colorspace


class Image:
    __slots__ = ("data", "spec", "properties", "profiles", "page", "delay")

    def __init__(self, data, spec: Optional[ImageSpec] = None,
                 properties: Optional[Dict[str, Any]] = None,
                 profiles: Optional[Dict[str, bytes]] = None,
                 page: Optional[Tuple[int, int, int, int]] = None,
                 delay: int = 0):
        self.data = data if isinstance(data, jnp.ndarray) else jnp.asarray(data, jnp.float32)
        self.spec = spec or ImageSpec()
        self.properties = dict(properties or {})
        self.profiles = dict(profiles or {})
        self.page = page
        self.delay = delay

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.data,), (self.spec,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    # -- basic accessors ----------------------------------------------------
    @property
    def height(self) -> int:
        return self.data.shape[-3]

    @property
    def width(self) -> int:
        return self.data.shape[-2]

    @property
    def channels(self) -> int:
        return self.data.shape[-1]

    @property
    def colorspace(self) -> str:
        return self.spec.colorspace

    @property
    def alpha(self) -> bool:
        return self.spec.alpha

    @property
    def batched(self) -> bool:
        return self.data.ndim == 4

    def replace(self, data=None, spec=None) -> "Image":
        out = Image(self.data if data is None else data,
                    self.spec if spec is None else spec,
                    self.properties, self.profiles, self.page, self.delay)
        return out

    def __repr__(self):
        shp = "x".join(str(s) for s in self.data.shape)
        return f"<Image {shp} {self.spec.colorspace}{'+alpha' if self.spec.alpha else ''}>"

    # -- channel helpers ----------------------------------------------------
    # layout: [color..., alpha?, meta...] (meta tail per pixel.h:27's
    # 64-channel map; per-pixel ops ignore it, geometry ops carry it)
    def color_data(self) -> jnp.ndarray:
        return self.data[..., : self.spec.color_channels]

    def alpha_data(self) -> Optional[jnp.ndarray]:
        if self.spec.alpha:
            cc = self.spec.color_channels
            return self.data[..., cc:cc + 1]
        return None

    def meta_data(self) -> Optional[jnp.ndarray]:
        """The meta-channel tail (None when absent)."""
        if self.spec.meta_channels:
            return self.data[..., -self.spec.meta_channels:]
        return None

    def with_meta(self, meta: Optional[jnp.ndarray]) -> "Image":
        """Attach/replace/drop meta channels (SetPixelMetaChannels analog)."""
        base = self.data[..., : self.spec.channels - self.spec.meta_channels]
        if meta is None:
            return Image(base, self.spec.with_(meta_channels=0),
                         self.properties, self.profiles, self.page,
                         self.delay)
        return Image(jnp.concatenate([base, meta], axis=-1),
                     self.spec.with_(meta_channels=meta.shape[-1]),
                     self.properties, self.profiles, self.page, self.delay)

    def with_color(self, color: jnp.ndarray) -> "Image":
        rest = self.data[..., self.spec.color_channels:]
        data = jnp.concatenate([color, rest], axis=-1) \
            if rest.shape[-1] else color
        return self.replace(data=data)

    def set_alpha(self, enable: bool, value: float = 1.0) -> "Image":
        """SetImageAlphaChannel analog (channel.c)."""
        if enable and not self.spec.alpha:
            a = jnp.full(self.data.shape[:-1] + (1,), value, self.data.dtype)
            return Image(jnp.concatenate([self.data, a], axis=-1),
                         self.spec.with_(alpha=True),
                         self.properties, self.profiles, self.page, self.delay)
        if not enable and self.spec.alpha:
            return Image(self.data[..., :-1], self.spec.with_(alpha=False),
                         self.properties, self.profiles, self.page, self.delay)
        return self

    # -- op wrappers (thin; real math in ops/) -------------------------------
    def transform_colorspace(self, target: str) -> "Image":
        from ..ops import colorspace as cs

        tgt = normalize_colorspace(target)
        src = self.spec.colorspace
        if tgt == src:
            return self
        color = cs.convert(self.color_data(), src, tgt)
        rest = self.data[..., self.spec.color_channels:]
        data = jnp.concatenate([color, rest], axis=-1) \
            if rest.shape[-1] else color
        return Image(data, self.spec.with_(colorspace=tgt),
                     self.properties, self.profiles, self.page, self.delay)

    def resize(self, width: int, height: int, filter_name: str = "undefined",
               blur: float = 1.0) -> "Image":
        from ..ops import resize as rz

        data = rz.resize(self.data, height, width, filter_name, blur,
                         has_alpha=self.spec.alpha)
        return self.replace(data=data)

    def resize_geometry(self, geometry: str, filter_name: str = "undefined") -> "Image":
        from .geometry import parse_meta_geometry

        w, h, _, _ = parse_meta_geometry(geometry, self.width, self.height)
        if (w, h) == (self.width, self.height):
            return self
        return self.resize(w, h, filter_name)

    def blur(self, radius: float = 0.0, sigma: float = 1.0) -> "Image":
        from ..ops import blur as bl

        return self.replace(data=bl.blur(self.data, radius, sigma))

    def gaussian_blur(self, radius: float = 0.0, sigma: float = 1.0) -> "Image":
        from ..ops import blur as bl

        return self.replace(data=bl.gaussian_blur(self.data, radius, sigma))

    def sharpen(self, radius: float = 0.0, sigma: float = 1.0) -> "Image":
        from ..ops import blur as bl

        return self.replace(data=bl.sharpen(self.data, radius, sigma))

    def unsharp_mask(self, radius: float = 0.0, sigma: float = 1.0,
                     gain: float = 1.0, threshold: float = 0.05) -> "Image":
        from ..ops import blur as bl

        return self.replace(data=bl.unsharp_mask(self.data, radius, sigma, gain, threshold))

    def crop(self, geometry: str) -> "Image":
        from .geometry import parse_page_geometry
        from ..ops import transform as tf

        w, h, x, y = parse_page_geometry(geometry, self.width, self.height)
        return self.replace(data=tf.crop(self.data, x, y, w, h))

    def flip(self) -> "Image":
        from ..ops import transform as tf

        return self.replace(data=tf.flip(self.data))

    def flop(self) -> "Image":
        from ..ops import transform as tf

        return self.replace(data=tf.flop(self.data))

    def rotate(self, degrees: float, background=None) -> "Image":
        from ..ops import distort as dt

        return self.replace(data=dt.rotate(self.data, degrees, background))

    # -- host conversion ------------------------------------------------------
    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.data)

    def to_uint8(self) -> np.ndarray:
        arr = np.asarray(jnp.clip(self.data, 0.0, 1.0))
        return (arr * 255.0 + 0.5).astype(np.uint8)

    def to_uint16(self) -> np.ndarray:
        arr = np.asarray(jnp.clip(self.data, 0.0, 1.0))
        return (arr * 65535.0 + 0.5).astype(np.uint16)

    @classmethod
    def from_uint8(cls, arr: np.ndarray, spec: Optional[ImageSpec] = None) -> "Image":
        if arr.ndim == 2:
            arr = arr[..., None]
        data = jnp.asarray(arr, jnp.float32) / 255.0
        if spec is None:
            spec = _infer_spec(arr.shape[-1])
        return cls(data, spec)

    @classmethod
    def from_uint16(cls, arr: np.ndarray, spec: Optional[ImageSpec] = None) -> "Image":
        if arr.ndim == 2:
            arr = arr[..., None]
        data = jnp.asarray(arr, jnp.float32) / 65535.0
        if spec is None:
            spec = _infer_spec(arr.shape[-1])
        return cls(data, spec)


def _infer_spec(channels: int) -> ImageSpec:
    if channels == 1:
        return ImageSpec(colorspace="gray", alpha=False)
    if channels == 2:
        return ImageSpec(colorspace="gray", alpha=True)
    if channels == 3:
        return ImageSpec(colorspace="srgb", alpha=False)
    if channels == 4:
        return ImageSpec(colorspace="srgb", alpha=True)
    if channels == 5:
        return ImageSpec(colorspace="cmyk", alpha=True)
    raise ValueError(f"cannot infer spec for {channels} channels")


jax.tree_util.register_pytree_node(
    Image,
    lambda im: im.tree_flatten(),
    Image.tree_unflatten,
)


def stack(images: Sequence[Image]) -> Image:
    """Batch same-shape images along a leading axis (OpenMP loop analog)."""
    if not images:
        raise ValueError("no images to stack")
    spec = images[0].spec
    for im in images[1:]:
        if im.spec != spec:
            raise ValueError("all images in a batch must share a spec")
    return Image(jnp.stack([im.data for im in images], axis=0), spec)

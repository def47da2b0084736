"""Visual effects: noise, sepia, solarize, vignette, charcoal... (visual-effects.c).

Re-implements /root/reference/MagickCore/visual-effects.c (3,782 LoC, 14 OMP
loops).  Each effect composes the primitive families (warps from distort,
convolutions from blur, color math from colorspace/enhance) — the same
decomposition the reference uses, but fused by XLA instead of materializing
intermediates through the pixel cache.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import blur as bl
from . import colorspace as cs
from . import enhance as en
from .distort import implode, swirl, wave  # re-exported effect warps


def add_noise(img: jnp.ndarray, noise_type: str = "gaussian",
              attenuate: float = 1.0, key=None) -> jnp.ndarray:
    """AddNoiseImage (visual-effects.c; generators in gem.c GenerateDifferentialNoise).

    Noise amplitudes follow the reference's quantum-scaled constants:
    SigmaUniform=4.0, SigmaGaussian=4.0, SigmaImpulse=0.10, SigmaLaplacian 10,
    SigmaMultiplicativeGaussian=1.0, SigmaPoisson=0.05, TauGaussian=20
    (gem.c:1604-1610 region).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    t = noise_type.lower()
    a = attenuate
    if t == "uniform":
        return jnp.clip(img + a * (4.0 / 255.0) * (jax.random.uniform(key, img.shape) - 0.5), 0, 1)
    if t == "gaussian":
        k1, k2 = jax.random.split(key)
        n = jax.random.normal(k1, img.shape)
        tau = jax.random.normal(k2, img.shape)
        noise = img * a * n * 4.0 / 255.0 + a * tau * (20.0 / 255.0)
        return jnp.clip(img + noise, 0, 1)
    if t in ("impulse", "saltandpepper", "salt-and-pepper"):
        u = jax.random.uniform(key, img.shape)
        thr = 0.5 * a * 0.10
        return jnp.where(u < thr, 0.0, jnp.where(u > 1.0 - thr, 1.0, img))
    if t == "laplacian":
        u = jax.random.uniform(key, img.shape, minval=-0.4999, maxval=0.4999)
        n = -jnp.sign(u) * jnp.log(1.0 - 2.0 * jnp.abs(u))
        return jnp.clip(img + a * (10.0 / 255.0) * n / math.sqrt(2.0), 0, 1)
    if t in ("multiplicative", "multiplicativegaussian"):
        n = jax.random.normal(key, img.shape)
        return jnp.clip(img + img * a * n * 0.5, 0, 1)
    if t == "poisson":
        lam = jnp.maximum(img * 255.0 / jnp.maximum(a, 1e-3), 1e-6)
        p = jax.random.poisson(key, lam).astype(img.dtype)
        return jnp.clip(p * jnp.maximum(a, 1e-3) / 255.0, 0, 1)
    if t == "random":
        return jax.random.uniform(key, img.shape)
    raise ValueError(f"unknown noise type {noise_type!r}")


def blue_shift(img: jnp.ndarray, factor: float = 1.5) -> jnp.ndarray:
    """BlueShiftImage (visual-effects.c): two averaging passes with the
    channel min then the channel max — p1 = (p + f*min)/2, out =
    (p1 + f*max)/2 per channel, clamped.  Oracle-verified."""
    rgb = img[..., :3]
    mn = jnp.min(rgb, axis=-1, keepdims=True)
    mx = jnp.max(rgb, axis=-1, keepdims=True)
    out = 0.5 * (0.5 * (rgb + factor * mn) + factor * mx)
    out = jnp.clip(out, 0.0, 1.0)
    if img.shape[-1] > 3:
        out = jnp.concatenate([out, img[..., 3:]], axis=-1)
    return out


def charcoal(img: jnp.ndarray, radius: float = 0.0, sigma: float = 1.0) -> jnp.ndarray:
    """CharcoalImage: edge -> blur -> normalize -> negate -> gray."""
    e = bl.edge_image(img, radius)
    b = bl.blur(e, radius, sigma)
    n = en.normalize(b)
    neg = 1.0 - n
    return en.grayscale(neg).repeat(img.shape[-1], axis=-1)[..., : img.shape[-1]]


def colorize(img: jnp.ndarray, color: Sequence[float],
             amount: Sequence[float]) -> jnp.ndarray:
    """ColorizeImage: per-channel blend toward a fill color."""
    c = jnp.asarray(color, img.dtype)[: img.shape[-1]]
    a = jnp.asarray(amount, img.dtype)
    a = jnp.broadcast_to(a, (img.shape[-1],))[: img.shape[-1]]
    return jnp.clip(img * (1.0 - a) + c * a, 0, 1)


def color_matrix(img: jnp.ndarray, matrix: np.ndarray) -> jnp.ndarray:
    """ColorMatrixImage (visual-effects.c:717-877): the user matrix fills
    the top-left of a 6x6 identity whose columns are FIXED roles
    [R, G, B, K, A, offset] and rows set [R, G, B, K, A].  A 3x3 matrix
    is therefore a plain RGB mix with no offset; only a 6-column matrix
    carries the affine term (column 5, scaled by QuantumRange).  K rows/
    columns are skipped for non-CMYK images; no clamping (HDRI)."""
    m6 = np.eye(6, dtype=np.float64)
    um = np.asarray(matrix, np.float64)
    n = um.shape[0]
    m6[:min(n, 6), :min(n, 6)] = um[:6, :6]
    c = img.shape[-1]
    has_alpha = c in (2, 4)
    nrgb = 1 if c <= 2 else 3
    cols = [img[..., i] for i in range(nrgb)]
    if nrgb == 1:
        cols = cols * 3                           # gray replicates to RGB
    alpha = img[..., -1] if has_alpha else None
    ones = jnp.ones(img.shape[:-1], img.dtype)
    rows = []
    for h in range(3 if nrgb == 3 else 1):
        s = (m6[h, 0] * cols[0] + m6[h, 1] * cols[1] + m6[h, 2] * cols[2]
             + m6[h, 5] * ones)                   # offset normalized by QR
        if has_alpha:
            s = s + m6[h, 4] * alpha
        rows.append(s)
    if has_alpha:
        s = (m6[4, 0] * cols[0] + m6[4, 1] * cols[1] + m6[4, 2] * cols[2]
             + m6[4, 4] * alpha + m6[4, 5] * ones)
        rows.append(s)
    return jnp.stack(rows, axis=-1).astype(img.dtype)


def sepia_tone(img: jnp.ndarray, threshold: float = 0.8) -> jnp.ndarray:
    """SepiaToneImage (visual-effects.c): per-channel intensity tone
    curves — r/g/b get shifted-and-clipped copies of the pixel intensity
    (offsets 0, t/6, with knees at t and 7t/6), then green/blue are
    floored at t/7 — followed by NormalizeImage + ContrastImage(sharpen)
    (visual-effects.c:1986-1987), which is what makes the op content-
    dependent (histogram stretch) and S-curved (HSB sine contrast)."""
    from .enhance import contrast, normalize

    i = (0.212656 * img[..., 0] + 0.715158 * img[..., 1] +
         0.072186 * img[..., 2])
    t = threshold
    r = jnp.where(i > t, 1.0, i + 1.0 - t)
    g = jnp.where(i > 7.0 * t / 6.0, 1.0, i + 1.0 - 7.0 * t / 6.0)
    b = jnp.where(i < t / 6.0, 0.0, i - t / 6.0)
    floor = t / 7.0
    g = jnp.maximum(g, floor)
    b = jnp.maximum(b, floor)
    out = jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)
    if img.shape[-1] > 3:
        out = jnp.concatenate([out, img[..., 3:]], axis=-1)
    return contrast(normalize(out), sharpen=True)


def solarize(img: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """SolarizeImage: negate above threshold."""
    return jnp.where(img > threshold, 1.0 - img, img)


def stegano(img: jnp.ndarray, watermark: jnp.ndarray, offset: int = 0) -> jnp.ndarray:
    """SteganoImage: hide a watermark in the LSBs (visual-effects.c)."""
    q = (img * 255.0 + 0.5).astype(jnp.int32)
    wm_bit = (jnp.mean(watermark, axis=-1, keepdims=True) > 0.5).astype(jnp.int32)
    h, w = watermark.shape[-3], watermark.shape[-2]
    canvas_bits = jnp.zeros(img.shape[:-1] + (1,), jnp.int32)
    canvas_bits = canvas_bits.at[..., :h, :w, :].set(wm_bit)
    q = (q & ~1) | canvas_bits
    return q.astype(img.dtype) / 255.0


def stereo(left: jnp.ndarray, right: jnp.ndarray,
           x_offset: int = 0, y_offset: int = 0) -> jnp.ndarray:
    """StereoAnaglyphImage (visual-effects.c:2626): red from the left
    image sampled at (x - x_offset, y - y_offset) through edge virtual
    pixels; green/blue from the right image in place."""
    h, w = left.shape[-3], left.shape[-2]
    ys = jnp.clip(jnp.arange(h) - y_offset, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) - x_offset, 0, w - 1)
    shifted = left[..., ys[:, None], xs[None, :], :]
    return jnp.stack([shifted[..., 0], right[..., 1], right[..., 2]],
                     axis=-1)


def tint(img: jnp.ndarray, color: Sequence[float],
         blend: Sequence[float] = (100.0, 100.0, 100.0)) -> jnp.ndarray:
    """TintImage (visual-effects.c:3003): per-channel midtone push.

    color = the -fill color (default black → identity); blend = the
    rho[,sigma,xi] percentages of the geometry argument.  Vector
    cv_c = blend_c·fill_c/100 − luma(fill); each channel moves by
    cv_c·(1−4·(v−0.5)²) — weights are PER-CHANNEL, not mean intensity."""
    c = [float(x) for x in tuple(color)[:3]]
    b = [float(x) for x in (tuple(blend) + (blend[-1],) * 3)[:3]]
    # GetPixelInfoIntensity: Rec709Luma on the fill color
    inten = 0.212656 * c[0] + 0.715158 * c[1] + 0.072186 * c[2]
    cv = jnp.asarray([b[i] * c[i] / 100.0 - inten for i in range(3)],
                     img.dtype)
    rgb = img[..., :3]
    w = rgb - 0.5
    out = rgb + cv * (1.0 - 4.0 * w * w)
    if img.shape[-1] > 3:
        out = jnp.concatenate([out, img[..., 3:]], axis=-1)
    return jnp.clip(out, 0, 1)


def vignette(img: jnp.ndarray, radius: float = 0.0, sigma: float = 10.0,
             x: Optional[float] = None, y: Optional[float] = None,
             background: Sequence[float] = (1.0, 1.0, 1.0)) -> jnp.ndarray:
    """VignetteImage (visual-effects.c): a white-filled ellipse of radii
    (W/2-x, H/2-y) on black, Gaussian-blurred (BlurImage), installed as
    the coverage mask — the net CLI output blends toward the image
    BACKGROUND color (default white) with an opaque result, which is the
    observed reference-binary behavior (the mask goes through the alpha
    channel internally and is flattened against background-color at
    write).  CLI defaults x = 0.1*W, y = 0.1*H (operation.c:3654)."""
    from .blur import blur as _blur
    from .draw import ellipse_fill_stroke_alpha

    h, w = img.shape[-3], img.shape[-2]
    if x is None:
        x = 0.1 * w
    if y is None:
        y = 0.1 * h
    # visual-effects.c:3245 draws "ellipse cx,cy,rx,ry,0,360" with BOTH
    # white fill and white 1px stroke — reproduce GetFillAlpha's ramps
    mask = ellipse_fill_stroke_alpha(h, w, w / 2.0, h / 2.0,
                                     max(w / 2.0 - x, 1.0),
                                     max(h / 2.0 - y, 1.0))
    mask = _blur(mask[..., None], radius, sigma)
    mask = mask.astype(img.dtype)
    bg = jnp.asarray(background, img.dtype)
    nc = min(img.shape[-1], 3)
    color = img[..., :nc] * mask + bg[:nc] * (1.0 - mask)
    return jnp.concatenate([color, img[..., nc:]], axis=-1) \
        if img.shape[-1] > nc else color


def sketch(img: jnp.ndarray, radius: float = 0.0, sigma: float = 1.0,
           angle: float = 0.0, key=None, has_alpha: bool = False) -> jnp.ndarray:
    """SketchImage (visual-effects.c:2094-2213): build a 2Wx2H uniform
    random GRAY image, MotionBlur(radius, sigma, angle) it, EdgeImage
    (radius), clamp + normalize + negate, resize back to 50%, then
    ColorDodge-composite onto the source.  The final Blend(20x80) with a
    transparent clone is an alpha-only identity for opaque sources; for
    alpha sources it mixes 20% of the original premultiplied color."""
    from . import composite as comp
    from . import resize as rz

    if key is None:
        key = jax.random.PRNGKey(7)
    h, w = img.shape[-3], img.shape[-2]
    c = img.shape[-1]
    val = jax.random.uniform(key, img.shape[:-3] + (2 * h, 2 * w, 1),
                             img.dtype)
    noise = jnp.repeat(val, c, axis=-1)
    streaks = bl.motion_blur(noise, radius, sigma, angle)
    dodge = bl.edge_image(streaks, radius)
    dodge = en.normalize(jnp.clip(dodge, 0.0, 1.0))
    dodge = 1.0 - dodge
    dodge = rz.resize(dodge, h, w)
    out = comp.composite(img, dodge, "colordodge",
                         dst_alpha=has_alpha, src_alpha=False)
    if has_alpha and c in (2, 4):
        # Blend 20x80 with the (alpha-carrying) original clone
        out = comp.composite(out, img, "blend", dst_alpha=True,
                             src_alpha=True, args=(20.0, 80.0))
    return out[..., :c]


def shadow(img_alpha: jnp.ndarray, alpha_pct: float = 80.0, sigma: float = 3.0,
           x: int = 5, y: int = 5,
           color: Sequence[float] = (1.0, 1.0, 1.0)) -> jnp.ndarray:
    """ShadowImage (visual-effects.c): border the silhouette by
    2σ+0.5 px of transparency, set every pixel to the BACKGROUND color
    (the shadow color, default white) with alpha = src_alpha·pct/100,
    then Gaussian-blur the ALPHA channel only.  The result is the
    shadow image alone (the caller composites); x/y only move the page
    offsets, which the raster does not encode."""
    b = int(2.0 * sigma + 0.5)
    a = (img_alpha[..., 3:4] if img_alpha.shape[-1] == 4
         else jnp.ones(img_alpha.shape[:-1] + (1,), img_alpha.dtype))
    pad = [(0, 0)] * (a.ndim - 3) + [(b, b), (b, b), (0, 0)]
    a0 = jnp.pad(a, pad) * (alpha_pct / 100.0)
    sh = bl.blur(a0, 0.0, sigma)
    c = jnp.asarray(tuple(color)[:3], img_alpha.dtype)
    out = jnp.concatenate(
        [jnp.broadcast_to(c, sh.shape[:-1] + (3,)), sh], axis=-1)
    return out


def polaroid(img: jnp.ndarray, angle: float = 0.0,
             background: Sequence[float] = (1.0, 1.0, 1.0),
             border_color: Sequence[float] = (223/255.0,)*3) -> jnp.ndarray:
    """PolaroidImage (visual-effects.c:2297-2442), caption-less path.

    quantum = max(max(W,H)/25, 10); frame the image on a border_color
    canvas (+quantum each side, opaque), bend it (rotate 90 → WaveImage
    (0.01·rows, 2·columns) → rotate −90), drop an 80%/σ2 shadow offset
    quantum/3, flop the shadow, composite the picture over it at
    trunc(−0.01·W/2), rotate by angle over transparent, and trim.
    Returns RGBA."""
    from .composite import composite_at
    from .distort import rotate, wave
    from .transform import flop, trim

    h, w = img.shape[-3], img.shape[-2]
    c = img.shape[-1]
    q = int(max(max(w, h) / 25.0, 10.0))
    bc = jnp.asarray(tuple(border_color)[:3], img.dtype)
    pic = jnp.ones(img.shape[:-3] + (h + 2 * q, w + 2 * q, 4), img.dtype)
    pic = pic.at[..., :3].set(bc)
    rgb = img[..., :3] if c >= 3 else jnp.repeat(img[..., :1], 3, -1)
    if c in (2, 4):   # compose over the frame color
        a = img[..., -1:]
        rgb = rgb * a + bc * (1.0 - a)
    pic = pic.at[..., q:q + h, q:q + w, :3].set(rgb)
    # bend: rotate 90, wave, rotate back (transparent off-canvas)
    pic = rotate(pic, 90.0)
    # WaveImage forces Background virtual pixels (here "none") and
    # interpolates alpha-premultiplied: wave the premultiplied RGBA and
    # un-premultiply so partially-covered edges keep their color
    al = pic[..., -1:]
    pm = jnp.concatenate([pic[..., :3] * al, al], -1)
    pm = wave(pm, 0.01 * pic.shape[-3], 2.0 * pic.shape[-2],
              background=(0.0, 0.0, 0.0, 0.0))
    al = pm[..., -1:]
    col = pm[..., :3] / jnp.where(jnp.abs(al) < 1e-12, 1.0, al)
    pic = jnp.concatenate([col, al], -1)
    pic = rotate(pic, -90.0)
    sh = shadow(pic, 80.0, 2.0, q // 3, q // 3, color=tuple(background)[:3])
    sh = flop(sh)
    # CompositeImage places at raw canvas coords (the shadow's page
    # offsets are metadata only); C ssize_t cast truncates toward zero
    px = int(-0.01 * pic.shape[-2] / 2.0)
    out = composite_at(sh, pic, "over", px, 0,
                       dst_alpha=True, src_alpha=True)
    out = rotate(out, angle, background=(0.0, 0.0, 0.0, 0.0))
    return trim(out)


def _hat_transform(x: jnp.ndarray, axis: int, scale: int) -> jnp.ndarray:
    """dcraw's à-trous hat filter (visual-effects.c:3478 HatTransform):
    0.25*(2*x[i] + x[i-s] + x[i+s]) with REFLECT (no edge repeat)
    boundaries — head uses x[s-i], tail mirrors about extent-1."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (scale, scale)
    xp = jnp.pad(x, pad, mode="reflect")
    n = x.shape[axis]
    left = jax.lax.slice_in_dim(xp, 0, n, axis=axis)
    mid = jax.lax.slice_in_dim(xp, scale, scale + n, axis=axis)
    right = jax.lax.slice_in_dim(xp, 2 * scale, 2 * scale + n, axis=axis)
    return 0.25 * (2.0 * mid + left + right)


def wavelet_denoise(img: jnp.ndarray, threshold: float = 0.05,
                    softness: float = 0.0, levels: int = 5) -> jnp.ndarray:
    """WaveletDenoiseImage (visual-effects.c:3515): 5-level à-trous
    transform with dcraw's [1,2,1]/4 hat kernel (stride 2^level, reflect
    boundaries), per-level shrink magnitude = threshold*noise_levels[level]
    (:3542,:3706): coefficients beyond ±m move in by m-softness*m, the
    rest scale by softness; final image = Σ shrunk details + last smooth."""
    noise_levels = (0.8002, 0.2735, 0.1202, 0.0585, 0.0291, 0.0152, 0.0080)
    hp = img
    acc = None
    low = img
    for level in range(levels):
        s = 1 << level
        low = _hat_transform(_hat_transform(hp, img.ndim - 3, s),
                             img.ndim - 2, s)
        detail = hp - low
        m = float(threshold) * noise_levels[level]
        shrink = float(m - softness * m)
        shrunk = jnp.where(detail < -m, detail + shrink,
                           jnp.where(detail > m, detail - shrink,
                                     detail * softness))
        acc = shrunk if acc is None else acc + shrunk
        hp = low
    return jnp.clip(acc + low, 0.0, 1.0)

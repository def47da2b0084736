"""Colorspace transforms — 40 colorspaces as vectorized per-pixel math.

TPU-native re-implementation of the reference's colorspace engine
(/root/reference/MagickCore/colorspace.c: TransformImageColorspace at :1751,
sRGBTransformImage at :722; scalar converters in colorspace-private.h).  The
reference loops rows with OpenMP and routes every conversion through sRGB as
a hub; here each conversion is a pure function over an ``(..., 3)`` float
array in [0, 1] (QuantumScale-normalized), so an entire pipeline fuses into
one XLA program and batches trivially.

Conventions (identical to the reference):
  * Arrays are sRGB-encoded (gamma) unless the colorspace says otherwise.
  * Hue-like channels are stored scaled to [0, 1].
  * Lab: L*/100, a*/255+0.5, b*/255+0.5.  Luv: L/100, (u+134)/354, (v+140)/262.
  * YCbCr/OHTA/YIQ/...: chroma channels offset by +0.5.
  * Conversions route through sRGB: convert(x, a, b) = from_rgb[b](to_rgb[a](x)).

All math uses float32 on device.  Branchy scalar code in the reference
(hue sextants, CIE piecewise curves) becomes jnp.where selects — the VPU
evaluates both sides, which is cheaper than divergent control flow.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Dict

import jax
import jax.numpy as jnp

# CIE constants (/root/reference/MagickCore/colorspace-private.h:29-30).
CIE_EPSILON = 216.0 / 24389.0
CIE_K = 24389.0 / 27.0

# D65 illuminant tristimulus (colorspace-private.h:40, entry D65).
D65 = (0.95047, 1.00000, 1.08883)

# Default absolute white luminance for Jzazbz (colorspace.c:991).
WHITE_LUMINANCE = 10000.0

_EPS = 1e-15


def _prec(x):
    """PerceptibleReciprocal: sign-preserving 1/x that avoids divide-by-0."""
    sign = jnp.where(x < 0.0, -1.0, 1.0)
    ax = jnp.abs(x)
    return sign / jnp.where(ax < _EPS, _EPS, ax)


def _mat3(x, M):
    """Exact-f32 3x3 color transform as VPU arithmetic: y_d = sum_c M[d,c]x_c.

    A K=3 einsum on the MXU (even at precision 'highest') wastes >97% of
    the systolic array and measured ~7ms for a 16MP batch; nine explicit
    fused multiply-adds on the VPU do the same transform exactly in f32
    at a small fraction of that.  M is a host-side (3, 3) array.
    """
    import numpy as _np

    M = _np.asarray(M, _np.float64)
    c0, c1, c2 = x[..., 0], x[..., 1], x[..., 2]
    outs = [M[d, 0] * c0 + M[d, 1] * c1 + M[d, 2] * c2 for d in range(3)]
    return jnp.stack(outs, axis=-1)


# ---------------------------------------------------------------------------
# sRGB transfer function (DecodePixelGamma/EncodePixelGamma,
# /root/reference/MagickCore/pixel.c:319-323 and :445-450 — the Chebyshev
# series there is just a fast pow; we use the closed form).
# ---------------------------------------------------------------------------

def _pow24(x):
    """x**2.4 for x in (0, ~1.1] via x^2 * exp2(0.4*log2 x).

    On this TPU, XLA's generic pow costs ~0.24ms per 1080p batch-8 pass
    while exp2/log2 are in the measurement noise; splitting the exponent
    as 2 + 0.4 keeps the log2-error amplification small (measured
    108.3dB vs float64 on [1e-4, 1] — the full-exponent form is 92.9dB,
    generic pow 123.9dB; all far above the 60dB fidelity gate)."""
    x = jnp.maximum(x, 1e-12)
    return x * x * jnp.exp2(jnp.float32(0.4) * jnp.log2(x))


def _pow_inv24(x):
    """x**(1/2.4) for x in (0, ~1.1] via exp2((1/2.4)*log2 x).

    Exponent < 1 shrinks log2 error, measured 101.4dB vs float64."""
    x = jnp.maximum(x, 1e-12)
    return jnp.exp2(jnp.float32(1.0 / 2.4) * jnp.log2(x))


def srgb_to_linear(v):
    """sRGB-encoded -> linear, on [0,1] values."""
    return jnp.where(
        v <= 0.0404482362771076,
        v / 12.92,
        _pow24((v + 0.055) / 1.055),
    )


def linear_to_srgb(v):
    """linear -> sRGB-encoded, on [0,1] values."""
    return jnp.where(
        v <= 0.0031306684425005883,
        12.92 * v,
        1.055 * _pow_inv24(v) - 0.055,
    )


def _split(x):
    return x[..., 0], x[..., 1], x[..., 2]


def _join(a, b, c):
    return jnp.stack([a, b, c], axis=-1)


# ---------------------------------------------------------------------------
# XYZ hub (D65, sRGB primaries — colorspace-private.h:759-780 / :72-94)
# ---------------------------------------------------------------------------

_RGB2XYZ = jnp.array(
    [
        [0.4123955889674142161, 0.3575834307637148171, 0.1804926473817015735],
        [0.2125862307855955516, 0.7151703037034108499, 0.07220049864333622685],
        [0.01929721549174694484, 0.1191838645808485318, 0.9504971251315797660],
    ],
    dtype=jnp.float32,
)

_XYZ2RGB = jnp.array(
    [
        [3.240969941904521, -1.537383177570093, -0.498610760293],
        [-0.96924363628087, 1.87596750150772, 0.041555057407175],
        [0.055630079696993, -0.20397695888897, 1.056971514242878],
    ],
    dtype=jnp.float32,
)


def rgb_to_xyz(x):
    lin = srgb_to_linear(x)
    return _mat3(lin, _RGB2XYZ)


def xyz_to_rgb(x):
    rgb = _mat3(x, _XYZ2RGB)
    # The reference lifts out-of-gamut negatives before encoding
    # (colorspace-private.h:84-90).
    mn = jnp.min(rgb, axis=-1, keepdims=True)
    rgb = jnp.where(mn < 0.0, rgb - mn, rgb)
    return linear_to_srgb(rgb)


def _matrix_space(to_xyz_mat, from_xyz_mat):
    """Gamma-encoded RGB working space defined by primaries matrices."""

    def from_rgb(x):
        xyz = rgb_to_xyz(x)
        lin = _mat3(xyz, from_xyz_mat)
        return linear_to_srgb(lin)

    def to_rgb(x):
        lin = srgb_to_linear(x)
        xyz = _mat3(lin, to_xyz_mat)
        return xyz_to_rgb(xyz)

    return to_rgb, from_rgb


# Adobe RGB (1998) (colorspace-private.h:53-70, :938-952)
_ADOBE98_TO_XYZ = [
    [0.57666904291013050, 0.18555823790654630, 0.18822864623499470],
    [0.29734497525053605, 0.62736356625546610, 0.07529145849399788],
    [0.02703136138641234, 0.07068885253582723, 0.99133753683763880],
]
_XYZ_TO_ADOBE98 = [
    [2.041587903810746500, -0.56500697427885960, -0.34473135077832956],
    [-0.969243636280879500, 1.87596750150772020, 0.04155505740717557],
    [0.013444280632031142, -0.11836239223101838, 1.01517499439120540],
]

# Display P3 (colorspace-private.h:675-693, :966-980)
_P3_TO_XYZ = [
    [0.4865709486482162, 0.26566769316909306, 0.1982172852343625],
    [0.2289745640697488, 0.69173852183650640, 0.0792869140937450],
    [0.0000000000000000, 0.04511338185890264, 1.0439443689009760],
]
_XYZ_TO_P3 = [
    [2.49349691194142500, -0.93138361791912390, -0.402710784450716840],
    [-0.82948896956157470, 1.76266406031834630, 0.023624685841943577],
    [0.03584583024378447, -0.07617238926804182, 0.956884524007687200],
]

# ProPhoto (colorspace-private.h:719-738, :1197-1211).  Note the reference
# assigns *X twice; the effective matrix is the second one.
_PROPHOTO_TO_XYZ = [
    [0.7977604896723027, 0.13518583717574031, 0.03134934958152480000],
    [0.2880711282292934, 0.71184321781010140, 0.00008565396060525902],
    [0.0000000000000000, 0.00000000000000000, 0.82510460251046010000],
]
_XYZ_TO_PROPHOTO = [
    [1.3457989731028281, -0.25558010007997534, -0.05110628506753401],
    [-0.5446224939028347, 1.50823274131327810, 0.02053603239147973],
    [0.0000000000000000, 0.0000000000000000, 1.21196754563894540],
]

# CAT02 LMS (colorspace-private.h:751-757, :108-117)
_XYZ_TO_LMS = [
    [0.7328, 0.4296, -0.1624],
    [-0.7036, 1.6975, 0.0061],
    [0.0030, 0.0136, 0.9834],
]
_LMS_TO_XYZ = [
    [1.096123820835514, -0.278869000218287, 0.182745179382773],
    [0.454369041975359, 0.473533154307412, 0.072097803717229],
    [-0.009627608738429, -0.005698031216113, 1.015325639954543],
]


def _lms_from_rgb(x):
    return _mat3(rgb_to_xyz(x), _XYZ_TO_LMS)


def _lms_to_rgb(x):
    return xyz_to_rgb(_mat3(x, _LMS_TO_XYZ))


# ---------------------------------------------------------------------------
# CIE Lab / Luv / LCH (colorspace-private.h:531-570, :1066-1103, :1138-1195)
# ---------------------------------------------------------------------------

def xyz_to_lab_raw(x, wp=D65):
    X, Y, Z = _split(x)

    def f(t, w):
        r = t / w
        return jnp.where(r > CIE_EPSILON, jnp.cbrt(jnp.maximum(r, 0.0)), (CIE_K * r + 16.0) / 116.0)

    fx, fy, fz = f(X, wp[0]), f(Y, wp[1]), f(Z, wp[2])
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return _join(L, a, b)


def lab_raw_to_xyz(lab, wp=D65):
    L, a, b = _split(lab)
    y = (L + 16.0) / 116.0
    x = y + a / 500.0
    z = y - b / 200.0
    x3, z3 = x * x * x, z * z * z
    X = jnp.where(x3 > CIE_EPSILON, x3, (116.0 * x - 16.0) / CIE_K)
    Y = jnp.where(L > CIE_K * CIE_EPSILON, y * y * y, L / CIE_K)
    Z = jnp.where(z3 > CIE_EPSILON, z3, (116.0 * z - 16.0) / CIE_K)
    return _join(X * wp[0], Y * wp[1], Z * wp[2])


def rgb_to_lab(x):
    lab = xyz_to_lab_raw(rgb_to_xyz(x))
    L, a, b = _split(lab)
    return _join(L / 100.0, a / 255.0 + 0.5, b / 255.0 + 0.5)


def lab_to_rgb(x):
    L, a, b = _split(x)
    return xyz_to_rgb(lab_raw_to_xyz(_join(100.0 * L, 255.0 * (a - 0.5), 255.0 * (b - 0.5))))


def rgb_to_lchab(x):
    lab = xyz_to_lab_raw(rgb_to_xyz(x))
    L, a, b = _split(lab)
    # Reference stores a,b scaled first (ConvertXYZToLCHab at
    # colorspace-private.h:1104: chroma = hypot(a', b') + 0.5 on the
    # 1/255-scaled values).
    a_s, b_s = a / 255.0, b / 255.0
    C = jnp.hypot(a_s, b_s) + 0.5
    H = jnp.arctan2(b_s, a_s) / (2.0 * math.pi)
    H = jnp.where(H < 0.0, H + 1.0, H)
    return _join(L / 100.0, C, H)


def lchab_to_rgb(x):
    L, C, H = _split(x)
    hr = 2.0 * math.pi * H
    a = 255.0 * (C - 0.5) * jnp.cos(hr)
    b = 255.0 * (C - 0.5) * jnp.sin(hr)
    return xyz_to_rgb(lab_raw_to_xyz(_join(100.0 * L, a, b)))


def _luv_consts(wp=D65):
    d = wp[0] + 15.0 * wp[1] + 3.0 * wp[2]
    return 4.0 * wp[0] / d, 9.0 * wp[1] / d


def xyz_to_luv_raw(x, wp=D65):
    X, Y, Z = _split(x)
    un, vn = _luv_consts(wp)
    r = Y / wp[1]
    L = jnp.where(r > CIE_EPSILON, 116.0 * jnp.cbrt(jnp.maximum(r, 0.0)) - 16.0, CIE_K * r)
    alpha = _prec(X + 15.0 * Y + 3.0 * Z)
    u = 13.0 * L * (4.0 * alpha * X - un)
    v = 13.0 * L * (9.0 * alpha * Y - vn)
    return _join(L, u, v)


def luv_raw_to_xyz(luv, wp=D65):
    L, u, v = _split(luv)
    un, vn = _luv_consts(wp)
    Y = jnp.where(L > CIE_K * CIE_EPSILON, jnp.power((L + 16.0) / 116.0, 3.0), L / CIE_K)
    # ConvertLuvToXYZ (colorspace-private.h:600-626)
    t_u = 52.0 * L * _prec(u + 13.0 * L * un)
    t_v = 39.0 * L * _prec(v + 13.0 * L * vn)
    gamma = _prec((t_u - 1.0) / 3.0 + 1.0 / 3.0)
    X = gamma * (Y * (t_v - 5.0) + 5.0 * Y)
    Z = X * ((t_u - 1.0) / 3.0) - 5.0 * Y
    return _join(X, Y, Z)


def rgb_to_luv(x):
    luv = xyz_to_luv_raw(rgb_to_xyz(x))
    L, u, v = _split(luv)
    return _join(L / 100.0, (u + 134.0) / 354.0, (v + 140.0) / 262.0)


def luv_to_rgb(x):
    L, u, v = _split(x)
    return xyz_to_rgb(luv_raw_to_xyz(_join(100.0 * L, 354.0 * u - 134.0, 262.0 * v - 140.0)))


def rgb_to_lchuv(x):
    luv = xyz_to_luv_raw(rgb_to_xyz(x))
    L, u, v = _split(luv)
    C = jnp.hypot(u, v) / 255.0 + 0.5
    H = jnp.arctan2(v, u) / (2.0 * math.pi)
    H = jnp.where(H < 0.0, H + 1.0, H)
    return _join(L / 100.0, C, H)


def lchuv_to_rgb(x):
    L, C, H = _split(x)
    hr = 2.0 * math.pi * H
    u = 255.0 * (C - 0.5) * jnp.cos(hr)
    v = 255.0 * (C - 0.5) * jnp.sin(hr)
    return xyz_to_rgb(luv_raw_to_xyz(_join(100.0 * L, u, v)))


def rgb_to_xyy(x):
    X, Y, Z = _split(rgb_to_xyz(x))
    g = _prec(X + Y + Z)
    return _join(g * X, g * Y, Y)


def xyy_to_rgb(x):
    lx, ly, Y = _split(x)
    g = _prec(ly)
    return xyz_to_rgb(_join(g * Y * lx, Y, g * Y * (1.0 - lx - ly)))


# ---------------------------------------------------------------------------
# OkLab / OkLch (colorspace-private.h:1480-1550)
# ---------------------------------------------------------------------------

def rgb_to_oklab(x):
    lin = srgb_to_linear(x)
    R, G, B = _split(lin)
    l = jnp.cbrt(0.4122214708 * R + 0.5363325363 * G + 0.0514459929 * B)
    m = jnp.cbrt(0.2119034982 * R + 0.6806995451 * G + 0.1073969566 * B)
    s = jnp.cbrt(0.0883024619 * R + 0.2817188376 * G + 0.6299787005 * B)
    L = 0.2104542553 * l + 0.7936177850 * m - 0.0040720468 * s
    a = 1.9779984951 * l - 2.4285922050 * m + 0.4505937099 * s + 0.5
    b = 0.0259040371 * l + 0.7827717662 * m - 0.8086757660 * s + 0.5
    return _join(L, a, b)


def oklab_to_rgb(x):
    L, a, b = _split(x)
    l = L + 0.3963377774 * (a - 0.5) + 0.2158037573 * (b - 0.5)
    m = L - 0.1055613458 * (a - 0.5) - 0.0638541728 * (b - 0.5)
    s = L - 0.0894841775 * (a - 0.5) - 1.2914855480 * (b - 0.5)
    l, m, s = l * l * l, m * m * m, s * s * s
    R = 4.0767416621 * l - 3.3077115913 * m + 0.2309699292 * s
    G = -1.2684380046 * l + 2.6097574011 * m - 0.3413193965 * s
    B = -0.0041960863 * l - 0.7034186147 * m + 1.7076147010 * s
    return linear_to_srgb(_join(R, G, B))


def rgb_to_oklch(x):
    L, a, b = _split(rgb_to_oklab(x))
    C = jnp.sqrt((a - 0.5) ** 2 + (b - 0.5) ** 2)
    h = 0.5 + 0.5 * jnp.arctan2(-(b - 0.5), -(a - 0.5)) / math.pi
    return _join(L, C, h)


def oklch_to_rgb(x):
    L, C, h = _split(x)
    a = C * jnp.cos(2.0 * math.pi * h) + 0.5
    b = C * jnp.sin(2.0 * math.pi * h) + 0.5
    return oklab_to_rgb(_join(L, a, b))


# ---------------------------------------------------------------------------
# Jzazbz (colorspace-private.h:1274-1478).  The reference passes RGB with
# green/blue swapped both ways (ConvertRGBToJzazbz at :1365 calls
# ConvertRGBToXYZ(red, blue, green, ...)); we reproduce that for parity.
# ---------------------------------------------------------------------------

_JZ = dict(
    b=1.15, g=0.66,
    c1=3424.0 / 4096.0, c2=2413.0 / 128.0, c3=2392.0 / 128.0,
    n=2610.0 / 16384.0, p=1.7 * 2523.0 / 32.0, d=-0.56,
    d0=1.6295499532821566e-11,
)
_JZ_XYZ2LMS = [
    [0.41478972, 0.579999, 0.0146480],
    [-0.2015100, 1.120649, 0.0531008],
    [-0.0166008, 0.264800, 0.6684799],
]
_JZ_AB = [
    [3.52400, -4.066708, 0.542708],
    [0.199076, 1.096799, -1.295875],
]
_JZ_LMS2XYZ = [
    [1.92422643578761, -1.00479231259537, 0.037651404030618],
    [0.350316762094999, 0.726481193931655, -0.065384422948085],
    [-0.0909828109828476, -0.312728290523074, 1.52276656130526],
]


def _pq_fwd(v):
    g = jnp.power(jnp.maximum(v / WHITE_LUMINANCE, 0.0), _JZ["n"])
    return jnp.power((_JZ["c1"] + _JZ["c2"] * g) / (1.0 + _JZ["c3"] * g), _JZ["p"])


def _pq_inv(v):
    g = jnp.power(jnp.maximum(v, 0.0), 1.0 / _JZ["p"])
    num = g - _JZ["c1"]
    den = _JZ["c2"] - _JZ["c3"] * g
    return WHITE_LUMINANCE * jnp.power(jnp.maximum(num / den, 0.0), 1.0 / _JZ["n"])


def rgb_to_jzazbz(x):
    R, G, B = _split(x)
    X, Y, Z = _split(rgb_to_xyz(_join(R, B, G)))  # reference swap
    Xp = Z + _JZ["b"] * (X - Z)
    Yp = X + _JZ["g"] * (Y - X)
    M = jnp.asarray(_JZ_XYZ2LMS, jnp.float32)
    L = M[0][0] * Xp + M[0][1] * Yp + M[0][2] * Z
    Mm = M[1][0] * Xp + M[1][1] * Yp + M[1][2] * Z
    S = M[2][0] * Xp + M[2][1] * Yp + M[2][2] * Z
    Lp, Mp, Sp = _pq_fwd(L), _pq_fwd(Mm), _pq_fwd(S)
    Iz = 0.5 * (Lp + Mp)
    J = (Iz + _JZ["d"] * Iz) / (1.0 + _JZ["d"] * Iz) - _JZ["d0"]
    A = jnp.asarray(_JZ_AB, jnp.float32)
    a = 0.5 + A[0][0] * Lp + A[0][1] * Mp + A[0][2] * Sp
    b = 0.5 + A[1][0] * Lp + A[1][1] * Mp + A[1][2] * Sp
    J = jnp.nan_to_num(J, nan=0.0)
    a = jnp.where(jnp.isnan(a), 0.5, a)
    b = jnp.where(jnp.isnan(b), 0.5, b)
    return _join(J, a, b)


def jzazbz_to_rgb(x):
    Jz, az, bz = _split(x)
    g = Jz + _JZ["d0"]
    azz, bzz = az - 0.5, bz - 0.5
    C = 0.138605043271539 * azz + 0.0580473161561189 * bzz
    Sp = g / (1.0 + _JZ["d"] * (1.0 - g))
    Lp = Sp + C
    Mp = Sp - C
    Sp = Sp + (-0.0960192420263189) * azz + (-0.811891896056039) * bzz
    L, M, S = _pq_inv(Lp), _pq_inv(Mp), _pq_inv(Sp)
    T = jnp.asarray(_JZ_LMS2XYZ, jnp.float32)
    Xp = T[0][0] * L + T[0][1] * M + T[0][2] * S
    Yp = T[1][0] * L + T[1][1] * M + T[1][2] * S
    Zp = T[2][0] * L + T[2][1] * M + T[2][2] * S
    Zp = jnp.nan_to_num(Zp, nan=0.0)
    Xp = jnp.nan_to_num(Zp + (Xp - Zp) / _JZ["b"], nan=0.0)
    Yp = jnp.nan_to_num(Xp + (Yp - Xp) / _JZ["g"], nan=0.0)
    R, B, G = _split(xyz_to_rgb(_join(Xp, Yp, Zp)))  # reference swap back
    return _join(R, G, B)


# ---------------------------------------------------------------------------
# Hue-based spaces (colorspace-private.h:149-530, :801-1065;
# HSL in colorspace.c:307/:597)
# ---------------------------------------------------------------------------

def _max_min_chroma(x):
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    return mx, mn, mx - mn


def _hue_sextant(x, mx, c):
    """Shared hue computation: returns hue in [0,6)."""
    r, g, b = _split(x)
    safe_c = jnp.where(c == 0.0, 1.0, c)
    h_r = jnp.mod((g - b) / safe_c + 6.0, 6.0)
    h_g = (b - r) / safe_c + 2.0
    h_b = (r - g) / safe_c + 4.0
    h = jnp.where(r == mx, h_r, jnp.where(g == mx, h_g, h_b))
    return jnp.where(c == 0.0, 0.0, h)


def _sextant_rgb(h6, c, x_val):
    """Map hue sextant to (r,g,b) chroma contributions; h6 in [0,6)."""
    i = jnp.floor(h6).astype(jnp.int32)
    r = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4],
        [c, x_val, jnp.zeros_like(c), jnp.zeros_like(c), x_val], c)
    g = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4],
        [x_val, c, c, x_val, jnp.zeros_like(c)], jnp.zeros_like(c))
    b = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4],
        [jnp.zeros_like(c), jnp.zeros_like(c), x_val, c, c], x_val)
    return r, g, b


def rgb_to_hsl(x):
    mx, mn, c = _max_min_chroma(x)
    lightness = (mx + mn) / 2.0
    h = _hue_sextant(x, mx, c) / 6.0
    s = jnp.where(
        lightness <= 0.5,
        c * _prec(2.0 * lightness),
        c * _prec(2.0 - 2.0 * lightness),
    )
    s = jnp.where(c <= 0.0, 0.0, s)
    return _join(h, s, lightness)


def hsl_to_rgb(x):
    h, s, lightness = _split(x)
    c = jnp.where(lightness <= 0.5, 2.0 * lightness * s, (2.0 - 2.0 * lightness) * s)
    mn = lightness - 0.5 * c
    h6 = jnp.mod(h * 6.0, 6.0)
    xv = c * (1.0 - jnp.abs(jnp.mod(h6, 2.0) - 1.0))
    r, g, b = _sextant_rgb(h6, c, xv)
    return _join(r + mn, g + mn, b + mn)


def rgb_to_hsv(x):
    mx, mn, c = _max_min_chroma(x)
    h = _hue_sextant(x, mx, c) / 6.0
    s = c * _prec(mx)
    s = jnp.where(c <= 0.0, 0.0, s)
    h = jnp.where(c <= 0.0, 0.0, h)
    return _join(h, s, mx)


def hsv_to_rgb(x):
    h, s, v = _split(x)
    c = v * s
    mn = v - c
    h6 = jnp.mod(h * 6.0, 6.0)
    xv = c * (1.0 - jnp.abs(jnp.mod(h6, 2.0) - 1.0))
    r, g, b = _sextant_rgb(h6, c, xv)
    return _join(r + mn, g + mn, b + mn)


rgb_to_hsb = rgb_to_hsv  # HSB == HSV (ConvertRGBToHSB, colorspace-private.h:867)
hsb_to_rgb = hsv_to_rgb


def rgb_to_hwb(x):
    """ConvertRGBToHWB (colorspace-private.h:1035)."""
    r, g, b = _split(x)
    w = jnp.min(x, axis=-1)
    v = jnp.max(x, axis=-1)
    blackness = 1.0 - v
    eq = (v - w) < 1e-12
    f = jnp.where(jnp.abs(r - w) < 1e-12, g - b,
                  jnp.where(jnp.abs(g - w) < 1e-12, b - r, r - g))
    p = jnp.where(jnp.abs(r - w) < 1e-12, 3.0,
                  jnp.where(jnp.abs(g - w) < 1e-12, 5.0, 1.0))
    h = (p - f * _prec(v - w)) / 6.0
    h = jnp.where(eq, -1.0, h)
    return _join(h, w, blackness)


def hwb_to_rgb(x):
    h, w, blk = _split(x)
    v = 1.0 - blk
    gray = jnp.abs(h - (-1.0)) < 1e-12
    h6 = 6.0 * h
    i = jnp.floor(h6).astype(jnp.int32)
    f = h6 - i
    f = jnp.where((i & 1) != 0, 1.0 - f, f)
    n = w + f * (v - w)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, n, w, w, n], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [n, v, v, n, w], w)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [w, w, n, v, v], n)
    r = jnp.where(gray, v, r)
    g = jnp.where(gray, v, g)
    b = jnp.where(gray, v, b)
    return _join(r, g, b)


def rgb_to_hsi(x):
    r, g, b = _split(x)
    i = (r + g + b) / 3.0
    s = 1.0 - jnp.min(x, axis=-1) * _prec(i)
    alpha = 0.5 * (2.0 * r - g - b)
    beta = 0.8660254037844385 * (g - b)
    h = jnp.arctan2(beta, alpha) / (2.0 * math.pi)
    h = jnp.where(h < 0.0, h + 1.0, h)
    h = jnp.where(i <= 0.0, 0.0, h)
    s = jnp.where(i <= 0.0, 0.0, s)
    return _join(h, s, i)


def hsi_to_rgb(x):
    h_, s, i = _split(x)
    h = jnp.mod(360.0 * h_, 360.0)

    def branch(hh):
        rad = math.pi / 180.0
        prim = i * (1.0 + s * jnp.cos(hh * rad) / jnp.where(
            jnp.abs(jnp.cos((60.0 - hh) * rad)) < _EPS, _EPS, jnp.cos((60.0 - hh) * rad)))
        low = i * (1.0 - s)
        return prim, low

    p0, l0 = branch(h)
    p1, l1 = branch(h - 120.0)
    p2, l2 = branch(h - 240.0)
    r = jnp.where(h < 120.0, p0, jnp.where(h < 240.0, l1, 3.0 * i - l2 - p2))
    g = jnp.where(h < 120.0, 3.0 * i - l0 - p0, jnp.where(h < 240.0, p1, l2))
    b = jnp.where(h < 120.0, l0, jnp.where(h < 240.0, 3.0 * i - l1 - p1, p2))
    return _join(r, g, b)


_HCL_LUMA = (0.298839, 0.586811, 0.114350)


def rgb_to_hcl(x):
    r, g, b = _split(x)
    mx, mn, c = _max_min_chroma(x)
    h = _hue_sextant(x, mx, c) / 6.0
    luma = _HCL_LUMA[0] * r + _HCL_LUMA[1] * g + _HCL_LUMA[2] * b
    return _join(h, c, luma)


def hcl_to_rgb(x):
    h, c, luma = _split(x)
    h6 = 6.0 * h
    xv = c * (1.0 - jnp.abs(jnp.mod(h6, 2.0) - 1.0))
    r, g, b = _sextant_rgb(jnp.clip(h6, 0.0, 5.999999), c, xv)
    inrange = (h6 >= 0.0) & (h6 < 6.0)
    r = jnp.where(inrange, r, 0.0)
    g = jnp.where(inrange, g, 0.0)
    b = jnp.where(inrange, b, 0.0)
    m = luma - (_HCL_LUMA[0] * r + _HCL_LUMA[1] * g + _HCL_LUMA[2] * b)
    return _join(r + m, g + m, b + m)


rgb_to_hclp = rgb_to_hcl  # identical forward (colorspace-private.h:834)


def hclp_to_rgb(x):
    h, c, luma = _split(x)
    h6 = 6.0 * h
    xv = c * (1.0 - jnp.abs(jnp.mod(h6, 2.0) - 1.0))
    r, g, b = _sextant_rgb(jnp.clip(h6, 0.0, 5.999999), c, xv)
    inrange = (h6 >= 0.0) & (h6 < 6.0)
    r = jnp.where(inrange, r, 0.0)
    g = jnp.where(inrange, g, 0.0)
    b = jnp.where(inrange, b, 0.0)
    m = luma - (_HCL_LUMA[0] * r + _HCL_LUMA[1] * g + _HCL_LUMA[2] * b)
    z = jnp.ones_like(m)
    z = jnp.where(m < 0.0, luma * _prec(luma - m), z)
    m_neg = jnp.zeros_like(m)
    over = (m + c) > 1.0
    z = jnp.where((m >= 0.0) & over, (1.0 - luma) * _prec(m + c - luma), z)
    m_over = 1.0 - z * c
    m = jnp.where(m < 0.0, m_neg, jnp.where(over, m_over, m))
    return _join(z * r + m, z * g + m, z * b + m)


# ---------------------------------------------------------------------------
# Broadcast/luma spaces (colorspace-private.h:1551-1587, :1637-1703;
# colorspace.c sRGBTransformImage cases)
# ---------------------------------------------------------------------------

def _luma_space(fwd_mat, inv_mat):
    """Y + offset-chroma linear space on gamma-encoded RGB."""
    F = jnp.asarray(fwd_mat, jnp.float32)
    I = jnp.asarray(inv_mat, jnp.float32)
    off = jnp.asarray([0.0, 0.5, 0.5], jnp.float32)

    def from_rgb(x):
        return _mat3(x, F) + off

    def to_rgb(x):
        return _mat3(x - off, I)

    return to_rgb, from_rgb


# YCbCr == YPbPr (Rec.601 full-range; colorspace-private.h:1567-1580/:1637)
_YCBCR_FWD = [
    [0.298839, 0.586811, 0.114350],
    [-0.1687367, -0.331264, 0.5],
    [0.5, -0.418688, -0.081312],
]
_YCBCR_INV = [
    [0.99999999999914679361, -1.2188941887145875e-06, 1.4019995886561440468],
    [0.99999975910502514331, -0.34413567816504303521, -0.71413649331646789076],
    [1.00000124040004623180, 1.77200006607230409200, 2.1453384174593273e-06],
]

_YIQ_FWD = [
    [0.298839, 0.586811, 0.114350],
    [0.595716, -0.274453, -0.321263],
    [0.211456, -0.522591, 0.311135],
]
_YIQ_INV = [
    [1.0, 0.9562957197589482261, 0.6210244164652610754],
    [1.0, -0.2721220993185104464, -0.6473805968256950427],
    [1.0, -1.1069890167364901945, 1.7046149983646481374],
]

_YUV_FWD = [
    [0.298839, 0.586811, 0.114350],
    [-0.147, -0.289, 0.436],
    [0.615, -0.515, -0.100],
]
_YUV_INV = [
    [1.0, -3.945707070708279e-05, 1.1398279671717170825],
    [1.0, -0.3946101641414141437, -0.5805003156565656797],
    [1.0, 2.0319996843434342537, -4.813762626262513e-04],
]

_YDBDR_FWD = [
    [0.298839, 0.586811, 0.114350],
    [-0.450, -0.883, 1.333],
    [-1.333, 1.116, 0.217],
]
_YDBDR_INV = [
    [1.0, 9.2303716147657e-05, -0.52591263066186533],
    [1.0, -0.12913289889050927, 0.26789932820759876],
    [1.0, 0.66467905997895482, -7.9202543533108e-05],
]

# OHTA (colorspace.c:1254 forward, :2591 inverse)
_OHTA_FWD = [
    [0.33333, 0.33334, 0.33333],
    [0.5, 0.0, -0.5],
    [-0.25, 0.5, -0.25],
]
_OHTA_INV = [
    [1.0, 1.0, -0.66668],
    [1.0, 0.0, 1.33333],
    [1.0, -1.0, -0.66668],
]

# Rec709 YCbCr (colorspace.c:1316 forward, :2652 inverse)
_R709_FWD = [
    [0.212656, 0.715158, 0.072186],
    [-0.114572, -0.385428, 0.5],
    [0.5, -0.454153, -0.045847],
]
_R709_INV = [
    [1.0, 0.0, 1.574800],
    [1.0, -0.187324, -0.468124],
    [1.0, 1.855600, 0.0],
]

ycbcr_to_rgb, rgb_to_ycbcr = _luma_space(_YCBCR_FWD, _YCBCR_INV)
yiq_to_rgb, rgb_to_yiq = _luma_space(_YIQ_FWD, _YIQ_INV)
yuv_to_rgb, rgb_to_yuv = _luma_space(_YUV_FWD, _YUV_INV)
ydbdr_to_rgb, rgb_to_ydbdr = _luma_space(_YDBDR_FWD, _YDBDR_INV)
ohta_to_rgb, rgb_to_ohta = _luma_space(_OHTA_FWD, _OHTA_INV)
rec709ycbcr_to_rgb, rgb_to_rec709ycbcr = _luma_space(_R709_FWD, _R709_INV)
rec601ycbcr_to_rgb, rgb_to_rec601ycbcr = ycbcr_to_rgb, rgb_to_ycbcr
ypbpr_to_rgb, rgb_to_ypbpr = ycbcr_to_rgb, rgb_to_ycbcr


def rgb_to_ycc(x):
    """PhotoYCC (colorspace.c:1347): piecewise transfer then luma matrix.

    Quirk preserved: the reference's upper branch computes
    0.298839*(1.099*i - 0.099) with i in MAP units, so the -0.099 offset
    is effectively zero (0.099/MaxMap) — the transfer is 1.099*v."""
    v = x
    f = jnp.where(v <= 0.018, 0.018 * v, 1.099 * v - 0.099 / 65535.0)
    r, g, b = _split(f)
    Y = 0.298839 * r + 0.586811 * g + 0.114350 * b
    C1 = -0.298839 * r - 0.586811 * g + 0.88600 * b + 156.0 / 255.0
    C2 = 0.70100 * r - 0.586811 * g - 0.114350 * b + 137.0 / 255.0
    return _join(Y, C1, C2)


def ycc_to_rgb(x):
    """Inverse PhotoYCC (colorspace.c:2681): linear unmix then the Kodak
    PhotoCD decode ramp (YCCMap LUT, colorspace.c:1829) applied to each
    channel at index round(1024*v) — oracle-verified."""
    from ._ycc_map import YCC_MAP

    Y, C1, C2 = _split(x)
    c1 = C1 - 156.0 / 255.0
    c2 = C2 - 137.0 / 255.0
    r = 1.3584 * Y + 1.8215 * c2
    g = 1.3584 * Y - 0.4302726 * c1 - 0.9271435 * c2
    b = 1.3584 * Y + 2.2179 * c1
    ramp = jnp.asarray(YCC_MAP, jnp.float32)

    def decode(v):
        idx = jnp.clip(jnp.round(1024.0 * v).astype(jnp.int32), 0, 1388)
        return ramp[idx]

    return _join(decode(r), decode(g), decode(b))


def rgb_to_cmy(x):
    return 1.0 - x


def cmy_to_rgb(x):
    return 1.0 - x


def rgb_to_log(x):
    """Cineon log encode (colorspace.c:1055 region).

    density == gamma == 1/1.7, film_gamma 0.6, reference black/white 95/685.
    """
    ref_black, ref_white, film_gamma = 95.0, 685.0, 0.6
    black = 10.0 ** ((ref_black - ref_white) * 0.002 / film_gamma)
    lin = srgb_to_linear(x)
    return (ref_white + jnp.log10(black + lin * (1.0 - black)) /
            (0.002 / film_gamma)) / 1024.0


def log_to_rgb(x):
    ref_black, ref_white, film_gamma = 95.0, 685.0, 0.6
    black = 10.0 ** ((ref_black - ref_white) * 0.002 / film_gamma)
    v = 1024.0 * x
    lin = (10.0 ** ((v - ref_white) * 0.002 / film_gamma) - black) / (1.0 - black)
    lin = jnp.where(v < ref_black, 0.0, jnp.where(v >= ref_white, 1.0, lin))
    return linear_to_srgb(jnp.clip(lin, 0.0, 1.0))


# Rec709 luma coefficients used for gray conversion
# (colorspace.c:886-890 GRAY case, :843 LinearGRAY case).
REC709_LUMA = (0.212656, 0.715158, 0.072186)
REC601_LUMA = (0.298839, 0.586811, 0.114350)


def rgb_to_gray(x):
    """sRGB -> GRAY: Rec709 luma on *encoded* values (colorspace.c:901)."""
    r, g, b = _split(x)
    y = REC709_LUMA[0] * r + REC709_LUMA[1] * g + REC709_LUMA[2] * b
    return y[..., None]


def rgb_to_linear_gray(x):
    """sRGB -> LinearGRAY: Rec709 luma on *linear* values (colorspace.c:843)."""
    lin = srgb_to_linear(x)
    r, g, b = _split(lin)
    y = REC709_LUMA[0] * r + REC709_LUMA[1] * g + REC709_LUMA[2] * b
    return y[..., None]


def gray_to_rgb(x):
    return jnp.repeat(x, 3, axis=-1)


def linear_gray_to_rgb(x):
    return jnp.repeat(linear_to_srgb(x), 3, axis=-1)


def rgb_to_cmyk(x):
    """sRGB -> CMYK with max black extraction (colorspace-private.h:1589).

    Note the reference decodes gamma first (linear CMYK).
    """
    lin = srgb_to_linear(x)
    r, g, b = _split(lin)
    c, m, y = 1.0 - r, 1.0 - g, 1.0 - b
    k = jnp.minimum(c, jnp.minimum(m, y))
    denom = _prec(1.0 - k)
    zero = (r < 1e-12) & (g < 1e-12) & (b < 1e-12)
    c = jnp.where(zero, 0.0, (c - k) * denom)
    m = jnp.where(zero, 0.0, (m - k) * denom)
    y = jnp.where(zero, 0.0, (y - k) * denom)
    k = jnp.where(zero, 1.0, k)
    return jnp.stack([c, m, y, k], axis=-1)


def cmyk_to_rgb(x):
    """CMYK -> sRGB (colorspace-private.h:131 + encode, colorspace.c:433)."""
    c, m, y, k = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    r = 1.0 - (c * (1.0 - k) + k)
    g = 1.0 - (m * (1.0 - k) + k)
    b = 1.0 - (y * (1.0 - k) + k)
    return linear_to_srgb(_join(r, g, b))


# Matrix working spaces
adobe98_to_rgb, rgb_to_adobe98 = _matrix_space(_ADOBE98_TO_XYZ, _XYZ_TO_ADOBE98)
displayp3_to_rgb, rgb_to_displayp3 = _matrix_space(_P3_TO_XYZ, _XYZ_TO_P3)
prophoto_to_rgb, rgb_to_prophoto = _matrix_space(_PROPHOTO_TO_XYZ, _XYZ_TO_PROPHOTO)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def _identity(x):
    return x


# colorspace key -> (to_srgb, from_srgb) over color channels only.
_CONVERTERS: Dict[str, tuple] = {
    "srgb": (_identity, _identity),
    "undefined": (_identity, _identity),
    "transparent": (_identity, _identity),
    "rgb": (linear_to_srgb, srgb_to_linear),
    "scrgb": (linear_to_srgb, srgb_to_linear),
    "gray": (gray_to_rgb, rgb_to_gray),
    "linear_gray": (linear_gray_to_rgb, rgb_to_linear_gray),
    "xyz": (xyz_to_rgb, rgb_to_xyz),
    "lab": (lab_to_rgb, rgb_to_lab),
    "lchab": (lchab_to_rgb, rgb_to_lchab),
    "lch": (lchab_to_rgb, rgb_to_lchab),
    "luv": (luv_to_rgb, rgb_to_luv),
    "lchuv": (lchuv_to_rgb, rgb_to_lchuv),
    "xyy": (xyy_to_rgb, rgb_to_xyy),
    "lms": (_lms_to_rgb, _lms_from_rgb),
    "cat02lms": (_lms_to_rgb, _lms_from_rgb),
    "oklab": (oklab_to_rgb, rgb_to_oklab),
    "oklch": (oklch_to_rgb, rgb_to_oklch),
    "jzazbz": (jzazbz_to_rgb, rgb_to_jzazbz),
    "hsl": (hsl_to_rgb, rgb_to_hsl),
    "hsv": (hsv_to_rgb, rgb_to_hsv),
    "hsb": (hsb_to_rgb, rgb_to_hsb),
    "hwb": (hwb_to_rgb, rgb_to_hwb),
    "hsi": (hsi_to_rgb, rgb_to_hsi),
    "hcl": (hcl_to_rgb, rgb_to_hcl),
    "hclp": (hclp_to_rgb, rgb_to_hclp),
    "ycbcr": (ycbcr_to_rgb, rgb_to_ycbcr),
    "ypbpr": (ypbpr_to_rgb, rgb_to_ypbpr),
    "rec601ycbcr": (rec601ycbcr_to_rgb, rgb_to_rec601ycbcr),
    "rec709ycbcr": (rec709ycbcr_to_rgb, rgb_to_rec709ycbcr),
    "yiq": (yiq_to_rgb, rgb_to_yiq),
    "yuv": (yuv_to_rgb, rgb_to_yuv),
    "ydbdr": (ydbdr_to_rgb, rgb_to_ydbdr),
    "ycc": (ycc_to_rgb, rgb_to_ycc),
    "ohta": (ohta_to_rgb, rgb_to_ohta),
    "cmy": (cmy_to_rgb, rgb_to_cmy),
    "cmyk": (cmyk_to_rgb, rgb_to_cmyk),
    "log": (log_to_rgb, rgb_to_log),
    "adobe98": (adobe98_to_rgb, rgb_to_adobe98),
    "displayp3": (displayp3_to_rgb, rgb_to_displayp3),
    "prophoto": (prophoto_to_rgb, rgb_to_prophoto),
}


def supported_colorspaces():
    return sorted(_CONVERTERS)


def convert(color: jnp.ndarray, src: str, dst: str) -> jnp.ndarray:
    """Convert color channels (no alpha) between colorspaces via the sRGB hub.

    Mirrors TransformImageColorspace (/root/reference/MagickCore/
    colorspace.c:1751): source -> sRGB -> target.
    """
    src, dst = src.lower(), dst.lower()
    if src == dst:
        return color
    if src not in _CONVERTERS:
        raise ValueError(f"unsupported source colorspace {src!r}")
    if dst not in _CONVERTERS:
        raise ValueError(f"unsupported target colorspace {dst!r}")
    to_rgb_fn = _CONVERTERS[src][0]
    from_rgb_fn = _CONVERTERS[dst][1]
    srgb = to_rgb_fn(color)
    out = from_rgb_fn(srgb)
    # Q16-HDRI semantics: values may exceed [0,1] mid-pipeline (XYZ Z reaches
    # 1.089); only encoders clamp.  Matches --enable-hdri, magick-type.h:64-112.
    return out

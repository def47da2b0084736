"""Composite: Porter-Duff + blend-mode compositing (composite.c).

Re-implements CompositeImage (/root/reference/MagickCore/composite.c:1424)
and its operator set (composite.h:25-108) as vectorized per-pixel math over
aligned (..., H, W, C) arrays.  Gravity/offset placement pads or crops the
source to the destination canvas first, then a single fused elementwise
program applies the operator — the watermark/thumbnail hot path.

Conventions: inputs are non-premultiplied RGB(A) in [0,1].  ``src`` is the
composite (overlay) image, ``dst`` the canvas, matching the reference's
argument order CompositeImage(image=dst, composite=src).

Duff-Porter algebra uses premultiplied intermediates:
  Dca' = f(Sc,Dc)·Sa·Da + Sca·(1−Da) + Dca·(1−Sa)       (blend modes)
with the standard SVG-compositing f per operator — the same formulas the
reference encodes per-case in composite.c's PixelComposite helpers.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-12


def _split_rgba(x, has_alpha: bool):
    if has_alpha:
        return x[..., :-1], x[..., -1:]
    return x, jnp.ones(x.shape[:-1] + (1,), x.dtype)


def _sanitize(c, a):
    return c, jnp.clip(a, 0.0, 1.0)


def _div(n, d):
    return n / jnp.where(jnp.abs(d) < _EPS, _EPS, d)


# --- blend-mode channel functions f(Sc, Dc) (composite.c per-case math) ----

def _f_multiply(s, d):
    return s * d


def _f_screen(s, d):
    return s + d - s * d


def _f_overlay_correct(s, d):
    return jnp.where(2.0 * d <= 1.0, 2.0 * s * d,
                     1.0 - 2.0 * (1.0 - s) * (1.0 - d))


def _f_darken(s, d):
    return jnp.minimum(s, d)


def _f_lighten(s, d):
    return jnp.maximum(s, d)


def _f_color_dodge(s, d):
    return jnp.where(d <= 0.0, 0.0,
                     jnp.where(s >= 1.0, 1.0, jnp.minimum(1.0, _div(d, 1.0 - s))))


def _f_color_burn(s, d):
    return jnp.where(d >= 1.0, 1.0,
                     jnp.where(s <= 0.0, 0.0, 1.0 - jnp.minimum(1.0, _div(1.0 - d, s))))


def _f_hard_light(s, d):
    return _f_overlay_correct(d, s)


def _f_soft_light(s, d):
    """SVG soft-light (composite.c SoftLight)."""
    g = jnp.where(d <= 0.25, ((16.0 * d - 12.0) * d + 4.0) * d, jnp.sqrt(jnp.maximum(d, 0.0)))
    return jnp.where(2.0 * s <= 1.0,
                     d - (1.0 - 2.0 * s) * d * (1.0 - d),
                     d + (2.0 * s - 1.0) * (g - d))


def _f_difference(s, d):
    return jnp.abs(s - d)


def _f_exclusion(s, d):
    return s + d - 2.0 * s * d


def _f_linear_burn(s, d):
    return s + d - 1.0


def _f_linear_dodge(s, d):
    return s + d


def _f_linear_light(s, d):
    return 2.0 * s + d - 1.0


def _f_vivid_light(s, d):
    return jnp.where(2.0 * s <= 1.0,
                     1.0 - jnp.minimum(1.0, _div(1.0 - d, 2.0 * s)),
                     jnp.minimum(1.0, _div(d, 2.0 * (1.0 - s))))


def _f_pin_light(s, d):
    return jnp.where(2.0 * s <= 1.0,
                     jnp.minimum(d, 2.0 * s),
                     jnp.maximum(d, 2.0 * s - 1.0))


def _f_hard_mix(s, d):
    return jnp.where(s + d >= 1.0, 1.0, 0.0)


def _f_minus_src(s, d):
    return s - d


def _f_minus_dst(s, d):
    return d - s


def _f_divide_src(s, d):
    return _div(s, d)


def _f_divide_dst(s, d):
    return _div(d, s)


def _f_modulus_add(s, d):
    return jnp.mod(s + d, 1.0 + _EPS)


def _f_modulus_subtract(s, d):
    return jnp.mod(s - d + 1.0, 1.0 + _EPS)


def _f_freeze(s, d):
    """Freeze (composite.c:3017): 1 - (1-Sc)^2/Dc, clamped at 0."""
    return jnp.maximum(1.0 - _div((1.0 - s) ** 2, d), 0.0)


def _f_interpolate(s, d):
    """Interpolate (composite.c:3178 region): cosine interpolation."""
    return 0.5 - 0.25 * jnp.cos(jnp.pi * s) - 0.25 * jnp.cos(jnp.pi * d)


def _f_negate(s, d):
    """Negate (composite.c:3299): 1 - |1 - Sc - Dc|."""
    return 1.0 - jnp.abs(1.0 - s - d)


def _f_reflect(s, d):
    """Reflect (composite.c:3379): Sc^2/(1-Dc), clamped at 1."""
    return jnp.minimum(_div(s * s, 1.0 - d), 1.0)


def _f_soft_burn(s, d):
    """SoftBurn (composite.c:3462)."""
    return jnp.where(s + d < 1.0, 0.5 * _div(d, 1.0 - s),
                     1.0 - 0.5 * _div(1.0 - s, d))


def _f_soft_dodge(s, d):
    """SoftDodge (composite.c:3472)."""
    return jnp.where(s + d < 1.0, 0.5 * _div(s, 1.0 - d),
                     1.0 - 0.5 * _div(1.0 - d, s))


def _f_stamp(s, d):
    """Stamp (composite.c:3501): Sc + Dc^2 - 1."""
    return s + d * d - 1.0


def _f_pegtop_light(s, d):
    """PegtopLight (composite.c:3328): Dc^2*(1-2Sc) + 2*Sc*Dc."""
    return d * d * (1.0 - 2.0 * s) + 2.0 * s * d


_BLEND_FNS = {
    "freeze": _f_freeze,
    "interpolate": _f_interpolate,
    "negate": _f_negate,
    "reflect": _f_reflect,
    "softburn": _f_soft_burn,
    "softdodge": _f_soft_dodge,
    "stamp": _f_stamp,
    "pegtoplight": _f_pegtop_light,
    "multiply": _f_multiply,
    "screen": _f_screen,
    "overlay": _f_overlay_correct,
    "darken": _f_darken,
    "lighten": _f_lighten,
    "colordodge": _f_color_dodge,
    "colorburn": _f_color_burn,
    "hardlight": _f_hard_light,
    "softlight": _f_soft_light,
    "difference": _f_difference,
    "exclusion": _f_exclusion,
    "linearburn": _f_linear_burn,
    "lineardodge": _f_linear_dodge,
    "linearlight": _f_linear_light,
    "vividlight": _f_vivid_light,
    "pinlight": _f_pin_light,
    "hardmix": _f_hard_mix,
    "minus": _f_minus_src,
    "minussrc": _f_minus_src,
    "minusdst": _f_minus_dst,
    "divide": _f_divide_src,
    "dividesrc": _f_divide_src,
    "dividedst": _f_divide_dst,
    "modulusadd": _f_modulus_add,
    "modulussubtract": _f_modulus_subtract,
}


def _luma(x):
    """Rec709 luma (GetPixelIntensity default) over color channels."""
    if x.shape[-1] >= 3:
        return (0.212656 * x[..., :1] + 0.715158 * x[..., 1:2] +
                0.072186 * x[..., 2:3])
    return x[..., :1]


def _hsl_ops(op, sc, dc):
    """Hue/Saturate/Luminize/Colorize component swaps in the HCL space —
    the reference's default compose colorspace (composite.c:1436)."""
    from . import colorspace as cs

    s_g = cs.rgb_to_hcl(sc)
    d_g = cs.rgb_to_hcl(dc)
    if op == "hue":
        out = jnp.stack([s_g[..., 0], d_g[..., 1], d_g[..., 2]], -1)
    elif op == "saturate":
        out = jnp.stack([d_g[..., 0], s_g[..., 1], d_g[..., 2]], -1)
    elif op == "luminize":
        out = jnp.stack([d_g[..., 0], d_g[..., 1], s_g[..., 2]], -1)
    else:  # colorize: hue+chroma from src, luma from dst
        out = jnp.stack([s_g[..., 0], s_g[..., 1], d_g[..., 2]], -1)
    return cs.hcl_to_rgb(out)


def composite(dst: jnp.ndarray, src: jnp.ndarray, operator: str = "over",
              dst_alpha: bool = False, src_alpha: bool = False,
              args: Sequence[float] = ()) -> jnp.ndarray:
    """Apply a composite operator; src must already be canvas-aligned.

    Returns an array with alpha iff dst carried alpha or the operator
    introduces it (over with alpha src etc. — caller tracks spec).
    """
    op = operator.lower().replace("-", "").replace("_", "")
    sc, sa = _split_rgba(jnp.asarray(src), src_alpha)
    dc, da = _split_rgba(jnp.asarray(dst), dst_alpha)
    nc = max(sc.shape[-1], dc.shape[-1])
    # gray -> color broadcast; only a 1-channel side can widen
    if sc.shape[-1] < nc:
        sc = jnp.repeat(sc[..., :1], nc, axis=-1) if sc.shape[-1] == 1 \
            else jnp.concatenate([sc, sc[..., -1:].repeat(nc - sc.shape[-1],
                                                          axis=-1)], -1)
    if dc.shape[-1] < nc:
        dc = jnp.repeat(dc[..., :1], nc, axis=-1) if dc.shape[-1] == 1 \
            else jnp.concatenate([dc, dc[..., -1:].repeat(nc - dc.shape[-1],
                                                          axis=-1)], -1)

    sca = sc * sa  # premultiplied
    dca = dc * da

    def unpack(out_ca, out_a):
        out_c = _div(out_ca, out_a)
        out_c = jnp.where(out_a < _EPS, 0.0, out_c)
        if dst_alpha or src_alpha:
            return jnp.concatenate([jnp.clip(out_c, 0.0, 1.0),
                                    jnp.clip(out_a, 0.0, 1.0)], axis=-1)
        return jnp.clip(out_c, 0.0, 1.0)

    # --- Duff-Porter set (composite.h:25-108 operator enum) ---
    if op in ("over", "srcover"):
        return unpack(sca + dca * (1.0 - sa), sa + da * (1.0 - sa))
    if op in ("dstover",):
        return unpack(dca + sca * (1.0 - da), da + sa * (1.0 - da))
    if op in ("in", "srcin"):
        return unpack(sca * da, sa * da)
    if op in ("dstin",):
        return unpack(dca * sa, da * sa)
    if op in ("out", "srcout"):
        return unpack(sca * (1.0 - da), sa * (1.0 - da))
    if op in ("dstout",):
        return unpack(dca * (1.0 - sa), da * (1.0 - sa))
    if op in ("atop", "srcatop"):
        return unpack(sca * da + dca * (1.0 - sa), da)
    if op in ("dstatop",):
        return unpack(dca * sa + sca * (1.0 - da), sa)
    if op in ("xor",):
        return unpack(sca * (1.0 - da) + dca * (1.0 - sa),
                      sa + da - 2.0 * sa * da)
    if op in ("plus",):
        return unpack(sca + dca, jnp.minimum(sa + da, 1.0))
    if op in ("copy", "src", "replace"):
        # straight copy: channel value = Sc regardless of Sa, alpha = Sa
        # (composite.c Copy group alpha switch) — unpack would zero the
        # colors wherever Sa == 0
        if dst_alpha or src_alpha:
            return jnp.concatenate([jnp.clip(sc, 0.0, 1.0),
                                    jnp.clip(sa, 0.0, 1.0)], axis=-1)
        return jnp.clip(sc, 0.0, 1.0)
    if op in ("dst", "none"):
        return unpack(dca, da)
    if op in ("clear",):
        return unpack(jnp.zeros_like(dca), jnp.zeros_like(da))
    if op in ("dissolve",):
        # composite.c:2056: rho>100 wraps into the canvas factor
        if args:
            sd, cd = args[0] / 100.0, 1.0
            sd = max(sd, 0.0)
            if sd > 1.0:
                cd, sd = 2.0 - sd, 1.0
            if len(args) > 1:
                cd = args[1] / 100.0
            cd = min(max(cd, 0.0), 1.0)
        else:
            sd = cd = 1.0
        return unpack(sd * sca + cd * dca * (1.0 - sd * sa),
                      sd * sa + cd * da * (1.0 - sd * sa))
    if op in ("blend",):
        # composite.c:2083: defaults 1.0/1.0; sigma defaults to 1-rho
        sw = (args[0] / 100.0) if args else 1.0
        dw = (args[1] / 100.0) if len(args) > 1 else \
            (1.0 - sw if args else 1.0)
        return unpack(sw * sca + dw * dca, jnp.minimum(sw * sa + dw * da, 1.0))
    if op in ("mathematics",):
        a0, b0, c0, d0 = (list(args) + [0.0] * 4)[:4]
        f = a0 * sc * dc + b0 * sc + c0 * dc + d0
        out_ca = f * sa * da + sca * (1.0 - da) + dca * (1.0 - sa)
        return unpack(out_ca, sa + da - sa * da)
    if op in ("threshold",):
        t = args[0] if args else 0.05
        diff = dc - sc
        out = jnp.where(jnp.abs(diff) < t, dc, jnp.clip(diff, 0.0, 1.0))
        return unpack(out * da, da)
    if op in ("changemask",):
        same = jnp.all(jnp.abs(sc - dc) < 0.003, axis=-1, keepdims=True)
        out_a = jnp.where(same, 0.0, da)
        return unpack(dc * out_a, out_a)
    if op in ("stereo",):
        out = jnp.concatenate([sc[..., :1], dc[..., 1:]], axis=-1)
        return unpack(out * da, da)
    if op in ("copyred", "copygreen", "copyblue", "copyalpha", "copyblack",
              "copycyan", "copymagenta", "copyyellow", "copyopacity"):
        ch = {"copyred": 0, "copycyan": 0, "copygreen": 1, "copymagenta": 1,
              "copyblue": 2, "copyyellow": 2, "copyblack": 3}.get(op)
        if op == "copyopacity":   # IM6 alias (option.c maps both)
            op = "copyalpha"
        if op == "copyalpha":
            new_a = sa if src_alpha else sc[..., :1]
            return jnp.concatenate([dc, jnp.clip(new_a, 0, 1)], axis=-1)
        out = dc.at[..., ch].set(sc[..., min(ch, sc.shape[-1] - 1)])
        return unpack(out * da, da)
    if op in ("hue", "saturate", "luminize", "colorize"):
        # straight color: Dc when Sa==0, Sc when Da==0, else the HCL mix;
        # alpha = max(Sa, Da) (composite.c alpha switch) — oracle-matched
        mix_c = _hsl_ops(op, sc, dc)
        out_c = jnp.where(sa <= _EPS, dc, jnp.where(da <= _EPS, sc, mix_c))
        out_a = jnp.maximum(sa, da)
        if dst_alpha or src_alpha:
            return jnp.concatenate([jnp.clip(out_c, 0.0, 1.0),
                                    jnp.clip(out_a, 0.0, 1.0)], axis=-1)
        return jnp.clip(out_c, 0.0, 1.0)
    if op in ("lightenintensity", "darkenintensity"):
        # Sa*Si vs Da*Di with Si = Rec709 luma; the winning PIXEL
        # (color and alpha) is copied (composite.c DarkenIntensity)
        si = _luma(sc)
        di = _luma(dc)
        take_src = (sa * si > da * di) if op == "lightenintensity" \
            else (sa * si < da * di)
        out_c = jnp.where(take_src, sc, dc)
        # the built reference zeroes the alpha channel for the intensity
        # compares whenever alpha participates (oracle-measured across
        # all four Sa/Da combinations)
        out_a = jnp.zeros_like(sa * da)
        if dst_alpha or src_alpha:
            return jnp.concatenate([jnp.clip(out_c, 0.0, 1.0),
                                    out_a], axis=-1)
        return jnp.clip(out_c, 0.0, 1.0)
    if op in ("bumpmap",):
        inten = _luma(sc)
        out_c = jnp.where(sa <= _EPS, dc, inten * dc)   # Sa==0 passthrough
        out_a = inten * da
        if dst_alpha or src_alpha:
            return jnp.concatenate([jnp.clip(out_c, 0.0, 1.0),
                                    jnp.clip(out_a, 0.0, 1.0)], axis=-1)
        return jnp.clip(out_c, 0.0, 1.0)
    if op in ("alpha",):
        # AlphaComposite (composite.c:2544): colors from dst, alpha := Sa
        new_a = sa if src_alpha else jnp.mean(sc, -1, keepdims=True)
        return jnp.concatenate([dc, jnp.clip(new_a, 0.0, 1.0)], axis=-1)
    if op in ("no",):
        return unpack(dca, da)
    if op in ("rmse",):
        # RMSEComposite (composite.c:3387): per-pixel color distance as gray
        # (the reference's literal expression divides only the blue term
        # by 3 — reproduced for parity)
        n3 = min(3, sc.shape[-1])
        diff = dc[..., :n3] - sc[..., :n3]
        terms = diff * diff
        if n3 == 3:
            gray = jnp.sqrt(terms[..., 0] + terms[..., 1]
                            + terms[..., 2] / 3.0)[..., None]
        else:
            gray = jnp.sqrt(jnp.sum(terms, -1, keepdims=True))
        out = jnp.repeat(gray, dc.shape[-1], axis=-1)
        return unpack(out * da, da)
    if op in ("modulate",):
        # ModulateComposite (composite.c:3226): shift dst luma by the src
        # intensity around midpoint, scale chroma; args = (luma%, chroma%)
        from . import colorspace as cs

        pl = (args[0] if args else 100.0)
        pc = (args[1] if len(args) > 1 else 100.0)
        si = jnp.mean(sc, axis=-1, keepdims=True)
        hcl = cs.rgb_to_hcl(dc[..., :3])
        luma = hcl[..., 2:3] + (0.01 * pl * (si - 0.5)) / 0.5
        chroma = hcl[..., 1:2] * 0.01 * pc
        out = cs.hcl_to_rgb(jnp.concatenate([hcl[..., :1], chroma, luma], -1))
        out = jnp.where(jnp.abs(si - 0.5) < 1e-6, dc[..., :3], out)
        if dc.shape[-1] > 3:
            out = jnp.concatenate([out, dc[..., 3:]], -1)
        return unpack(out * da, da)

    if op in ("displace", "distort"):
        # overlay is a displacement map: red -> X shift, green -> Y shift,
        # scaled by args (percent of overlay size); sample dst at the
        # displaced position (CompositeImage Displace/Distort cases).
        from .distort import sample_bilinear

        h, w = dc.shape[-3], dc.shape[-2]
        xscale = (args[0] if args else 20.0) / 100.0 * w
        yscale = (args[1] if len(args) > 1 else (args[0] if args else 20.0)) / 100.0 * h
        yy = jnp.arange(h, dtype=dc.dtype)[:, None] * jnp.ones((1, w), dc.dtype)
        xx = jnp.ones((h, 1), dc.dtype) * jnp.arange(w, dtype=dc.dtype)[None, :]
        dx = (sc[..., 0] - 0.5) * xscale
        dy = (sc[..., min(1, sc.shape[-1] - 1)] - 0.5) * yscale
        out = sample_bilinear(dc, xx + dx, yy + dy)
        # outside the overlay's support (sa==0) keep dst
        out = jnp.where(sa > 0, out, dc)
        return unpack(out * da, da)

    if op in ("difference",):
        # colors use the premultiplied SVG difference normalized by the
        # UNION alpha, but the written alpha channel is |Sa - Da|
        # (composite.c:2637) — oracle-matched
        union = sa + da - sa * da
        out_c = _div(sca + dca - 2.0 * jnp.minimum(sca * da, dca * sa),
                     union)
        if dst_alpha or src_alpha:
            return jnp.concatenate([jnp.clip(out_c, 0.0, 1.0),
                                    jnp.abs(sa - da)], axis=-1)
        return jnp.clip(out_c, 0.0, 1.0)
    if op in ("hardmix",):
        # threshold on the PREMULTIPLIED sum, normalized by union alpha
        union = sa + da - sa * da
        out_c = _div(jnp.where(sca + dca < 1.0, 0.0, 1.0), union)
        if dst_alpha or src_alpha:
            return jnp.concatenate([jnp.clip(out_c, 0.0, 1.0),
                                    jnp.clip(union, 0.0, 1.0)], axis=-1)
        return jnp.clip(out_c, 0.0, 1.0)
    if op in ("modulusadd", "modulussubtract"):
        # wrap on the premultiplied values, stored straight (no gamma)
        if op == "modulusadd":
            v = sca + dca
            out_c = jnp.where(v <= 1.0, v, v - 1.0)
            out_a = jnp.minimum(sa + da - sa * da, 1.0)
        else:
            v = sca - dca
            out_c = jnp.where(v >= 0.0, v, v + 1.0)
            out_a = sa * (1.0 - da)        # OUT-group alpha (oracle)
        if dst_alpha or src_alpha:
            return jnp.concatenate([jnp.clip(out_c, 0.0, 1.0),
                                    jnp.clip(out_a, 0.0, 1.0)], axis=-1)
        return jnp.clip(out_c, 0.0, 1.0)
    # --- SVG blend modes through the general alpha formula ---
    if op in _BLEND_FNS:
        f = _BLEND_FNS[op](sc, dc)
        out_ca = f * sa * da + sca * (1.0 - da) + dca * (1.0 - sa)
        out_a = sa + da - sa * da
        return unpack(out_ca, out_a)

    raise ValueError(f"unsupported composite operator {operator!r}")


GRAVITIES = ("northwest", "north", "northeast", "west", "center", "east",
             "southwest", "south", "southeast", "forget", "undefined")


def gravity_offset(gravity: str, dst_w: int, dst_h: int,
                   src_w: int, src_h: int, x: int = 0, y: int = 0) -> Tuple[int, int]:
    """Resolve a gravity + offset to absolute placement (gravity semantics
    from GravityAdjustGeometry, MagickCore/geometry.c)."""
    g = (gravity or "northwest").lower()
    if g in ("forget", "undefined", "northwest"):
        return x, y
    cx = (dst_w - src_w) // 2
    cy = (dst_h - src_h) // 2
    ex = dst_w - src_w
    ey = dst_h - src_h
    table = {
        "north": (cx + x, y),
        "northeast": (ex - x, y),
        "west": (x, cy + y),
        "center": (cx + x, cy + y),
        "east": (ex - x, cy + y),
        "southwest": (x, ey - y),
        "south": (cx + x, ey - y),
        "southeast": (ex - x, ey - y),
    }
    return table[g]


def place(dst: jnp.ndarray, src: jnp.ndarray, x: int, y: int,
          fill_alpha: float = 0.0) -> jnp.ndarray:
    """Align src onto dst's canvas at (x, y), zero/transparent elsewhere.

    Returns an array shaped like dst (channel count of src) — the aligned
    overlay CompositeImage works from.
    """
    dh, dw = dst.shape[-3], dst.shape[-2]
    sh, sw = src.shape[-3], src.shape[-2]
    c = src.shape[-1]
    canvas = jnp.zeros(dst.shape[:-3] + (dh, dw, c), src.dtype)
    sx0, sy0 = max(-x, 0), max(-y, 0)
    dx0, dy0 = max(x, 0), max(y, 0)
    cw = min(sw - sx0, dw - dx0)
    ch = min(sh - sy0, dh - dy0)
    if cw <= 0 or ch <= 0:
        return canvas
    return canvas.at[..., dy0:dy0 + ch, dx0:dx0 + cw, :].set(
        src[..., sy0:sy0 + ch, sx0:sx0 + cw, :])


def composite_at(dst: jnp.ndarray, src: jnp.ndarray, operator: str = "over",
                 x: int = 0, y: int = 0, gravity: str = "northwest",
                 dst_alpha: bool = False, src_alpha: bool = False,
                 args: Sequence[float] = ()) -> jnp.ndarray:
    """CompositeImage with placement: aligns src then applies the operator.

    Outside the src region the overlay is fully transparent, so Duff-Porter
    operators behave exactly as the reference's region-limited loop.
    """
    dh, dw = dst.shape[-3], dst.shape[-2]
    sh, sw = src.shape[-3], src.shape[-2]
    gx, gy = gravity_offset(gravity, dw, dh, sw, sh, x, y)
    if not src_alpha:
        src = jnp.concatenate(
            [src, jnp.ones(src.shape[:-1] + (1,), src.dtype)], axis=-1)
    aligned = place(dst, src, gx, gy)
    out = composite(dst, aligned, operator, dst_alpha=dst_alpha,
                    src_alpha=True, args=args)
    return out

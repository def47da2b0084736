"""Try-first dispatch of lazy op chains onto the fused Pallas kernels.

The reference's accelerate.c pattern — every op calls its Accelerate*
fast path first and silently falls back to the CPU loop
(/root/reference/MagickCore/accelerate.c:3986 AccelerateResizeImage) —
inverted for the TPU build: here the *pipeline interpreter* (CLI lazy
chains, wand method queues, serve requests) pattern-matches its pending
op queue against chains the banded-block-matmul kernel covers
(resize / separable gaussian blur / linear channel mix, in any order)
and compiles the matched prefix into ONE Pallas kernel call instead of
an XLA op chain.  Anything unmatched falls through to the XLA op path.

Chain composition is exact: each tagged op contributes its (out, in)
banded operator on each axis (the same matrices the op-path kernels
apply), composed host-side into a single (Mv, Mw, mix) triple — so the
kernel computes the same separable-linear math as the op chain.  The
one semantic deviation: the op path clips to [0,1] after each op while
the kernel clips once at the end (a chain of clips is not linear);
tests gate the difference at >=60dB on representative content.

Plans and jitted runners are cached per (shape, chain) so repeated
requests (the serve daemon, batched CLI invocations) pay host planning
and weight upload once and run pure device time thereafter.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Tuple

import numpy as np

# kill switch for debugging / A-B timing
ENABLED = os.environ.get("IMTPU_NO_FUSED_DISPATCH", "") != "1"
# tests set this to exercise the kernel in the Pallas interpreter on CPU
FORCE_INTERPRET = False

# dispatch outcome counters (inspected by tests and -bench tooling)
COUNTS = {"pallas": 0, "xla": 0, "error": 0}

# re-raise dispatch errors instead of silently falling back (tests)
STRICT = os.environ.get("IMTPU_DISPATCH_STRICT", "") == "1"

_MAX_DIM = 4096          # dense host-side operator composition bound
_MAX_CHANNELS = 4

# Padding strategy (round 4): the old in-kernel pad_align — flattening
# NHWC to (N*H, W*C) and padding the MERGED lane dim to %128, leaving a
# WINC that is not a multiple of C — hard-hung the axon worker twice
# (multi-hour, process-wide) on its first Mosaic compile, while
# born-aligned shapes always ran fine.  Round 4 replaces it with
# NHWC-space alignment: pad W so that (W'·C) % 128 == 0 exactly and
# H to %8, zero-extend the operators, and call the kernel with
# pad_align=False — the program is then structurally identical to a
# born-aligned image's, the code path the worker has never hung on.
# IMTPU_DISPATCH_NO_PAD=1 refuses padded shapes entirely (fallback to
# the XLA op chain); IMTPU_DISPATCH_PADDED=1 is accepted for backward
# compat (it forces the old behavior of allowing padded dispatch, which
# is now the default).
NO_PAD = os.environ.get("IMTPU_DISPATCH_NO_PAD", "") == "1"


def _shape_safe(H: int, W: int, C: int, interpret: bool) -> bool:
    """True when (H, W, C) may dispatch on the current backend."""
    if H % 8 == 0 and (W * C) % 128 == 0:
        return True
    return not NO_PAD


def _fully_opaque(data) -> bool:
    """True when the trailing (alpha) channel is 1 everywhere.

    Alpha-carrying chains are only dispatched when the image is fully
    opaque: the reference resizes/interpolates alpha-PREMULTIPLIED
    (resize.c BlendPixelTrait) and premultiplication is the identity
    exactly there, making the whole chain linear on the straight
    channels.  One 4-byte scalar readback; callers only pay it for
    alpha specs."""
    import jax.numpy as jnp

    return bool(float(jnp.min(data[..., -1])) >= 1.0 - 1e-6)


def _aligned_dims(H: int, W: int, C: int) -> Tuple[int, int]:
    """Smallest (H', W') >= (H, W) with H'%8 == 0 and (W'·C)%128 == 0."""
    import math

    step = 128 // math.gcd(128, C)
    return -(-H // 8) * 8, -(-W // step) * step


@functools.lru_cache(maxsize=64)
def _plan_chain(H: int, W: int, C: int, prefix: tuple):
    """Compose a tagged chain into (Mv, Mw, mix, Hout, Wout, Cout).

    Tags (hashable): ("resize", (h, w, filter)) · ("gblur", (radius,
    sigma, rule)) · ("mix", ((row...), ...)).  Returns None when the
    chain leaves the kernel's envelope (upscale, bad op).
    """
    from .fused_pipeline import blur_band_matrix
    from .resize import resize_matrix

    hcur, wcur = H, W
    Av: Optional[np.ndarray] = None   # None = identity
    Aw: Optional[np.ndarray] = None
    mix: Optional[np.ndarray] = None
    ccur = C
    for kind, params in prefix:
        if kind == "resize":
            h, w, filt = params
            if h > hcur or w > wcur or h < 1 or w < 1:
                return None
            Rv = resize_matrix(hcur, h, filt).astype(np.float64).T
            Rw = resize_matrix(wcur, w, filt).astype(np.float64).T
            Av = Rv if Av is None else Rv @ Av
            Aw = Rw if Aw is None else Rw @ Aw
            hcur, wcur = h, w
        elif kind == "gblur":
            radius, sigma, rule = params
            if sigma <= 0:
                continue
            Bv = blur_band_matrix(hcur, sigma, radius, width_rule=rule)
            Bw = blur_band_matrix(wcur, sigma, radius, width_rule=rule) \
                if wcur != hcur else Bv
            Av = Bv if Av is None else Bv @ Av
            Aw = Bw if Aw is None else Bw @ Aw
        elif kind == "mix":
            m = np.asarray(params, np.float64)
            if m.ndim != 2 or m.shape[1] != ccur:
                return None
            mix = m if mix is None else m @ mix
            ccur = m.shape[0]
        else:
            return None
    if Av is None:
        Av = np.eye(hcur)
    if Aw is None:
        Aw = np.eye(wcur)
    return Av, Aw, mix, hcur, wcur, ccur


@functools.lru_cache(maxsize=64)
def _chain_runner(H: int, W: int, C: int, prefix: tuple,
                  interpret: bool = False):
    """A jitted (H, W, C) -> (Hout, Wout, Cout) kernel runner, or None."""
    import jax
    import jax.numpy as jnp

    from .fused_pipeline import fused_linear_pipeline

    plan = _plan_chain(H, W, C, prefix)
    if plan is None:
        return None
    Mv, Mw, mix, Hout, Wout, Cout = plan
    Hp, Wp = _aligned_dims(H, W, C)
    if (Hp, Wp) != (H, W):
        # zero-extend the operators over the pad; the kernel then sees a
        # structurally born-aligned (Hp, Wp, C) image (see NO_PAD note)
        Mv = np.pad(Mv, ((0, 0), (0, Hp - H)))
        Mw = np.pad(Mw, ((0, 0), (0, Wp - W)))
    probe = jax.ShapeDtypeStruct((1, Hp, Wp, C), jnp.float32)
    ok = fused_linear_pipeline(probe, [(Mv, Mw)], C, mix=mix,
                               interpret=interpret, plan_only=True)
    if not ok:
        return None

    @jax.jit
    def run(x):
        if (Hp, Wp) != (H, W):
            x = jnp.pad(x, ((0, Hp - H), (0, Wp - W), (0, 0)))
        out = fused_linear_pipeline(x[None], [(Mv, Mw)], C, mix=mix,
                                    interpret=interpret)
        return out[0]

    return run


@functools.lru_cache(maxsize=64)
def _batch_runner(N: int, H: int, W: int, C: int, prefix: tuple,
                  interpret: bool = False):
    """Jitted runner over a BATCH of N same-shape images sharing one
    chain: the images are stacked inside the program (so the whole batch
    is one device dispatch) and run through one kernel call — this is the
    CLI/wand batch path that matches bench.py's batched kernel shape."""
    import jax
    import jax.numpy as jnp

    from .fused_pipeline import fused_linear_pipeline

    plan = _plan_chain(H, W, C, prefix)
    if plan is None:
        return None
    Mv, Mw, mix, Hout, Wout, Cout = plan
    Hp, Wp = _aligned_dims(H, W, C)
    if (Hp, Wp) != (H, W):
        Mv = np.pad(Mv, ((0, 0), (0, Hp - H)))
        Mw = np.pad(Mw, ((0, 0), (0, Wp - W)))
    probe = jax.ShapeDtypeStruct((N, Hp, Wp, C), jnp.float32)
    ok = fused_linear_pipeline(probe, [(Mv, Mw)], C, mix=mix,
                               interpret=interpret, plan_only=True)
    if not ok:
        return None

    @jax.jit
    def run(*xs):
        x = jnp.stack(xs)
        if (Hp, Wp) != (H, W):
            x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        return fused_linear_pipeline(x, [(Mv, Mw)], C, mix=mix,
                                     interpret=interpret)

    return run


@functools.lru_cache(maxsize=64)
def _batch_array_runner(N: int, H: int, W: int, C: int, prefix: tuple,
                        interpret: bool = False):
    """_batch_runner for a BORN-STACKED (N, H, W, C) array: the serve
    daemon's device-resident sessions hold the whole batch as one array,
    so slicing it into N per-image arguments (N eager device ops per
    request) just to re-stack them inside the jit would dominate the
    request cost.  One array in, one kernel call out."""
    import jax
    import jax.numpy as jnp

    from .fused_pipeline import fused_linear_pipeline

    plan = _plan_chain(H, W, C, prefix)
    if plan is None:
        return None
    Mv, Mw, mix, Hout, Wout, Cout = plan
    Hp, Wp = _aligned_dims(H, W, C)
    if (Hp, Wp) != (H, W):
        Mv = np.pad(Mv, ((0, 0), (0, Hp - H)))
        Mw = np.pad(Mw, ((0, 0), (0, Wp - W)))
    probe = jax.ShapeDtypeStruct((N, Hp, Wp, C), jnp.float32)
    ok = fused_linear_pipeline(probe, [(Mv, Mw)], C, mix=mix,
                               interpret=interpret, plan_only=True)
    if not ok:
        return None

    @jax.jit
    def run(x):
        if (Hp, Wp) != (H, W):
            x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        return fused_linear_pipeline(x, [(Mv, Mw)], C, mix=mix,
                                     interpret=interpret)

    return run


def try_fused_batch_array(x, tags: List[Optional[tuple]],
                          alpha: bool = False):
    """try_fused_batch over one (N, H, W, C) device array (no host-side
    per-image slicing).  Returns the (N, Hout, Wout, Cout) result or
    None when the chain/shape leaves the kernel envelope."""
    if not ENABLED or getattr(x, "ndim", 0) != 4 or \
            str(x.dtype) != "float32":
        return None
    N, H, W, C = map(int, x.shape)
    if (H < 8 or W * C < 128 or C > _MAX_CHANNELS
            or H > _MAX_DIM or W > _MAX_DIM):
        return None
    if not _shape_safe(H, W, C, FORCE_INTERPRET):
        return None
    if alpha and not _fully_opaque(x):
        return None
    n = match_prefix(tags)
    if n != len(tags) or n == 0:
        return None
    try:
        run = _batch_array_runner(N, H, W, C, tuple(tags),
                                  interpret=FORCE_INTERPRET)
        if run is None:
            return None
        out = run(x)
        COUNTS["pallas"] += 1
        return out
    except Exception:            # noqa: BLE001 — transparent fallback
        if STRICT:
            raise
        COUNTS["error"] += 1
        return None


def try_fused_batch(datas, tags: List[Optional[tuple]], alpha: bool = False):
    """Batch variant of try_fused_chain: ``datas`` is a sequence of N
    same-shape (H, W, C) arrays sharing one FULLY-tagged chain.  Returns
    the (N, Hout, Wout, Cout) result or None."""
    if not ENABLED or not datas:
        return None
    d0 = datas[0]
    if getattr(d0, "ndim", 0) != 3 or str(d0.dtype) != "float32":
        return None
    H, W, C = map(int, d0.shape)
    if (H < 8 or W * C < 128 or C > _MAX_CHANNELS
            or H > _MAX_DIM or W > _MAX_DIM):
        return None
    if any(tuple(map(int, d.shape)) != (H, W, C) for d in datas[1:]):
        return None
    if not _shape_safe(H, W, C, FORCE_INTERPRET):
        return None
    if alpha and not all(_fully_opaque(d) for d in datas):
        return None
    n = match_prefix(tags)
    if n != len(tags) or n == 0:
        return None
    try:
        run = _batch_runner(len(datas), H, W, C, tuple(tags),
                            interpret=FORCE_INTERPRET)
        if run is None:
            return None
        return run(*datas)
    except Exception:            # noqa: BLE001 — transparent fallback
        if STRICT:
            raise
        COUNTS["error"] += 1
        return None


def match_prefix(tags: List[Optional[tuple]]) -> int:
    """Length of the leading run of kernel-expressible tags — at least
    one spatial op (resize/gblur) required for dispatch to pay."""
    n = 0
    for t in tags:
        if t is None or t[0] not in ("resize", "gblur", "mix"):
            break
        n += 1
    if not any(t[0] in ("resize", "gblur") for t in tags[:n]):
        return 0
    return n


def try_fused_chain(data, tags: List[Optional[tuple]], alpha: bool = False
                    ) -> Optional[Tuple[object, int]]:
    """Dispatch the longest expressible prefix of a tagged lazy chain.

    data: (H, W, C) f32 device array.  tags: one entry per pending op
    (None = not expressible).  alpha: the image spec carries alpha (the
    trailing channel) — dispatch requires it fully opaque, see
    _fully_opaque.  Returns (out_array, n_ops_consumed) or None when
    nothing dispatches (caller runs the XLA chain).
    """
    if not ENABLED:
        return None
    if getattr(data, "ndim", 0) != 3 or str(data.dtype) != "float32":
        return None
    H, W, C = map(int, data.shape)
    if (H < 8 or W * C < 128 or C > _MAX_CHANNELS
            or H > _MAX_DIM or W > _MAX_DIM):
        return None
    if not _shape_safe(H, W, C, FORCE_INTERPRET):
        return None
    if alpha and not _fully_opaque(data):
        return None
    n = match_prefix(tags)
    if n == 0:
        return None
    try:
        run = _chain_runner(H, W, C, tuple(tags[:n]),
                            interpret=FORCE_INTERPRET)
        if run is None:
            return None
        return run(data), n
    except Exception:            # noqa: BLE001 — accelerate.c:3986-style
        if STRICT:               # transparent fallback to the XLA chain
            raise
        COUNTS["error"] += 1
        return None

"""Benchmark: batched resize+blur+colorspace thumbnail pipeline, MP/s/chip.

Measures BASELINE.md config #1 (768x512 -> Lanczos 256x256 -> Gaussian σ=2
-> sRGB->Gray) on whatever device JAX defaults to (the real TPU chip under
the driver), via the fused Pallas pipeline kernel
(imagemagick_tpu/ops/fused_pipeline.py): the whole chain compiled into two
banded block matmuls per row-tile, one HBM read of the input, one write of
the output.  Input is device-resident in the kernel's flat (N*H, W*C) wire
layout — the layout a decoder upload produces — because feeding an
NHWC-computed value costs a one-time relayout at the kernel boundary.
Falls back to the XLA op pipeline when the fused path declines the shape.

Timing method: the axon tunnel makes ``block_until_ready`` unreliable and
bulk host copies are tunnel-bandwidth-bound, so we sync with a 4-byte
scalar readback and report the *marginal* per-step time of a chained
N-step program vs a 1-step program — pure device throughput, excluding
the fixed RPC round-trip.

Baseline: the reference's only published number is the architecture doc's
`-sharpen` walkthrough (www/architecture.html:883-897): 4.566 iter/s on a
1920x1080 image with all 6 cores ≈ 9.47 MP/s for a full single-socket CPU
on a comparable convolution pipeline.  vs_baseline compares against that
full-socket figure.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_MP_S = 9.47  # reference full-socket MP/s (architecture.html:890)

# The axon worker can hang outright after kernel-crash recoveries (observed:
# even a 4x4 jnp.sum never returns).  The parent process therefore runs the
# measurement in a child with a hard timeout and falls back to the last
# successful figure so the driver always gets its one JSON line.
_LASTGOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_lastgood.json")
_CHILD_ENV = "IMTPU_BENCH_CHILD"
_TIMEOUT_S = int(os.environ.get("IMTPU_BENCH_TIMEOUT", "540"))

import numpy as np

BATCH = 32
H, W, C = 512, 768, 3
# 60 steps => ~28ms of pure device delta between the 1-step and N-step
# programs; a 20-step chain's ~9ms delta drowned in tunnel RPC jitter
# (single-round figures swung 26-45k MP/s for the same cached program)
STEPS = 60

GRAY_MIX = np.array([[0.212656, 0.715158, 0.072186]])  # colorspace.c:886


def pipeline_flat(flat_batch, wscale=None):
    """Fused kernel path on the (N*H, W*C) wire layout."""
    from imagemagick_tpu.ops.fused_pipeline import fused_resize_pipeline

    # TO=128/depth-4 needs ~12.8MB VMEM — measured to compile and run
    # fastest on this exact shape (28.3k MP/s vs 27.0k at depth 3)
    return fused_resize_pipeline(flat_batch, 256, 256, "lanczos", 2.0,
                                 GRAY_MIX, TO=128, nslots=4,
                                 vmem_budget=14 * 1024 * 1024,
                                 in_shape=(BATCH, H, W, C),
                                 wscale=wscale)


def pipeline_xla(batch):
    """XLA op-composition fallback (identical math, op by op)."""
    from imagemagick_tpu.ops import blur as bl
    from imagemagick_tpu.ops import colorspace as cs
    from imagemagick_tpu.ops import resize as rz

    x = rz.resize(batch, 256, 256, "lanczos")
    x = bl.gaussian_blur(x, 0.0, 2.0)
    return cs.convert(x, "srgb", "gray")


def _chain(n, fused):
    import jax
    import jax.numpy as jnp

    # lax.scan, NOT an unrolled Python loop: the round-4 driver bench timed
    # out (540s) because the 60-step UNROLLED pallas chain takes ~10min to
    # remote-compile cold (program size scales the compile helper's cost;
    # the cache had been evicted between the last good run and the driver's
    # end-of-round run).  With scan the body compiles ONCE regardless of n.
    @jax.jit
    def fn(b):
        def body(acc, i):
            if fused:
                # per-step scale on the kernel's (small) weight operand
                # defeats CSE without an extra full-tensor multiply pass
                # over the 151MB input (which tripled HBM traffic/step).
                # 1 + i/64: exactly representable after a bf16 weight
                # split, so the scaled operands stay DISTINCT (1e-6-scale
                # nudges round away in bf16 and the steps CSE to one call).
                # Under scan the scale is loop-carried-traced, so steps
                # cannot CSE either way.
                out = pipeline_flat(b, wscale=1.0 +
                                    i.astype(jnp.float32) * 0.015625)
            else:
                # fallback path: perturb the input (ops are not opaque,
                # so identical inputs would CSE into one step)
                out = pipeline_xla(b * (1.0 + i.astype(jnp.float32) * 1e-6))
            # full sum — a sliced sum lets XLA dead-code whole images out
            # of the (non-opaque) fallback path and under-report
            return acc + jnp.sum(out), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc

    return fn


def _time(fn, x, reps=4):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(x))  # scalar readback forces full execution
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    fused = pipeline_flat(jnp.zeros((BATCH * H, W * C), jnp.float32)) is not None
    if fused:
        x = jax.random.uniform(key, (BATCH * H, W * C), jnp.float32)
    else:
        x = jax.random.uniform(key, (BATCH, H, W, C), jnp.float32)

    one = _chain(1, fused)
    many = _chain(STEPS, fused)
    float(one(x))   # compile
    float(many(x))  # compile

    # the worker's throughput drifts between (and within) sessions —
    # observed 26.8-30.8k MP/s for the identical cached program across
    # process runs at a single round.  Take the MEDIAN of 5 per-round
    # marginals: min-of-rounds would cherry-pick anti-correlated jitter
    # (slow t1 + fast tn in one round measured 45k — not real), a single
    # round inherits the session's drift wholesale.
    marginals = []
    for _ in range(5):
        t1 = _time(one, x)
        tn = _time(many, x)
        marginals.append(max((tn - t1) / (STEPS - 1), 1e-9))
    per_step = sorted(marginals)[len(marginals) // 2]

    mp = BATCH * H * W / 1e6  # input megapixels per step
    mp_per_s = mp / per_step
    print(json.dumps({
        "metric": "thumbnail_pipeline_megapixels_per_sec",
        "value": round(mp_per_s, 2),
        "unit": "MP/s/chip (768x512->256x256 lanczos + gaussian2 + gray, "
                "batch 32%s)" % (", fused-pallas" if fused else ""),
        "vs_baseline": round(mp_per_s / BASELINE_MP_S, 2),
    }))


def _supervise():
    """Run the measurement in a watchdogged child; retry once (a first
    attempt can hit a cold remote-compile that the retry then finds cached),
    fall back to the last good figure only if both attempts fail."""
    env = dict(os.environ)
    env[_CHILD_ENV] = "1"
    attempts = int(os.environ.get("IMTPU_BENCH_ATTEMPTS", "2"))
    exc = None
    for attempt in range(attempts):
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               capture_output=True, text=True,
                               timeout=_TIMEOUT_S, env=env)
            for line in (r.stdout or "").splitlines():
                line = line.strip()
                if line.startswith("{"):
                    rec = json.loads(line)
                    if "metric" in rec and "value" in rec:
                        with open(_LASTGOOD, "w") as f:
                            json.dump(rec, f)
                        print(json.dumps(rec))
                        return
            raise RuntimeError("no JSON line from child:\n" +
                               (r.stderr or ""))
        except (subprocess.TimeoutExpired, RuntimeError,
                json.JSONDecodeError) as e:
            exc = e
    if os.path.exists(_LASTGOOD):
        rec = json.load(open(_LASTGOOD))
        rec["unit"] = rec.get("unit", "") + \
            " [last-good: live run failed/timed out (%s)]" % \
            type(exc).__name__
        print(json.dumps(rec))
    else:
        print(json.dumps({
            "metric": "thumbnail_pipeline_megapixels_per_sec",
            "value": 0.0,
            "unit": "bench failed: %s" % type(exc).__name__,
            "vs_baseline": 0.0,
        }))


if __name__ == "__main__":
    if os.environ.get(_CHILD_ENV) == "1":
        main()
    else:
        _supervise()

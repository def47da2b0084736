"""Benchmark: batched resize+blur+colorspace thumbnail pipeline, MP/s/chip.

Measures BASELINE.md config #1 (768x512 -> Lanczos 256x256 -> Gaussian σ=2
-> sRGB->Gray) as one fused XLA program over a batch, on whatever device
JAX defaults to (the real TPU chip under the driver).

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
import time

import jax
import jax.numpy as jnp

BASELINE_MP_S = 9.47  # reference full-socket MP/s (architecture.html:890)

BATCH = 32
H, W = 512, 768
STEPS = 20


def pipeline(batch):
    from imagemagick_tpu.ops import blur as bl
    from imagemagick_tpu.ops import colorspace as cs
    from imagemagick_tpu.ops import resize as rz

    x = rz.resize(batch, 256, 256, "lanczos")
    x = bl.gaussian_blur(x, 0.0, 2.0)
    return cs.convert(x, "srgb", "gray")


def _chain(n):
    @jax.jit
    def fn(b):
        acc = jnp.float32(0.0)
        for i in range(n):
            # tiny per-step input perturbation defeats CSE between steps
            acc = acc + jnp.sum(pipeline(b + jnp.float32(i) * 1e-12))
        return acc

    return fn


def _time(fn, x, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(x))  # scalar readback forces full execution
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (BATCH, H, W, 3), jnp.float32)

    one = _chain(1)
    many = _chain(STEPS)
    float(one(x))   # compile
    float(many(x))  # compile

    t1 = _time(one, x)
    tn = _time(many, x)
    per_step = max((tn - t1) / (STEPS - 1), 1e-9)

    mp = BATCH * H * W / 1e6  # input megapixels per step
    mp_per_s = mp / per_step
    print(json.dumps({
        "metric": "thumbnail_pipeline_megapixels_per_sec",
        "value": round(mp_per_s, 2),
        "unit": "MP/s/chip (768x512->256x256 lanczos + gaussian2 + gray, batch 32)",
        "vs_baseline": round(mp_per_s / BASELINE_MP_S, 2),
    }))


if __name__ == "__main__":
    main()

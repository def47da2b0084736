"""Multi-config benchmark suite — BASELINE.md configs #1-#5.

The driver's bench.py reports config #1 only; this script measures all
five on whatever device JAX defaults to (the real TPU chip) and prints
one JSON line per config plus an estimated MFU/HBM utilization note.

Timing: chained-N marginal with scalar readback (see bench.py; the axon
tunnel makes block_until_ready unreliable).  Inputs are device-resident.

Run:  python benchmarks.py [--quick]
"""

import json
import sys
import time
import timeit

import jax
import jax.numpy as jnp
import numpy as np

QUICK = "--quick" in sys.argv

RECORDS = []  # every emitted JSON record, for the per-round artifact


def _emit(obj):
    RECORDS.append(obj)
    # flush: the suite runs for many minutes through remote compiles —
    # buffered stdout hides which config a wedged run died in
    print(json.dumps(obj), flush=True)


# v5e peak numbers for utilization estimates
HBM_GBS = 819.0
PEAK_BF16_TF = 394.0


def _time_chain_w(make_step, x, n1=1, n2=11, reps=4):
    """Marginal per-step time where make_step(b, scale) consumes a
    per-step traced scalar on a SMALL kernel operand — anti-CSE with no
    extra full-tensor traffic (the input-perturbation variant below adds
    a whole read+write of the input per step and bills it to the kernel;
    it measured config #1 at 28k where the kernel actually runs 53k).

    The step scale must survive a bf16 weight split: kernels pre-split
    operands to (hi, lo) bf16 (~16-bit combined), where 1+i*1e-6 rounds
    back to IDENTICAL operands and every step CSEs into one call
    (measured: a 31-step chain = 1-step wall time, '16 billion MP/s').
    1 + i/64 is exactly representable in bf16 and keeps steps distinct.

    lax.scan, NOT an unrolled Python loop (round-4 lesson, see bench.py):
    the remote compile helper's cost scales with program SIZE — a 31-step
    unrolled pallas chain compiles cold in ~minutes; the scan body
    compiles ONCE regardless of n."""
    def chain(n):
        @jax.jit
        def f(b):
            def body(acc, i):
                out = make_step(b, 1.0 + i * 0.015625)
                return acc + jnp.sum(out), None
            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(n, dtype=jnp.float32))
            return acc
        return f

    f1, f2 = chain(n1), chain(n2)
    float(f1(x)); float(f2(x))
    t1 = min(timeit.repeat(lambda: float(f1(x)), number=1, repeat=reps))
    tn = min(timeit.repeat(lambda: float(f2(x)), number=1, repeat=reps))
    return max((tn - t1) / (n2 - n1), 1e-9)


def _time_chain_feedback(make_step, x, n1=1, n2=11, reps=4):
    """Marginal per-step time with each step consuming the previous
    step's output — steady-state throughput for shape-preserving steps,
    zero anti-CSE overhead (operands genuinely differ)."""
    def chain(n):
        @jax.jit
        def f(b):
            def body(y, _):
                return make_step(y), None
            y, _ = jax.lax.scan(body, b, None, length=n)
            return jnp.sum(y)
        return f

    f1, f2 = chain(n1), chain(n2)
    float(f1(x)); float(f2(x))
    t1 = min(timeit.repeat(lambda: float(f1(x)), number=1, repeat=reps))
    tn = min(timeit.repeat(lambda: float(f2(x)), number=1, repeat=reps))
    return max((tn - t1) / (n2 - n1), 1e-9)


def _time_chain(make_step, x, n1=1, n2=11, reps=4):
    def chain(n):
        @jax.jit
        def f(b):
            def body(acc, i):
                out = make_step(b * (1.0 + i * 1e-6))
                # FULL sum: slicing (e.g. out[:1]) lets XLA dead-code
                # whole images out of non-opaque steps and under-reports.
                return acc + jnp.sum(out), None
            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(n, dtype=jnp.float32))
            return acc
        return f

    f1, f2 = chain(n1), chain(n2)
    float(f1(x)); float(f2(x))
    t1 = min(timeit.repeat(lambda: float(f1(x)), number=1, repeat=reps))
    tn = min(timeit.repeat(lambda: float(f2(x)), number=1, repeat=reps))
    return max((tn - t1) / (n2 - n1), 1e-9)


def _roofline(name, per, read_px, write_px, flops=0.0):
    """Minimum-traffic roofline note: effective HBM GB/s (+ TF/s when a
    meaningful FLOP count exists) against v5e peaks."""
    traffic = (read_px + write_px) * 4 / 1e9
    rec = {"note": f"{name} roofline",
           "min_traffic_GB": round(traffic, 4),
           "effective_GBs": round(traffic / per, 1),
           "hbm_utilization": round(traffic / per / HBM_GBS, 3)}
    if flops:
        rec["effective_TFs"] = round(flops / per / 1e12, 2)
        rec["mxu_utilization"] = round(flops / per / 1e12 / PEAK_BF16_TF, 4)
    rec["bound"] = ("HBM" if rec["hbm_utilization"] >
                    rec.get("mxu_utilization", 0.0) else "MXU")
    _emit((rec))


def _report(name, mp, per_step, extra=""):
    _emit(({
        "metric": f"bench_{name}_megapixels_per_sec",
        "value": round(mp / per_step, 2),
        "unit": f"MP/s/chip ({extra})",
        "ms_per_step": round(per_step * 1e3, 3),
    }))


def config1_thumbnail():
    """768x512 -> lanczos 256x256 + gaussian2 + gray (fused kernel)."""
    from imagemagick_tpu.ops.fused_pipeline import fused_resize_pipeline

    N, H, W, C = (8, 512, 768, 3) if QUICK else (32, 512, 768, 3)
    mix = np.array([[0.212656, 0.715158, 0.072186]])
    x = jax.random.uniform(jax.random.PRNGKey(0), (N * H, W * C), jnp.float32)

    def step(b, s):
        return fused_resize_pipeline(b, 256, 256, "lanczos", 2.0, mix,
                                     TO=128, nslots=4,
                                     vmem_budget=14 * 1024 * 1024,
                                     in_shape=(N, H, W, C), wscale=s)

    # ~0.4 ms/step: a 10-step delta sits at the tunnel's ~5 ms RPC jitter
    # floor (one run measured an impossible 148% of HBM peak) — use 60
    per = _time_chain_w(step, x, n1=1, n2=61)
    mp = N * H * W / 1e6
    _report("config1_thumbnail", mp, per, "fused pallas, batch %d" % N)
    # HBM utilization note: one read of input + one write of output
    traffic = (x.size + N * 256 * 256) * 4 / 1e9
    _emit(({"note": "config1 HBM utilization",
                      "effective_GBs": round(traffic / per, 1),
                      "peak_GBs": HBM_GBS,
                      "utilization": round(traffic / per / HBM_GBS, 3)}))
    return mp / per


def config1_cli():
    """Config #1 driven through the REAL CLI surface (VERDICT r2 #1):
    device-resident frames -> process() option interpreter -> grouped
    materialize_all -> ONE batched fused Pallas call.  Marginal per-image
    time between two batch sizes excludes the fixed per-call RPC (same
    exclusion bench.py's chained-marginal makes)."""
    import importlib

    from imagemagick_tpu.core.image import Image
    from imagemagick_tpu.core.spec import ImageSpec

    climain = importlib.import_module("imagemagick_tpu.cli.main")
    from imagemagick_tpu.ops import dispatch as dsp

    N1, N2 = (4, 12) if QUICK else (8, 32)
    H, W, C = 512, 768, 3
    datas = [jax.random.uniform(jax.random.PRNGKey(i), (H, W, C),
                                jnp.float32) for i in range(N2)]
    argv = ["-resize", "256x256!", "-gaussian-blur", "0x2",
            "-colorspace", "gray"]

    @jax.jit
    def _sum_all(*xs):
        return sum(jnp.sum(x) for x in xs)

    def run(n):
        st = climain.CLIState()
        for d in datas[:n]:
            st.images.append(climain.LazyImage(
                Image(d, ImageSpec(colorspace="srgb"))))
        climain.process(list(argv), st)
        outs = climain.materialize_all(st.images)
        return float(_sum_all(*[o.data for o in outs]))

    before = dsp.COUNTS["pallas"]
    run(N1); run(N2)                              # compile/warm both
    assert dsp.COUNTS["pallas"] >= before + 2, \
        "CLI chain did not dispatch to the fused kernel"
    # the per-image cost here is host-side CLI interpretation + the
    # batched kernel; python timing on this 1-core box is noisy, so take
    # the median of 5 per-round marginals (observed 112-581 MP/s swings
    # from a single min-of-4 pair)
    margs = []
    for _ in range(5):
        t1 = min(timeit.repeat(lambda: run(N1), number=1, repeat=3))
        t2 = min(timeit.repeat(lambda: run(N2), number=1, repeat=3))
        margs.append(max((t2 - t1) / (N2 - N1), 1e-9))
    per_img = sorted(margs)[len(margs) // 2]
    mp = H * W / 1e6
    _report("config1_cli", mp, per_img,
            f"CLI-driven batch marginal ({N2}-{N1} imgs, fused dispatch)")
    return mp / per_img


def config1_serve():
    """Config #1 through the serve daemon (VERDICT r4 #6): device-resident
    session batches over real HTTP, whole chain as ONE batched Pallas
    call per request (dispatch.try_fused_batch_array), warm executables.
    Marginal per-image time between two session batch sizes — the same
    fixed-cost exclusion config1_cli makes (per-request HTTP + parse +
    the one sync readback cancel in the marginal)."""
    import threading
    from http.client import HTTPConnection
    from urllib.parse import quote

    from imagemagick_tpu import serve

    srv = serve.make_server(port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    NB = 16 if QUICK else 64
    H, W, C = 512, 768, 3
    rng = np.random.default_rng(0)
    args = quote("-resize 256x256! -gaussian-blur 0x2 -colorspace gray")

    def post(path, body=None, headers=None):
        c = HTTPConnection("127.0.0.1", port, timeout=600)
        c.request("POST", path, body=body, headers=headers or {})
        r = c.getresponse()
        out = r.read()
        assert r.status == 200, out
        return json.loads(out)

    raw = (rng.random((NB, H, W, C)) * 255).astype(np.uint8).tobytes()
    post("/session/s1", raw,
         {"X-Shape": f"{NB},{H},{W},{C}", "X-Dtype": "u8"})

    def apply_once(_i=None):
        t0 = time.perf_counter()
        info = post(f"/session/s1/apply?keep=1&args={args}")
        wall = time.perf_counter() - t0
        assert info["path"] == "fused-batch", info
        return wall

    # NO marginal here: the batched kernel runs the whole request in
    # sub-ms, so a batch-size marginal just measures RPC jitter (a first
    # cut reported an impossible 393 GMP/s).  Two honest figures instead:
    # (a) FULL client-observed single-request wall — HTTP + option parse
    # + one fused kernel call + the sync readback (floor on THIS machine:
    # the tunnel's ~23ms readback round trip; on-prem PCIe would be
    # ~100x lower); (b) aggregate throughput with 8 concurrent clients —
    # round trips pipeline (~4.6x measured), which is how a serving
    # deployment actually runs.
    apply_once(); apply_once()                    # compile + warm
    walls = sorted(apply_once() for _ in range(9))
    per = walls[len(walls) // 2]
    mp = NB * H * W / 1e6
    _report(f"config1_serve_batch{NB}", mp, per,
            f"serve daemon, batch {NB}, FULL request wall "
            "(HTTP+parse+fused kernel+sync readback)")

    from concurrent.futures import ThreadPoolExecutor
    nclients, rounds = 8, 3
    with ThreadPoolExecutor(nclients) as ex:
        list(ex.map(apply_once, range(nclients)))     # warm the pool
        t0 = time.perf_counter()
        list(ex.map(apply_once, range(nclients * rounds)))
        wall = time.perf_counter() - t0
    total_mp = nclients * rounds * mp
    _emit(({
        "metric": "bench_config1_serve_concurrent_megapixels_per_sec",
        "value": round(total_mp / wall, 2),
        "unit": f"MP/s/chip (serve daemon, {nclients} concurrent clients"
                f" x batch {NB}, {nclients * rounds} requests, every "
                "request synced)",
        "ms_per_request": round(wall / (nclients * rounds) * 1e3, 2),
    }))
    srv.shutdown()
    return total_mp / wall


def _config2_fidelity_db(step, xf, x1, terms):
    """On-chip kernel output vs float64 host reference, image 0 only
    (24MB readback).  The reference composes the SAME banded linear
    terms in f64 (blur+unsharp incl. edge policy) then the sRGB->Lab->
    sRGB round trip per colorspace.c:722 in f64 — the committed-artifact
    fidelity the round-4 verdict asked to carry next to the MP/s."""
    from imagemagick_tpu.ops import colorspace as cs

    got = np.asarray(step(xf)[0], np.float64)
    xin = np.asarray(x1[0], np.float64)

    def apply(Av, Bw):
        t = np.einsum("hi,ivc->hvc", np.asarray(Av, np.float64), xin)
        return np.einsum("wv,hvc->hwc", np.asarray(Bw, np.float64), t)

    lin0 = np.clip(sum(apply(Av, Bw) for Av, Bw in terms), 0.0, 1.0)
    M = np.asarray(cs._RGB2XYZ, np.float64)
    Mi = np.asarray(cs._XYZ2RGB, np.float64)
    D65 = np.asarray(cs.D65, np.float64)
    eps, K = float(cs.CIE_EPSILON), float(cs.CIE_K)
    x = lin0
    lin = np.where(x <= 0.0404482362771076, x / 12.92,
                   ((x + 0.055) / 1.055) ** 2.4)
    r = (lin @ M.T) / D65
    fv = np.where(r > eps, np.cbrt(r), (K * r + 16) / 116)
    L = 116 * fv[..., 1] - 16
    a = 500 * (fv[..., 0] - fv[..., 1])
    b = 200 * (fv[..., 1] - fv[..., 2])
    fy = (L + 16) / 116
    fx = fy + a / 500
    fz = fy - b / 200

    def finv(f):
        return np.where(f ** 3 > eps, f ** 3, (116 * f - 16) / K)

    Y = np.where(L > K * eps, ((L + 16) / 116) ** 3, L / K)
    xyz2 = np.stack([finv(fx), Y, finv(fz)], -1) * D65
    rgb = xyz2 @ Mi.T
    mn = rgb.min(-1, keepdims=True)
    rgb = np.where(mn < 0, rgb - mn, rgb)
    ref = np.where(rgb <= 0.0031306684425005883, 12.92 * rgb,
                   1.055 * np.maximum(rgb, 1e-300) ** (1 / 2.4) - 0.055)
    ref = np.clip(ref, 0.0, 1.0)
    mse = float(np.mean((got - ref) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-30))


def config2_blur_unsharp_lab():
    """1080p batch: gaussian 0x2 + unsharp 0x1 + sRGB->Lab->sRGB.

    Two variants: op composition (reference threshold semantics) and the
    fused rank-2 separable kernel (blur+unsharp as one Pallas program,
    threshold 0) with the Lab round trip as an XLA epilogue.
    """
    from imagemagick_tpu.ops import blur as bl
    from imagemagick_tpu.ops import colorspace as cs
    from imagemagick_tpu.ops.fused_pipeline import (blur_unsharp_terms,
                                                    fused_linear_pipeline)

    N, H, W, C = (2, 1080, 1920, 3) if QUICK else (8, 1080, 1920, 3)
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, H, W, C), jnp.float32)
    mp = N * H * W / 1e6

    def step_ops(b):
        y = bl.gaussian_blur(b, 0.0, 2.0)
        y = bl.unsharp_mask(y, 0.0, 1.0)
        y = cs.convert(y, "srgb", "lab")
        return cs.convert(y, "lab", "srgb")

    per = _time_chain(step_ops, x, n2=6 if QUICK else 11)
    _report("config2_blur_unsharp_lab", mp, per, f"1080p batch {N}, op path")

    terms = blur_unsharp_terms(H, W, 2.0, 1.0, 1.0)
    xf = x.reshape(N * H, W * C)

    def step_fused(b):
        # TO=128 fills the MXU's M dimension (the kernel is MXU-bound at
        # b3 precision); a 2-deep DMA queue frees the VMEM it needs
        y = fused_linear_pipeline(b, terms, C, TO=128, nslots=2,
                                  in_shape=(N, H, W, C))
        y = cs.convert(y, "srgb", "lab")
        return cs.convert(y, "lab", "srgb")

    from imagemagick_tpu.ops.fused_pipeline import fused_blur_unsharp_pipeline

    def step_fused2(b):
        y = fused_blur_unsharp_pipeline(b, 2.0, 1.0, 1.0, C, TO=128,
                                        nslots=2, in_shape=(N, H, W, C))
        y = cs.convert(y, "srgb", "lab")
        return cs.convert(y, "lab", "srgb")

    def step_fused3(b, s=None):
        # VERDICT r2 #2: the whole chain INCLUDING the Lab round trip as
        # one kernel — the per-pixel Lab math runs as a VPU epilogue on
        # the tile already in VMEM (zero extra HBM traffic).  TO=64 with
        # the raised Mosaic vmem ceiling (round 5): the 11MB default
        # budget silently degraded this shape to TO=32 tiles (1.5x band
        # reread + quarter-height MXU tiles); measured 3,614 -> 4,040
        # MP/s at TO=64/48MB, fidelity 104.3dB vs f64 (two div-free
        # Newton steps on the cbrt seed)
        return fused_blur_unsharp_pipeline(b, 2.0, 1.0, 1.0, C, TO=64,
                                           nslots=2, in_shape=(N, H, W, C),
                                           lab_roundtrip=True, wscale=s,
                                           vmem_budget=48 * 1024 * 1024)

    # headline: two-stage kernel with in-kernel Lab epilogue
    try:
        if step_fused3(xf) is not None:
            per_f3 = _time_chain_w(step_fused3, xf, n2=6 if QUICK else 31)
            _report("config2_fused", mp, per_f3,
                    f"1080p batch {N}, two-stage pallas, in-kernel lab")
            px = N * H * W * C
            _roofline("config2_fused", per_f3, px, px)
            try:
                _emit({"note": "config2 fidelity (on-chip vs f64 host)",
                       "psnr_dB": round(_config2_fidelity_db(
                           step_fused3, xf, x[:1], terms), 1)})
            except Exception as exc:  # noqa: BLE001
                _emit({"note": "config2 fidelity check failed",
                       "error": str(exc)[:120]})
            return mp / per_f3
    except Exception as exc:
        _emit(({"note": "config2 in-kernel-lab variant failed",
                          "error": str(exc)[:120]}))
    try:
        if fused_blur_unsharp_pipeline(xf, 2.0, 1.0, 1.0, C, TO=128,
                                       nslots=2,
                                       in_shape=(N, H, W, C)) is not None:
            per_f2 = _time_chain(step_fused2, xf, n2=6 if QUICK else 11)
            _report("config2_fused_xla_lab", mp, per_f2,
                    f"1080p batch {N}, two-stage pallas + lab epilogue")
            px = N * H * W * C
            _roofline("config2_fused", per_f2, 3 * px, 3 * px)
            return mp / per_f2
    except Exception as exc:
        _emit(({"note": "config2 two-stage variant failed",
                          "error": str(exc)[:120]}))

    if fused_linear_pipeline(xf, terms, C, TO=128, nslots=2,
                             in_shape=(N, H, W, C)) is not None:
        per_f = _time_chain(step_fused, xf, n2=6 if QUICK else 11)
        _report("config2_fused_rank2", mp, per_f,
                f"1080p batch {N}, rank-2 pallas + lab epilogue")
        px = N * H * W * C
        _roofline("config2_fused", per_f, 3 * px, 3 * px)
        return mp / per_f
    return mp / per


def config3_document():
    """Document batch: otsu + open/close square:1 + edge 1."""
    from imagemagick_tpu.ops import blur as bl
    from imagemagick_tpu.ops import morphology as mo
    from imagemagick_tpu.ops import threshold as th

    N = 4 if QUICK else 16
    x = jax.random.uniform(jax.random.PRNGKey(2), (N, 1056, 816, 1),
                           jnp.float32)

    def step(b):
        y = th.auto_threshold(b, "otsu")
        y = mo.morphology(y, "open", "square:1")
        y = mo.morphology(y, "close", "square:1")
        return bl.edge_image(y, 1.0)

    per = _time_chain(step, x, n2=6 if QUICK else 11)
    mp = N * 1056 * 816 / 1e6
    _report("config3_document", mp, per, f"letter-page batch {N}, op path")

    from imagemagick_tpu.ops.pallas_kernels import fused_bilevel_morph_edge
    from imagemagick_tpu.ops.threshold import otsu_threshold_value

    def step_fused(b):
        return fused_bilevel_morph_edge(b, otsu_threshold_value(b))

    if fused_bilevel_morph_edge(x, 0.5) is not None:
        # feedback chain: edge output feeds the next step's otsu, so the
        # histogram genuinely recomputes per step and no perturbation
        # traffic is billed to the kernel
        per_f = _time_chain_feedback(step_fused, x, n2=6 if QUICK else 31)
        _report("config3_fused", mp, per_f,
                f"letter-page batch {N}, fused pallas morph/edge")
        # otsu histogram pass + fused kernel read/write (1 channel)
        px = N * 1056 * 816
        _roofline("config3_fused", per_f, 2 * px, px)
        return mp / per_f
    return mp / per


def config4_fft():
    """4K: forward FFT -> Wiener-style filter -> inverse FFT.

    When the axon worker is in its degraded no-FFT state (see CLAUDE.md)
    ops/fourier.py's probe routes the same pipeline through the exact
    matmul-DFT fallback — a real measurement either way, never a
    last-good figure while the chip is otherwise healthy (VERDICT r2 #8).
    """
    from imagemagick_tpu.ops import fourier as ff

    fft_ok = ff.probe_fft(recheck=True)
    # VERDICT r3 #9: once the FFT probe passes, a later failure must
    # surface as an ERROR — never silently substitute a last-good figure
    config4_fft.probe_ok = bool(fft_ok)
    # round 4: the four-step factored matmul FFT (fourier.py) is the
    # default TPU path — measured 3.0 ms vs XLA's native FFT at 7.2 ms
    # for this exact pipeline, and it never touches an FFT op, so the
    # degraded no-FFT worker state cannot invalidate the number.
    path = ff._resolve_mode()

    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 2160, 4096, 1),
                           jnp.float32)

    def step(b):
        return ff.wiener_deconvolve(b, noise=0.01)

    per = _time_chain(step, x, n2=6)
    mp = 2160 * 4096 / 1e6
    _report("config4_fft_4k", mp, per, f"2160x4096 wiener, {path}")
    n = 2160 * 4096
    import math as _m

    if path == "fft":
        # 2 complex 2-D FFTs: ~2 * 5 N log2(N) real flops over H+W passes
        flops = 2 * 5.0 * n * _m.log2(n)
    elif path == "fourstep":
        # four-step factorization: 8*(n1+n2) real flops/sample per axis
        fac = 0.0
        for ext in (2160, 4096):
            c = ff._fourstep_consts(ext, False)
            fac += (c[0] + c[1]) if c else ext
        flops = 2 * 8.0 * n * fac
    else:
        # 2 complex DFTs as matmuls: 2 * 4 real MACs * N * (H + W)
        flops = 2 * 8.0 * n * (2160 + 4096)
    _roofline("config4_fft", per, 4 * n, n, flops=flops)
    # speed-of-light honesty (VERDICT r3 #9): the theoretical floor is
    # max(HBM traffic bound, DFT FLOP bound) — report both and the
    # implied MP/s ceiling next to the measured figure
    hbm_bound = (4 * n + n) * 4 / (HBM_GBS * 1e9)
    flop_bound = flops / (PEAK_BF16_TF / 2 * 1e12)   # f32 ~ half bf16 peak
    sol = max(hbm_bound, flop_bound)
    _emit(({"note": "config4 speed-of-light",
            "measured_ms": round(per * 1e3, 3),
            "hbm_bound_ms": round(hbm_bound * 1e3, 4),
            "dft_flop_bound_ms": round(flop_bound * 1e3, 4),
            "speed_of_light_MPs": round(mp / sol, 1),
            "fraction_of_sol": round(sol / per, 3)}))
    return mp / per


def config5_thumbnailer():
    """End-to-end thumbnailer: JPEG decode -> resize -> watermark -> encode.

    Host decode/encode dominate through the 0.5MB/s tunnel upload, so the
    corpus is generated locally and the figure reported is images/s of
    the full host+device loop on this machine.
    """
    import tempfile

    from PIL import Image as PImage

    from imagemagick_tpu.models import thumbnailer as tn

    n_images = 16 if QUICK else 64
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i in range(n_images):
            arr = (rng.uniform(0, 1, (512, 768, 3)) * 255).astype(np.uint8)
            p = f"{td}/in_{i:04d}.jpg"
            PImage.fromarray(arr).save(p, "JPEG", quality=90)
            paths.append(p)
        cfg = tn.ThumbnailerConfig(stage_width=768, stage_height=512,
                                   batch_size=16)
        stats = tn.run(paths * 2, f"{td}/out", cfg)  # warm + measured pass
        t0 = time.perf_counter()
        stats = tn.run(paths, f"{td}/out2", cfg)
        dt = time.perf_counter() - t0
    # actual staged volume (DCT-scaled decode stages ~4x less than the
    # source size on this 2x-larger-than-thumb corpus)
    upload_mb = (stats or {}).get("staged_MB", 0.0) / max(n_images, 1)
    _emit(({
        "metric": "bench_config5_thumbnailer_images_per_sec",
        "value": round(n_images / dt, 2),
        "unit": f"images/s end-to-end (decode+resize+encode, {n_images} jpegs)",
        "ms_per_image": round(dt / n_images * 1e3, 2),
        "stats": {k: (round(v, 2) if isinstance(v, float) else v)
                  for k, v in (stats or {}).items()},
        # overlap evidence (VERDICT r3 #8), side by side with the ceiling
        # math: achieved host->device rate, and the img/s the pipeline
        # would reach at 100% overlap (device fully hidden); the residual
        # un-hidden device time is device_drain_wait_s
        "overlap": {
            "achieved_upload_MBps":
                round(n_images * upload_mb / dt, 2),
            "overlap_efficiency": (stats or {}).get("overlap_efficiency"),
            "img_s_at_100pct_overlap":
                round(n_images / max(dt - (stats or {}).get(
                    "device_drain_wait_s", 0.0), 1e-9), 2),
            "note": "tunnel-transfer-bound on this machine: "
                    f"{upload_mb:.2f} MB/img staged via jit-arg transfer "
                    "(DCT-scaled decode); "
                    "img/s at 100% overlap = wall time minus the "
                    "un-hidden device wait (double-buffering hides the "
                    "rest of compute+readback behind decode)",
        },
    }))
    return n_images / dt


_LASTGOOD_PATH = __file__.rsplit("/", 1)[0] + "/.benchmarks_lastgood.json"


def _load_lastgood():
    import os

    if os.path.exists(_LASTGOOD_PATH):
        try:
            with open(_LASTGOOD_PATH) as f:
                return json.load(f)
        except Exception:  # noqa: BLE001
            return {}
    return {}


if __name__ == "__main__":
    results = {}
    last_good = _load_lastgood()
    _ALL = (config1_thumbnail, config1_cli, config1_serve,
            config2_blur_unsharp_lab,
            config3_document, config4_fft, config5_thumbnailer)
    # --only <substr>[,<substr>...]: run a subset (wedge bisection /
    # re-measuring one config without paying the whole suite's compiles)
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    sel = _ALL if not only else tuple(
        fn for fn in _ALL
        if any(s in fn.__name__ for s in only[0].split(",")))
    for fn in sel:
        try:
            results[fn.__name__] = fn()
            last_good[fn.__name__] = results[fn.__name__]
        except Exception as e:  # noqa: BLE001 - keep benching
            # the axon worker sporadically degrades mid-process (generic
            # UNIMPLEMENTED on previously-working kernels); report the
            # last RECORDED good figure (from a prior run's artifact) and
            # mark it "_lastgood" so it cannot be mistaken for a measurement
            msg = {"metric": fn.__name__, "error": str(e)[:200]}
            # never substitute last-good once a config's own health probe
            # passed this run (VERDICT r3 #9) — a post-probe failure is a
            # real error, not worker degradation
            if fn.__name__ in last_good and \
                    not getattr(fn, "probe_ok", False):
                msg["last_good"] = last_good[fn.__name__]
                results[fn.__name__ + "_lastgood"] = last_good[fn.__name__]
            _emit((msg))
    try:
        with open(_LASTGOOD_PATH, "w") as f:
            json.dump(last_good, f)
    except Exception:  # noqa: BLE001
        pass
    _emit(({"summary": {k: round(v, 1) for k, v in results.items()}}))
    # committed per-round artifact (VERDICT r3 #5): every record of this
    # run, measured values only — last-good substitutions carry an
    # explicit "last_good" key and a *_lastgood summary entry
    import os as _os

    art = _os.environ.get("IMTPU_BENCH_ARTIFACT",
                          __file__.rsplit("/", 1)[0] + "/BENCHMARKS_r05.json")
    if only and "IMTPU_BENCH_ARTIFACT" not in _os.environ:
        art += ".partial"  # subset runs must not clobber the round artifact
    try:
        with open(art, "w") as f:
            for rec in RECORDS:
                f.write(json.dumps(rec) + "\n")
    except Exception:  # noqa: BLE001
        pass

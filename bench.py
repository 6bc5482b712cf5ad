"""Benchmark: fused preprocess + int8 inference + YOLO decode + NMS on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N,
   "engine_mode": <flagship>, "modes": {mode: fps, ...}, ...}

Measured program = the full camera-frame pipeline (the analogue of the
reference's per-frame superloop, main.c:42-54): device-resident RGB565
frame batches (pre-generated on device — no host transfer anywhere; in
serving they arrive via the producer ring) run through preprocess + the
54-op int8 graph + YOLO decode + NMS, reduced to a scalar detection count
whose host fetch is the per-iteration sync point.  (Round-1 methodology
generated frames with in-jit RNG each step; that Threefry pass alone cost
~40 ms @32k and diluted the pipeline number — now hoisted out.)

The flagship serving mode is ``pallas_mxu2`` — the WHCN activation-arena
Pallas lowering (MXU 1x1 convs, in-kernel preprocess, one-kernel fused
head) with the fast-bits-v2 single-rounding epilogue (closer to the
float ideal than fast/exact; see ops/int8_fast2.py).  ``fast`` (stock
XLA ops), ``pallas_mxu`` (v1 bits) and ``pallas_mxu_exact`` are
benchmarked alongside so BENCH_r*.json pins the framework-kernels-vs-XLA
comparison in hardware; a mode that fails to compile FAILS the benchmark
(no silent fallback).

Methodology note: on this tunnel-attached TPU, ``jax.block_until_ready``
can return before remote execution finishes, so completion is always
forced by fetching a scalar result.  Two numbers are reported: the
synchronous per-batch latency (p50, includes the fixed ~24 ms tunnel round
trip per dispatch) and the serving throughput measured with one-batch-deep
pipelining — dispatch batch k+1 before fetching batch k's count, exactly
the ``host/streamer.py`` serving loop — which overlaps device compute with
the link round trip.  vs_baseline is the ratio to the 50,000
frames/sec/chip north-star target (BASELINE.json).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 50_000.0
TFLITE = "/root/reference/yoloface/tflite/yoloface_int8.tflite"
# The axon tunnel has documented transient outages (ROADMAP round 3:
# one UNAVAILABLE at import zeroed the whole round's perf evidence,
# BENCH_r03.json rc=1).  The driver runs bench.py exactly once per
# round, so the bench itself owns availability: poll the tunnel health
# endpoint and retry the first device op for a bounded window before
# failing loudly.  BENCH_TPU_WAIT_S=0 disables (e.g. CPU smoke runs).
TPU_HEALTH_URL = os.environ.get("BENCH_TPU_HEALTH_URL",
                                "http://127.0.0.1:8083/health")
TPU_WAIT_S = float(os.environ.get("BENCH_TPU_WAIT_S", "600"))


def _tunnel_healthy(timeout=5.0):
    import urllib.request
    try:
        with urllib.request.urlopen(TPU_HEALTH_URL, timeout=timeout) as r:
            return r.status == 200
    except Exception:
        return False


def _gate_on_tunnel(deadline):
    """Block until the tunnel health endpoint answers, or fail loudly.

    The round-3 outage raised UNAVAILABLE (caught by _retry_tpu); the
    round-4 outage mode is WORSE — backend init simply HANGS (observed:
    ``jax.devices()`` blocks forever while the health endpoint refuses
    connections).  A hang never raises, so the retry wrapper can't save
    us; gate on the health endpoint BEFORE the first device touch so the
    bench either runs or fails with a diagnosable message within
    BENCH_TPU_WAIT_S, never hangs the driver.

    The gate is ADVISORY when the proxy itself is simply absent (e.g. a
    driver topology without the localhost health endpoint): before giving
    up it probes backend init in a SUBPROCESS with a hard timeout — a
    working backend proceeds, a hung/raising one fails loudly.
    """
    if TPU_WAIT_S <= 0 or _tunnel_healthy():
        return
    print("bench: TPU tunnel health endpoint not answering; waiting up to "
          f"{TPU_WAIT_S:.0f}s before touching the backend...", file=sys.stderr)
    while time.time() < deadline:
        if _tunnel_healthy():
            time.sleep(5)  # give the backend a beat after health returns
            return
        time.sleep(10)
    print("bench: health endpoint never answered — probing backend init in "
          "a subprocess (the endpoint may just not exist here)...",
          file=sys.stderr)
    if _backend_probe():
        print("bench: backend is reachable; proceeding without the health "
              "endpoint.", file=sys.stderr)
        return
    raise RuntimeError(
        f"TPU tunnel health endpoint ({TPU_HEALTH_URL}) unreachable for "
        f"{TPU_WAIT_S:.0f}s AND a subprocess backend probe failed — backend "
        "init would hang; failing loudly instead. Set BENCH_TPU_WAIT_S / "
        "BENCH_TPU_HEALTH_URL to adjust.")


def _backend_probe(timeout=180.0):
    """Can a FRESH process initialize the backend and see a TPU?  Runs in a
    subprocess so the round-4 outage mode (backend init hangs forever)
    costs a bounded timeout, never a hung bench."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices()[0])"],
            timeout=timeout, capture_output=True, text=True)
        return r.returncode == 0 and "TPU" in r.stdout
    except Exception:
        return False


def _retry_tpu(fn, what):
    """Run fn(); on UNAVAILABLE backend errors retry for TPU_WAIT_S.

    The window is PER-INCIDENT (opened when the first UNAVAILABLE is
    seen), not per-process: a long multi-mode bench can outlive a
    process-start deadline, which would turn every late transient outage
    into an instant zero-retry failure — the exact evidence loss this
    wrapper exists to prevent."""
    deadline = None
    while True:
        try:
            return fn()
        except Exception as e:  # JaxRuntimeError/RuntimeError: UNAVAILABLE
            msg = str(e)
            if "UNAVAILABLE" not in msg and "Unable to initialize" not in msg:
                raise
            if deadline is None:
                deadline = time.time() + TPU_WAIT_S
            if time.time() >= deadline or TPU_WAIT_S <= 0:
                raise RuntimeError(
                    f"TPU tunnel still unavailable after {TPU_WAIT_S:.0f}s "
                    f"while {what}: {msg}") from e
            print(f"bench: TPU UNAVAILABLE while {what}; waiting for the "
                  "tunnel to recover...", file=sys.stderr)
            while time.time() < deadline and not _tunnel_healthy():
                time.sleep(10)
            time.sleep(5)  # give the backend a beat after health returns
FLAGSHIP = os.environ.get("BENCH_MODE", "pallas_mxu2")
# exact-bits flagship included so deploy-validation perf regressions are
# caught by the driver artifact, not prose (VERDICT r2 weak #6)
EXTRA_MODES = os.environ.get("BENCH_EXTRA_MODES",
                             "fast,pallas_mxu,pallas_mxu_exact").split(",")


def main():
    import jax
    import jax.numpy as jnp
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.pipeline.e2e import FacePipeline
    from yoloface_tpu.runtime.engine import Int8Engine

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    graph = load_tflite(TFLITE)

    _gate_on_tunnel(time.time() + TPU_WAIT_S)

    # two device-resident frame batches (alternate per iteration)
    gen = jax.jit(lambda seed: jax.random.bits(
        jax.random.key(seed), (batch, 112, 112), jnp.uint16))
    frame_bufs = _retry_tpu(lambda: [gen(0), gen(1)],
                            "initializing the TPU backend")
    _retry_tpu(lambda: jax.block_until_ready(frame_bufs),
               "materializing frame batches")

    def build(mode):
        pipe = FacePipeline(Int8Engine(graph, mode=mode))

        @jax.jit
        def step(frames):
            det = pipe._detect_from_rgb565(frames)
            return det["count"].sum()

        return step

    def measure(mode):
        step = build(mode)
        # compile + first run (remote compile service — also retried)
        _retry_tpu(lambda: int(step(frame_bufs[0])),
                   f"compiling mode {mode}")
        # synchronous latency (dispatch + compute + fixed ~24 ms tunnel
        # round trip per fetch — the conservative per-batch number)
        lats = []
        for i in range(iters):
            t1 = time.perf_counter()
            int(step(frame_bufs[i % 2]))   # scalar fetch forces completion
            lats.append(time.perf_counter() - t1)
        # serving throughput: one-batch-deep pipelining, exactly like
        # host/streamer.py — dispatch batch k+1 before fetching k's result
        # so device compute overlaps the link round trip.  The timed
        # window opens BEFORE the first counted dispatch and closes after
        # the last counted fetch (ADVICE r2 #4: no head-start batch).
        t0 = time.perf_counter()
        res = step(frame_bufs[1])
        for i in range(2, iters + 1):
            nxt = step(frame_bufs[i % 2])
            int(res)                       # fetch k-1 while k computes
            res = nxt
        int(res)
        dt = time.perf_counter() - t0
        return batch * iters / dt, float(np.median(lats) * 1e3)

    modes_fps = {}
    for mode in [m for m in EXTRA_MODES if m] + [FLAGSHIP]:
        fps, p50 = measure(mode)
        modes_fps[mode] = round(fps, 1)
        if mode == FLAGSHIP:
            flag_fps, flag_p50 = fps, p50

    # the 448 scale family: framework tiled kernels vs the XLA twin,
    # net-only at a fixed batch (VERDICT r3: the comparison must live in
    # the bench artifact, not prose).  BENCH_448=0 skips it.
    scale448 = {}
    if os.environ.get("BENCH_448", "1") != "0":
        from yoloface_tpu.graph.retarget import retarget_spatial
        from yoloface_tpu.runtime.profiler import macc_per_op
        g448 = retarget_spatial(graph, 8)
        # static MACs/frame (the reference's codegen MACC report role,
        # network_generate_report.txt:488-515) — the profiler's counter,
        # so bench TOPS and the MACC attribution can never drift apart
        macs448 = sum(macc_per_op(g448).values())
        n448 = int(os.environ.get("BENCH_448_BATCH", "1024"))
        x448 = _retry_tpu(lambda: jax.jit(lambda: jax.random.randint(
            jax.random.key(2), (n448, 448, 448, 3), -128, 128,
            jnp.int8))(), "generating the 448 input batch")
        _retry_tpu(lambda: jax.block_until_ready(x448),
                   "materializing the 448 input batch")
        for mode in os.environ.get(
                "BENCH_448_MODES",
                "fast2,pallas_tiled2,pallas_tiled_exact").split(","):
            eng = Int8Engine(g448, mode=mode)
            s = jax.jit(lambda v, eng=eng:
                        eng._forward(v).astype(jnp.int32).sum())
            _retry_tpu(lambda: int(s(x448)),
                       f"compiling 448 mode {mode}")
            t0 = time.perf_counter()
            for _ in range(5):
                int(s(x448))               # sync per batch (fetch each)
            dt = (time.perf_counter() - t0) / 5
            # '_sync' key: per-batch latency incl. the ~24 ms tunnel
            # round trip (distinct key — round-3's unsuffixed key briefly
            # meant a 5-deep-async number; never reuse it)
            scale448[mode + "_sync"] = round(n448 / dt, 1)
            # serving throughput: one-batch-deep pipelining, same
            # methodology as the 56-px flagship number above
            t0 = time.perf_counter()
            r = s(x448)
            for _ in range(2, 6):
                nxt = s(x448)
                int(r)
                r = nxt
            int(r)
            dt = (time.perf_counter() - t0) / 5
            scale448[mode + "_pipelined"] = round(n448 / dt, 1)
        # achieved int8 TOPS at the best pipelined fps, next to the
        # intrinsic ~1.74-TOPS ceiling analysis (docs/PROFILE.md): the
        # graph's depthwise convs are VPU-bound and its 1x1 contractions
        # use K = 4..48 of the MXU's 128-wide axis, so the ceiling is
        # architectural, not a compiler artifact
        best = max((v for k, v in scale448.items()
                    if k.endswith("_pipelined")), default=0.0)
        scale448["achieved_int8_tops"] = round(2 * macs448 * best / 1e12, 3)
        scale448["macs_per_frame"] = macs448

    print(json.dumps({
        "metric": "fused_pipeline_frames_per_sec_per_chip",
        "value": round(flag_fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(flag_fps / BASELINE_FPS, 3),
        "batch": batch,
        "p50_batch_latency_ms": round(flag_p50, 3),
        "engine_mode": FLAGSHIP,
        "modes": modes_fps,
        "scale448_net_fps": scale448,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()

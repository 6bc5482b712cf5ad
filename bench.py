"""Benchmark: fused preprocess + int8 inference + YOLO decode + NMS on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

Measured program = the full camera-frame pipeline (the analogue of the
reference's per-frame superloop, main.c:42-54): RGB565 frames are generated
on-device inside the same jit (no host transfer in the loop), run through
preprocess + the 54-op int8 graph + YOLO decode + NMS, and reduced to a
scalar detection count whose host fetch is the per-iteration sync point.

Methodology note: on this tunnel-attached TPU, ``jax.block_until_ready`` can
return before remote execution finishes, so every iteration fetches a scalar
result to force completion — the conservative (latency-inclusive) number.
vs_baseline is the ratio to the 50,000 frames/sec/chip north-star target
(BASELINE.json)."""

import json
import sys
import time

import numpy as np

BASELINE_FPS = 50_000.0
TFLITE = "/root/reference/yoloface/tflite/yoloface_int8.tflite"


def main():
    import os

    import jax
    import jax.numpy as jnp
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.pipeline.e2e import FacePipeline
    from yoloface_tpu.runtime.engine import Int8Engine

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    # BENCH_MODE picks the engine; "fast" (XLA + float requant) is the
    # current fastest end-to-end path — the per-op Pallas mode wins on conv
    # microbenchmarks but loses on the depthwise/pool VPU glue (see
    # CLAUDE.md perf notes); automatic fallback if a mode fails to compile.
    mode = os.environ.get("BENCH_MODE", "fast")

    graph = load_tflite(TFLITE)

    def build(mode):
        pipe = FacePipeline(Int8Engine(graph, mode=mode))

        @jax.jit
        def step(seed):
            frames = jax.random.bits(jax.random.key(seed),
                                     (batch, 112, 112), jnp.uint16)
            det = pipe._detect_from_rgb565(frames)
            return det["count"].sum()

        return step

    step = build(mode)
    try:
        int(step(0))  # compile + first run
    except Exception as e:
        print(f"# {mode} mode failed ({type(e).__name__}); "
              "falling back to fast", file=sys.stderr)
        mode = "fast"
        step = build(mode)
        int(step(0))

    lats = []
    t0 = time.perf_counter()
    for i in range(iters):
        t1 = time.perf_counter()
        int(step(i + 1))  # scalar fetch forces real completion
        lats.append(time.perf_counter() - t1)
    dt = time.perf_counter() - t0
    fps = batch * iters / dt
    p50_ms = float(np.median(lats) * 1e3)

    print(json.dumps({
        "metric": "fused_pipeline_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "batch": batch,
        "p50_batch_latency_ms": round(p50_ms, 3),
        "engine_mode": mode,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()

"""yoloface-448: the deployed int8 graph spatially retargeted to 448x448
(64x MACC), verified against the stock TFLite reference kernels and
benchmarked on the real TPU.

The reference's scale axis is its 416x416 trainer variant
(`yolov3_train_tf.py:31-32`); this tool exercises the TPU-native
equivalent end-to-end: retarget -> flatbuffer export -> stock-interpreter
bit parity -> XLA serving-path throughput (the VMEM arena modes refuse
448-sized planes by design; `fast` is the scale path).

Usage (real TPU): python tools/yoloface448.py [batch] [iters]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import sys
import time

import numpy as np

TFLITE = "/root/reference/yoloface/tflite/yoloface_int8.tflite"
IMG = "/root/reference/yoloface/small_dataset/img_1087.jpg"
MACC_56 = 1_344_320            # network_generate_report.txt:20
SIZE = 448
FACTOR = SIZE // 56
MACC = MACC_56 * FACTOR * FACTOR


def main():
    import cv2
    import jax
    import jax.numpy as jnp
    import tensorflow as tf
    from yoloface_tpu.graph.retarget import retarget_spatial
    from yoloface_tpu.io.tflite_export import export_tflite
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.runtime.engine import Int8Engine

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    graph = retarget_spatial(load_tflite(TFLITE), FACTOR)

    # 1) bit parity vs the stock reference kernels at 448 (one real image)
    buf = export_tflite(graph)
    it = tf.lite.Interpreter(
        model_content=buf,
        experimental_op_resolver_type=(
            tf.lite.experimental.OpResolverType.BUILTIN_REF))
    it.allocate_tensors()
    img = cv2.cvtColor(cv2.imread(IMG), cv2.COLOR_BGR2RGB)
    x = (cv2.resize(img, (SIZE, SIZE)).astype(np.float32) - 128).astype(
        np.int8)[None]
    it.set_tensor(it.get_input_details()[0]["index"], x)
    it.invoke()
    want = it.get_tensor(it.get_output_details()[0]["index"])
    got = np.asarray(Int8Engine(graph, mode="exact")(x))
    bit_exact = bool(np.array_equal(got, want))

    # 2) TPU throughput: XLA serving paths AND the framework's own tiled
    # kernels (kernels/pallas_tiled.py), device-resident frames
    gen = jax.jit(lambda seed: jax.random.randint(
        jax.random.key(seed), (batch, SIZE, SIZE, 3), -128, 128, jnp.int8))
    xb = [gen(0), gen(1)]
    jax.block_until_ready(xb)

    modes = _os.environ.get(
        "YOLOFACE448_MODES", "fast,fast2,pallas_tiled2").split(",")
    results = {}
    for mode in modes:
        eng = Int8Engine(graph, mode=mode)

        @jax.jit
        def step(frames, eng=eng):
            return eng._forward(frames).astype(jnp.int32).sum()

        int(step(xb[0]))
        t0 = time.perf_counter()
        for i in range(iters):
            int(step(xb[i % 2]))
        dt = (time.perf_counter() - t0) / iters
        results[mode] = {
            "net_ms_per_batch": round(dt * 1e3, 2),
            "frames_per_sec_per_chip": round(batch / dt, 1),
            "int8_tops": round(batch / dt * MACC * 2 / 1e12, 2),
        }

    best = max(results, key=lambda m:
               results[m]["frames_per_sec_per_chip"])
    print(json.dumps({
        "model": "yoloface448_int8 (retargeted x8)",
        "bit_exact_vs_stock_interpreter": bit_exact,
        "macc_per_frame": MACC,
        "batch": batch,
        "best_mode": best,
        **results[best],
        "modes": results,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()

"""TPU-compiled Pallas parity smoke: run EVERY engine mode on the real
chip against the TFLite reference-kernel oracle and record the verdict.

The pytest suite forces the CPU backend (Pallas runs interpreted there);
this tool is the committed hardware evidence that the Mosaic-compiled
kernels are bit-exact — run it each round and commit TPU_SMOKE.json.

Usage: python tools/tpu_smoke.py [out.json]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import sys

import numpy as np

TFLITE = "/root/reference/yoloface/tflite/yoloface_int8.tflite"
IMG = "/root/reference/yoloface/small_dataset/img_1087.jpg"
MODES = ["exact", "fast", "fast2", "pallas", "pallas_exact",
         "pallas_fused", "pallas_fused_exact",
         "pallas_arena", "pallas_arena_exact",
         "pallas_mxu", "pallas_mxu_exact", "pallas_mxu2"]


def main():
    import cv2
    import jax
    import tensorflow as tf
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.runtime.engine import Int8Engine

    out_path = sys.argv[1] if len(sys.argv) > 1 else "TPU_SMOKE.json"
    device = str(jax.devices()[0])
    assert "TPU" in device, f"not on TPU: {device}"

    img = cv2.cvtColor(cv2.imread(IMG), cv2.COLOR_BGR2RGB)
    x = (cv2.resize(img, (56, 56)).astype(np.float32) - 128).astype(
        np.int8)[None]
    x = np.repeat(x, 4, axis=0)          # small batch (pads to lanes)

    it = tf.lite.Interpreter(
        model_path=TFLITE,
        experimental_op_resolver_type=(
            tf.lite.experimental.OpResolverType.BUILTIN_REF))
    it.allocate_tensors()
    it.set_tensor(it.get_input_details()[0]["index"], x[:1])
    it.invoke()
    oracle = it.get_tensor(it.get_output_details()[0]["index"])

    graph = load_tflite(TFLITE)
    twin = {}                             # semantics twin outputs on HW
    results = {}
    for mode in MODES:
        try:
            y = np.asarray(Int8Engine(graph, mode=mode)(x))
            if mode in ("exact", "fast", "fast2"):
                twin[mode] = y
            tw = twin["exact" if mode.endswith("exact")
                      else "fast2" if mode.endswith("2") else "fast"]
            results[mode] = {
                "compiled": True,
                "bit_exact_vs_oracle": bool(np.array_equal(y[:1], oracle)),
                "bit_exact_vs_twin": bool(np.array_equal(y, tw)),
                "batch_consistent": bool((y == y[0:1]).all()),
            }
        except Exception as e:  # noqa: BLE001 - record, don't hide
            results[mode] = {"compiled": False,
                             "error": str(e).splitlines()[0][:200]}
        print(mode, results[mode], flush=True)

    # the 448 scale family on the framework's tiled kernels: every tiled
    # mode must be bit-exact vs its semantics twin ON HARDWARE at the
    # real 448 shapes (kernels/pallas_tiled.py; the 56-net plan above is
    # the arena fallback, which tests nothing new)
    from yoloface_tpu.graph.retarget import retarget_spatial
    g448 = retarget_spatial(graph, 8)
    rng = np.random.default_rng(0)
    x448 = rng.integers(-128, 128, (128, 448, 448, 3)).astype(np.int8)
    twin448 = {}
    tiled = {}
    for mode in ("fast", "fast2", "exact", "pallas_tiled",
                 "pallas_tiled2", "pallas_tiled_exact"):
        try:
            y = np.asarray(Int8Engine(g448, mode=mode)(x448))
            if not mode.startswith("pallas"):
                twin448[mode] = y
                continue
            tw = twin448["exact" if mode.endswith("exact")
                         else "fast2" if mode.endswith("2") else "fast"]
            tiled[mode] = {"compiled": True,
                           "bit_exact_vs_twin": bool(np.array_equal(y, tw))}
        except Exception as e:  # noqa: BLE001 - record, don't hide
            tiled[mode] = {"compiled": False,
                           "error": str(e).splitlines()[0][:200]}
        if mode in tiled:
            print("448", mode, tiled[mode], flush=True)

    # pure-tiled entries: the framework's OWN kernels end to end (fast2
    # AND exact bits — the exact rsm epilogue must see real Mosaic on
    # every section kind), even when DEFAULT_TILE_XLA bakes a hybrid
    # routing into the plain modes
    _os.environ["YOLOFACE_TPU_TILE_XLA"] = "none"
    try:
        for mode, tw in (("pallas_tiled2", "fast2"),
                         ("pallas_tiled_exact", "exact")):
            key = mode + "_pure"
            try:
                y = np.asarray(Int8Engine(g448, mode=mode)(x448))
                tiled[key] = {
                    "compiled": True,
                    "bit_exact_vs_twin": bool(np.array_equal(y, twin448[tw]))}
            except Exception as e:  # noqa: BLE001 - record, don't hide
                tiled[key] = {"compiled": False,
                              "error": str(e).splitlines()[0][:200]}
            print("448", key, tiled[key], flush=True)
    finally:
        del _os.environ["YOLOFACE_TPU_TILE_XLA"]

    # fast-bits modes legitimately differ from the reference kernels by
    # float-rounding drift; exact-bits modes must match the oracle, and
    # EVERY mode must match its semantics twin ("fast"/"exact") in hardware
    ok = (all(r.get("compiled") for r in results.values())
          and all(results[m]["bit_exact_vs_oracle"]
                  for m in results if m.endswith("exact"))
          and all(results[m]["bit_exact_vs_twin"] for m in results)
          and all(r.get("compiled") and r.get("bit_exact_vs_twin")
                  for r in tiled.values()))
    payload = {"device": device, "image": IMG, "ok": ok, "modes": results,
               "tiled448": tiled}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(("OK" if ok else "FAILED"), "->", out_path)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

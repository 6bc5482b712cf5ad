"""Discriminate the v1 WHCN fused-program divergence (448, real chip).

debug448_whcn.py showed NO per-tensor divergence under collect=True
(every tensor materialized -> fusion broken), while the fused all-XLA
v1 hybrid mismatches at batch 128 — an XLA fusion-context miscompile.
Matrix here (all plain fused __call__, WHCN engine vs NHWC engine):

  A. batch 128, default (1x1 convs via dot_general)   - repro baseline
  B. batch 128, YOLOFACE_TPU_WHCN_CGD1X1=1            - 1x1 path culprit?
  C. batch 64, default                                 - batch dependence
  D. batch 128, fast2 (known-green smoke config)       - sanity

Usage (real TPU): python tools/debug448_whcn2.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

TFLITE = "/root/reference/yoloface/tflite/yoloface_int8.tflite"


def main():
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.graph.retarget import retarget_spatial
    from yoloface_tpu.runtime.engine import Int8Engine

    graph = load_tflite(TFLITE)
    g448 = retarget_spatial(graph, 8)
    rng = np.random.default_rng(0)
    x128 = rng.integers(-128, 128, (128, 448, 448, 3)).astype(np.int8)

    ref = {}

    def cmp(label, mode, batch, env=None):
        x = x128[:batch]
        key = (mode, batch)
        if key not in ref:
            ref[key] = np.asarray(Int8Engine(g448, mode=mode)(x))
        for k, v in (env or {}).items():
            _os.environ[k] = v
        try:
            y = np.asarray(Int8Engine(g448, mode=mode,
                                      xla_layout="whcn")(x))
        finally:
            for k in (env or {}):
                del _os.environ[k]
        t = ref[key]
        if np.array_equal(y, t):
            print(f"{label}: BIT-EXACT", flush=True)
        else:
            nbad = int((y != t).sum())
            mx = int(np.abs(y.astype(np.int32) - t.astype(np.int32)).max())
            print(f"{label}: MISMATCH {nbad}/{t.size} max|d|={mx}",
                  flush=True)

    cmp("A fast whcn b128 dotgen", "fast", 128)
    cmp("B fast whcn b128 cgd1x1", "fast", 128,
        {"YOLOFACE_TPU_WHCN_CGD1X1": "1"})
    cmp("C fast whcn b64 dotgen", "fast", 64)
    cmp("D fast2 whcn b128 dotgen", "fast2", 128)


if __name__ == "__main__":
    main()

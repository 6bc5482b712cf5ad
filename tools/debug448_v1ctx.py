"""v1 WHCN twin: is conv_general_dilated 1x1 safe DOWNSTREAM of pallas?

debug448_whcn2.py pinned the v1 no-pallas divergence to the dot_general
1x1 form (conv_general_dilated is bit-exact there) — the MIRROR of the
v2/exact finding (conv_general_dilated miscompiled downstream of a
pallas call, dot_general exact).  Before making the 1x1 lowering
semantics-dependent, verify conv_general_dilated in the v1 HYBRID
context (tiled section 2 pallas_call + WHCN twin sections 0,1,3,suffix):

  A. v1 hybrid default routing, CGD1X1=1  vs fast NHWC
  B. v1 hybrid default routing, dot_general (current, known-bad) control

Usage (real TPU): python tools/debug448_v1ctx.py [batch]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

import numpy as np

TFLITE = "/root/reference/yoloface/tflite/yoloface_int8.tflite"


def main():
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.graph.retarget import retarget_spatial
    from yoloface_tpu.runtime.engine import Int8Engine

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    graph = load_tflite(TFLITE)
    g448 = retarget_spatial(graph, 8)
    rng = np.random.default_rng(0)
    x = rng.integers(-128, 128, (batch, 448, 448, 3)).astype(np.int8)

    ty = np.asarray(Int8Engine(g448, mode="fast")(x))
    print("twin (fast NHWC) done", flush=True)

    def cmp(label, env):
        for k, v in env.items():
            _os.environ[k] = v
        try:
            y = np.asarray(Int8Engine(g448, mode="pallas_tiled")(x))
        finally:
            for k in env:
                del _os.environ[k]
        if np.array_equal(y, ty):
            print(f"{label}: BIT-EXACT", flush=True)
        else:
            nbad = int((y != ty).sum())
            mx = int(np.abs(y.astype(np.int32) - ty.astype(np.int32)).max())
            print(f"{label}: MISMATCH {nbad}/{ty.size} max|d|={mx}",
                  flush=True)

    cmp("A v1 hybrid cgd1x1", {"YOLOFACE_TPU_WHCN_CGD1X1": "1"})
    cmp("B v1 hybrid dotgen (control)", {})


if __name__ == "__main__":
    main()

"""Per-op diff: v1 'fast' WHCN twin vs NHWC twin on the real chip.

tools/debug448_v1.py probe A showed the WHCN-native v1 fast lowering
diverging from NHWC fast with NO pallas_call in the program (~74% of
output cells, max|d|=81) — an XLA-level layout-dependent divergence.
This runs both engines with intermediates and prints the FIRST diverging
tensor and every bad tensor, pinning the op kind.

Usage (real TPU): python tools/debug448_whcn.py [batch] [mode]
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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    mode = sys.argv[2] if len(sys.argv) > 2 else "fast"
    graph = load_tflite(TFLITE)
    g448 = retarget_spatial(graph, 8)

    rng = np.random.default_rng(0)
    x = rng.integers(-128, 128, (batch, 448, 448, 3)).astype(np.int8)

    nhwc = Int8Engine(g448, mode=mode).run_with_intermediates(x)
    print("nhwc done", flush=True)
    whcn = Int8Engine(g448, mode=mode,
                      xla_layout="whcn").run_with_intermediates(x)
    print("whcn done", flush=True)

    by_out = {}
    for op in g448.ops:
        for o in op.outputs:
            by_out[o] = op
    first = None
    for o in sorted(set(nhwc) & set(whcn)):
        a = nhwc[o]
        b = whcn[o]
        if b.ndim == 4 and b.shape != a.shape:
            b = b.transpose(3, 1, 0, 2)      # WHCN -> NHWC
        opn = by_out[o].opname if o in by_out else "?"
        if np.array_equal(a, b):
            continue
        nbad = int((a != b).sum())
        mx = int(np.abs(a.astype(np.int32) - b.astype(np.int32)).max())
        idx = np.argwhere(a != b)
        print(f"t{o} op={by_out[o].index if o in by_out else '?'}:{opn} "
              f"BAD {nbad}/{a.size} max|d|={mx} first={idx[0].tolist()} "
              f"shape={list(a.shape)}", flush=True)
        if first is None:
            first = o
    print("first diverging tensor:", first, flush=True)


if __name__ == "__main__":
    main()

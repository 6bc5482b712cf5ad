"""Bisect the pure-tiled 448 remote-compile failure (HTTP 500).

TPU_SMOKE's `pallas_tiled2_pure` / `pallas_tiled_exact_pure` entries
(YOLOFACE_TPU_TILE_XLA='none') die in the remote compile helper while the
hybrid default compiles fine with tiled section 2.  This tool compiles
(AOT, no execution) the engine with exactly ONE group routed to the
tiled/arena kernels and everything else on the XLA twin, pinning which
section's lowering kills the compiler.  Then the reverse: all-but-one
tiled.

Usage (real TPU): python tools/bisect448_pure.py [batch] [mode]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

import numpy as np

TFLITE = "/root/reference/yoloface/tflite/yoloface_int8.tflite"


def main():
    import jax
    import jax.numpy as jnp
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.graph.retarget import retarget_spatial
    from yoloface_tpu.runtime.engine import Int8Engine
    from yoloface_tpu.kernels.pallas_tiled import plan_tiled_split

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    mode = sys.argv[2] if len(sys.argv) > 2 else "pallas_tiled2"

    graph = load_tflite(TFLITE)
    g448 = retarget_spatial(graph, 8)
    sections, suffix = plan_tiled_split(g448)
    nsec = len(sections)
    names = [str(i) for i in range(nsec)] + (["suffix"] if suffix else [])

    xspec = jax.ShapeDtypeStruct((batch, 448, 448, 3), jnp.int8)

    def try_compile(route, label):
        _os.environ["YOLOFACE_TPU_TILE_XLA"] = route
        try:
            eng = Int8Engine(g448, mode=mode)
            jax.jit(lambda x: eng._forward(x)).lower(xspec).compile()
            print(f"{label:>24s} (xla={route!r}): COMPILES", flush=True)
            return True
        except Exception as e:
            print(f"{label:>24s} (xla={route!r}): FAIL "
                  f"{str(e).splitlines()[0][:110]}", flush=True)
            return False
        finally:
            del _os.environ["YOLOFACE_TPU_TILE_XLA"]

    # one tiled group at a time
    for only in names:
        route = ",".join(n for n in names if n != only)
        try_compile(route, f"only-{only}-tiled")
    # all tiled (the failing smoke config), for the record
    try_compile("none", "pure")


if __name__ == "__main__":
    main()

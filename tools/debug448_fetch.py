"""Discriminate compute-divergence vs host-fetch corruption for tiled448.

Runs the hybrid tiled engine and its XLA twin on the same input, then
compares the two outputs (a) ON DEVICE (jnp.sum(a != b), scalar fetch)
and (b) on host after np.asarray fetches.  If the device comparison is
zero while the host comparison isn't, the miscompare is in the transfer
path (layout misinterpretation over the axon tunnel), not in compute.

Usage (real TPU): python tools/debug448_fetch.py [batch] [mode]
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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    mode = sys.argv[2] if len(sys.argv) > 2 else "pallas_tiled2"
    twin_mode = ("exact" if mode.endswith("exact")
                 else "fast2" if mode.endswith("2") else "fast")

    graph = load_tflite(TFLITE)
    g448 = retarget_spatial(graph, 8)

    rng = np.random.default_rng(0)
    x = rng.integers(-128, 128, (batch, 448, 448, 3)).astype(np.int8)

    twin = Int8Engine(g448, mode=twin_mode)
    tiled = Int8Engine(g448, mode=mode)
    b = twin(x)
    print("twin done", flush=True)
    a = tiled(x)
    print("tiled done", flush=True)

    n_dev = int(jax.jit(lambda a, b: jnp.sum((a != b).astype(jnp.int32)))(a, b))
    an = np.asarray(a)
    bn = np.asarray(b)
    n_host = int((an != bn).sum())
    print(f"device-compare mismatches: {n_dev}", flush=True)
    print(f"host-compare   mismatches: {n_host} / {an.size}", flush=True)
    if n_dev == 0 and n_host:
        print("=> FETCH-PATH CORRUPTION (compute is bit-exact on device)")
    elif n_dev == n_host:
        print("=> genuine compute divergence")
    else:
        print("=> mixed: both compute and fetch differ?!")


if __name__ == "__main__":
    main()

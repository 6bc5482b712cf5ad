"""Pin the pallas_tiled (v1 fast bits) 448 hardware divergence.

bisect448 sections showed EVERY single-tiled-section routing mismatching
mode "fast" with ~74% wrong cells (s0 and s3 byte-identical counts), so
the error is not one section's kernel.  Two orthogonal probes:

  A. all-XLA routing inside the v1 tiled engine (NO pallas_call in the
     program) vs mode "fast" NHWC — isolates the WHCN twin lowering;
  B. each tiled section STANDALONE (twin intermediates in, every tensor
     out) vs the twin's intermediates — isolates each v1 tiled kernel
     with no downstream XLA to miscompile.

Usage (real TPU): python tools/debug448_v1.py [batch]
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
    from yoloface_tpu.kernels.pallas_tiled import (plan_tiled_split,
                                                   _lower_section,
                                                   _build_tiled_section)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    graph = load_tflite(TFLITE)
    g448 = retarget_spatial(graph, 8)
    sections, suffix = plan_tiled_split(g448)
    nsec = len(sections)
    names = [str(i) for i in range(nsec)] + ["suffix"]

    rng = np.random.default_rng(0)
    x = rng.integers(-128, 128, (batch, 448, 448, 3)).astype(np.int8)
    twin = Int8Engine(g448, mode="fast")
    ty = np.asarray(twin(x))
    print("twin (fast NHWC) done", flush=True)

    # ---- A: all-XLA inside the tiled engine (no pallas_call at all)
    _os.environ["YOLOFACE_TPU_TILE_XLA"] = ",".join(names)
    try:
        y = np.asarray(Int8Engine(g448, mode="pallas_tiled")(x))
    finally:
        del _os.environ["YOLOFACE_TPU_TILE_XLA"]
    if np.array_equal(y, ty):
        print("A: all-XLA v1 hybrid == fast NHWC: BIT-EXACT", flush=True)
    else:
        nbad = int((y != ty).sum())
        print(f"A: all-XLA v1 hybrid vs fast NHWC: MISMATCH {nbad} cells "
              f"max|d|={int(np.abs(y.astype(np.int32) - ty.astype(np.int32)).max())}",
              flush=True)

    # ---- B: each tiled section standalone vs twin intermediates
    inter = twin.run_with_intermediates(x)
    npad = (-batch) % 128
    for si in range(nsec):
        sec_ops = sections[si]
        all_produced = {o for op in sec_ops for o in op.outputs}
        sec = _lower_section(g448, sec_ops, False, False,
                             later_needs=all_produced)
        fn = _build_tiled_section(g448, sec)
        env = {}
        for i in sec.inputs:
            v = inter[i]
            if npad:
                v = np.concatenate(
                    [v, np.zeros((npad,) + v.shape[1:], v.dtype)], 0)
            env[i] = jnp.asarray(v.transpose(2, 1, 3, 0))

        def run(env):
            env = dict(env)
            fn(env)
            return {o: env[o] for o in sec.outputs}

        outs = jax.jit(run)(env)
        bad = []
        for o in sec.outputs:
            yv = np.asarray(outs[o]).transpose(3, 1, 0, 2)[:batch]
            tw = inter[o]
            if not np.array_equal(yv, tw):
                bad.append((o, int((yv != tw).sum()),
                            int(np.abs(yv.astype(np.int32)
                                       - tw.astype(np.int32)).max())))
        print(f"B: section {si} standalone: "
              + ("BIT-EXACT" if not bad else f"BAD {bad}"), flush=True)


if __name__ == "__main__":
    main()

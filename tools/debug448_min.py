"""Minimal repro hunt for the tiled448 hardware divergence.

Round-4/5 bisect established (tools/bisect448.py):
  * each tiled section, fed the twin's inputs, is bit-exact on the chip;
  * all-XLA routing inside the tiled mode is bit-exact;
  * in the composed hybrid program with every intermediate observed,
    ONLY t100 (the final 1x1 head conv, op 53) mismatches — its input
    t99 is exact in the same program.

So: does the final conv's XLA lowering change bits when a pallas call
exists in the same program?  Variants (random int8 input, batch 128):
  A: conv alone                               -> reference bits
  B: conv + independent trivial pallas call   -> custom-call presence
  C: conv fed from pallas output via the WHCN->NHWC boundary transpose
  D: conv fed via transpose of a plain XLA tensor (no pallas)

Usage (real TPU): python tools/debug448_min.py [batch]
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.graph.retarget import retarget_spatial
    from yoloface_tpu.runtime.engine import Int8Engine

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128

    graph = load_tflite(TFLITE)
    g448 = retarget_spatial(graph, 8)
    eng = Int8Engine(g448, mode="fast2")
    conv = {fn.out_idx: fn for fn in eng._plan}[100]

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (batch, 56, 56, 32)), jnp.int8)

    def ident_kernel(src, dst):
        dst[...] = src[...]

    def pallas_ident(v):
        blk = (1,) + v.shape[1:]
        idx = lambda i: (i,) + (0,) * (len(v.shape) - 1)
        return pl.pallas_call(
            ident_kernel,
            grid=(v.shape[0],),
            out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            in_specs=[pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
        )(v)

    perm_in, perm_out = (3, 1, 0, 2), (2, 1, 3, 0)  # WHCN<->NHWC

    def fA(x):
        return conv({99: x})

    def fB(x):
        return conv({99: x}), pallas_ident(x)

    def fC(x):
        w = jnp.transpose(x, perm_out)      # NHWC -> WHCN
        w = pallas_ident(w)                 # pallas produces the WHCN val
        return conv({99: jnp.transpose(w, perm_in)})

    def fD(x):
        w = jnp.transpose(x, perm_out)
        return conv({99: jnp.transpose(w, perm_in)})

    yA = np.asarray(jax.jit(fA)(x))
    print("A (conv alone) done", flush=True)
    for name, f, pick in (("B", fB, 0), ("C", fC, None), ("D", fD, None)):
        r = jax.jit(f)(x)
        y = np.asarray(r[pick] if pick is not None else r)
        if np.array_equal(y, yA):
            print(f"{name}: BIT-EXACT vs A", flush=True)
        else:
            nbad = int((y != yA).sum())
            mx = int(np.abs(y.astype(np.int32) - yA.astype(np.int32)).max())
            print(f"{name}: MISMATCH {nbad}/{y.size} cells max|d|={mx}",
                  flush=True)


if __name__ == "__main__":
    main()

"""Shrunken repro attempt for the tiled448 suffix divergence.

Replace the real tiled section 2 with a BLOCKED pallas identity whose
out_specs mimic the real kernel's ((ws,H,C,nt) blocks over grid
(n//nt, nw)), then run the REAL XLA section 3 + the first suffix conv
(op 29, a 1x1) on top.  If t78 diverges from the same chain fed by the
plain XLA value, the trigger is the custom-call output blocking — not
the tiled kernel arithmetic.

Usage (real TPU): python tools/debug448_rep.py [batch]
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
    from yoloface_tpu.kernels import pallas_tiled as PT

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128

    graph = load_tflite(TFLITE)
    g448 = retarget_spatial(graph, 8)
    sections, suffix = PT.plan_tiled_split(g448)

    sec3 = PT._build_xla_section(g448, sections[3], False, True,
                                 later_needs={74, 77, 78})
    conv29 = PT._build_xla_section(g448, [suffix[0]], False, True,
                                   later_needs={78})

    rng = np.random.default_rng(0)
    x = rng.integers(-128, 128, (batch, 112, 112, 24)).astype(np.int8)
    x_whcn = np.transpose(x, (2, 1, 3, 0))   # [W,H,C,N]

    W, H, C, N = x_whcn.shape
    ws, nw, nt = 14, 8, min(128, N)

    def ident_kernel(src, dst):
        dst[...] = src[...]

    def blocked_ident(v):
        blk = (ws, H, C, nt)
        idx = lambda i, j: (j, 0, 0, i)
        return pl.pallas_call(
            ident_kernel,
            grid=(N // nt, nw),
            out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            in_specs=[pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
        )(v)

    def chain(x73):
        env = {73: x73}
        sec3(env)
        conv29(env)
        return env[78], env[77]

    def f_ref(xw):
        return chain(xw)

    def f_pal(xw):
        return chain(blocked_ident(xw))

    r78, r77 = map(np.asarray, jax.jit(f_ref)(x_whcn))
    print("ref chain done", flush=True)
    p78, p77 = map(np.asarray, jax.jit(f_pal)(x_whcn))
    print("pallas chain done", flush=True)

    for name, a, b in (("t77", r77, p77), ("t78", r78, p78)):
        if np.array_equal(a, b):
            print(f"{name}: BIT-EXACT", flush=True)
        else:
            nbad = int((a != b).sum())
            mx = int(np.abs(a.astype(np.int32) - b.astype(np.int32)).max())
            print(f"{name}: MISMATCH {nbad}/{a.size} max|d|={mx}",
                  flush=True)


if __name__ == "__main__":
    main()

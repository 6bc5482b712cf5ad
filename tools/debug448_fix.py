"""Workaround hunt for the tiled448 custom-call-consumer miscompile.

Repro (debug448_rep2): in one jitted program, `conv(jnp.transpose(t73))`
— t73 being the REAL tiled section-2 pallas output — computes wrong
bits on v5e, while t73 fetched from the same program is bit-exact.

This script runs a battery of candidate consumer formulations on the
same t73 inside ONE program and compares each against a clean reference
computed in a separate pallas-free program from the fetched t73:

  raw      conv(transpose(t73))                       (repro control)
  barrier  conv(transpose(optimization_barrier(t73)))
  i32      conv(transpose(t73.astype(i32)).astype(i8))
  pcopy    conv(transpose(pallas_identity(t73)))
  whcn     dot-based conv contracting C directly on WHCN (no transpose)
  csum     channel sum (any C-contraction without conv?)
  tfetch   the transposed tensor itself, fetched

Usage (real TPU): python tools/debug448_fix.py [batch]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

import numpy as np

TFLITE = "/root/reference/yoloface/tflite/yoloface_int8.tflite"
KEEP = 8     # frames fetched/compared (tunnel is ~60 MB/s)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.graph.retarget import retarget_spatial
    from yoloface_tpu.kernels import pallas_tiled as PT
    from yoloface_tpu.runtime.engine import Int8Engine

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128

    graph = load_tflite(TFLITE)
    g448 = retarget_spatial(graph, 8)
    sections, _suffix = PT.plan_tiled_split(g448)
    sec2_t = PT._lower_section(g448, sections[2], False, True,
                               later_needs={73})
    sec2_tiled = PT._build_tiled_section(g448, sec2_t)
    eng = Int8Engine(g448, mode="fast2")
    conv = {fn.out_idx: fn for fn in eng._plan}[78]   # 1x1, 24->8

    w_t = g448.tensor(17)                             # [8,1,1,24] int8
    wmat = jnp.asarray(w_t.data.reshape(8, 24).T.astype(np.int8))

    def whcn_conv(t):          # [W,H,C,N] -> int32 [W,H,O,N] (determin.)
        return lax.dot_general(
            t.astype(jnp.int32), wmat.astype(jnp.int32),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).transpose(0, 1, 3, 2)

    def ident_kernel(src, dst):
        dst[...] = src[...]

    def pallas_ident(v):
        # block under the 16 MB scoped-vmem ceiling (in + out resident)
        wb = max(1, (4 << 20) // (v.shape[1] * v.shape[2] * 128))
        while v.shape[0] % wb:
            wb -= 1
        blk = (wb, v.shape[1], v.shape[2], 128)
        return pl.pallas_call(
            ident_kernel,
            grid=(v.shape[3] // 128, v.shape[0] // wb),
            out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            in_specs=[pl.BlockSpec(blk, lambda i, j: (j, 0, 0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(blk, lambda i, j: (j, 0, 0, i),
                                   memory_space=pltpu.VMEM),
        )(v)

    sec_in = sorted({i for op in sections[2] for i in op.inputs
                     if i >= 0 and g448.tensor(i).data is None
                     and i not in {o for op in sections[2]
                                   for o in op.outputs}})
    rng = np.random.default_rng(0)
    env0 = {}
    for i in sec_in:
        shp = g448.tensor(i).shape
        v = rng.integers(-128, 128, (batch,) + tuple(shp[1:])).astype(np.int8)
        env0[i] = jnp.asarray(np.transpose(v, (2, 1, 3, 0)))

    perm = (3, 1, 0, 2)   # WHCN -> NHWC

    def prog(env0):
        env = dict(env0)
        sec2_tiled(env)
        t73 = env[73]
        out = {"t73": t73[..., :KEEP]}
        out["raw"] = conv({77: jnp.transpose(t73, perm)})[:KEEP]
        tb = lax.optimization_barrier(t73)
        out["barrier"] = conv({77: jnp.transpose(tb, perm)})[:KEEP]
        ti = jnp.transpose(t73.astype(jnp.int32), perm).astype(jnp.int8)
        out["i32"] = conv({77: ti})[:KEEP]
        tp = pallas_ident(t73)
        out["pcopy"] = conv({77: jnp.transpose(tp, perm)})[:KEEP]
        out["whcn"] = whcn_conv(t73)[..., :KEEP]
        out["csum"] = jnp.sum(t73.astype(jnp.int32), axis=2)[..., :KEEP]
        out["tfetch"] = jnp.transpose(t73, perm)[:KEEP]
        return out

    res = jax.jit(prog)(env0)
    res = {k: np.asarray(v) for k, v in res.items()}
    print("program done", flush=True)

    # clean references from the fetched t73 (pallas-free programs)
    t73 = jnp.asarray(res["t73"])

    def ref_prog(t73):
        return {"conv": conv({77: jnp.transpose(t73, perm)}),
                "whcn": whcn_conv(t73),
                "csum": jnp.sum(t73.astype(jnp.int32), axis=2),
                "tfetch": jnp.transpose(t73, perm)}

    ref = {k: np.asarray(v) for k, v in jax.jit(ref_prog)(t73).items()}
    print("reference done", flush=True)

    refs = {"raw": ref["conv"], "barrier": ref["conv"], "i32": ref["conv"],
            "pcopy": ref["conv"], "whcn": ref["whcn"], "csum": ref["csum"],
            "tfetch": ref["tfetch"]}
    for k in ("raw", "barrier", "i32", "pcopy", "whcn", "csum", "tfetch"):
        a, b = res[k], refs[k]
        if np.array_equal(a, b):
            print(f"{k:8s}: BIT-EXACT", flush=True)
        else:
            nbad = int((a != b).sum())
            mx = int(np.abs(a.astype(np.int64)
                            - b.astype(np.int64)).max())
            print(f"{k:8s}: MISMATCH {nbad}/{a.size} max|d|={mx}",
                  flush=True)


if __name__ == "__main__":
    main()

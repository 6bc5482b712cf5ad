"""Round 2 of the tiled448 workaround battery.

debug448_fix established: transpose(t73) is CORRECT when materialized
(tfetch bit-exact), but an int8 conv consuming the (fused) transpose is
miscompiled — dtype roundtrips and pallas copies upstream don't help,
while a dot_general contracting C directly on the WHCN value is exact.

This battery tests (a) the materialization workaround — a barrier
BETWEEN the transpose and the conv — and (b) the full WHCN-native op
set needed to drop boundary transposes altogether: 3x3 conv, depthwise
conv (feature_group_count), and maxpool via reduce_window, all with
WHCN dimension numbers, against references computed from the fetched
t73 in a pallas-free program.

Usage (real TPU): python tools/debug448_fix2.py [batch]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

import numpy as np

TFLITE = "/root/reference/yoloface/tflite/yoloface_int8.tflite"
KEEP = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
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
    conv = {fn.out_idx: fn for fn in eng._plan}[78]

    rng = np.random.default_rng(1)
    w3 = jnp.asarray(rng.integers(-64, 64, (8, 3, 3, 24)), jnp.int8)  # OHWI
    wdw = jnp.asarray(rng.integers(-64, 64, (3, 3, 1, 24)), jnp.int8)  # HWIO

    def conv3_whcn(t):
        return lax.conv_general_dilated(
            t, w3, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("WHCN", "OHWI", "WHCN"),
            preferred_element_type=jnp.int32)

    def dw_whcn(t):
        return lax.conv_general_dilated(
            t, wdw, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("WHCN", "HWIO", "WHCN"),
            feature_group_count=t.shape[2],
            preferred_element_type=jnp.int32)

    def pool_whcn(t):
        return lax.reduce_window(
            t, jnp.int8(-128), lax.max,
            window_dimensions=(2, 2, 1, 1), window_strides=(2, 2, 1, 1),
            padding=[(0, 0)] * 4)

    perm = (3, 1, 0, 2)

    sec_in = sorted({i for op in sections[2] for i in op.inputs
                     if i >= 0 and g448.tensor(i).data is None
                     and i not in {o for op in sections[2]
                                   for o in op.outputs}})
    env0 = {}
    rng0 = np.random.default_rng(0)
    for i in sec_in:
        shp = g448.tensor(i).shape
        v = rng0.integers(-128, 128,
                          (batch,) + tuple(shp[1:])).astype(np.int8)
        env0[i] = jnp.asarray(np.transpose(v, (2, 1, 3, 0)))

    def prog(env0):
        env = dict(env0)
        sec2_tiled(env)
        t73 = env[73]
        out = {"t73": t73[..., :KEEP]}
        tb = lax.optimization_barrier(jnp.transpose(t73, perm))
        out["b_after"] = conv({77: tb})[:KEEP]
        out["conv3"] = conv3_whcn(t73)[..., :KEEP]
        out["dw"] = dw_whcn(t73)[..., :KEEP]
        out["pool"] = pool_whcn(t73)[..., :KEEP]
        return out

    res = {k: np.asarray(v) for k, v in jax.jit(prog)(env0).items()}
    print("program done", flush=True)

    t73 = jnp.asarray(res["t73"])

    def ref_prog(t73):
        return {"b_after": conv({77: jnp.transpose(t73, perm)}),
                "conv3": conv3_whcn(t73), "dw": dw_whcn(t73),
                "pool": pool_whcn(t73)}

    ref = {k: np.asarray(v) for k, v in jax.jit(ref_prog)(t73).items()}
    print("reference done", flush=True)

    for k in ("b_after", "conv3", "dw", "pool"):
        a, b = res[k], ref[k]
        if np.array_equal(a, b):
            print(f"{k:8s}: BIT-EXACT", flush=True)
        else:
            nbad = int((a != b).sum())
            mx = int(np.abs(a.astype(np.int64) - b.astype(np.int64)).max())
            print(f"{k:8s}: MISMATCH {nbad}/{a.size} max|d|={mx}",
                  flush=True)


if __name__ == "__main__":
    main()

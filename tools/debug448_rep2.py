"""Tiled448 divergence repro, stage 2: REAL section-2 kernel upstream.

The blocked-identity pallas producer did NOT reproduce (debug448_rep);
this version runs the REAL tiled section 2 (vs its XLA twin) and then
two downstream consumers of t73:
  probe:  op29's 1x1 conv fn applied DIRECTLY to t73 (shape-polymorphic)
  chain:  the real XLA section 3 (maxpool/pad/dw/leaky) + op29 -> t78
Everything is returned from ONE jit per path so fusion context matches
the failing composed program as closely as possible.

Usage (real TPU): python tools/debug448_rep2.py [batch]
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
    from yoloface_tpu.kernels import pallas_tiled as PT
    from yoloface_tpu.runtime.engine import Int8Engine

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128

    graph = load_tflite(TFLITE)
    g448 = retarget_spatial(graph, 8)
    sections, suffix = PT.plan_tiled_split(g448)

    sec2_xla = PT._build_xla_section(g448, sections[2], False, True,
                                     later_needs={73})
    sec2_t = PT._lower_section(g448, sections[2], False, True,
                               later_needs={73})
    sec2_tiled = PT._build_tiled_section(g448, sec2_t)
    sec3 = PT._build_xla_section(g448, sections[3], False, True,
                                 later_needs={74, 77})
    conv29 = PT._build_xla_section(g448, [suffix[0]], False, True,
                                   later_needs={78})

    # probe: op29's fast2 fn applied directly to t73 (shape-polymorphic)
    eng = Int8Engine(g448, mode="fast2")
    conv29_raw = {fn.out_idx: fn for fn in eng._plan}[78]

    # section 2's input tensors
    sec_in = sorted({i for op in sections[2] for i in op.inputs
                     if i >= 0 and g448.tensor(i).data is None
                     and i not in {o for op in sections[2]
                                   for o in op.outputs}})
    print("sec2 inputs:", sec_in, flush=True)
    rng = np.random.default_rng(0)
    env0 = {}
    for i in sec_in:
        shp = g448.tensor(i).shape
        v = rng.integers(-128, 128, (batch,) + tuple(shp[1:])).astype(np.int8)
        env0[i] = jnp.asarray(np.transpose(v, (2, 1, 3, 0)))  # WHCN

    def path(sec2fn):
        def f(env0):
            env = dict(env0)
            sec2fn(env)
            t73 = env[73]
            probe = conv29_raw({77: jnp.transpose(t73, (3, 1, 0, 2))})
            sec3(env)
            conv29(env)
            return t73, probe, env[77], env[78]
        return f

    A = jax.jit(path(sec2_xla))(env0)
    print("XLA path done", flush=True)
    B = jax.jit(path(sec2_tiled))(env0)
    print("tiled path done", flush=True)

    for name, a, b in zip(("t73", "probe(t73)", "t77", "t78"), A, B):
        a, b = np.asarray(a), np.asarray(b)
        if np.array_equal(a, b):
            print(f"{name}: BIT-EXACT", flush=True)
        else:
            nbad = int((a != b).sum())
            mx = int(np.abs(a.astype(np.int32) - b.astype(np.int32)).max())
            print(f"{name}: MISMATCH {nbad}/{a.size} max|d|={mx}",
                  flush=True)


if __name__ == "__main__":
    main()

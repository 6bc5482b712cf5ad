"""Find the first diverging suffix op of the composed tiled448 program.

The composed hybrid program is bit-exact at every section boundary
(t52..t77) but wrong at t100 — the divergence is inside the XLA suffix
(ops 29-53) and varies with fusion context.  This script rebuilds the
composed program with the suffix forced to OUTPUT EVERY tensor it
produces (later_needs = all), then compares each suffix tensor against
the twin's collect-mode env ON DEVICE (scalar fetches only).

Usage (real TPU): python tools/debug448_suffix.py [batch] [mode]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import sys

import numpy as np

TFLITE = "/root/reference/yoloface/tflite/yoloface_int8.tflite"


def main():
    import jax
    import jax.numpy as jnp
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.graph.retarget import retarget_spatial
    from yoloface_tpu.runtime.engine import Int8Engine
    from yoloface_tpu.kernels import pallas_tiled as PT

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    mode = sys.argv[2] if len(sys.argv) > 2 else "pallas_tiled2"
    exact = mode.endswith("exact")
    v2 = "2" in mode.replace("448", "")
    twin_mode = "exact" if exact else ("fast2" if v2 else "fast")

    graph = load_tflite(TFLITE)
    g448 = retarget_spatial(graph, 8)
    sections, suffix = PT.plan_tiled_split(g448)

    raw = _os.environ.get("YOLOFACE_TPU_TILE_XLA", PT.DEFAULT_TILE_XLA)
    xla_secs = set(raw.split(","))
    # only tensors the twin plan materializes (fast2 fuses conv+leaky,
    # so fused-away conv outputs never exist in its env)
    twin_probe = Int8Engine(g448, mode=twin_mode)
    materialized = {fn.out_idx for fn in twin_probe._plan}
    all_suffix_t = {o for op in suffix for o in op.outputs} & materialized

    plan = []
    all_groups = sections + ([suffix] if suffix else [])
    for si, sec_ops in enumerate(sections):
        later = set(g448.outputs)
        for grp in all_groups[si + 1:]:
            for op in grp:
                later.update(i for i in op.inputs if i >= 0)
        if str(si) in xla_secs:
            plan.append(PT._build_xla_section(g448, sec_ops, exact, v2,
                                              later))
        else:
            sec = PT._lower_section(g448, sec_ops, exact, v2, later)
            plan.append(PT._build_tiled_section(g448, sec))
    sfn = PT._build_xla_section(g448, suffix, exact, v2,
                                later_needs=all_suffix_t | set(g448.outputs))
    plan.append(sfn)

    rng = np.random.default_rng(0)
    x = rng.integers(-128, 128, (batch, 448, 448, 3)).astype(np.int8)

    def fwd(xx):
        env = {0: jnp.transpose(xx, (2, 1, 3, 0))}   # NHWC -> WHCN
        for f in plan:
            f(env)
        # suffix tensors are WHCN in env; return them as-is (compare in
        # the same layout on device)
        return {t: env[t] for t in sorted(all_suffix_t) if t in env}

    aenv = jax.jit(fwd)(x)
    print("composed (suffix-observed) done:", sorted(aenv), flush=True)

    twin = Int8Engine(g448, mode=twin_mode)
    benv = jax.jit(functools.partial(twin._forward, collect=True))(x)
    print("twin collect done", flush=True)

    neq = jax.jit(lambda a, b: jnp.sum((a != b).astype(jnp.int32)))
    perm_out = (2, 1, 3, 0)  # NHWC -> WHCN
    for t in sorted(aenv):
        if t not in benv:
            print(f"t{t}: not in twin env")
            continue
        b = jnp.transpose(benv[t], perm_out)
        n = int(neq(aenv[t], b))
        sz = int(np.prod(aenv[t].shape))
        print(f"t{t:3d} {str(benv[t].shape):24s} "
              f"{'ok' if n == 0 else f'MISMATCH {n}/{sz}'}", flush=True)


if __name__ == "__main__":
    main()

"""Bisect the tiled448 hardware divergence (TPU_SMOKE tiled448 red).

Stage 1 (`sections`): for each tiled section si, route every OTHER
section (and the suffix) to the XLA twin and compare the net output vs
the pure twin on the real chip — pins which section's Mosaic lowering
diverges (CPU interpret is bit-exact, so this is hardware-only).

Stage 2 (`ops <si>`): lower section si with EVERY produced tensor
forced into the section outputs (later_needs = all), feed it the twin's
input activation, and diff each tensor against the twin intermediates —
pins the first diverging op inside the section.

Usage (on the real TPU):
    python tools/bisect448.py sections [batch] [mode]
    python tools/bisect448.py ops <si> [batch] [mode]
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

    cmd = sys.argv[1] if len(sys.argv) > 1 else "sections"
    arg0 = 2 if cmd == "sections" else 3
    batch = int(sys.argv[arg0]) if len(sys.argv) > arg0 else 128
    mode = sys.argv[arg0 + 1] if len(sys.argv) > arg0 + 1 else "pallas_tiled2"
    twin_mode = ("exact" if mode.endswith("exact")
                 else "fast2" if mode.endswith("2") else "fast")

    graph = load_tflite(TFLITE)
    g448 = retarget_spatial(graph, 8)
    sections, suffix = plan_tiled_split(g448)
    nsec = len(sections)
    print(f"{nsec} sections + suffix({len(suffix)} ops); "
          f"section mains:", flush=True)
    for si, s in enumerate(sections):
        names = [f"{op.index}:{op.opname}" for op in s]
        print(f"  [{si}] {names}", flush=True)

    rng = np.random.default_rng(0)
    x = rng.integers(-128, 128, (batch, 448, 448, 3)).astype(np.int8)

    twin = Int8Engine(g448, mode=twin_mode)
    ty = np.asarray(twin(x))
    print(f"twin ({twin_mode}) done", flush=True)

    if cmd == "sections":
        all_names = [str(i) for i in range(nsec)] + ["suffix"]
        for si in range(nsec):
            route = ",".join(n for n in all_names if n != str(si))
            _os.environ["YOLOFACE_TPU_TILE_XLA"] = route
            try:
                y = np.asarray(Int8Engine(g448, mode=mode)(x))
                ok = bool(np.array_equal(y, ty))
                nbad = int((y != ty).sum())
                mx = int(np.abs(y.astype(np.int32)
                                - ty.astype(np.int32)).max())
                print(f"section {si} tiled alone: "
                      f"{'BIT-EXACT' if ok else f'MISMATCH {nbad} cells, max |d|={mx}'}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"section {si} tiled alone: COMPILE FAIL "
                      f"{str(e).splitlines()[0][:160]}", flush=True)
            finally:
                del _os.environ["YOLOFACE_TPU_TILE_XLA"]
        return

    # ---- ops: diff every tensor of one tiled section vs the twin
    si = int(sys.argv[2])
    inter = twin.run_with_intermediates(x)   # NHWC tensors
    sec_ops = sections[si]

    from yoloface_tpu.kernels.pallas_tiled import (_lower_section,
                                                   _build_tiled_section)
    exact = mode.endswith("exact")
    v2 = mode.endswith("2")
    all_produced = {o for op in sec_ops for o in op.outputs}
    sec = _lower_section(g448, sec_ops, exact, v2, later_needs=all_produced)
    fn = _build_tiled_section(g448, sec)
    print(f"section {si}: inputs={sec.inputs} outputs={sec.outputs} "
          f"nw={sec.nw}", flush=True)

    # env inputs in WHCN from the twin intermediates (pad batch to lanes)
    n = batch
    npad = (-n) % 128
    env = {}
    for i in sec.inputs:
        v = inter[i]                       # [N,H,W,C]
        if npad:
            v = np.concatenate(
                [v, np.zeros((npad,) + v.shape[1:], v.dtype)], 0)
        env[i] = jnp.asarray(v.transpose(2, 1, 3, 0))  # -> [W,H,C,N]

    def run(env):
        env = dict(env)
        fn(env)
        return {o: env[o] for o in sec.outputs}

    outs = jax.jit(run)(env)
    first_bad = None
    for op in sec_ops:
        for o in op.outputs:
            if o not in outs:
                continue
            y = np.asarray(outs[o]).transpose(3, 1, 0, 2)[:n]  # WHCN->NHWC
            tw = inter[o]
            if np.array_equal(y, tw):
                print(f"  op {op.index:3d} {op.opname:20s} t{o}: ok",
                      flush=True)
            else:
                nbad = int((y != tw).sum())
                mx = int(np.abs(y.astype(np.int32)
                                - tw.astype(np.int32)).max())
                # locate the mismatch region
                idx = np.argwhere(y != tw)
                print(f"  op {op.index:3d} {op.opname:20s} t{o}: "
                      f"MISMATCH {nbad} cells max|d|={mx} "
                      f"first={idx[0].tolist()} last={idx[-1].tolist()} "
                      f"shape={list(tw.shape)}", flush=True)
                if first_bad is None:
                    first_bad = (op.index, o)
    print("first diverging:", first_bad, flush=True)


if __name__ == "__main__":
    main()

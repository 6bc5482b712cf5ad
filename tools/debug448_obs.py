"""Composed-program intermediate diff for tiled448, device-side compares.

Runs BOTH the hybrid tiled engine and its XLA twin in collect mode and
compares every activation tensor ON DEVICE (scalar fetches only — the
448 intermediates are hundreds of MB and the tunnel moves ~60 MB/s).
Then fetches just the final tensor pair and prints diff-pattern stats
(per-channel diff histogram, spatial-shift checks) to classify the
corruption: bias-like (channel-constant), halo/shift, or layout-permute.

Usage (real TPU): python tools/debug448_obs.py [batch] [mode]
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
    aenv = jax.jit(functools.partial(tiled._forward, collect=True))(x)
    print("tiled collect done", flush=True)
    benv = jax.jit(functools.partial(twin._forward, collect=True))(x)
    print("twin collect done", flush=True)

    neq = jax.jit(lambda a, b: jnp.sum((a != b).astype(jnp.int32)))
    keys = sorted(set(aenv) & set(benv))
    bad = []
    for k in keys:
        if aenv[k].shape != benv[k].shape:
            print(f"t{k}: SHAPE {aenv[k].shape} vs {benv[k].shape}")
            continue
        n = int(neq(aenv[k], benv[k]))
        sz = int(np.prod(aenv[k].shape))
        tag = "ok" if n == 0 else f"MISMATCH {n}/{sz}"
        print(f"t{k:3d} {str(aenv[k].shape):24s} {tag}", flush=True)
        if n:
            bad.append(k)
    if not bad:
        print("all observed tensors bit-exact (observation fixed it?)")
        return

    k = bad[0]
    a = np.asarray(aenv[k]).astype(np.int32)
    b = np.asarray(benv[k]).astype(np.int32)
    d = a - b
    print(f"\n-- first bad tensor t{k} {a.shape} --")
    print("diff range", d.min(), d.max(), " nonzero", (d != 0).mean())
    # channel-constant?
    per_ch = [(c, np.unique(d[..., c]).size, int(np.abs(d[..., c]).max()))
              for c in range(a.shape[-1])]
    print("per-channel (#unique diffs, max|d|):", per_ch)
    # batch dependence: same diff for every frame?
    same_across_batch = bool((d == d[:1]).all())
    print("diff identical across batch:", same_across_batch)
    # spatial shift check: does a shifted b match?
    H = a.shape[1]
    hits = []
    for dy in (-2, -1, 0, 1, 2):
        for dx in (-2, -1, 0, 1, 2):
            if dy == 0 and dx == 0:
                continue
            bs = np.roll(b, (dy, dx), axis=(1, 2))
            m = (a == bs).mean()
            if m > 0.9:
                hits.append((dy, dx, round(float(m), 4)))
    print("shift matches >0.9:", hits)
    # is `a` a pure function of `b` cellwise (value remap)?
    pairs = np.stack([b.ravel(), a.ravel()], 1)
    uniq = np.unique(pairs, axis=0)
    bvals, counts = np.unique(uniq[:, 0], return_counts=True)
    print("value-remap?  max images per input value:", counts.max())


if __name__ == "__main__":
    main()

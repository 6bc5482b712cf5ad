"""Mosaic lowering micro-probes for the 448 tiled-arena design.

Questions (run on real TPU):
  A. Does a plain-dim SPLIT reshape on an int8 4D value lower?
     ([W,H,C,N] -> [W/2,2,H,C,N], minor (C,N) untouched) — would give
     stride-2 phase selection on loaded values without int32 refs.
  B. Does a fori_loop with dynamic-offset ref reads + per-position int8
     MXU dots lower, and what is the per-dot cost at strip scale?
  C. 3D dot 'oc,pcn->pon' at 448-scale position counts vs the per-h
     fori_loop of 2D dots.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NT = 128
    W, H, C = 32, 224, 8

    rng = np.random.default_rng(0)
    x = rng.integers(-128, 128, (W, H, C, NT)).astype(np.int8)
    w8 = rng.integers(-127, 128, (8, C)).astype(np.int8)
    x = jax.device_put(x)
    w8 = jax.device_put(w8)

    def timeit(name, f, *a):
        jf = jax.jit(f)
        y = jf(*a)
        np.asarray(jax.tree.leaves(y)[0]).ravel()[0]
        t0 = time.perf_counter()
        for _ in range(20):
            y = jf(*a)
        np.asarray(jax.tree.leaves(y)[0]).ravel()[0]
        print(f"{name:>28s}: {(time.perf_counter()-t0)/20*1e3:7.3f} ms",
              flush=True)

    # ---- A: plain-dim split reshape on int8 value
    def kA(x_ref, o_ref):
        v = x_ref[:]                                 # [W,H,C,NT] int8
        v5 = v.reshape(W // 2, 2, H, C, NT)
        even = v5[:, 0]                              # [W/2,H,C,NT]
        o_ref[:] = even

    try:
        f = pl.pallas_call(
            kA, out_shape=jax.ShapeDtypeStruct((W // 2, H, C, NT), jnp.int8))
        y = np.asarray(jax.jit(f)(x))
        ok = np.array_equal(y, x[::2])
        print("A split-reshape int8:", "OK bit-exact" if ok else "WRONG",
              flush=True)
    except Exception as e:
        print("A split-reshape int8: FAIL:", str(e).splitlines()[0][:160],
              flush=True)

    # ---- B: fori_loop over h, dynamic ref read, per-position dots
    def kB(x_ref, w_ref, o_ref):
        wv = w_ref[:]

        def body(h, _):
            col = x_ref[:, pl.ds(h, 1), :, :]        # [W,1,C,NT] int8
            outs = []
            for wp in range(W):
                d = lax.dot_general(wv, col[wp, 0],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                outs.append(d)
            acc = jnp.stack(outs, 0)                 # [W,8,NT] i32
            o_ref[:, pl.ds(h, 1), :, :] = (
                acc.reshape(W, 1, 8, NT).astype(jnp.int8))
            return 0

        lax.fori_loop(0, H, body, 0)

    try:
        f = pl.pallas_call(
            kB, out_shape=jax.ShapeDtypeStruct((W, H, 8, NT), jnp.int8))
        y = np.asarray(jax.jit(f)(x, w8))
        want = np.einsum("oc,whcn->whon", w8.astype(np.int32),
                         x.astype(np.int32)).astype(np.int8)
        print("B fori+dyn-ref+dots:",
              "OK bit-exact" if np.array_equal(y, want) else "WRONG",
              flush=True)
        timeit("B fori dots (W*H=%d)" % (W * H), f, x, w8)
    except Exception as e:
        print("B fori dots: FAIL:", str(e).splitlines()[0][:160], flush=True)

    # ---- C: 3D dot 'oc,pcn->pon' with flattened positions
    def kC(x_ref, w_ref, o_ref):
        v = x_ref[:].reshape(W * H, C, NT)
        wv = w_ref[:]
        d = lax.dot_general(wv, v, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
        # d: [8, W*H, NT]
        o_ref[:] = d.transpose(1, 0, 2).reshape(W, H, 8, NT).astype(jnp.int8)

    try:
        f = pl.pallas_call(
            kC, out_shape=jax.ShapeDtypeStruct((W, H, 8, NT), jnp.int8))
        y = np.asarray(jax.jit(f)(x, w8))
        want = np.einsum("oc,whcn->whon", w8.astype(np.int32),
                         x.astype(np.int32)).astype(np.int8)
        print("C 3D dot:",
              "OK bit-exact" if np.array_equal(y, want) else "WRONG",
              flush=True)
        timeit("C 3D dot", f, x, w8)
    except Exception as e:
        print("C 3D dot: FAIL:", str(e).splitlines()[0][:160], flush=True)


def main2():
    """B2: chunked fori (one dynamic chunk read, static inner slices,
    unrolled dots per chunk) and D: fully unrolled grid-step chunking."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import time

    NT = 128
    W, H, C = 32, 224, 8
    CH = 16                                       # h-chunk
    rng = np.random.default_rng(0)
    x = rng.integers(-128, 128, (W, H, C, NT)).astype(np.int8)
    w8 = rng.integers(-127, 128, (8, C)).astype(np.int8)
    want = np.einsum("oc,whcn->whon", w8.astype(np.int32),
                     x.astype(np.int32)).astype(np.int8)
    x = jax.device_put(x)
    w8 = jax.device_put(w8)

    def timeit(name, f, *a):
        jf = jax.jit(f)
        y = jf(*a)
        np.asarray(jax.tree.leaves(y)[0]).ravel()[0]
        t0 = time.perf_counter()
        for _ in range(20):
            y = jf(*a)
        np.asarray(jax.tree.leaves(y)[0]).ravel()[0]
        print(f"{name:>28s}: {(time.perf_counter()-t0)/20*1e3:7.3f} ms",
              flush=True)

    def kB2(x_ref, w_ref, o_ref):
        wv = w_ref[:]

        def body(hc, _):
            h0 = hc * CH
            chunk = x_ref[:, pl.ds(h0, CH), :, :]     # [W,CH,C,NT]
            outs = []
            for wp in range(W):
                for hh in range(CH):
                    d = lax.dot_general(wv, chunk[wp, hh],
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                    outs.append(d)
            acc = jnp.stack(outs, 0).reshape(W, CH, 8, NT)
            o_ref[:, pl.ds(h0, CH), :, :] = acc.astype(jnp.int8)
            return 0

        lax.fori_loop(0, H // CH, body, 0)

    try:
        f = pl.pallas_call(
            kB2, out_shape=jax.ShapeDtypeStruct((W, H, 8, NT), jnp.int8))
        y = np.asarray(jax.jit(f)(x, w8))
        print("B2 chunked fori:",
              "OK bit-exact" if np.array_equal(y, want) else "WRONG",
              flush=True)
        timeit("B2 chunked fori", f, x, w8)
    except Exception as e:
        print("B2: FAIL:", str(e).splitlines()[0][:160], flush=True)

    # D: 2D grid over h-chunks, fully static kernel
    def kD(x_ref, w_ref, o_ref):
        wv = w_ref[:]
        chunk = x_ref[:]                              # [W,CH,C,NT] block
        outs = []
        for wp in range(W):
            for hh in range(CH):
                d = lax.dot_general(wv, chunk[wp, hh],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                outs.append(d)
        o_ref[:] = jnp.stack(outs, 0).reshape(W, CH, 8, NT).astype(jnp.int8)

    try:
        f = pl.pallas_call(
            kD,
            grid=(H // CH,),
            in_specs=[pl.BlockSpec((W, CH, C, NT), lambda i: (0, i, 0, 0)),
                      pl.BlockSpec((8, C), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((W, CH, 8, NT), lambda i: (0, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((W, H, 8, NT), jnp.int8))
        y = np.asarray(jax.jit(f)(x, w8))
        print("D grid-chunk static:",
              "OK bit-exact" if np.array_equal(y, want) else "WRONG",
              flush=True)
        timeit("D grid-chunk static", f, x, w8)
    except Exception as e:
        print("D: FAIL:", str(e).splitlines()[0][:160], flush=True)


if __name__ == "__main__":
    import sys as s
    if len(s.argv) > 1 and s.argv[1] == "2":
        main2()
    else:
        main()

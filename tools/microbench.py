"""In-kernel cost isolation for the Pallas int8 kernels (run on real TPU).

Times one dw-conv-shaped Pallas kernel per variant, chained sequentially
inside a single jit (each call's output feeds the next call's input, so XLA
cannot elide or overlap iterations), with a scalar fetch as the sync point.

Variants isolate: the pure tile-copy floor, int8->int32 widening loads,
sublane-offset window reads, strided (stride-2) ref reads, the float32
requant chain, the exact gemmlowp chain, and an all-int32 arena.

Usage: python tools/microbench.py [batch] [C] [S]   (defaults 32768 8 28)
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import sys
import time

import numpy as np


def conv1x1_probe():
    """How does Mosaic lower dot_general on [Ci,W,H,N]?  Compare the 4D
    dot_general, a per-W-column 3D dot_general, and an explicit FMA loop at
    a representative 1x1-conv shape.  Usage:
        python tools/microbench.py conv1x1 [batch] [Ci] [Co] [S]
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    argv = sys.argv[2:]
    batch = int(argv[0]) if len(argv) > 0 else 32768
    CI = int(argv[1]) if len(argv) > 1 else 36
    CO = int(argv[2]) if len(argv) > 2 else 24
    S = int(argv[3]) if len(argv) > 3 else 14
    NT = 128
    REPS = 20
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (CI, S, S, batch)), jnp.int8)
    w = jnp.asarray(rng.integers(-64, 64, (CI, CO)), jnp.int8)

    def pcall(kern):
        def call(y):
            return pl.pallas_call(
                kern,
                grid=(batch // NT,),
                in_specs=[
                    pl.BlockSpec((CI, S, S, NT), lambda i: (0, 0, 0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((CI, CO), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((CI, S, S, NT),
                                       lambda i: (0, 0, 0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((CI, S, S, batch), jnp.int8),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(y, w)
        return call

    def finish(o, xr, acc):
        r = jnp.clip(acc >> 7, -128, 127).astype(jnp.int8)
        o[:CO] = r
        if CO < CI:
            o[CO:] = xr[CO:]

    def k_dot4d(xr, wr, o):
        acc = lax.dot_general(wr[:], xr[:].astype(jnp.int8),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        finish(o, xr, acc)

    def k_dot3d(xr, wr, o):
        cols = []
        wv = wr[:]
        for wcol in range(S):
            cols.append(lax.dot_general(
                wv, xr[:, wcol], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32))
        finish(o, xr, jnp.stack(cols, axis=1))

    def k_fma(xr, wr, o):
        wv = wr[:].astype(jnp.int32)
        acc = jnp.zeros((CO, S, S, NT), jnp.int32)
        for ci in range(CI):
            col = wv[ci].reshape(CO, 1, 1, 1)
            acc = acc + xr[ci:ci + 1].astype(jnp.int32) * col
        finish(o, xr, acc)

    def k_dot4d_bf16(xr, wr, o):
        # int8 ranges are exact in bf16 and partial sums < 2**24 are exact
        # in the MXU's f32 accumulation -> bit-identical int32 accumulators
        acc = lax.dot_general(wr[:].T.astype(jnp.bfloat16),
                              xr[:].astype(jnp.bfloat16),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        finish(o, xr, acc.astype(jnp.int32))

    gmac = CI * CO * S * S * batch / 1e9

    def run(name, call):
        try:
            def chain(v):
                for _ in range(REPS):
                    v = call(v)
                return v
            f = jax.jit(chain)
            y = f(x)
            np.asarray(y[(0,) * y.ndim])
            t0 = time.perf_counter()
            y = f(x)
            np.asarray(y[(0,) * y.ndim])
            ms = (time.perf_counter() - t0) / REPS * 1e3
            print(f"{name:>22s}: {ms:7.3f} ms/op ({gmac / ms:6.1f} GMAC/ms)",
                  flush=True)
        except Exception as e:
            print(f"{name:>22s}: FAILED {str(e).splitlines()[0][:120]}",
                  flush=True)

    print(f"1x1 probe Ci={CI} Co={CO} S={S} batch={batch} "
          f"({gmac:.1f} GMAC/op)", flush=True)
    run("dot_general 4D", pcall(k_dot4d))
    run("dot_general 3D perW", pcall(k_dot3d))
    run("FMA loop", pcall(k_fma))


def whcn_probe():
    """Probe the [W, H, C, N] layout (C in sublanes, N in lanes):
      * batched dot_general [W,H,Co,Ci] x [W,H,Ci,N] — does Mosaic emit
        MXU matmuls per (w,h)?
      * dw taps via plain-dim offset slices + sublane-varying weights;
      * plain-dim stride-2 loads from an int8 ref.
    Usage: python tools/microbench.py whcn [batch] [Ci] [Co] [S]
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    argv = sys.argv[2:]
    batch = int(argv[0]) if len(argv) > 0 else 32768
    CI = int(argv[1]) if len(argv) > 1 else 36
    CO = int(argv[2]) if len(argv) > 2 else 24
    S = int(argv[3]) if len(argv) > 3 else 14
    NT = 128
    REPS = 20
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (S, S, CI, batch)), jnp.int8)
    w = jnp.asarray(rng.integers(-64, 64, (CO, CI)), jnp.int8)
    dwt = jnp.asarray(rng.integers(-128, 128, (CI, 9)), jnp.int32)

    def pcall(kern, extra):
        def call(y):
            return pl.pallas_call(
                kern,
                grid=(batch // NT,),
                in_specs=[pl.BlockSpec((S, S, CI, NT),
                                       lambda i: (0, 0, 0, i),
                                       memory_space=pltpu.VMEM)]
                + [pl.BlockSpec(tuple(a.shape),
                                lambda i, nd=a.ndim: (0,) * nd,
                                memory_space=pltpu.VMEM) for a in extra],
                out_specs=pl.BlockSpec((S, S, CI, NT),
                                       lambda i: (0, 0, 0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((S, S, CI, batch), jnp.int8),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(y, *extra)
        return call

    def run(name, call, gmac):
        try:
            def chain(v):
                for _ in range(REPS):
                    v = call(v)
                return v
            f = jax.jit(chain)
            y = f(x)
            np.asarray(y[(0,) * y.ndim])
            t0 = time.perf_counter()
            y = f(x)
            np.asarray(y[(0,) * y.ndim])
            ms = (time.perf_counter() - t0) / REPS * 1e3
            print(f"{name:>26s}: {ms:7.3f} ms/op"
                  + (f" ({gmac / ms:6.1f} GMAC/ms)" if gmac else ""),
                  flush=True)
        except Exception as e:
            print(f"{name:>26s}: FAILED {str(e).splitlines()[0][:110]}",
                  flush=True)

    mm_gmac = CI * CO * S * S * batch / 1e9
    dw_gmac = CI * (S - 2) * (S - 2) * batch * 9 / 1e9

    def finish(o, xr, acc, co, s0=0):
        r = jnp.clip(acc.astype(jnp.int32) >> 7, -128, 127).astype(jnp.int8)
        so = r.shape[0]
        o[s0:s0 + so, s0:s0 + so, :co, :] = r
        if co < CI:
            o[:, :, co:, :] = xr[:, :, co:, :]
        if s0:
            o[:s0, :, :co, :] = xr[:s0, :, :co, :]
            o[s0 + so:, :, :co, :] = xr[s0 + so:, :, :co, :]
            o[:, :s0, :co, :] = xr[:, :s0, :co, :]
            o[:, s0 + so:, :co, :] = xr[:, s0 + so:, :co, :]

    def k_loop_dot(xr, wr, o, dt=jnp.int8, acc_t=jnp.int32):
        wv = wr[:].astype(dt)
        rows = []
        for i in range(S):
            cols = []
            for j in range(S):
                cols.append(lax.dot_general(
                    wv, xr[i, j].astype(dt), (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_t))
            rows.append(jnp.stack(cols, 0))
        finish(o, xr, jnp.stack(rows, 0), CO)

    def k_loop_dot_bf16(xr, wr, o):
        k_loop_dot(xr, wr, o, dt=jnp.bfloat16, acc_t=jnp.float32)

    def k_batched_dot_bf16(xr, wr, o):
        wb = jnp.broadcast_to(wr[:].astype(jnp.bfloat16).reshape(
            1, 1, CO, CI), (S, S, CO, CI))
        acc = lax.dot_general(
            wb, xr[:].astype(jnp.bfloat16),
            (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32)
        finish(o, xr, acc, CO)

    def k_dw(xr, wr, o):
        so = S - 2
        acc = jnp.zeros((so, so, CI, NT), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                sl = xr[dy:dy + so, dx:dx + so, :, :].astype(jnp.int32)
                acc = acc + sl * wr[:, dy * 3 + dx].reshape(1, 1, CI, 1)
        finish(o, xr, acc, CI, s0=1)

    def k_dw_s2(xr, wr, o):
        so = (S - 2) // 2
        acc = jnp.zeros((so, so, CI, NT), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                sl = xr[dy:dy + 2 * so - 1:2, dx:dx + 2 * so - 1:2,
                        :, :].astype(jnp.int32)
                acc = acc + sl * wr[:, dy * 3 + dx].reshape(1, 1, CI, 1)
        finish(o, xr, acc, CI, s0=1)

    print(f"whcn probe Ci={CI} Co={CO} S={S} batch={batch}", flush=True)
    run("loop-of-2D dots i8", pcall(k_loop_dot, (w,)), mm_gmac)
    run("loop-of-2D dots bf16", pcall(k_loop_dot_bf16, (w,)), mm_gmac)
    run("batched dot bf16", pcall(k_batched_dot_bf16, (w,)), mm_gmac)
    run("dw taps plain offs", pcall(k_dw, (dwt,)), dw_gmac)
    run("dw taps plain stride2 i8", pcall(k_dw_s2, (dwt,)),
        dw_gmac / 4)


def inkernel_probe():
    """Pure in-VMEM compute throughput: repeat the op R times INSIDE one
    kernel (weights perturbed per rep to defeat CSE), so HBM block traffic
    amortizes away.  Usage: python tools/microbench.py inkernel [batch]
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    NT = 128
    R = 16
    rng = np.random.default_rng(0)

    def timed(name, call, x, gmac_total):
        try:
            f = jax.jit(call)
            y = f(x)
            np.asarray(y[(0,) * y.ndim])
            t0 = time.perf_counter()
            y = f(x)
            np.asarray(y[(0,) * y.ndim])
            ms = (time.perf_counter() - t0) * 1e3
            print(f"{name:>34s}: {ms / R:7.3f} ms/op "
                  f"({gmac_total / ms:6.1f} GMAC/ms)", flush=True)
        except Exception as e:
            print(f"{name:>34s}: FAILED {str(e).splitlines()[0][:100]}",
                  flush=True)

    def pc(kern, x, w):
        return pl.pallas_call(
            kern,
            grid=(batch // NT,),
            in_specs=[
                pl.BlockSpec(tuple(x.shape[:-1]) + (NT,),
                             lambda i, nd=x.ndim: (0,) * (nd - 1) + (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tuple(w.shape),
                             lambda i, nd=w.ndim: (0,) * nd,
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(tuple(x.shape[:-1]) + (NT,),
                                   lambda i, nd=x.ndim:
                                   (0,) * (nd - 1) + (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, w)

    # ---- 1x1 conv, CWHN [Ci,S,S,N], contract plain dim ----
    for CI, CO, S in [(36, 36, 14), (40, 40, 7)]:
        x = jnp.asarray(rng.integers(-128, 128, (CI, S, S, batch)),
                        jnp.int8)
        w = jnp.asarray(rng.integers(-64, 64, (CI, CO)), jnp.int8)
        g = CI * CO * S * S * batch * R / 1e9

        def k_i8(xr, wr, o, CI=CI, CO=CO):
            acc = 0
            xv = xr[:]
            for r in range(R):
                acc += lax.dot_general(wr[:] + r, xv,
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)
            o[:] = acc

        def k_bf(xr, wr, o, CI=CI, CO=CO):
            acc = 0.0
            xv = xr[:].astype(jnp.bfloat16)
            for r in range(R):
                acc += lax.dot_general(
                    (wr[:] + r).astype(jnp.bfloat16), xv,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o[:] = acc.astype(jnp.int32)

        timed(f"cwhn 1x1 i8 dot {CI}x{CO}@{S}", lambda v: pc(k_i8, v, w),
              x, g)
        timed(f"cwhn 1x1 bf16 dot {CI}x{CO}@{S}", lambda v: pc(k_bf, v, w),
              x, g)

    # ---- 1x1 conv, WHCN [S,S,Ci,N], 2D dots per (w,h) ----
    for CI, CO, S in [(36, 36, 14), (40, 40, 7)]:
        x = jnp.asarray(rng.integers(-128, 128, (S, S, CI, batch)),
                        jnp.int8)
        w = jnp.asarray(rng.integers(-64, 64, (CO, CI)), jnp.int8)
        g = CI * CO * S * S * batch * R / 1e9

        def k2d(xr, wr, o, S=S, dt=jnp.int8, at=jnp.int32):
            accs = []
            for i in range(S):
                cols = []
                for j in range(S):
                    xv = xr[i, j].astype(dt)
                    a = 0
                    for r in range(R):
                        a += lax.dot_general(
                            (wr[:] + r).astype(dt), xv,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=at)
                    cols.append(a.astype(jnp.int32))
                accs.append(jnp.stack(cols, 0))
            o[:] = jnp.stack(accs, 0)

        def k2d_bf(xr, wr, o, S=S):
            k2d(xr, wr, o, S=S, dt=jnp.bfloat16, at=jnp.float32)

        timed(f"whcn 1x1 i8 2Ddots {CI}x{CO}@{S}",
              lambda v: pc(k2d, v, w), x, g)
        timed(f"whcn 1x1 bf16 2Ddots {CI}x{CO}@{S}",
              lambda v: pc(k2d_bf, v, w), x, g)

    # ---- dw taps CWHN (current arena emission) ----
    C, S = 8, 28
    x = jnp.asarray(rng.integers(-128, 128, (C, S + 2, S + 2, batch)),
                    jnp.int8)
    w = jnp.asarray(rng.integers(-128, 128, (C, 9)), jnp.int32)
    g = C * S * S * batch * 9 * R / 1e9

    def kdw(xr, wr, o):
        acc = jnp.zeros((C, S, S, NT), jnp.int32)
        for r in range(R):
            for dy in range(3):
                for dx in range(3):
                    sl = xr[:, dy:dy + S, dx:dx + S, :].astype(jnp.int32)
                    acc = acc + sl * (wr[:, dy * 3 + dx] + r).reshape(
                        C, 1, 1, 1)
        o[:, :S, :S, :] = acc
        o[:, S:, :, :] = jnp.zeros((C, 2, S + 2, NT), jnp.int32)
        o[:, :S, S:, :] = jnp.zeros((C, S, 2, NT), jnp.int32)

    timed(f"cwhn dw taps C={C}@{S}", lambda v: pc(kdw, v, w), x, g)

    # ---- requant chain cost (fast f32 path) over a [C,S,S,N] i32 acc ----
    def kreq(xr, wr, o):
        acc = xr[:].astype(jnp.int32) * 1000
        out = jnp.zeros((C, S + 2, S + 2, NT), jnp.int32)
        for r in range(R):
            v = jnp.round(acc.astype(jnp.float32) * (1e-4 * (r + 1)))
            v = jnp.clip(v + 3.0, -128, 127)
            out = out + v.astype(jnp.int32)
        o[:] = out

    timed(f"cwhn fastrequant C={C}@{S}", lambda v: pc(kreq, v, w), x,
          C * (S + 2) * (S + 2) * batch * R / 1e9)


def dw16_probe():
    """dw 3x3 tap arithmetic width A/B: int32 (current arena emission)
    vs int16 (2-packed storage on TPU — does Mosaic execute packed int16
    multiply-adds faster, or unpack-compute-repack slower?).  Decides the
    round-1 'int16 taps where ranges allow' lever with a measurement:
    per-channel accumulators with static bound < 2**15 could run the 9
    widening FMAs at half width IF this probe shows a win.  Overflow
    wrap-around is irrelevant here (speed probe; the real emission would
    gate on the static bound).  WHCN layout (the flagship arena's).

    Usage: python tools/microbench.py dw16 [batch]
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    NT = 128
    R = 16
    rng = np.random.default_rng(0)

    def timed(name, call, x, gmac_total):
        try:
            f = jax.jit(call)
            y = f(x)
            np.asarray(y[(0,) * y.ndim])
            t0 = time.perf_counter()
            y = f(x)
            np.asarray(y[(0,) * y.ndim])
            ms = (time.perf_counter() - t0) * 1e3
            print(f"{name:>30s}: {ms / R:7.3f} ms/op "
                  f"({gmac_total / ms:6.1f} GMAC/ms)", flush=True)
        except Exception as e:
            print(f"{name:>30s}: FAILED {str(e).splitlines()[0][:110]}",
                  flush=True)

    for C, S in [(40, 14), (16, 28), (48, 7)]:
        SP = S + 2
        x = jnp.asarray(rng.integers(-128, 128, (SP, SP, C, batch)),
                        jnp.int8)
        # small weights so int16 accs stay representative of the gated case
        w = jnp.asarray(rng.integers(-8, 8, (9, C)), jnp.int32)
        g = C * S * S * batch * 9 * R / 1e9

        def pc(kern, acc_dt):
            return pl.pallas_call(
                kern,
                grid=(batch // NT,),
                in_specs=[
                    pl.BlockSpec((SP, SP, C, NT), lambda i: (0, 0, 0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((9, C), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((S, S, C, NT),
                                       lambda i: (0, 0, 0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((S, S, C, batch), acc_dt),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )

        def kdw(xr, wr, o, S=S, C=C, dt=jnp.int32):
            # single widen per rep, taps as value slices (the arena's
            # dw shape); (w + r) perturbation defeats rep hoisting
            acc = jnp.zeros((S, S, C, NT), dt)
            xv = xr[:].astype(dt)
            for r in range(R):
                for dy in range(3):
                    for dx in range(3):
                        tap = (wr[dy * 3 + dx] + r).astype(dt)
                        acc = acc + xv[dy:dy + S, dx:dx + S] * tap.reshape(
                            1, 1, C, 1)
            o[:] = acc

        def kdw16(xr, wr, o, S=S, C=C):
            kdw(xr, wr, o, S=S, C=C, dt=jnp.int16)

        timed(f"whcn dw i32 taps C={C}@{S}",
              lambda v, C=C, S=S: pc(kdw, jnp.int32)(v, w), x, g)
        timed(f"whcn dw i16 taps C={C}@{S}",
              lambda v, C=C, S=S: pc(kdw16, jnp.int16)(v, w), x, g)


def packdot_probe():
    """Block-diagonal position packing for small-Ci 1x1 MXU dots.

    The per-position dot [Co,Ci]@[Ci,NT] costs ~12 ns per 128-lane block
    nearly independent of Ci,Co<=40 (docs/PROFILE.md microbench notes), so
    the tiled 448 conv floor is POSITIONS-bound: 241k positions/frame =
    23 ms @1024 no matter the layout.  This probe measures whether packing
    P consecutive H positions into ONE dot via block-diagonal weights
    [P*Co, P*Ci] @ [P*Ci, NT] (rhs = concat of P phase slices on the
    sublane axis, the proven im2col pattern) divides the block count by P
    at similar per-block cost — the only structural lever below the
    per-position floor.  Also validates bit-equality of the packed form.

    Usage: python tools/microbench.py packdot [batch]
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    NT = 128
    R = 16
    rng = np.random.default_rng(0)

    def timed(name, call, x, gmac_total, blocks):
        try:
            f = jax.jit(call)
            y = f(x)
            np.asarray(y[(0,) * y.ndim])
            t0 = time.perf_counter()
            y = f(x)
            np.asarray(y[(0,) * y.ndim])
            ms = (time.perf_counter() - t0) * 1e3
            print(f"{name:>30s}: {ms / R:7.3f} ms/op "
                  f"({gmac_total / ms:6.1f} GMAC/ms, "
                  f"{ms / R / blocks * 1e6:6.1f} ns/dot)", flush=True)
            return ms / R
        except Exception as e:
            print(f"{name:>30s}: FAILED {str(e).splitlines()[0][:110]}",
                  flush=True)
            return None

    # graph-representative shapes: (Ci, Co, S) at the 448 retarget
    for CI, CO, S in [(8, 4, 28), (4, 18, 28), (18, 6, 28), (6, 36, 28),
                      (36, 24, 28), (40, 8, 28)]:
        x = jnp.asarray(rng.integers(-128, 128, (S, S, CI, batch)),
                        jnp.int8)
        w = jnp.asarray(rng.integers(-64, 64, (CO, CI)), jnp.int8)
        g = CI * CO * S * S * batch * R / 1e9

        def pc(kern, extra=()):
            return pl.pallas_call(
                kern,
                grid=(batch // NT,),
                in_specs=[
                    pl.BlockSpec((S, S, CI, NT), lambda i: (0, 0, 0, i),
                                 memory_space=pltpu.VMEM)]
                + [pl.BlockSpec(tuple(e.shape),
                                lambda i, nd=e.ndim: (0,) * nd,
                                memory_space=pltpu.VMEM) for e in extra],
                out_specs=pl.BlockSpec((S, S, CO, NT),
                                       lambda i: (0, 0, 0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((S, S, CO, batch),
                                               jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )

        def k_pp(xr, wr, o, S=S, reps=R):
            # per-position baseline (the tiled _gen_conv1x1 form)
            for i in range(S):
                cols = []
                for j in range(S):
                    a = 0
                    for r in range(reps):
                        a += lax.dot_general(
                            wr[:] + r, xr[i, j],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
                    cols.append(a)
                o[i] = jnp.stack(cols, 0)

        base = timed(f"perpos {CI}x{CO}@{S}",
                     lambda v, w=w: pc(k_pp, (w,))(v, w), x, g,
                     S * S * batch / NT)

        for P in (2, 4, 8, 16):
            if P * CI > 128 or P * CO > 128 or S % P:
                continue
            wp = np.zeros((P * CO, P * CI), np.int8)
            for p in range(P):
                wp[p * CO:(p + 1) * CO, p * CI:(p + 1) * CI] = np.asarray(w)
            wp = jnp.asarray(wp)

            def k_pack(xr, wr, o, S=S, P=P, CI=CI, CO=CO, reps=R):
                for i in range(S):
                    xv = xr[i]                       # [S, CI, NT]
                    # P phase slices concat'd on sublanes: group g's
                    # sublane block p holds position g*P+p
                    xg = jnp.concatenate(
                        [xv.reshape(S // P, P, CI, NT)[:, p]
                         for p in range(P)], axis=1)  # [S//P, P*CI, NT]
                    cols = []
                    for gi in range(S // P):
                        a = 0
                        for r in range(reps):
                            a += lax.dot_general(
                                wr[:] + r, xg[gi],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
                        for p in range(P):
                            cols.append(a[p * CO:(p + 1) * CO])
                    o[i] = jnp.stack(cols, 0)

            ms = timed(f"pack P={P} {CI}x{CO}@{S}",
                       lambda v, wp=wp, k=k_pack: pc(k, (wp,))(v, wp),
                       x, g, S * S * batch / NT / P)
            if ms is not None and P == max(
                    p for p in (2, 4, 8, 16)
                    if p * CI <= 128 and p * CO <= 128 and S % p == 0):
                # bit-equality of the packed form (single rep, true
                # block-diag zeros): must match per-position exactly
                def one_pp(xr, wr, o):
                    k_pp(xr, wr, o, reps=1)

                def one_pk(xr, wr, o, P=P):
                    k_pack(xr, wr, o, P=P, reps=1)

                ya = jax.jit(lambda v: pc(one_pp, (w,))(v, w))(x)
                yb = jax.jit(lambda v, wp=wp: pc(one_pk, (wp,))(v, wp))(x)
                eq = bool(jnp.array_equal(ya, yb))
                print(f"{'':>30s}  bit-equal P={P}: {eq}", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "conv1x1":
        conv1x1_probe()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "dw16":
        dw16_probe()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "packdot":
        packdot_probe()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "whcn":
        whcn_probe()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "inkernel":
        inkernel_probe()
        return
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from yoloface_tpu.core.fixedpoint import (
        multiply_by_quantized_multiplier)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 28   # output spatial
    SP = S + 2
    NT = 128
    REPS = 20

    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-128, 128, (C, SP, SP, batch)), jnp.int8)
    taps = jnp.asarray(rng.integers(-128, 128, (C, 9)), jnp.int32)
    scale = jnp.asarray(rng.random((C, 1)) * 0.01 + 0.001, jnp.float32)

    def in_spec(shape, dtype):
        nd = len(shape)
        return pl.BlockSpec(tuple(shape[:nd - 1]) + (NT,),
                            lambda i, nd=nd: (0,) * (nd - 1) + (i,),
                            memory_space=pltpu.VMEM)

    def const_spec(a):
        nd = a.ndim
        return pl.BlockSpec(tuple(a.shape),
                            lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    def pcall(kern, dtype, extra=()):
        def call(y):
            return pl.pallas_call(
                kern,
                grid=(batch // NT,),
                in_specs=[in_spec(y.shape, dtype)]
                         + [const_spec(a) for a in extra],
                out_specs=pl.BlockSpec((C, SP, SP, NT),
                                       lambda i: (0, 0, 0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((C, SP, SP, batch), dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(y, *extra)
        return call

    def run_case(name, call, x_in, gmac):
        def chain(v):
            for _ in range(REPS):
                v = call(v)
            return v

        try:
            f = jax.jit(chain)
            y = f(x_in)
            np.asarray(y[(0,) * y.ndim])
            t0 = time.perf_counter()
            y = f(x_in)
            np.asarray(y[(0,) * y.ndim])
            ms = (time.perf_counter() - t0) / REPS * 1e3
            print(f"{name:>30s}: {ms:7.3f} ms/op"
                  + (f"  ({gmac / max(ms, 1e-9):5.1f} GMAC/ms)"
                     if gmac else ""), flush=True)
        except Exception as e:
            msg = str(e).splitlines()
            print(f"{name:>30s}: FAILED {type(e).__name__}: "
                  f"{msg[0] if msg else ''}", flush=True)

    def restore_border(o, xr, r, dt):
        o[:, :S, :S, :] = r.astype(dt)
        o[:, S:, :, :] = xr[:, S:, :, :]
        o[:, :S, S:, :] = xr[:, :S, S:, :]

    def make_case(*, offs=True, stride=1, requant=None, dtype=jnp.int8):
        so = S // stride

        def kern(xr, wr, scr, o):
            acc = jnp.zeros((C, so, so, NT), jnp.int32)
            for dy in range(3):
                for dx in range(3):
                    oy, ox = (dy, dx) if offs else (0, 0)
                    if stride == 1:
                        sl = xr[:, oy:oy + so, ox:ox + so, :]
                    else:
                        sl = xr[:, oy:oy + 2 * so - 1:2,
                                ox:ox + 2 * so - 1:2, :]
                    v = sl.astype(jnp.int32) if dtype == jnp.int8 else sl
                    acc = acc + v * wr[:, dy * 3 + dx].reshape(C, 1, 1, 1)
            if requant == "fast":
                r = jnp.round(acc.astype(jnp.float32)
                              * scr[:].reshape(C, 1, 1, 1))
                r = jnp.clip(r, -128, 127).astype(jnp.int32)
            elif requant == "exact":
                r = multiply_by_quantized_multiplier(
                    acc, jnp.int32(1518500250), jnp.int32(-7))
                r = jnp.clip(r, -128, 127)
            else:
                r = jnp.clip(acc >> 7, -128, 127)
            o[:, :so, :so, :] = r.astype(dtype)
            o[:, so:, :, :] = xr[:, so:, :, :]
            o[:, :so, so:, :] = xr[:, :so, so:, :]

        return kern, so

    gm = lambda so: C * so * so * batch * 9 / 1e9

    print(f"dw-shaped microbench C={C} S={S} batch={batch}", flush=True)

    def copy_kernel(xr, o):
        o[:] = xr[:]

    run_case("int8 tile copy", pcall(copy_kernel, jnp.int8), x8, 0)

    for name, kw in [
        ("taps noffs i8 shift", dict(offs=False)),
        ("taps offs i8 shift", dict()),
        ("taps offs i8 fastreq", dict(requant="fast")),
        ("taps offs i8 exactreq", dict(requant="exact")),
    ]:
        kern, so = make_case(**kw)
        run_case(name, pcall(kern, jnp.int8, (taps, scale)), x8,
                 gm(so))

    x32 = x8.astype(jnp.int32)
    for name, kw in [
        ("taps offs i32-arena shift", dict()),
        ("taps offs i32-arena stride2", dict(stride=2)),
        ("taps offs i32-arena fastreq", dict(requant="fast")),
    ]:
        kern, so = make_case(dtype=jnp.int32, **kw)
        run_case(name, pcall(kern, jnp.int32, (taps, scale)), x32,
                 gm(so))


if __name__ == "__main__":
    main()

"""The 448 spatially-tiled arena probe (VERDICT r2 next #1), MEASURED.

Builds a real W-strip-tiled Pallas stage covering the retargeted graph's
first block at 448 — PAD + stem conv 3x3 s2 (448->224) + leaky + dw 3x3
+ leaky + 1x1 8->4 + 1x1 4->18 + leaky (ops 0-7) — and times it against
stock XLA ("fast" lowering) running the SAME subgraph at the same batch,
both with device-resident inputs and scalar-fetch sync.

Tiling design measured here (the best variant from probe448_micro):
  * grid (batch_tiles, 16 W-strips); per strip a manual DMA pulls the
    [35, 449, 3, 128] input window (halo included) from HBM;
  * stem phases via plain-dim split-reshape on the int8 value (stride-2
    selection without int32 refs — probe A), im2col concat on sublanes,
    per-position [8,27]@[27,128] int8 MXU dots in h-chunked fori loops
    (static unrolled interiors — probe B2);
  * dw as int32 VPU taps on chunk reads; 1x1s as per-position MXU dots;
    the fused fast-bits requant+leaky epilogue throughout;
  * output written through blocked out_specs, strip-aligned.

Run:  python tools/probe448.py [batch=256]
Writes one JSON line with pallas-vs-XLA ms for the subgraph.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import time

import numpy as np

TFLITE = "/root/reference/yoloface/tflite/yoloface_int8.tflite"
NT = 128
NW = 16          # W strips
CH = 16          # h-chunk inside fori loops
STAGE = _os.environ.get("PROBE_STAGE", "full")   # full | stem | dw (debug)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from yoloface_tpu.graph.retarget import retarget_spatial
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.runtime.engine import Int8Engine
    from yoloface_tpu.runtime.pallas_plan import _leaky_spec, _requant_spec
    from yoloface_tpu.kernels.pallas_int8 import (acc_bound,
                                                  apply_requant_leaky)

    batch = int(_sys.argv[1]) if len(_sys.argv) > 1 else 256
    assert batch % NT == 0
    g56 = load_tflite(TFLITE)
    g = retarget_spatial(g56, 8)
    t = g.tensor

    # ---- subgraph params (ops 0..7) --------------------------------------
    ops = {op.index: op for op in g.ops}
    stem, dw, c5, c6 = ops[1], ops[3], ops[5], ops[6]
    leaky = {1: ops[2], 3: ops[4], 6: ops[7]}

    def conv_consts(op, leaky_op):
        w_t, b_t = t(op.inputs[1]), t(op.inputs[2])
        in_q = t(op.inputs[0]).qparams
        out_q = t(op.outputs[0]).qparams
        wd = w_t.data
        sums = (wd.astype(np.int64).sum((1, 2, 3))
                if op.opname == "CONV_2D"
                else wd.astype(np.int64).sum((0, 1, 2)))
        co = wd.shape[0] if op.opname == "CONV_2D" else wd.shape[3]
        bias_eff = (b_t.data.astype(np.int64)
                    - in_q.zero_point * sums).astype(np.int32).reshape(co, 1)
        rq = _requant_spec(in_q.scale, w_t.qparams.scales,
                           out_q.scale, out_q.zero_point, exact=False)
        rq.bound = acc_bound(
            np.abs(wd.astype(np.int64)).sum(
                (1, 2, 3) if op.opname == "CONV_2D" else (0, 1, 2)),
            bias_eff)
        lk = _leaky_spec(g, leaky_op, exact=False) if leaky_op else None
        return wd, bias_eff, rq, lk, in_q.zero_point

    wd1, b1, rq1, lk1, zp_in1 = conv_consts(stem, leaky[1])
    wd3, b3, rq3, lk3, _ = conv_consts(dw, leaky[3])
    wd5, b5, rq5, lk5, _ = conv_consts(c5, None)
    wd6, b6, rq6, lk6, _ = conv_consts(c6, leaky[6])
    # PAD fills with its output tensor's zp
    pad_zp = int(t(ops[0].outputs[0]).qparams.zero_point)
    # the tensor dw consumes is the stem LEAKY output -> SAME pads fill
    # with ITS zp (not the conv tensor's)
    zp_stem = lk1.zp_out
    # op5 (no leaky): its consumers read its tensor zp
    # stem weights as [8, 36] (dy-major W offset, dx, ci padded to 4 —
    # the HBM DMA needs the sublane dim tiled to 4; the pad channel gets
    # zero weight so its zp content never contributes)
    w14 = np.zeros((8, 3, 3, 4), np.int8)
    w14[..., :3] = wd1.transpose(0, 2, 1, 3)
    w1 = np.ascontiguousarray(w14.reshape(8, 36)).astype(np.int8)
    w5 = np.ascontiguousarray(wd5.reshape(4, 8)).astype(np.int8)
    w6 = np.ascontiguousarray(wd6.reshape(18, 4)).astype(np.int8)
    # dw taps [3,3,8] int32
    wdw = np.ascontiguousarray(wd3[0].astype(np.int32))        # [3,3,8]

    WS_IN = 28       # input W per strip (448/16)
    WS_OUT = 14      # 224/16
    HP = 451                     # 449 + 2 slice margin (rows never selected)

    def kernel(p_hbm, w1r, b1r, p11, w3r, b3r, p13, w5r, b5r, p15,
               w6r, b6r, p16, out_ref, xs, x_ref, stem_ref, dw_ref, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        # ---- DMA the input strip (+halo) HBM -> VMEM
        cp = pltpu.make_async_copy(
            p_hbm.at[pl.ds(j * WS_IN, 35), slice(None), slice(None),
                     pl.ds(i * NT, NT)], xs, sem)
        cp.start()
        cp.wait()

        # ---- stem: phases via split-reshape, written straight into the
        # im2col scratch sublane ranges (no whole-X concat value — a
        # single concatenated X spilled the register allocator)
        for dy in range(3):
            p5 = (xs[dy:dy + 32].reshape(16, 2, HP, 4, NT))[:, 0]
            for dx in range(3):
                k = dy * 3 + dx
                x_ref[:, :, 4 * k:4 * k + 4, :] = (
                    p5[:, dx:dx + 448].reshape(16, 224, 2, 4, NT)[:, :, 0])

        w1v, b1v = w1r[:], b1r[:]
        p11v = p11[:]
        zero = jnp.zeros((), jnp.int32)

        @pl.when(pl.program_id(0) == 0)
        def _fill_hpads():
            stem_ref[:, 0:1] = jnp.full((16, 1, 8, NT), zp_stem, jnp.int8)
            stem_ref[:, 225:226] = jnp.full((16, 1, 8, NT), zp_stem,
                                            jnp.int8)

        def stem_chunk(hc, _):
            h0 = hc * CH
            Xc = x_ref[:, pl.ds(h0, CH)]
            outs = []
            for wp in range(16):
                for hh in range(CH):
                    outs.append(lax.dot_general(
                        w1v, Xc[wp, hh], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32))
            acc = (jnp.stack(outs, 0).reshape(16, CH, 8, NT)
                   + b1v.reshape(1, 1, 8, 1))
            r = apply_requant_leaky(rq1, lk1, acc, [p11v], ch_axis=2)
            stem_ref[:, pl.ds(1 + h0, CH)] = r
            return zero

        lax.fori_loop(0, 224 // CH, stem_chunk, zero)
        # edge strips: halo cols fall outside the image -> dw zp pad
        @pl.when(j == 0)
        def _lpad():
            stem_ref[0:1, :] = jnp.full((1, 226, 8, NT), zp_stem, jnp.int8)

        @pl.when(j == NW - 1)
        def _rpad():
            stem_ref[15:16, :] = jnp.full((1, 226, 8, NT), zp_stem,
                                          jnp.int8)

        # ---- dw 3x3 (s1, SAME): taps on chunk reads
        w3v = w3r[:]
        b3v, p13v = b3r[:], p13[:]

        def dw_chunk(hc, _):
            h0 = hc * CH
            c = stem_ref[:, pl.ds(h0, CH + 2)].astype(jnp.int32)
            acc = jnp.zeros((14, CH, 8, NT), jnp.int32) + b3v.reshape(
                1, 1, 8, 1)
            for dy in range(3):
                for dx in range(3):
                    # dy walks the W axis (TFLite Kw), dx the H axis (Kh)
                    acc = acc + (c[dy:dy + 14, dx:dx + CH]
                                 * w3v[dx, dy].reshape(1, 1, 8, 1))
            r = apply_requant_leaky(rq3, lk3, acc, [p13v], ch_axis=2)
            dw_ref[:, pl.ds(h0, CH)] = r
            return zero

        lax.fori_loop(0, 224 // CH, dw_chunk, zero)

        # ---- 1x1 8->4 (linear) then 1x1 4->18 + leaky
        w5v, b5v, p15v = w5r[:], b5r[:], p15[:]
        w6v, b6v, p16v = w6r[:], b6r[:], p16[:]

        def pw_chunk(hc, _):
            h0 = hc * CH
            c = dw_ref[:, pl.ds(h0, CH)]
            outs = []
            for wp in range(14):
                for hh in range(CH):
                    outs.append(lax.dot_general(
                        w5v, c[wp, hh], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32))
            acc5 = (jnp.stack(outs, 0).reshape(14, CH, 4, NT)
                    + b5v.reshape(1, 1, 4, 1))
            r5 = apply_requant_leaky(rq5, None, acc5, [p15v], ch_axis=2)
            outs6 = []
            for wp in range(14):
                for hh in range(CH):
                    outs6.append(lax.dot_general(
                        w6v, r5[wp, hh], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32))
            acc6 = (jnp.stack(outs6, 0).reshape(14, CH, 18, NT)
                    + b6v.reshape(1, 1, 18, 1))
            r6 = apply_requant_leaky(rq6, lk6, acc6, [p16v], ch_axis=2)
            out_ref[:, pl.ds(h0, CH)] = r6
            return zero

        lax.fori_loop(0, 224 // CH, pw_chunk, zero)

        if STAGE == "stem":
            def cp_stem(hc, _):
                h0 = hc * CH
                v8 = stem_ref[1:15, pl.ds(1 + h0, CH)]
                out_ref[:, pl.ds(h0, CH), 0:8, :] = v8
                out_ref[:, pl.ds(h0, CH), 8:18, :] = jnp.zeros(
                    (14, CH, 10, NT), jnp.int8)
                return zero
            lax.fori_loop(0, 224 // CH, cp_stem, zero)
        elif STAGE == "dw":
            def cp_dw(hc, _):
                h0 = hc * CH
                out_ref[:, pl.ds(h0, CH), 0:8, :] = dw_ref[:, pl.ds(h0, CH)]
                out_ref[:, pl.ds(h0, CH), 8:18, :] = jnp.zeros(
                    (14, CH, 10, NT), jnp.int8)
                return zero
            lax.fori_loop(0, 224 // CH, cp_dw, zero)

    def run_pallas(p_whcn):
        n = p_whcn.shape[-1]
        operands = [
            w1, b1, rq1.p1.astype(np.float32),
            wdw, b3, rq3.p1.astype(np.float32),
            w5, b5, rq5.p1.astype(np.float32),
            w6, b6, rq6.p1.astype(np.float32),
        ]
        op_specs = [pl.BlockSpec(a.shape,
                                 (lambda i, j, nd=a.ndim:
                                  tuple(0 for _ in range(nd))),
                                 memory_space=pltpu.VMEM)
                    for a in operands]
        return pl.pallas_call(
            kernel,
            grid=(n // NT, NW),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] + op_specs,
            out_specs=pl.BlockSpec((WS_OUT, 224, 18, NT),
                                   lambda i, j: (j, 0, 0, i)),
            out_shape=jax.ShapeDtypeStruct((224, 224, 18, n), jnp.int8),
            scratch_shapes=[
                pltpu.VMEM((35, HP, 4, NT), jnp.int8),      # input strip
                pltpu.VMEM((16, 224, 36, NT), jnp.int8),    # stem im2col
                pltpu.VMEM((16, 226, 8, NT), jnp.int8),     # stem + pads
                pltpu.VMEM((14, 224, 8, NT), jnp.int8),     # dw out
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(p_whcn, *[jnp.asarray(a) for a in operands])

    # ---- build inputs -----------------------------------------------------
    import jax  # noqa: F811
    rng = np.random.default_rng(0)
    x = rng.integers(-128, 128, (batch, 448, 448, 3)).astype(np.int8)

    # pre-padded WHCN input: W margin 3 left (2 strip + 1 PAD) + 5 right;
    # H: 1 top (the PAD op's zp fill).  Strip j's DMA window is
    # [28j, 28j+35); local phase col 2wp+dy maps to padded-image col
    # 2*(14j+wp-1)+dy, i.e. out col o'=14j-1+wp reads cols 2o'+dy.
    pw = np.full((456, 451, 4, batch), pad_zp, np.int8)
    pw[3:451, 1:449, :3] = x.transpose(2, 1, 3, 0)  # [W,H,C,N]
    p_dev = jax.device_put(pw)

    # ---- XLA fast baseline on the same subgraph ---------------------------
    eng = Int8Engine(g, mode="fast")
    sub = eng._plan[:8]

    stage_out = {"full": sub[-1].out_idx, "stem": ops[2].outputs[0],
                 "dw": ops[4].outputs[0]}[STAGE]

    def xla_sub(xin):
        env = {g.inputs[0]: xin}
        for fn in sub:
            env[fn.out_idx] = fn(env)
        return env[stage_out]

    x_dev = jax.device_put(x)
    jx = jax.jit(xla_sub)
    y_x = jx(x_dev)
    np.asarray(y_x[0, 0, 0, 0])

    def timeit(fn, arg, iters=8):
        out = fn(arg)
        np.asarray(out[(0,) * out.ndim])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(arg)
        np.asarray(out[(0,) * out.ndim])
        return (time.perf_counter() - t0) / iters * 1e3

    ms_xla = timeit(jx, x_dev)

    jp = jax.jit(run_pallas)
    y_p = jp(p_dev)
    np.asarray(y_p[0, 0, 0, 0])
    # correctness: compare vs the XLA subgraph (fast twin must be
    # bit-identical: same epilogue math)
    yp = np.asarray(y_p).transpose(3, 1, 0, 2)      # WHCN -> NHWC
    yx = np.asarray(y_x)
    if STAGE != "full":
        yp = yp[..., :yx.shape[-1]]
    bit = bool(np.array_equal(yp, yx))
    if not bit and _os.environ.get("PROBE_DEBUG"):
        mm = yp != yx
        per_w = mm.sum((0, 1, 3)); per_h = mm.sum((0, 2, 3))
        print("solid W cols:", np.nonzero(per_w > 100000)[0].tolist())
        print("solid H rows:", np.nonzero(per_h > 100000)[0].tolist())
        inter = mm[:, 2:222, 2:222, :]
        print("interior sparse frac:", float(inter.mean()))
        ii = np.argwhere(inter)
        if len(ii):
            print("sample interior mismatches (n,h,w,c):", ii[:5].tolist())
            n0,h0,w0,c0 = ii[0]
            print("vals p/x:", yp[n0,h0+2,w0+2,c0], yx[n0,h0+2,w0+2,c0])
        print("count:", mm.sum(), "of", mm.size)
    ms_pal = timeit(jp, p_dev)

    print(json.dumps({
        "probe": "448_tiled_stage_ops0-7",
        "batch": batch,
        "bit_exact_vs_fast": bit,
        "mismatch_frac": (None if bit else
                          float((yp != yx).mean())),
        "pallas_tiled_ms": round(ms_pal, 2),
        "xla_fast_ms": round(ms_xla, 2),
        "speedup": round(ms_xla / ms_pal, 3),
    }))


if __name__ == "__main__":
    main()

"""Fused multi-op Pallas stages: the whole int8 net in a few kernels.

The per-op kernel plan (`runtime/pallas_plan.py`) pays a VMEM<->HBM round
trip plus int8<->int32 conversion per op.  This lowering instead partitions
the graph into a handful of *stages* — each stage is ONE ``pallas_call``
that keeps every intermediate activation in VMEM as a value, walking the
ops back-to-back (the whole-network analogue of the reference's statically
planned activation arena, ``network.c:2944-3100``, but planned by Mosaic).

In-kernel op implementations (values in ``[C, W, H, N]`` layout, N in
lanes):
  * 1x1 conv: int8 ``dot_general`` over the channel dim (MXU);
  * 3x3 depthwise / conv1 / maxpool: tap accumulation; stride-2 and
    windowed taps read an int32 VMEM scratch ref via ``pl.run_scoped``
    (Mosaic supports arbitrary-offset strided reads only on refs);
  * pad: int8 scratch ref fill + interior store;
  * add / quantize / leaky: elementwise, both requant semantics.

Stage partitioning is greedy over an estimated live-set byte budget, so the
same code handles any graph of these op types.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yoloface_tpu.core.fixedpoint import multiply_by_quantized_multiplier
from yoloface_tpu.graph.ir import GraphDef
from yoloface_tpu.kernels import pallas_int8 as pk
from yoloface_tpu.kernels.pallas_int8 import (LeakySpec, RequantSpec,
                                              _interpret_mode)
from yoloface_tpu.ops.int8_ref import _same_pad_amounts

import os

NT = 128
# estimated live-activation bytes per stage; override to tune stage count
# (YOLOFACE_TPU_STAGE_BUDGET=999999999 -> single whole-net mega-kernel)
STAGE_BUDGET_BYTES = int(os.environ.get(
    "YOLOFACE_TPU_STAGE_BUDGET", 6 * 1024 * 1024))


# --------------------------------------------------------------------------
# in-kernel value ops
# --------------------------------------------------------------------------
def _scoped_i32(value_i8, body, pads=None, fill=0):
    """Stage an int8 value into an int32 scratch ref (optionally padding it
    with ``fill`` during staging) and run ``body(ref)`` — refs are the only
    strided-read-capable objects in Mosaic.  run_scoped forwards the
    return."""
    c, w, h, n = value_i8.shape
    if pads is None or pads == ((0, 0), (0, 0)):
        def inner(s):
            s[:] = value_i8.astype(jnp.int32)
            return body(s)

        return pl.run_scoped(inner, pltpu.VMEM(value_i8.shape, jnp.int32))

    (pw0, pw1), (ph0, ph1) = pads
    wo, ho = w + pw0 + pw1, h + ph0 + ph1

    def inner(s):
        s[:] = jnp.full((c, wo, ho, n), fill, jnp.int32)
        s[:, pw0:pw0 + w, ph0:ph0 + h, :] = value_i8.astype(jnp.int32)
        return body(s)

    return pl.run_scoped(inner, pltpu.VMEM((c, wo, ho, n), jnp.int32))


def _pad_value(v, pads, zp):
    """Pad an int8 value via an int8 scratch ref (dims 1, 2)."""
    c, w, h, n = v.shape
    (pw0, pw1), (ph0, ph1) = pads
    wo, ho = w + pw0 + pw1, h + ph0 + ph1

    def inner(s):
        s[:] = jnp.full((c, wo, ho, n), zp, jnp.int8)
        s[:, pw0:pw0 + w, ph0:ph0 + h, :] = v
        return s[:]

    return pl.run_scoped(inner, pltpu.VMEM((c, wo, ho, n), jnp.int8))


def _conv_taps(xi_or_ref, k, stride, out_hw, tap_fn, init):
    """Accumulate k x k taps; ``tap_fn(sl, dy, dx)`` combines a window with
    the accumulator.  ``xi_or_ref`` is an int32 ref (strided capable)."""
    wo, ho = out_hw
    s = xi_or_ref
    _, wp, hp, _ = s.shape
    acc = init
    for dy in range(k):
        for dx in range(k):
            if stride == 1:
                sl = s[:, dy:dy + wo, dx:dx + ho, :]
            else:
                sl = s[:, dy:min(dy + stride * wo, wp):stride,
                       dx:min(dx + stride * ho, hp):stride, :]
            acc = tap_fn(acc, sl, dy, dx)
    return acc


class FusedOp:
    """One graph op lowered for in-kernel execution."""

    def __init__(self, out_idx: int, in_idxs: List[int],
                 operands: List[np.ndarray],
                 emit: Callable, out_bytes: int):
        self.out_idx = out_idx
        self.in_idxs = in_idxs
        self.operands = operands     # numpy arrays -> kernel inputs
        self.emit = emit             # emit(env, opvals) -> value
        self.out_bytes = out_bytes


def _shape_chwn(t) -> tuple:
    # graph tensor [1,H,W,C] -> value shape [C,W,H,NT]
    return (t.shape[3], t.shape[2], t.shape[1], NT)


def _nbytes(t) -> int:
    return int(np.prod(_shape_chwn(t)))


def lower_fused_ops(graph: GraphDef, exact: bool) -> List[FusedOp]:
    from yoloface_tpu.runtime.pallas_plan import _leaky_spec, _requant_spec
    from collections import Counter

    t = graph.tensor
    uses = Counter()
    for op in graph.ops:
        for i in op.inputs:
            if i >= 0:
                uses[i] += 1
    for i in graph.outputs:
        uses[i] += 1
    ops_by_out = {op.outputs[0]: op for op in graph.ops}
    fused_leaky, absorbed = {}, set()
    for op in graph.ops:
        if op.opname == "LEAKY_RELU":
            src = ops_by_out.get(op.inputs[0])
            if (src is not None
                    and src.opname in ("CONV_2D", "DEPTHWISE_CONV_2D")
                    and uses[op.inputs[0]] == 1):
                fused_leaky[src.index] = op
                absorbed.add(op.index)
    # absorb single-consumer PAD ops into the conv that consumes them (the
    # conv's int32 staging pads for free)
    pad_by_out = {}
    consumers = {}
    for op in graph.ops:
        for i in op.inputs:
            consumers.setdefault(i, []).append(op)
    absorbed_pads = {}   # conv op index -> (pads, src_idx)
    for op in graph.ops:
        if op.opname != "PAD":
            continue
        cons = consumers.get(op.outputs[0], [])
        if (len(cons) == 1
                and cons[0].opname in ("CONV_2D", "DEPTHWISE_CONV_2D")):
            p = t(op.inputs[1]).data.astype(int)
            absorbed_pads[cons[0].index] = (
                ((int(p[2][0]), int(p[2][1])),
                 (int(p[1][0]), int(p[1][1]))),   # (W pads, H pads)
                op.inputs[0])
            absorbed.add(op.index)

    out: List[FusedOp] = []
    for op in graph.ops:
        if op.index in absorbed:
            continue
        name = op.opname
        out_idx = op.outputs[0]
        leaky_op = fused_leaky.get(op.index)
        if leaky_op is not None:
            out_idx = leaky_op.outputs[0]
        out_t = t(op.outputs[0])

        if name == "PAD":
            data_idx, pad_idx = op.inputs
            p = t(pad_idx).data.astype(int)
            pads = (((int(p[2][0]), int(p[2][1])),
                     (int(p[1][0]), int(p[1][1]))))  # W pads, H pads
            zp = out_t.qparams.zero_point

            def emit(env, opvals, data_idx=data_idx, pads=pads, zp=zp):
                return _pad_value(env[data_idx], pads, zp)

            out.append(FusedOp(out_idx, [data_idx], [], emit,
                               _nbytes(out_t)))

        elif name in ("CONV_2D", "DEPTHWISE_CONV_2D"):
            from yoloface_tpu.runtime.engine import _check_no_dilation
            _check_no_dilation(op)
            x_idx, w_idx, b_idx = op.inputs
            w, b = t(w_idx), t(b_idx)
            in_q, out_q = t(x_idx).qparams, out_t.qparams
            requant = _requant_spec(in_q.scale, w.qparams.scales,
                                    out_q.scale, out_q.zero_point, exact)
            leaky = (None if leaky_op is None
                     else _leaky_spec(graph, leaky_op, exact))
            stride = op.attrs["stride_h"]
            zp_in = in_q.zero_point
            in_h, in_w = t(x_idx).shape[1], t(x_idx).shape[2]
            out_hw = (out_t.shape[2], out_t.shape[1])   # (W, H)
            pads = None
            if op.attrs["padding"] == "SAME":
                kk = w.data.shape[1]
                pads = (_same_pad_amounts(in_w, stride, kk),
                        _same_pad_amounts(in_h, stride, kk))
            if op.index in absorbed_pads:
                assert pads is None
                pads, x_idx = absorbed_pads[op.index]

            if name == "CONV_2D":
                wd = w.data
                co, kh = wd.shape[0], wd.shape[1]
                bias_eff = (b.data.astype(np.int64)
                            - zp_in * wd.astype(np.int64).sum((1, 2, 3))
                            ).astype(np.int32).reshape(co, 1)
                pk.set_conv_bounds(requant,
                    np.abs(wd.astype(np.int64)).sum((1, 2, 3)), bias_eff)
                if kh == 1:
                    w_io = np.ascontiguousarray(
                        wd.reshape(co, wd.shape[3]).T)

                    def emit(env, opvals, x_idx=x_idx, requant=requant,
                             leaky=leaky, co=co):
                        w_v, b_v, *rq = opvals
                        acc = lax.dot_general(
                            w_v, env[x_idx], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
                        acc = acc + b_v.reshape(co, 1, 1, 1)
                        r = requant.apply_in_kernel(acc, rq)
                        return leaky.apply(r) if leaky else r

                    out.append(FusedOp(out_idx, [x_idx],
                                       [w_io, bias_eff, *requant.operand_arrays()], emit, _nbytes(out_t)))
                else:
                    # conv1 3x3: [K*K, Co, Ci] taps, int32 VPU FMAs
                    ci = wd.shape[3]
                    # index k = ww*kh + hh must match _conv_taps' loop
                    # (dy iterates dim1 = W, dx iterates dim2 = H)
                    taps = np.stack([
                        np.asarray(wd[:, hh, ww, :], np.int32)
                        for ww in range(kh) for hh in range(kh)])

                    def emit(env, opvals, x_idx=x_idx, requant=requant,
                             leaky=leaky, co=co, ci=ci, kh=kh,
                             stride=stride, out_hw=out_hw, pads=pads,
                             zp_in=zp_in):
                        w_v, b_v, *rq = opvals
                        x = env[x_idx]
                        if pads is not None:
                            x = _pad_value(x, pads, zp_in)
                        wo, ho = out_hw

                        nt_b = x.shape[-1]

                        def body(sref):
                            acc = (b_v.reshape(co, 1, 1, 1)
                                   + jnp.zeros((co, wo, ho, nt_b),
                                               jnp.int32))

                            def tap(acc, sl, dy, dx):
                                k = dy * kh + dx
                                for ci_i in range(ci):
                                    col = w_v[k:k + 1, :, ci_i:ci_i + 1
                                              ].reshape(co, 1, 1, 1)
                                    acc = acc + sl[ci_i:ci_i + 1] * col
                                return acc

                            return _conv_taps(sref, kh, stride, out_hw,
                                              tap, acc)

                        acc = _scoped_i32(x, body)
                        r = requant.apply_in_kernel(acc, rq)
                        return leaky.apply(r) if leaky else r

                    out.append(FusedOp(out_idx, [x_idx],
                                       [taps, bias_eff, *requant.operand_arrays()], emit, _nbytes(out_t)))
            else:
                wd = w.data
                if not (wd.shape[1] == wd.shape[2] == 3):
                    raise NotImplementedError(
                        f"fused depthwise taps are 3x3-only, got "
                        f"{wd.shape[1]}x{wd.shape[2]} (op {op.index})")
                c = wd.shape[3]
                bias_eff = (b.data.astype(np.int64)
                            - zp_in * wd.astype(np.int64).sum((0, 1, 2))
                            ).astype(np.int32).reshape(c, 1)
                pk.set_conv_bounds(
                    requant, np.abs(wd.astype(np.int64)).sum((0, 1, 2)), bias_eff)
                # [C, 9] taps in W-major order (layout dims are [C,W,H,N])
                w_taps = np.asarray(
                    wd[0].transpose(2, 1, 0), np.int32).reshape(c, 9)

                def emit(env, opvals, x_idx=x_idx, requant=requant,
                         leaky=leaky, c=c, stride=stride, out_hw=out_hw,
                         pads=pads, zp_in=zp_in):
                    w_v, b_v, *rq = opvals
                    x = env[x_idx]
                    if pads is not None:
                        x = _pad_value(x, pads, zp_in)
                    wo, ho = out_hw

                    nt_b = x.shape[-1]

                    def body(sref):
                        acc = (b_v.reshape(c, 1, 1, 1)
                               + jnp.zeros((c, wo, ho, nt_b), jnp.int32))

                        def tap(acc, sl, dy, dx):
                            col = w_v[:, dy * 3 + dx].reshape(c, 1, 1, 1)
                            return acc + sl * col

                        return _conv_taps(sref, 3, stride, out_hw, tap, acc)

                    acc = _scoped_i32(x, body)
                    r = requant.apply_in_kernel(acc, rq)
                    return leaky.apply(r) if leaky else r

                out.append(FusedOp(out_idx, [x_idx],
                                   [w_taps, bias_eff,
                                    *requant.operand_arrays()], emit, _nbytes(out_t)))

        elif name == "LEAKY_RELU":
            spec = _leaky_spec(graph, op, exact)
            x_idx = op.inputs[0]

            def emit(env, opvals, x_idx=x_idx, spec=spec):
                return spec.apply(env[x_idx])

            out.append(FusedOp(out_idx, [x_idx], [], emit, _nbytes(out_t)))

        elif name in ("RELU", "RELU6", "LOGISTIC"):
            (x_idx,) = op.inputs
            fn_val = pk.activation_int32(name, t(x_idx).qparams)

            def emit(env, opvals, x_idx=x_idx, fn_val=fn_val):
                return fn_val(env[x_idx]).astype(jnp.int8)

            out.append(FusedOp(out_idx, [x_idx], [], emit, _nbytes(out_t)))

        elif name == "RESIZE_NEAREST_NEIGHBOR":
            x_idx = op.inputs[0]
            factors = pk.resize_factors(t, op)   # (f_w, f_h) = dims 1, 2

            def emit(env, opvals, x_idx=x_idx, factors=factors):
                return jnp.repeat(jnp.repeat(env[x_idx], factors[0],
                                             axis=1), factors[1], axis=2)

            out.append(FusedOp(out_idx, [x_idx], [], emit, _nbytes(out_t)))

        elif name == "MAX_POOL_2D":
            (x_idx,) = op.inputs
            fh, fw = op.attrs["filter_h"], op.attrs["filter_w"]
            sh = op.attrs["stride_h"]
            in_h, in_w = t(x_idx).shape[1], t(x_idx).shape[2]
            if op.attrs["padding"] == "SAME":
                pads = (_same_pad_amounts(in_w, sh, fw),
                        _same_pad_amounts(in_h, sh, fh))
            else:
                pads = ((0, 0), (0, 0))
            out_hw = (out_t.shape[2], out_t.shape[1])

            def emit(env, opvals, x_idx=x_idx, fw=fw, fh=fh, sh=sh,
                     pads=pads, out_hw=out_hw):
                # separable two-pass max: fw + fh taps instead of fw * fh
                x = env[x_idx]
                c = x.shape[0]
                nt_b = x.shape[-1]
                wo, ho = out_hw
                (pw0, pw1), (ph0, ph1) = pads
                wp = x.shape[1] + pw0 + pw1
                hp = x.shape[2] + ph0 + ph1

                def rows_body(sref):
                    # max over W taps, stride in W; H stays padded-full
                    acc = jnp.full((c, wo, hp, nt_b), -128, jnp.int32)
                    for dy in range(fw):
                        sl = sref[:, dy:min(dy + sh * wo, wp):sh, :, :] \
                            if sh > 1 else sref[:, dy:dy + wo, :, :]
                        acc = jnp.maximum(acc, sl)
                    return acc

                rows = _scoped_i32(x, rows_body, pads, -128)

                def cols_body(sref):
                    acc = jnp.full((c, wo, ho, nt_b), -128, jnp.int32)
                    for dx in range(fh):
                        sl = sref[:, :, dx:min(dx + sh * ho, hp):sh, :] \
                            if sh > 1 else sref[:, :, dx:dx + ho, :]
                        acc = jnp.maximum(acc, sl)
                    return acc

                def stage_rows(s2):
                    s2[:] = rows
                    return cols_body(s2)

                out = pl.run_scoped(
                    stage_rows, pltpu.VMEM((c, wo, hp, nt_b), jnp.int32))
                return out.astype(jnp.int8)

            out.append(FusedOp(out_idx, [x_idx], [], emit, _nbytes(out_t)))

        elif name == "ADD":
            a_idx, b_idx = op.inputs
            from yoloface_tpu.core.fixedpoint import quantize_multiplier
            q1, q2 = t(a_idx).qparams, t(b_idx).qparams
            qo = out_t.qparams
            s1, s2, so = (np.float64(q1.scale), np.float64(q2.scale),
                          np.float64(qo.scale))
            spec = {"exact": exact, "zp1": q1.zero_point,
                    "zp2": q2.zero_point, "zp_out": qo.zero_point}
            if exact:
                twice_max = 2.0 * max(s1, s2)
                spec["left_shift"] = 20
                spec["qm1"], spec["sh1"] = quantize_multiplier(s1 / twice_max)
                spec["qm2"], spec["sh2"] = quantize_multiplier(s2 / twice_max)
                spec["qmo"], spec["sho"] = quantize_multiplier(
                    twice_max / ((1 << 20) * so))
            else:
                spec["s1"] = np.float32(s1 / so)
                spec["s2"] = np.float32(s2 / so)

            def emit(env, opvals, a_idx=a_idx, b_idx=b_idx, spec=spec):
                va = env[a_idx].astype(jnp.int32) - spec["zp1"]
                vb = env[b_idx].astype(jnp.int32) - spec["zp2"]
                if spec["exact"]:
                    from yoloface_tpu.kernels.pallas_int8 import \
                        exact_add_rescale
                    sa = exact_add_rescale(va, spec["qm1"], spec["sh1"],
                                           spec["left_shift"])
                    sb = exact_add_rescale(vb, spec["qm2"], spec["sh2"],
                                           spec["left_shift"])
                    o = multiply_by_quantized_multiplier(
                        sa + sb, jnp.int32(spec["qmo"]),
                        jnp.int32(spec["sho"]))
                else:
                    o = jnp.round(
                        va.astype(jnp.float32) * spec["s1"]
                        + vb.astype(jnp.float32) * spec["s2"]
                    ).astype(jnp.int32)
                return jnp.clip(o + spec["zp_out"], -128,
                                127).astype(jnp.int8)

            out.append(FusedOp(out_idx, [a_idx, b_idx], [], emit,
                               _nbytes(out_t)))

        elif name == "QUANTIZE":
            from yoloface_tpu.core.fixedpoint import quantize_multiplier
            (x_idx,) = op.inputs
            in_q, out_q = t(x_idx).qparams, out_t.qparams
            ratio = np.float64(in_q.scale) / np.float64(out_q.scale)
            spec = {"exact": exact, "zp_in": in_q.zero_point,
                    "zp_out": out_q.zero_point}
            if exact:
                spec["qm"], spec["sh"] = quantize_multiplier(ratio)
            else:
                spec["scale"] = np.float32(ratio)

            def emit(env, opvals, x_idx=x_idx, spec=spec):
                v = env[x_idx].astype(jnp.int32) - spec["zp_in"]
                if spec["exact"]:
                    o = multiply_by_quantized_multiplier(
                        v, jnp.int32(spec["qm"]), jnp.int32(spec["sh"]))
                else:
                    o = jnp.round(v.astype(jnp.float32)
                                  * spec["scale"]).astype(jnp.int32)
                return jnp.clip(o + spec["zp_out"], -128,
                                127).astype(jnp.int8)

            out.append(FusedOp(out_idx, [x_idx], [], emit, _nbytes(out_t)))

        elif name == "CONCATENATION":
            idxs = list(op.inputs)

            def emit(env, opvals, idxs=idxs):
                return jnp.concatenate([env[i] for i in idxs], axis=0)

            out.append(FusedOp(out_idx, idxs, [], emit, _nbytes(out_t)))

        else:
            raise NotImplementedError(name)
    return out


# --------------------------------------------------------------------------
# stage partitioning + pallas_call assembly
# --------------------------------------------------------------------------
def partition_stages(fused_ops: List[FusedOp], graph: GraphDef,
                     budget: Optional[int] = None) -> List[List[FusedOp]]:
    """Greedy: extend the current stage while the estimated bytes of live
    activations stays under budget; cut otherwise."""
    if budget is None:
        budget = STAGE_BUDGET_BYTES   # resolved at call time (test knob)
    stages: List[List[FusedOp]] = []
    cur: List[FusedOp] = []
    cur_bytes = 0
    for fop in fused_ops:
        if cur and cur_bytes + fop.out_bytes > budget:
            stages.append(cur)
            cur, cur_bytes = [], 0
        cur.append(fop)
        cur_bytes += fop.out_bytes
    if cur:
        stages.append(cur)
    return stages


def build_fused_plan(graph: GraphDef, exact: bool) -> List[Callable]:
    """Plan in the Int8Engine convention: list of fns over a CHWN env (here
    [C,W,H,N]); each fn sets possibly several env entries via .out_idx /
    .extra_out_idxs."""
    fused_ops = lower_fused_ops(graph, exact)
    stages = partition_stages(fused_ops, graph)
    t = graph.tensor

    # tensors produced / consumed across stage boundaries
    produced_in = {}
    for si, stage in enumerate(stages):
        for fop in stage:
            produced_in[fop.out_idx] = si
    plan: List[Callable] = []
    graph_outputs = set(graph.outputs)

    for si, stage in enumerate(stages):
        internal = {fop.out_idx for fop in stage}
        ext_inputs: List[int] = []
        for fop in stage:
            for i in fop.in_idxs:
                if i not in internal and i not in ext_inputs:
                    ext_inputs.append(i)
        # stage outputs: produced here and consumed later or graph output
        later_needs = set(graph_outputs)
        for sj in range(si + 1, len(stages)):
            for fop in stages[sj]:
                later_needs.update(fop.in_idxs)
        outputs = [fop.out_idx for fop in stage
                   if fop.out_idx in later_needs]

        operand_arrays: List[np.ndarray] = []
        operand_slices: List[tuple] = []
        for fop in stage:
            start = len(operand_arrays)
            operand_arrays.extend(fop.operands)
            operand_slices.append((start, len(operand_arrays)))

        def make_stage(stage=stage, ext_inputs=ext_inputs, outputs=outputs,
                       operand_arrays=operand_arrays,
                       operand_slices=operand_slices):
            n_in = len(ext_inputs)
            n_op = len(operand_arrays)

            def kernel(*refs):
                in_refs = refs[:n_in]
                op_refs = refs[n_in:n_in + n_op]
                out_refs = refs[n_in + n_op:]
                env: Dict[int, jnp.ndarray] = {
                    idx: r[:] for idx, r in zip(ext_inputs, in_refs)}
                opvals = [r[:] for r in op_refs]
                for fop, (a, b) in zip(stage, operand_slices):
                    env[fop.out_idx] = fop.emit(env, opvals[a:b])
                for o, r in zip(outputs, out_refs):
                    r[:] = env[o]

            def run(env_outer):
                xs = [env_outer[i] for i in ext_inputs]
                n = xs[0].shape[-1]
                assert n % NT == 0 or n == NT or n < NT, n
                nt = NT if n % NT == 0 else n
                in_specs = [
                    pl.BlockSpec(tuple(x.shape[:3]) + (nt,),
                                 (lambda i: (0, 0, 0, i)),
                                 memory_space=pltpu.VMEM) for x in xs]
                op_specs = [
                    pl.BlockSpec(a.shape,
                                 (lambda i, nd=len(a.shape):
                                  tuple(0 for _ in range(nd))),
                                 memory_space=pltpu.VMEM)
                    for a in operand_arrays]
                out_specs = tuple(
                    pl.BlockSpec(
                        (t(o).shape[3], t(o).shape[2], t(o).shape[1], nt),
                        lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM)
                    for o in outputs)
                out_shape = tuple(
                    jax.ShapeDtypeStruct(
                        (t(o).shape[3], t(o).shape[2], t(o).shape[1], n),
                        jnp.int8) for o in outputs)
                res = pl.pallas_call(
                    kernel,
                    grid=(n // nt,),
                    in_specs=in_specs + op_specs,
                    out_specs=out_specs,
                    out_shape=out_shape,
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=64 * 1024 * 1024),
                    interpret=_interpret_mode(),
                )(*xs, *[jnp.asarray(a) for a in operand_arrays])
                if not isinstance(res, (tuple, list)):
                    res = (res,)
                return dict(zip(outputs, res))

            return run, outputs

        run, outputs = make_stage()

        def fn(env, run=run, outputs=outputs):
            env.update(run(env))
            return env[outputs[-1]]

        fn.out_idx = outputs[-1]                     # type: ignore
        fn.stage_outputs = outputs                   # type: ignore
        plan.append(fn)
    return plan

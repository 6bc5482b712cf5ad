"""Graph lowering onto the Pallas TPU kernels (engine modes "pallas[_exact]").

Consumes the same :class:`GraphDef` as the XLA lowering but plans in the
``[C, H, W, N]`` activation layout of :mod:`yoloface_tpu.kernels.pallas_int8`
and runs a single peephole fusion pass: a CONV/DW whose output feeds exactly
one LEAKY_RELU gets the activation folded into its kernel (one HBM
round-trip saved per conv — the same folding the reference's codegen does
with its per-conv int8 LUTs, ``network.c:2900-2921``).

EVERY op runs as a Pallas kernel (convs, pad, pool, add, quantize, concat,
standalone leaky): consecutive custom calls then share the row-major
[C,H,W,N] layout, eliminating the relayout copies XLA otherwise inserts
around each kernel boundary (measured ~35% of net time at batch 32k).  The
only XLA ops left in the net are the stride-2 polyphase slices.
"""

from __future__ import annotations

from collections import Counter
from typing import Callable, List

import numpy as np

from yoloface_tpu.core.fixedpoint import (derive_single_multiply,
                                          quantize_multiplier,
                                          quantize_multiplier_arr)
from yoloface_tpu.graph.ir import GraphDef, OpDef
from yoloface_tpu.kernels import pallas_int8 as pk
from yoloface_tpu.ops.int8_ref import _same_pad_amounts


def _requant_spec(s_in, s_w, s_out, zp_out, exact) -> pk.RequantSpec:
    eff = np.float64(s_in) * np.asarray(s_w, np.float64) / np.float64(s_out)
    qm = shift = None
    if exact:
        qm, shift = quantize_multiplier_arr(eff)
    return pk.RequantSpec(zp_out=zp_out, scale=eff.astype(np.float32),
                          qm=qm, shift=shift, exact=exact)


def _leaky_spec(graph: GraphDef, leaky_op: OpDef, exact) -> pk.LeakySpec:
    in_q = graph.tensor(leaky_op.inputs[0]).qparams
    out_q = graph.tensor(leaky_op.outputs[0]).qparams
    alpha = np.float64(leaky_op.attrs["alpha"])
    ratio = np.float64(in_q.scale) / np.float64(out_q.scale)
    kw = dict(zp_in=in_q.zero_point, zp_out=out_q.zero_point,
              s_id=ratio, s_al=ratio * alpha, exact=exact)
    if exact:
        kw["qm_id"], kw["sh_id"] = quantize_multiplier(ratio)
        kw["qm_al"], kw["sh_al"] = quantize_multiplier(ratio * alpha)
        # plan-time single-multiply derivation (exhaustively verified over
        # the 256-value domain); None falls back to the bounded MBQM
        kw["sm"] = derive_single_multiply(
            kw["qm_id"], kw["sh_id"], kw["qm_al"], kw["sh_al"],
            in_q.zero_point, out_q.zero_point)
    return pk.LeakySpec(**kw)


def build_pallas_plan(graph: GraphDef, exact: bool) -> List[Callable]:
    t = graph.tensor
    # tensor -> number of consuming ops (plus graph outputs)
    uses = Counter()
    for op in graph.ops:
        for i in op.inputs:
            if i >= 0:
                uses[i] += 1
    for i in graph.outputs:
        uses[i] += 1
    # map: conv op index -> fused leaky op (or None); leaky ops absorbed
    ops_by_out = {op.outputs[0]: op for op in graph.ops}
    fused_leaky = {}
    absorbed = set()
    for op in graph.ops:
        if op.opname == "LEAKY_RELU":
            src = ops_by_out.get(op.inputs[0])
            if (src is not None
                    and src.opname in ("CONV_2D", "DEPTHWISE_CONV_2D")
                    and uses[op.inputs[0]] == 1):
                fused_leaky[src.index] = op
                absorbed.add(op.index)

    plan: List[Callable] = []
    for op in graph.ops:
        if op.index in absorbed:
            continue
        name = op.opname
        out_idx = op.outputs[0]
        leaky_op = fused_leaky.get(op.index)
        if leaky_op is not None:
            out_idx = leaky_op.outputs[0]

        if name == "PAD":
            data_idx, pad_idx = op.inputs
            # NHWC paddings [(n),(h),(w),(c)] -> CHWN dims (1, 2)
            p = t(pad_idx).data.astype(int)
            zp = t(op.outputs[0]).qparams.zero_point
            # layout is [C, W, H, N]: dim1 = W pads, dim2 = H pads
            pads = ((int(p[2][0]), int(p[2][1])),
                    (int(p[1][0]), int(p[1][1])))

            def fn(env, data_idx=data_idx, pads=pads, zp=zp):
                return pk.pad_int8(env[data_idx], pads, zp)

        elif name in ("CONV_2D", "DEPTHWISE_CONV_2D"):
            from yoloface_tpu.runtime.engine import _check_no_dilation
            _check_no_dilation(op)
            x_idx, w_idx, b_idx = op.inputs
            w, b = t(w_idx), t(b_idx)
            in_q = t(x_idx).qparams
            out_q = t(op.outputs[0]).qparams
            requant = _requant_spec(in_q.scale, w.qparams.scales,
                                    out_q.scale, out_q.zero_point, exact)
            leaky = (None if leaky_op is None
                     else _leaky_spec(graph, leaky_op, exact))
            stride = (op.attrs["stride_h"], op.attrs["stride_w"])
            padding = op.attrs["padding"]
            in_h, in_w = t(x_idx).shape[1], t(x_idx).shape[2]
            out_h, out_w = t(op.outputs[0]).shape[1], t(op.outputs[0]).shape[2]
            zp_in = in_q.zero_point

            if name == "CONV_2D":
                wd = w.data  # [Co, Kh, Kw, Ci]
                kh, kw_ = wd.shape[1], wd.shape[2]
                bias_eff = (b.data.astype(np.int64)
                            - zp_in * wd.astype(np.int64).sum((1, 2, 3))
                            ).astype(np.int32)
                pk.set_conv_bounds(requant,
                    np.abs(wd.astype(np.int64)).sum((1, 2, 3)), bias_eff)
                if kh == kw_ == 1:
                    w_io = np.ascontiguousarray(
                        wd.reshape(wd.shape[0], wd.shape[3]).T)
                    assert stride == (1, 1)

                    def fn(env, x_idx=x_idx, w_io=w_io, bias=bias_eff,
                           requant=requant, leaky=leaky):
                        return pk.conv1x1(env[x_idx], w_io, bias, requant,
                                          leaky)
                else:
                    # [Co,Ci,Kw,Kh]: spatial dims swapped for the
                    # [C, W, H, N] layout
                    w_oihw = np.ascontiguousarray(wd.transpose(0, 3, 2, 1))
                    pads = None
                    if padding == "SAME":
                        pads = (_same_pad_amounts(in_w, stride[1], kw_),
                                _same_pad_amounts(in_h, stride[0], kh))

                    def fn(env, x_idx=x_idx, w_oihw=w_oihw, bias=bias_eff,
                           requant=requant, leaky=leaky, stride=stride,
                           pads=pads, out_hw=(out_w, out_h), zp_in=zp_in):
                        x = env[x_idx]
                        if pads is not None:
                            x = pk.pad_int8(x, pads, zp_in)
                        return pk.conv3x3(x, w_oihw, bias, requant,
                                          stride=stride[0], out_hw=out_hw,
                                          leaky=leaky)
            else:  # DEPTHWISE_CONV_2D
                wd = w.data  # [1, Kh, Kw, C]
                if not (wd.shape[1] == wd.shape[2] == 3):
                    raise NotImplementedError(
                        f"pallas depthwise taps are 3x3-only, got "
                        f"{wd.shape[1]}x{wd.shape[2]} (op {op.index})")
                c = wd.shape[3]
                bias_eff = (b.data.astype(np.int64)
                            - zp_in * wd.astype(np.int64).sum((0, 1, 2))
                            ).astype(np.int32)
                pk.set_conv_bounds(requant,
                    np.abs(wd.astype(np.int64)).sum((0, 1, 2)), bias_eff)
                # [C,Kw,Kh]: spatial dims swapped for [C, W, H, N]
                w_c33 = np.ascontiguousarray(
                    wd[0].transpose(2, 1, 0))
                pads = None
                if padding == "SAME":
                    pads = (_same_pad_amounts(in_w, stride[1], 3),
                            _same_pad_amounts(in_h, stride[0], 3))

                def fn(env, x_idx=x_idx, w_c33=w_c33, bias=bias_eff,
                       requant=requant, leaky=leaky, stride=stride,
                       pads=pads, out_hw=(out_w, out_h), zp_in=zp_in):
                    x = env[x_idx]
                    if pads is not None:
                        x = pk.pad_int8(x, pads, zp_in)
                    return pk.dwconv3x3(x, w_c33, bias, requant,
                                        stride=stride[0], out_hw=out_hw,
                                        leaky=leaky)

        elif name == "LEAKY_RELU":
            # standalone (conv output had other consumers)
            spec = _leaky_spec(graph, op, exact)
            x_idx = op.inputs[0]

            def fn(env, x_idx=x_idx, spec=spec):
                return pk.leaky_int8(env[x_idx], spec)

        elif name == "MAX_POOL_2D":
            (x_idx,) = op.inputs
            fh, fw = op.attrs["filter_h"], op.attrs["filter_w"]
            sh, sw = op.attrs["stride_h"], op.attrs["stride_w"]
            in_h, in_w = t(x_idx).shape[1], t(x_idx).shape[2]
            if op.attrs["padding"] == "SAME":
                ph = _same_pad_amounts(in_h, sh, fh)
                pw = _same_pad_amounts(in_w, sw, fw)
            else:
                ph = pw = (0, 0)
            # swapped for the [C, W, H, N] layout
            out_hw = (t(op.outputs[0]).shape[2], t(op.outputs[0]).shape[1])

            def fn(env, x_idx=x_idx, fh=fh, fw=fw, sh=sh, ph=ph, pw=pw,
                   out_hw=out_hw):
                return pk.maxpool_int8(env[x_idx], filter_hw=(fw, fh),
                                       stride=sh, pads=(pw, ph),
                                       out_hw=out_hw)

        elif name == "ADD":
            a_idx, b_idx = op.inputs
            q1, q2 = t(a_idx).qparams, t(b_idx).qparams
            qo = t(out_idx).qparams
            s1, s2, so = (np.float64(q1.scale), np.float64(q2.scale),
                          np.float64(qo.scale))
            spec = {"exact": exact, "zp1": q1.zero_point,
                    "zp2": q2.zero_point, "zp_out": qo.zero_point}
            if exact:
                left_shift = 20
                twice_max = 2.0 * max(s1, s2)
                spec["left_shift"] = left_shift
                spec["qm1"], spec["sh1"] = quantize_multiplier(s1 / twice_max)
                spec["qm2"], spec["sh2"] = quantize_multiplier(s2 / twice_max)
                spec["qmo"], spec["sho"] = quantize_multiplier(
                    twice_max / ((1 << left_shift) * so))
            else:
                spec["s1"] = np.float32(s1 / so)
                spec["s2"] = np.float32(s2 / so)

            def fn(env, a_idx=a_idx, b_idx=b_idx, spec=spec):
                return pk.add_int8(env[a_idx], env[b_idx], spec)

        elif name == "QUANTIZE":
            (x_idx,) = op.inputs
            in_q, out_q = t(x_idx).qparams, t(out_idx).qparams
            ratio = np.float64(in_q.scale) / np.float64(out_q.scale)
            spec = {"exact": exact, "zp_in": in_q.zero_point,
                    "zp_out": out_q.zero_point}
            if exact:
                spec["qm"], spec["sh"] = quantize_multiplier(ratio)
            else:
                spec["scale"] = np.float32(ratio)

            def fn(env, x_idx=x_idx, spec=spec):
                return pk.requantize_int8(env[x_idx], spec)

        elif name in ("RELU", "RELU6", "LOGISTIC"):
            (x_idx,) = op.inputs
            fn_val = pk.activation_int32(name, t(x_idx).qparams)

            def fn(env, x_idx=x_idx, fn_val=fn_val):
                return pk.eltwise_int8(env[x_idx], fn_val)

        elif name == "RESIZE_NEAREST_NEIGHBOR":
            x_idx = op.inputs[0]
            factors = pk.resize_factors(t, op)   # (f_w, f_h) = dims 1, 2

            def fn(env, x_idx=x_idx, factors=factors):
                return pk.resize_nearest(env[x_idx], factors)

        elif name == "CONCATENATION":
            idxs = list(op.inputs)
            assert op.attrs["axis"] == 3  # NHWC channel -> CHWN dim 0

            def fn(env, idxs=idxs):
                # N-ary via pairwise folds (1-input routes pass through;
                # >2-input concats cost one extra HBM round-trip per
                # operand — this mode is the per-op ablation baseline)
                v = env[idxs[0]]
                for i in idxs[1:]:
                    v = pk.concat_channels(v, env[i])
                return v

        else:
            raise NotImplementedError(f"pallas plan: op {name}")

        fn.out_idx = out_idx  # type: ignore[attr-defined]
        plan.append(fn)
    return plan

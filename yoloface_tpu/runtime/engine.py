"""Int8 graph engine: compiles a :class:`GraphDef` into one jitted XLA program.

The TPU-native counterpart of the reference's generated runtime
(``stm32/X-CUBE-AI/App/network.c:3272-3417``): where the MCU walks a linked
list of 31 layer structs with a hand-planned activation arena, we lower the
imported graph once into a single XLA computation — XLA performs memory
planning, fusion and scheduling (the analogue of
``network_configure_activations``, ``network.c:2944-3100``).

All requantization parameters are resolved to fixed-point (qm, shift) pairs
at load time in double precision, exactly like the TFLite kernel-init code,
then baked into the program as constants.

Public API mirrors the reference's ``ai_network_create / ai_network_run``
(``network.h:103-213``): ``Int8Engine(graph)`` ≈ create+init,
``engine(frames)`` ≈ run.  ``engine.run_with_intermediates`` is the analogue
of the (unused-by-the-reference) X-CUBE-AI network-inspector hooks
(``ai_network_inspector.h``) and backs the per-layer parity tests.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from yoloface_tpu.core.fixedpoint import (quantize_multiplier,
                                          quantize_multiplier_arr)
from yoloface_tpu.graph.ir import GraphDef, OpDef
from yoloface_tpu.ops import int8_fast as fast_ops
from yoloface_tpu.ops import int8_ref as ops


def _check_no_dilation(op: "OpDef") -> None:
    """Dilated int8 convs are not implemented in any lowering; failing loudly
    beats silently running them as dilation=1 (wrong outputs)."""
    dw = op.attrs.get("dilation_w", 1)
    dh = op.attrs.get("dilation_h", 1)
    if dw != 1 or dh != 1:
        raise NotImplementedError(
            f"{op.opname} with dilation ({dh},{dw}) is not supported")


class Int8Engine:
    """Executes an imported int8 TFLite graph bit-exactly on TPU via XLA."""

    def __init__(self, graph: GraphDef, mode: str = "exact",
                 xla_layout: str = "nhwc"):
        """mode:
          * "exact" — XLA ops, bit-exact gemmlowp fixed-point requantization
            (the parity oracle);
          * "fast" — XLA ops, float32 requantization (~2x faster; diverges
            from exact by the same class of rounding drift as TFLite's own
            optimized backends vs its reference kernels);
          * "pallas" — one Pallas TPU kernel per op in [C,W,H,N] layout
            with fused conv+leaky, float requant (bit-identical to "fast");
          * "pallas_exact" — same kernels, fixed-point requant
            (bit-identical to "exact");
          * "pallas_fused[_exact]" — the whole net as a few fused-stage
            kernels over value-env stages (kernels/pallas_fused.py);
          * "pallas_arena[_exact]" — fused stages over a static VMEM
            activation-arena of refs, CWHN layout (kernels/pallas_arena.py);
          * "pallas_mxu[_exact]" — the arena in WHCN layout (C in
            sublanes): 1x1 convs run as true MXU matmuls;
          * "fast2" / "pallas_mxu2" — fast-bits-v2: ONE rounding across
            each fused conv+leaky pair (the reference's one-LUT epilogue
            semantics, network.c:2900-2921; see ops/int8_fast2.py).
            Closer to the float ideal than fast/exact AND the fastest —
            pallas_mxu2 is the FLAGSHIP serving mode (24.1 ms net @32k
            on v5e vs fast 37.7; bit-identical to its "fast2" XLA twin).
        All modes are validated bit-exactly against their semantics twin
        ("fast" or "exact").

        xla_layout (base XLA modes only): "nhwc" (default) keeps the
        TFLite activation layout; "whcn" runs every op natively in the
        framework's [W,H,C,N] TPU layout (conv dimension numbers +
        per-channel broadcast axes change; the integer math and the
        elementwise requant are layout-invariant, so outputs are
        bit-identical).  WHCN twins back the hybrid tiled routing with
        zero boundary relayouts — see kernels/pallas_tiled.py.
        """
        if xla_layout not in ("nhwc", "whcn"):
            raise ValueError(f"unknown xla_layout {xla_layout!r}")
        if xla_layout == "whcn" and mode not in ("exact", "fast", "fast2"):
            raise ValueError(
                f"xla_layout='whcn' applies to the base XLA modes only, "
                f"not {mode!r} (pallas modes have their own layouts)")
        self._xla_layout = xla_layout
        if mode not in ("exact", "fast", "fast2", "pallas", "pallas_exact",
                        "pallas_fused", "pallas_fused_exact",
                        "pallas_arena", "pallas_arena_exact",
                        "pallas_mxu", "pallas_mxu_exact", "pallas_mxu2",
                        "pallas_tiled", "pallas_tiled_exact",
                        "pallas_tiled2"):
            raise ValueError(f"unknown engine mode {mode!r}")
        self.mode = mode
        self.graph = graph
        if len(graph.inputs) != 1 or len(graph.outputs) < 1:
            raise ValueError(
                f"Int8Engine supports single-input graphs with >= 1 "
                f"output; got {len(graph.inputs)} inputs / "
                f"{len(graph.outputs)} outputs")
        self.input_idx = graph.inputs[0]
        # multi-head graphs (e.g. two-scale yolo-v3 detectors) have several
        # outputs; __call__ returns a tuple in graph order for those
        self.output_idxs = list(graph.outputs)
        self.output_idx = graph.outputs[0]
        in_t = graph.tensor(self.input_idx)
        if in_t.qparams is None or in_t.dtype != np.dtype(np.int8):
            raise ValueError(
                f"Int8Engine requires a full-int8 quantized graph; input "
                f"tensor {in_t.name!r} is {in_t.dtype} with qparams="
                f"{in_t.qparams}. For float graphs use the FP32 model path "
                f"(yoloface_tpu.models).")
        self.input_shape = tuple(in_t.shape[1:])  # without batch
        # layout of the pallas activation tensors + the NHWC<->layout perms
        # ([N,H,W,C] in; CWHN = [C,W,H,N]; WHCN = [W,H,C,N])
        if (mode.startswith(("pallas_mxu", "pallas_tiled"))
                or xla_layout == "whcn"):
            self._perm_in, self._perm_out = (2, 1, 3, 0), (3, 1, 0, 2)
        else:
            self._perm_in = self._perm_out = (3, 2, 1, 0)
        if mode.startswith("pallas_tiled"):
            # W-strip tiled sections for big-plane (retargeted-scale)
            # graphs + arena stages for the small-plane suffix
            # (kernels/pallas_tiled.py); falls back to the plain arena on
            # small graphs.  Bits: tiled==fast, tiled2==fast2, _exact.
            from yoloface_tpu.kernels.pallas_tiled import build_tiled_plan
            self._plan = build_tiled_plan(graph,
                                          exact=mode.endswith("exact"),
                                          v2=(mode == "pallas_tiled2"))
        elif mode.startswith("pallas_arena"):
            from yoloface_tpu.kernels.pallas_arena import build_arena_plan
            self._plan = build_arena_plan(graph, exact=mode.endswith("exact"))
        elif mode.startswith("pallas_mxu"):
            from yoloface_tpu.kernels.pallas_arena import build_arena_plan
            self._plan = build_arena_plan(graph, exact=mode.endswith("exact"),
                                          layout="whcn",
                                          v2=(mode == "pallas_mxu2"))
        elif mode.startswith("pallas_fused"):
            from yoloface_tpu.kernels.pallas_fused import build_fused_plan
            self._plan = build_fused_plan(graph, exact=mode.endswith("exact"))
        elif mode.startswith("pallas"):
            from yoloface_tpu.runtime.pallas_plan import build_pallas_plan
            self._plan = build_pallas_plan(graph, exact=mode.endswith("exact"))
        elif mode == "fast2":
            self._plan = self._lower_ops_fast2()
        else:
            self._plan = [self._lower_op(op) for op in graph.ops]
        if xla_layout == "whcn" and mode == "fast":
            # Hardware workaround (real v5e, jax 0.9): the v1 fast-bits
            # WHCN program is miscompiled by XLA's fusion pass — BOTH 1x1
            # lowerings diverge (~70% of output cells, max|d|~80) in the
            # fully-fused program, while materializing every tensor
            # (collect=True) or the fast2/exact fusion shapes are
            # bit-exact: tools/debug448_whcn.py (per-op: zero divergence),
            # debug448_whcn2.py (dot_general BAD / conv_general OK with no
            # pallas_call; batch-independent), debug448_v1ctx.py (BOTH bad
            # downstream of a pallas_call).  Per-op optimization_barrier
            # forbids the cross-op fusions XLA gets wrong; bit-identical
            # by construction (barrier is the identity) and perf-neutral
            # where it matters (the WHCN v1 twin is a parity baseline,
            # not a serving mode).
            def _barrier(fn):
                def wrapped(env, fn=fn):
                    return jax.lax.optimization_barrier(fn(env))
                wrapped.out_idx = fn.out_idx  # type: ignore[attr-defined]
                return wrapped

            self._plan = [_barrier(fn) for fn in self._plan]
        self._jit_cache: Dict[int, Callable] = {}

    def _check_input(self, x):
        if x.ndim != len(self.input_shape) + 1 or tuple(x.shape[1:]) != self.input_shape:
            raise ValueError(
                f"expected input [N,{','.join(map(str, self.input_shape))}], "
                f"got {tuple(x.shape)}")
        if x.dtype != np.int8:
            raise ValueError(f"expected int8 input, got {x.dtype}")

    # ---------------------------------------------------------------- quant
    @property
    def input_qparams(self):
        return self.graph.tensor(self.input_idx).qparams

    @property
    def output_qparams(self):
        return self.graph.tensor(self.output_idx).qparams

    # ------------------------------------------------------------- lowering
    def _lower_op(self, op: OpDef) -> Callable:
        g = self.graph
        t = g.tensor
        name = op.opname
        out_idx = op.outputs[0]
        whcn = self._xla_layout == "whcn"
        lay = "WHCN" if whcn else "NHWC"

        if whcn and name in ("RESHAPE", "FULLY_CONNECTED", "SOFTMAX"):
            # flat-feature head ops have no 4-D WHCN form; lazy-raise so a
            # graph is only rejected if a WHCN plan actually RUNS one
            # (hybrid tiled routing never routes these to a WHCN section)
            def fn(env, name=name):
                raise NotImplementedError(
                    f"op {name} has no WHCN-layout XLA lowering; route "
                    f"its section to the NHWC twin")

            fn.out_idx = out_idx  # type: ignore[attr-defined]
            return fn

        if name == "PAD":
            data_idx, pad_idx = op.inputs
            paddings = t(pad_idx).data.astype(np.int64)
            if whcn:
                paddings = paddings[[2, 1, 3, 0]]   # NHWC rows -> WHCN rows
            zp = t(out_idx).qparams.zero_point

            def fn(env, data_idx=data_idx, paddings=paddings, zp=zp):
                return ops.pad_int8(env[data_idx], paddings, zp)

        elif name in ("CONV_2D", "DEPTHWISE_CONV_2D"):
            _check_no_dilation(op)
            x_idx, w_idx, b_idx = op.inputs
            w, b = t(w_idx), t(b_idx)
            in_q, out_q = t(x_idx).qparams, t(out_idx).qparams
            s_in = np.float64(in_q.scale)
            s_w = np.asarray(w.qparams.scales, np.float64)
            s_out = np.float64(out_q.scale)
            kw = dict(
                weights=w.data, bias=b.data.astype(np.int32),
                input_zp=in_q.zero_point, output_zp=out_q.zero_point,
                stride=(op.attrs["stride_h"], op.attrs["stride_w"]),
                padding=op.attrs["padding"], layout=lay,
            )
            assert op.attrs["activation"] == "NONE"
            if self.mode == "exact":
                kw["qm"], kw["shift"] = quantize_multiplier_arr(
                    s_in * s_w / s_out)
                impl = (ops.conv2d_int8 if name == "CONV_2D"
                        else ops.depthwise_conv2d_int8)
            else:
                kw["scale"] = (s_in * s_w / s_out).astype(np.float32)
                impl = (fast_ops.conv2d_int8_fast if name == "CONV_2D"
                        else fast_ops.depthwise_conv2d_int8_fast)

            def fn(env, x_idx=x_idx, impl=impl, kw=kw):
                return impl(env[x_idx], **kw)

        elif name == "LEAKY_RELU":
            (x_idx,) = op.inputs
            in_q, out_q = t(x_idx).qparams, t(out_idx).qparams
            alpha = np.float64(op.attrs["alpha"])
            ratio = np.float64(in_q.scale) / np.float64(out_q.scale)
            if self.mode == "exact":
                qm_id, sh_id = quantize_multiplier(ratio)
                qm_al, sh_al = quantize_multiplier(ratio * alpha)
                kw = dict(input_zp=in_q.zero_point,
                          output_zp=out_q.zero_point,
                          qm_identity=qm_id, shift_identity=sh_id,
                          qm_alpha=qm_al, shift_alpha=sh_al)
                impl = ops.leaky_relu_int8
            else:
                kw = dict(input_zp=in_q.zero_point,
                          output_zp=out_q.zero_point,
                          scale_identity=np.float32(ratio),
                          scale_alpha=np.float32(ratio * alpha))
                impl = fast_ops.leaky_relu_int8_fast

            def fn(env, x_idx=x_idx, impl=impl, kw=kw):
                return impl(env[x_idx], **kw)

        elif name == "MAX_POOL_2D":
            (x_idx,) = op.inputs
            kw = dict(filter_hw=(op.attrs["filter_h"], op.attrs["filter_w"]),
                      stride=(op.attrs["stride_h"], op.attrs["stride_w"]),
                      padding=op.attrs["padding"], layout=lay)

            def fn(env, x_idx=x_idx, kw=kw):
                return ops.maxpool_int8(env[x_idx], **kw)

        elif name == "ADD":
            a_idx, b_idx = op.inputs
            q1, q2 = t(a_idx).qparams, t(b_idx).qparams
            qo = t(out_idx).qparams
            s1, s2, so = (np.float64(q1.scale), np.float64(q2.scale),
                          np.float64(qo.scale))
            if self.mode == "exact":
                left_shift = 20
                twice_max = 2.0 * max(s1, s2)
                qm1, sh1 = quantize_multiplier(s1 / twice_max)
                qm2, sh2 = quantize_multiplier(s2 / twice_max)
                qmo, sho = quantize_multiplier(
                    twice_max / ((1 << left_shift) * so))
                kw = dict(zp1=q1.zero_point, zp2=q2.zero_point,
                          zp_out=qo.zero_point,
                          qm1=qm1, shift1=sh1, qm2=qm2, shift2=sh2,
                          qm_out=qmo, shift_out=sho, left_shift=left_shift)
                impl = ops.add_int8
            else:
                kw = dict(zp1=q1.zero_point, zp2=q2.zero_point,
                          zp_out=qo.zero_point,
                          scale1=np.float32(s1 / so),
                          scale2=np.float32(s2 / so))
                impl = fast_ops.add_int8_fast

            def fn(env, a_idx=a_idx, b_idx=b_idx, impl=impl, kw=kw):
                return impl(env[a_idx], env[b_idx], **kw)

        elif name == "QUANTIZE":
            (x_idx,) = op.inputs
            in_q, out_q = t(x_idx).qparams, t(out_idx).qparams
            ratio = np.float64(in_q.scale) / np.float64(out_q.scale)
            if self.mode == "exact":
                qm, sh = quantize_multiplier(ratio)
                kw = dict(input_zp=in_q.zero_point,
                          output_zp=out_q.zero_point, qm=qm, shift=sh)
                impl = ops.requantize_int8
            else:
                kw = dict(input_zp=in_q.zero_point,
                          output_zp=out_q.zero_point,
                          scale=np.float32(ratio))
                impl = fast_ops.requantize_int8_fast

            def fn(env, x_idx=x_idx, impl=impl, kw=kw):
                return impl(env[x_idx], **kw)

        elif name == "CONCATENATION":
            idxs = list(op.inputs)
            axis = op.attrs["axis"] % 4
            if whcn:
                axis = {0: 3, 1: 1, 2: 0, 3: 2}[axis]  # NHWC ax -> WHCN ax

            def fn(env, idxs=idxs, axis=axis):
                return ops.concat_int8([env[i] for i in idxs], axis)

        elif name == "AVERAGE_POOL_2D":
            (x_idx,) = op.inputs
            kw = dict(filter_hw=(op.attrs["filter_h"], op.attrs["filter_w"]),
                      stride=(op.attrs["stride_h"], op.attrs["stride_w"]),
                      padding=op.attrs["padding"], layout=lay)

            def fn(env, x_idx=x_idx, kw=kw):
                return ops.avgpool_int8(env[x_idx], **kw)

        elif name == "LOGISTIC":
            (x_idx,) = op.inputs
            in_q = t(x_idx).qparams
            kw = dict(input_scale=float(in_q.scale),
                      input_zp=in_q.zero_point)

            def fn(env, x_idx=x_idx, kw=kw):
                return ops.logistic_int8(env[x_idx], **kw)

        elif name == "RELU":
            (x_idx,) = op.inputs
            zp = t(x_idx).qparams.zero_point

            def fn(env, x_idx=x_idx, zp=zp):
                return ops.relu_int8(env[x_idx], zero_point=zp)

        elif name == "RELU6":
            (x_idx,) = op.inputs
            q = t(x_idx).qparams

            def fn(env, x_idx=x_idx, q=q):
                return ops.relu6_int8(env[x_idx], scale=float(q.scale),
                                      zero_point=q.zero_point)

        elif name == "RESIZE_NEAREST_NEIGHBOR":
            x_idx = op.inputs[0]
            in_q, out_q = t(x_idx).qparams, t(out_idx).qparams
            if (in_q.scale != out_q.scale
                    or in_q.zero_point != out_q.zero_point):
                raise NotImplementedError(
                    "RESIZE_NEAREST_NEIGHBOR with requantization")
            if op.attrs.get("align_corners") or op.attrs.get(
                    "half_pixel_centers"):
                # for integer factors all three conventions coincide with
                # replication; reject explicitly-flagged graphs anyway so
                # unsupported semantics cannot pass silently
                raise NotImplementedError(
                    "RESIZE_NEAREST_NEIGHBOR align_corners/half_pixel")
            out_hw = (t(out_idx).shape[1], t(out_idx).shape[2])

            def fn(env, x_idx=x_idx, out_hw=out_hw, lay=lay):
                return ops.resize_nearest_int8(env[x_idx], out_hw=out_hw,
                                               layout=lay)

        elif name == "FULLY_CONNECTED":
            x_idx, w_idx = op.inputs[0], op.inputs[1]
            b_idx = op.inputs[2] if len(op.inputs) > 2 else -1
            w = t(w_idx)
            in_q, out_q = t(x_idx).qparams, t(out_idx).qparams
            s_in = np.float64(in_q.scale)
            s_w = np.asarray(w.qparams.scales, np.float64)
            s_out = np.float64(out_q.scale)
            if self.mode == "exact" or True:  # FC always exact (cheap)
                qm, shift = quantize_multiplier_arr(s_in * s_w / s_out)
                if qm.size == 1:
                    qm, shift = int(qm[0]), int(shift[0])
            bias = (t(b_idx).data.astype(np.int32)
                    if b_idx >= 0 and t(b_idx).data is not None else None)
            kw = dict(weights=w.data, bias=bias,
                      input_zp=in_q.zero_point, output_zp=out_q.zero_point,
                      qm=qm, shift=shift)

            def fn(env, x_idx=x_idx, kw=kw):
                return ops.fully_connected_int8(env[x_idx], **kw)

        elif name == "SOFTMAX":
            (x_idx,) = op.inputs
            in_q = t(x_idx).qparams
            kw = dict(input_scale=float(in_q.scale),
                      input_zp=in_q.zero_point,
                      beta=float(op.attrs.get("beta", 1.0)))

            def fn(env, x_idx=x_idx, kw=kw):
                return ops.softmax_int8(env[x_idx], **kw)

        elif name == "RESHAPE":
            x_idx = op.inputs[0]
            new_shape = tuple(t(out_idx).shape)

            def fn(env, x_idx=x_idx, new_shape=new_shape):
                return ops.reshape_int8(env[x_idx], new_shape)

        else:
            raise NotImplementedError(f"op {name} not supported")

        fn.out_idx = out_idx  # type: ignore[attr-defined]
        return fn

    def _lower_ops_fast2(self):
        """fast2 plan: single-rounding fused conv+leaky pairs (the
        reference's one-rounding LUT epilogue semantics,
        network.c:2900-2921), everything else the "fast" lowering.  Kept
        in elementwise lockstep with the arena v2 epilogue
        (kernels/pallas_int8.apply_requant_leaky) so pallas_mxu2 is
        bit-identical to fast2."""
        from collections import Counter

        from yoloface_tpu.ops import int8_fast2 as fast2_ops

        g = self.graph
        t = g.tensor
        uses = Counter()
        for op in g.ops:
            for i in op.inputs:
                if i >= 0:
                    uses[i] += 1
        for i in g.outputs:
            uses[i] += 1
        ops_by_out = {op.outputs[0]: op for op in g.ops}
        fused, absorbed = {}, set()
        for op in g.ops:
            if op.opname != "LEAKY_RELU":
                continue
            src = ops_by_out.get(op.inputs[0])
            if (src is not None
                    and src.opname in ("CONV_2D", "DEPTHWISE_CONV_2D")
                    and uses[op.inputs[0]] == 1):
                fused[src.index] = op
                absorbed.add(op.index)

        plan = []
        for op in g.ops:
            if op.index in absorbed:
                continue
            leaky_op = fused.get(op.index)
            if leaky_op is None:
                plan.append(self._lower_op(op))
                continue
            _check_no_dilation(op)
            x_idx, w_idx, b_idx = op.inputs
            w, b = t(w_idx), t(b_idx)
            conv_q = t(op.outputs[0]).qparams
            in_q = t(x_idx).qparams
            out_q = t(leaky_op.outputs[0]).qparams
            # identical f64 -> f32 constant derivations as the arena's
            # _requant_spec / _leaky_spec, for bit-lockstep
            eff = (np.float64(in_q.scale)
                   * np.asarray(w.qparams.scales, np.float64)
                   / np.float64(conv_q.scale))
            ratio = np.float64(conv_q.scale) / np.float64(out_q.scale)
            alpha = np.float64(leaky_op.attrs["alpha"])
            kw = dict(
                weights=w.data, bias=b.data.astype(np.int32),
                input_zp=in_q.zero_point, conv_zp=conv_q.zero_point,
                out_zp=out_q.zero_point, scale=eff.astype(np.float32),
                s_id=float(ratio), s_al=float(ratio * alpha),
                stride=(op.attrs["stride_h"], op.attrs["stride_w"]),
                padding=op.attrs["padding"],
                layout="WHCN" if self._xla_layout == "whcn" else "NHWC",
            )
            impl = (fast2_ops.conv2d_leaky_int8_fast2
                    if op.opname == "CONV_2D"
                    else fast2_ops.depthwise_conv2d_leaky_int8_fast2)

            def fn(env, x_idx=x_idx, impl=impl, kw=kw):
                return impl(env[x_idx], **kw)

            fn.out_idx = leaky_op.outputs[0]  # type: ignore[attr-defined]
            plan.append(fn)
        return plan

    # ------------------------------------------------------------ execution
    def _forward(self, x, collect: bool = False):
        pall = self.mode.startswith("pallas")
        relayout = pall or self._xla_layout == "whcn"
        n = x.shape[0]
        if relayout:
            # Mosaic kernels want full 128-lane batch tiles (tiny lane dims
            # trip vector-reshape lowering); pad and slice the result.
            if pall and jax.default_backend() != "cpu" and n % 128 != 0:
                pad = (-n) % 128
                x = jnp.concatenate(
                    [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
            # NHWC -> activation layout (CWHN keeps H in sublanes; WHCN
            # puts C in sublanes so 1x1 convs hit the MXU)
            x = jnp.transpose(x, self._perm_in)
        env = {self.input_idx: x}
        for fn in self._plan:
            env[fn.out_idx] = fn(env)
        if collect:
            if relayout:
                env = {k: jnp.transpose(v, self._perm_out)[:n]
                       for k, v in env.items()}
            return env
        outs = tuple(
            (jnp.transpose(env[o], self._perm_out)[:n] if relayout
             else env[o])
            for o in self.output_idxs)
        return outs[0] if len(outs) == 1 else outs

    def forward_native(self, x_layout):
        """Pallas modes: forward from an input already in the engine's
        activation layout (CWHN [C,W,H,N] / WHCN [W,H,C,N], batch padded to
        the lane tile by the caller) -> NHWC output.  The zero-relayout
        serving entry: the Pallas preprocess kernel emits this layout
        directly (see pipeline/e2e.py)."""
        assert self.mode.startswith("pallas"), self.mode
        env = {self.input_idx: x_layout}
        for fn in self._plan:
            env[fn.out_idx] = fn(env)
        outs = tuple(jnp.transpose(env[o], self._perm_out)
                     for o in self.output_idxs)
        return outs[0] if len(outs) == 1 else outs

    def __call__(self, x):
        """Run the graph on int8 frames [N,56,56,3] -> int8 [N,7,7,18]."""
        self._check_input(x)
        key = x.shape[0]
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                functools.partial(self._forward, collect=False))
        return self._jit_cache[key](x)

    def run_with_intermediates(self, x) -> Dict[int, np.ndarray]:
        """Inspector mode: every activation tensor, for parity testing."""
        env = jax.jit(functools.partial(self._forward, collect=True))(x)
        return {k: np.asarray(v) for k, v in env.items()}

    # ------------------------------------------------- float-domain helpers
    def quantize_input(self, frames_f32):
        """float frames (0..1 domain of the original converter) -> int8."""
        q = self.input_qparams
        v = jnp.round(frames_f32 / q.scale) + q.zero_point
        return jnp.clip(v, -128, 127).astype(jnp.int8)

    def dequantize_output(self, y_int8):
        q = self.output_qparams
        return (y_int8.astype(jnp.float32) - q.zero_point) * q.scale

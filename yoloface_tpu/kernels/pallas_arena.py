"""Arena-fused Pallas stages: the int8 net over a static VMEM activation arena.

Third-generation Pallas lowering (after the per-op kernels and the value-env
fused stages).  Round-1 measurements showed the fused value-env stages lose
to stock XLA because every windowed op stages its int8 input into an int32
scratch ref (Mosaic only supports offset/strided reads on REFS, not on
loaded values) — a whole-tensor copy + widen per op.

This lowering instead gives every intermediate tensor a *static VMEM ref*
("alloc") for the whole stage — the direct TPU analogue of the reference's
statically planned activation arena (``network.c:2944-3100``,
``network_configure_activations``) — and:

  * producers write their requantized output strips straight into the
    (pre-padded) interior of each consumer's alloc — no PAD ops, no staging
    copies, no whole-tensor int8<->int32 round trips;
  * windowed/strided ops (depthwise conv, stem conv, maxpool) read their
    taps directly from the padded refs (any offset is legal on refs;
    strided loads require 32-bit data, so strided-consumed tensors get
    int32 allocs);
  * pad borders are constant across batch tiles, so they are filled once at
    grid step 0 and persist in scratch across the grid;
  * CONCATENATION dissolves: single-consumer in-stage concat inputs alias
    channel ranges of the concat output's allocs, so their producers write
    in place.

Two activation layouts (both [*, NT=128-lane batch] tiled):

  * ``cwhn`` — [C, W, H, N]: H in sublanes.  All convolutions run as VPU
    tap FMAs; 1x1 convs contract the plain C dim (measured VPU-bound).
  * ``whcn`` — [W, H, C, N]: C in sublanes.  1x1 convs become per-(w,h)
    2D ``dot_general`` [Co,Ci] @ [Ci,N] — the MXU shape (measured at the
    HBM floor in microbenchmarks, vs ~1.5 GMAC/ms for plain-dim dots) —
    and all window offsets/strides move to plain dims.

Both requant semantics are supported (fast float32 / exact gemmlowp) with
the same RequantSpec / LeakySpec math as the other Pallas paths, so the
arena modes are bit-identical to "fast" / "exact" respectively.

Reference roles replaced: the binary kernel library's graph walk
(``ai_platform_network_process``, ``layers_conv2d.h:192``,
``layers_pool.h:374``) plus the static memory plan.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yoloface_tpu.core.fixedpoint import (
    multiply_by_quantized_multiplier,
    multiply_by_quantized_multiplier_bounded, quantize_multiplier)
from yoloface_tpu.graph.ir import GraphDef
from yoloface_tpu.kernels import pallas_int8 as pk
from yoloface_tpu.kernels.pallas_int8 import (_interpret_mode,
                                              set_conv_bounds as _set_conv_bounds,
                                              apply_requant_leaky)
from yoloface_tpu.ops.int8_ref import _same_pad_amounts

# batch-lane tile: lanes are 128 wide; multiples of 128 amortize the
# per-dot MXU issue overhead of the small per-(w,h) 1x1 dots at the cost
# of proportionally larger VMEM arenas (env-tunable)
NT = int(os.environ.get("YOLOFACE_TPU_ARENA_NT", 128))
# per-stage VMEM budget for the activation arena (bytes, sublane-padded
# estimate); ARENA_BUDGET=999999999 -> whole net in one kernel
# NOTE: 40 MB fits the whole 56-net in ONE mega-kernel (est 36.3 MB) and
# wins 0.25 ms net-only @32k, but LOSES ~9% in the full pipeline @64k
# (919k vs 1008k fps — less overlap with the preprocess/head kernels), so
# the 2-stage 24 MB default stays
ARENA_BUDGET = int(os.environ.get("YOLOFACE_TPU_ARENA_BUDGET",
                                  24 * 1024 * 1024))
_EXACT_BUDGET_CAP = 24 * 1024 * 1024
# live int32 accumulator bytes per requant strip (env-tunable).  16 MB
# measured best on v5e: the 4 MB default left exact-mode strip-loop
# overhead on the table (pallas_mxu_exact 77.5 -> 67.7 ms @32k; fast
# unchanged; 64 MB saturates)
_STRIP_TARGET = int(os.environ.get("YOLOFACE_TPU_STRIP_TARGET", 16 << 20))
# estimated live int32 words per accumulator element in the exact epilogue
# (drives strip width).  6 matched the bounded-MBQM chain; the reduced
# pure-int32 form (rsm) keeps ~4 temporaries alive — sweep on hardware.
_EXACT_LIVE = int(os.environ.get("YOLOFACE_TPU_EXACT_LIVE", 6))
# hard per-alloc ceiling: one activation plane larger than this cannot fit
# VMEM regardless of stage partition (v5e VMEM ~128 MB, compile limit 100)
_VMEM_CEILING = 64 * 1024 * 1024
# experiment knob: give EVERY windowed consumer an int32 input alloc so
# producers store wide and the per-op int8->int32 widening load disappears
# (4x VMEM for those allocs)
_WIDE_WINDOWS = os.environ.get("YOLOFACE_TPU_ARENA_WIDE", "0") == "1"

Pads = Tuple[Tuple[int, int], Tuple[int, int]]
NOPAD: Pads = ((0, 0), (0, 0))


# --------------------------------------------------------------------------
# layout helpers: dims are canonically (c, w, h) + batch lanes
# --------------------------------------------------------------------------
def _shape4(layout: str, c: int, w: int, h: int) -> Tuple[int, int, int]:
    return (c, w, h) if layout == "cwhn" else (w, h, c)


def _ix(layout: str, cs, ws, hs) -> tuple:
    """Index tuple for a [*, NT] ref/value in the given layout."""
    return ((cs, ws, hs, slice(None)) if layout == "cwhn"
            else (ws, hs, cs, slice(None)))


def _ch_axis(layout: str) -> int:
    return 0 if layout == "cwhn" else 2


def _chvec(layout: str, vec, c: int):
    """Per-channel [C]/[C,1] operand value -> broadcastable 4D shape."""
    return vec.reshape((c, 1, 1, 1) if layout == "cwhn" else (1, 1, c, 1))


class Alloc:
    """One VMEM scratch buffer: interior (c, w, h) + pad borders.

    dtype is int8 unless a consumer reads the tensor with stride > 1:
    Mosaic only implements strided loads for 32-bit data, so those allocs
    are int32 (producers store their int32 result directly)."""

    def __init__(self, aid: int, layout: str, c: int, w: int, h: int,
                 pads: Pads, fill: int, dtype=jnp.int8):
        self.id = aid
        self.layout = layout
        self.c, self.w, self.h = c, w, h
        self.pads = pads
        self.fill = fill
        self.dtype = dtype

    @property
    def shape(self) -> Tuple[int, int, int]:
        (pw0, pw1), (ph0, ph1) = self.pads
        return _shape4(self.layout, self.c, self.w + pw0 + pw1,
                       self.h + ph0 + ph1)

    @property
    def est_bytes(self) -> int:
        isz = np.dtype(self.dtype).itemsize
        q = 32 // isz                      # sublane quantum per dtype
        s = list(self.shape)
        s[-1] = -(-s[-1] // q) * q         # sublane dim is shape[-1]
        return int(np.prod(s)) * NT * isz


class View:
    """A tensor's placement inside an alloc (channel offset for concat)."""

    def __init__(self, alloc: Alloc, c0: int = 0):
        self.alloc = alloc
        self.c0 = c0


class _Ctx:
    """In-kernel context: resolves tensor reads/writes against the arena."""

    def __init__(self, layout, views, in_refs, out_refs, refs, shapes):
        self.layout = layout
        self.views: Dict[int, List[View]] = views
        self.in_refs = in_refs
        self.out_refs = out_refs
        self.refs = refs
        self.shapes = shapes            # tensor -> (c, w, h)

    def read_base(self, t: int, pads: Pads = NOPAD, fill: int = 0):
        """(ref, c0, w0, h0): base of the *pads-padded* tensor t."""
        for v in self.views.get(t, []):
            a = v.alloc
            if pads == NOPAD or (a.pads == pads and a.fill == fill):
                (pw0, _), (ph0, _) = a.pads
                (rw0, _), (rh0, _) = pads
                return self.refs[a.id], v.c0, pw0 - rw0, ph0 - rh0
        if pads == NOPAD and t in self.in_refs:
            return self.in_refs[t], 0, 0, 0
        raise KeyError(f"no view of tensor {t} with pads {pads}")

    def write(self, t: int, w0: int, w1: int, val):
        """Store an output strip (c, w1-w0, h) into every view (+ the stage
        output ref when t crosses the stage boundary).  ``val`` is laid out
        per the arena layout and may be int8 or in-range int32."""
        c, _, h = self.shapes[t]
        L = self.layout
        for v in self.views.get(t, []):
            a = v.alloc
            (pw0, _), (ph0, _) = a.pads
            self.refs[a.id][_ix(L, slice(v.c0, v.c0 + c),
                                slice(pw0 + w0, pw0 + w1),
                                slice(ph0, ph0 + h))] = val.astype(a.dtype)
        if t in self.out_refs:
            self.out_refs[t][_ix(L, slice(0, c), slice(w0, w1),
                                 slice(0, h))] = val.astype(jnp.int8)


class ArenaOp:
    """One lowered op: numpy operands + in-kernel emit fn + input needs."""

    def __init__(self, out_idx: int,
                 in_reqs: List[Tuple[int, Pads, int, bool]],
                 operands: List, emit: Callable):
        self.out_idx = out_idx
        self.in_reqs = in_reqs          # (tensor, pads, fill, strided)
        self.in_idxs = [r[0] for r in in_reqs]
        self.operands = operands
        self.emit = emit


def _strips(wo: int, co: int, h: int, exact: bool) -> List[Tuple[int, int]]:
    """Output W-strip ranges bounding the live int32 accumulator."""
    per_w = co * h * NT * 4 * (_EXACT_LIVE if exact else 2)
    strip = max(1, min(wo, _STRIP_TARGET // max(per_w, 1)))
    return [(w0, min(w0 + strip, wo)) for w0 in range(0, wo, strip)]


# --------------------------------------------------------------------------
# lowering: graph ops -> ArenaOps
# --------------------------------------------------------------------------
def _input_req(graph: GraphDef, op) -> Tuple[int, Pads, int]:
    """(real input tensor, pads, fill) for a conv/pool input, absorbing an
    upstream PAD op (darknet top-left pad) when the op consumes one.
    Shared with the W-strip-tiled lowering (kernels/pallas_tiled.py)."""
    t = graph.tensor
    x_idx = op.inputs[0]
    producer = next((p for p in graph.ops
                     if p.outputs and p.outputs[0] == x_idx
                     and p.opname == "PAD"), None)
    if producer is not None:
        p = t(producer.inputs[1]).data.astype(int)
        pads = ((int(p[2][0]), int(p[2][1])), (int(p[1][0]), int(p[1][1])))
        zp = t(producer.outputs[0]).qparams.zero_point
        return producer.inputs[0], pads, zp
    if op.attrs.get("padding") == "SAME":
        k_h = op.attrs.get("filter_h")
        k_w = op.attrs.get("filter_w")
        if k_h is None:                 # conv: kernel dims from weights
            wd = t(op.inputs[1]).data
            k_h, k_w = wd.shape[1], wd.shape[2]
        in_h, in_w = t(x_idx).shape[1], t(x_idx).shape[2]
        pads = (_same_pad_amounts(in_w, op.attrs["stride_w"], k_w),
                _same_pad_amounts(in_h, op.attrs["stride_h"], k_h))
        if pads != NOPAD:
            fill = (-128 if op.opname == "MAX_POOL_2D"
                    else t(x_idx).qparams.zero_point)
            return x_idx, pads, fill
    return x_idx, NOPAD, 0


def lower_arena_ops(graph: GraphDef, exact: bool, layout: str,
                    v2: bool = False, ops: Optional[List] = None):
    """Returns (arena_ops, concat_alias) after absorbing LEAKY + PAD.
    ``v2`` selects the single-rounding fused conv+leaky epilogue (fast2
    semantics; see ops/int8_fast2.py).  ``ops`` restricts lowering to a
    subset of ``graph.ops`` (a section of the graph): fusion/absorption
    only fires within the subset, while use counts stay global so a
    tensor consumed outside the subset is never absorbed away."""
    from yoloface_tpu.runtime.pallas_plan import _leaky_spec, _requant_spec
    from yoloface_tpu.runtime.engine import _check_no_dilation
    from collections import Counter

    L = layout
    CH = _ch_axis(L)
    t = graph.tensor
    op_list = list(ops) if ops is not None else graph.ops
    uses = Counter()
    for op in graph.ops:
        for i in op.inputs:
            if i >= 0:
                uses[i] += 1
    for i in graph.outputs:
        uses[i] += 1

    ops_by_out = {op.outputs[0]: op for op in op_list}
    fused_leaky, absorbed = {}, set()
    for op in op_list:
        if op.opname == "LEAKY_RELU":
            src = ops_by_out.get(op.inputs[0])
            if (src is not None
                    and src.opname in ("CONV_2D", "DEPTHWISE_CONV_2D")
                    and uses[op.inputs[0]] == 1):
                fused_leaky[src.index] = op
                absorbed.add(op.index)
        elif op.opname == "PAD":
            absorbed.add(op.index)      # consumers absorb via _input_req

    # concat input -> (concat output, channel offset) for single-consumer
    # inputs produced by an op (aliasing resolved per stage)
    concat_alias: Dict[int, Tuple[int, int]] = {}
    for op in op_list:
        if op.opname != "CONCATENATION":
            continue
        c0 = 0
        for i in op.inputs:
            if uses[i] == 1 and i in ops_by_out:
                concat_alias[i] = (op.outputs[0], c0)
            c0 += t(i).shape[3]

    arena_ops: List[ArenaOp] = []
    for op in op_list:
        if op.index in absorbed:
            continue
        name = op.opname
        out_idx = op.outputs[0]
        leaky_op = fused_leaky.get(op.index)
        if leaky_op is not None:
            out_idx = leaky_op.outputs[0]
        out_t = t(op.outputs[0])
        oh, ow = out_t.shape[1], out_t.shape[2]

        if name in ("CONV_2D", "DEPTHWISE_CONV_2D"):
            _check_no_dilation(op)
            x_raw, w_idx, b_idx = op.inputs
            x_idx, pads, fill = _input_req(graph, op)
            w, b = t(w_idx), t(b_idx)
            in_q, out_q = t(x_raw).qparams, out_t.qparams
            requant = _requant_spec(in_q.scale, w.qparams.scales,
                                    out_q.scale, out_q.zero_point, exact)
            requant.v2 = bool(v2) or requant.v2
            leaky = (None if leaky_op is None
                     else _leaky_spec(graph, leaky_op, exact))
            stride = op.attrs["stride_h"]
            zp_in = in_q.zero_point
            wd = w.data

            if name == "CONV_2D" and wd.shape[1] == wd.shape[2] == 1:
                if stride != 1 or op.attrs.get("stride_w", 1) != 1:
                    # both arena 1x1 emits slice the input at output
                    # coordinates (stride-1 assumption on BOTH axes);
                    # fail loudly on strided 1x1 convs instead of
                    # lowering silently wrong (ADVICE r3)
                    raise NotImplementedError(
                        f"arena 1x1 conv with stride "
                        f"({stride},{op.attrs.get('stride_w', 1)}) (op "
                        f"{op.index}); only stride 1 is lowered")
                co, ci = wd.shape[0], wd.shape[3]
                bias_eff = (b.data.astype(np.int64)
                            - zp_in * wd.astype(np.int64).sum((1, 2, 3))
                            ).astype(np.int32).reshape(co, 1)
                _set_conv_bounds(requant,
                    np.abs(wd.astype(np.int64)).sum((1, 2, 3)), bias_eff)
                if L == "cwhn":
                    w_arr = np.ascontiguousarray(wd.reshape(co, ci).T)

                    def emit(ctx, opvals, x_idx=x_idx, out_idx=out_idx,
                             ci=ci, requant=requant, leaky=leaky, co=co,
                             ow=ow, oh=oh, exact=exact):
                        w_v, b_v, *rq = opvals
                        xr, c0, wb, hb = ctx.read_base(x_idx)
                        x = xr[c0:c0 + ci, wb:wb + ow, hb:hb + oh, :]
                        if x.dtype != jnp.int8:
                            x = x.astype(jnp.int8)
                        acc = lax.dot_general(
                            w_v, x, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
                        acc = acc + b_v.reshape(co, 1, 1, 1)
                        for s0, s1 in _strips(ow, co, oh, exact):
                            r = apply_requant_leaky(
                                requant, leaky, acc[:, s0:s1], rq)
                            ctx.write(out_idx, s0, s1, r)
                else:
                    # whcn: per-(w,h) 2D MXU dots [Co,Ci] @ [Ci,NT]
                    w_arr = np.ascontiguousarray(wd.reshape(co, ci))

                    def emit(ctx, opvals, x_idx=x_idx, out_idx=out_idx,
                             ci=ci, requant=requant, leaky=leaky, co=co,
                             ow=ow, oh=oh, exact=exact):
                        w_v, b_v, *rq = opvals
                        xr, c0, wb, hb = ctx.read_base(x_idx)
                        for s0, s1 in _strips(ow, co, oh, exact):
                            rows = []
                            for wpos in range(s0, s1):
                                cols = []
                                for hpos in range(oh):
                                    x2d = xr[wb + wpos, hb + hpos,
                                             c0:c0 + ci, :]
                                    if x2d.dtype != jnp.int8:
                                        x2d = x2d.astype(jnp.int8)
                                    cols.append(lax.dot_general(
                                        w_v, x2d, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32))
                                rows.append(jnp.stack(cols, 0))
                            acc = jnp.stack(rows, 0)     # [ws, oh, Co, NT]
                            acc = acc + b_v.reshape(1, 1, co, 1)
                            r = apply_requant_leaky(requant, leaky, acc,
                                                    rq, ch_axis=2)
                            ctx.write(out_idx, s0, s1, r)

                arena_ops.append(ArenaOp(
                    out_idx, [(x_idx, NOPAD, 0, False)],
                    [w_arr, bias_eff, *requant.operand_arrays()], emit))

            elif name == "CONV_2D" and L == "whcn":
                # im2col -> MXU: 9 strided phase reads concatenated on the
                # sublane (C) axis form X[w,h, kh*kh*ci, NT]; each output
                # position is one int8 MXU dot [Co, K] @ [K, NT].  Measured
                # 1.4x the VPU tap loop at the stem shape (3x3 ci=3 s2) and
                # bit-exact vs the reference conv on hardware.
                co, kh, ci = wd.shape[0], wd.shape[1], wd.shape[3]
                bias_eff = (b.data.astype(np.int64)
                            - zp_in * wd.astype(np.int64).sum((1, 2, 3))
                            ).astype(np.int32).reshape(co, 1)
                _set_conv_bounds(requant,
                    np.abs(wd.astype(np.int64)).sum((1, 2, 3)), bias_eff)
                # columns ordered (dy-major W offset, dx H offset, ci)
                w2 = np.ascontiguousarray(
                    wd.transpose(0, 2, 1, 3).reshape(co, kh * kh * ci)
                ).astype(np.int8)

                def emit(ctx, opvals, x_idx=x_idx, out_idx=out_idx,
                         requant=requant, leaky=leaky, co=co, ci=ci, kh=kh,
                         stride=stride, pads=pads, fill=fill, ow=ow, oh=oh,
                         exact=exact):
                    w_v, b_v, *rq = opvals
                    xr, c0, wb, hb = ctx.read_base(x_idx, pads, fill)
                    phases = []
                    for dy in range(kh):
                        for dx in range(kh):
                            wsl = slice(wb + dy,
                                        wb + dy + (ow - 1) * stride + 1,
                                        stride)
                            hsl = slice(hb + dx,
                                        hb + dx + (oh - 1) * stride + 1,
                                        stride)
                            ph = xr[wsl, hsl, c0:c0 + ci, :]
                            if ph.dtype != jnp.int8:
                                ph = ph.astype(jnp.int8)
                            phases.append(ph)
                    X = jnp.concatenate(phases, axis=2)
                    for s0, s1 in _strips(ow, co, oh, exact):
                        rows = []
                        for wpos in range(s0, s1):
                            cols = []
                            for hpos in range(oh):
                                cols.append(lax.dot_general(
                                    w_v, X[wpos, hpos],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32))
                            rows.append(jnp.stack(cols, 0))
                        acc = jnp.stack(rows, 0) + b_v.reshape(1, 1, co, 1)
                        r = apply_requant_leaky(requant, leaky, acc, rq,
                                                ch_axis=2)
                        ctx.write(out_idx, s0, s1, r)

                arena_ops.append(ArenaOp(
                    out_idx, [(x_idx, pads, fill, stride > 1 or _WIDE_WINDOWS)],
                    [w2, bias_eff, *requant.operand_arrays()], emit))

            elif name == "CONV_2D":
                co, kh, ci = wd.shape[0], wd.shape[1], wd.shape[3]
                bias_eff = (b.data.astype(np.int64)
                            - zp_in * wd.astype(np.int64).sum((1, 2, 3))
                            ).astype(np.int32).reshape(co, 1)
                _set_conv_bounds(requant,
                    np.abs(wd.astype(np.int64)).sum((1, 2, 3)), bias_eff)
                # [K*K, Co, Ci] taps; index k = ww*kh + hh (W-major)
                taps = np.stack([
                    np.asarray(wd[:, hh, ww, :], np.int32)
                    for ww in range(kh) for hh in range(kh)])

                def emit(ctx, opvals, x_idx=x_idx, out_idx=out_idx,
                         requant=requant, leaky=leaky, co=co, ci=ci, kh=kh,
                         stride=stride, pads=pads, fill=fill, ow=ow, oh=oh,
                         exact=exact):
                    w_v, b_v, *rq = opvals
                    xr, c0, wb, hb = ctx.read_base(x_idx, pads, fill)
                    nt = xr.shape[-1]
                    for s0, s1 in _strips(ow, co, oh, exact):
                        acc = (_chvec(L, b_v, co)
                               + jnp.zeros(_shape4(L, co, s1 - s0, oh)
                                           + (nt,), jnp.int32))
                        for dy in range(kh):
                            for dx in range(kh):
                                wsl = slice(
                                    wb + s0 * stride + dy,
                                    wb + s0 * stride + dy
                                    + (s1 - s0 - 1) * stride + 1, stride)
                                hsl = slice(hb + dx,
                                            hb + dx + (oh - 1) * stride + 1,
                                            stride)
                                k = dy * kh + dx
                                for ci_i in range(ci):
                                    sl = xr[_ix(L, slice(c0 + ci_i,
                                                         c0 + ci_i + 1),
                                                wsl, hsl)].astype(jnp.int32)
                                    col = _chvec(
                                        L, w_v[k:k + 1, :, ci_i:ci_i + 1],
                                        co)
                                    acc = acc + sl * col
                        r = apply_requant_leaky(requant, leaky, acc, rq,
                                                ch_axis=_ch_axis(L))
                        ctx.write(out_idx, s0, s1, r)

                arena_ops.append(ArenaOp(
                    out_idx, [(x_idx, pads, fill, stride > 1 or _WIDE_WINDOWS)],
                    [taps, bias_eff, *requant.operand_arrays()], emit))

            else:                       # depthwise 3x3
                if not (wd.shape[1] == wd.shape[2] == 3):
                    raise NotImplementedError(
                        f"arena depthwise taps are 3x3-only, got "
                        f"{wd.shape[1]}x{wd.shape[2]} (op {op.index})")
                c = wd.shape[3]
                bias_eff = (b.data.astype(np.int64)
                            - zp_in * wd.astype(np.int64).sum((0, 1, 2))
                            ).astype(np.int32).reshape(c, 1)
                _set_conv_bounds(requant,
                    np.abs(wd.astype(np.int64)).sum((0, 1, 2)), bias_eff)
                w_taps = np.asarray(
                    wd[0].transpose(2, 1, 0), np.int32).reshape(c, 9)

                def emit(ctx, opvals, x_idx=x_idx, out_idx=out_idx,
                         requant=requant, leaky=leaky, c=c, stride=stride,
                         pads=pads, fill=fill, ow=ow, oh=oh, exact=exact):
                    w_v, b_v, *rq = opvals
                    xr, c0, wb, hb = ctx.read_base(x_idx, pads, fill)
                    nt = xr.shape[-1]
                    for s0, s1 in _strips(ow, c, oh, exact):
                        ws = s1 - s0
                        acc = (_chvec(L, b_v, c)
                               + jnp.zeros(_shape4(L, c, ws, oh)
                                           + (nt,), jnp.int32))
                        if stride == 1:
                            # one widening load; taps are plain-dim VALUE
                            # slices (free vreg selects) — avoids 9 int8->
                            # int32 relayouts per layer (measured dominant)
                            xall = xr[_ix(L, slice(c0, c0 + c),
                                          slice(wb + s0, wb + s1 + 2),
                                          slice(hb, hb + oh + 2))
                                      ].astype(jnp.int32)
                            for dy in range(3):
                                for dx in range(3):
                                    sl = xall[_ix(L, slice(0, c),
                                                  slice(dy, dy + ws),
                                                  slice(dx, dx + oh))]
                                    tap = _chvec(L, w_v[:, dy * 3 + dx], c)
                                    acc = acc + sl * tap
                        else:
                            for dy in range(3):
                                for dx in range(3):
                                    wsl = slice(
                                        wb + s0 * stride + dy,
                                        wb + s0 * stride + dy
                                        + (ws - 1) * stride + 1, stride)
                                    hsl = slice(
                                        hb + dx,
                                        hb + dx + (oh - 1) * stride + 1,
                                        stride)
                                    sl = xr[_ix(L, slice(c0, c0 + c),
                                                wsl, hsl)
                                            ].astype(jnp.int32)
                                    tap = _chvec(L, w_v[:, dy * 3 + dx], c)
                                    acc = acc + sl * tap
                        r = apply_requant_leaky(requant, leaky, acc, rq,
                                                ch_axis=_ch_axis(L))
                        ctx.write(out_idx, s0, s1, r)

                arena_ops.append(ArenaOp(
                    out_idx, [(x_idx, pads, fill, stride > 1 or _WIDE_WINDOWS)],
                    [w_taps, bias_eff, *requant.operand_arrays()], emit))

        elif name == "MAX_POOL_2D":
            x_idx, pads, fill = _input_req(graph, op)
            fh, fw = op.attrs["filter_h"], op.attrs["filter_w"]
            stride = op.attrs["stride_h"]
            in_h = t(x_idx).shape[1]
            (_, _), (ph0, ph1) = pads
            hp = in_h + ph0 + ph1

            def emit(ctx, opvals, x_idx=x_idx, out_idx=out_idx, fw=fw,
                     fh=fh, stride=stride, pads=pads, fill=fill,
                     ow=ow, oh=oh, hp=hp):
                # separable two-pass max (fw + fh taps instead of fw*fh):
                # rows-max over W (keeping padded H), staged into an int32
                # scratch ref so the cols pass can read H-strided slices
                xr, c0, wb, hb = ctx.read_base(x_idx, pads, fill)
                c = ctx.shapes[x_idx][0]
                nt = xr.shape[-1]
                rows = jnp.full(_shape4(L, c, ow, hp) + (nt,), -128,
                                jnp.int32)
                for dy in range(fw):
                    wsl = slice(wb + dy, wb + dy + (ow - 1) * stride + 1,
                                stride)
                    sl = xr[_ix(L, slice(c0, c0 + c), wsl,
                                slice(hb, hb + hp))].astype(jnp.int32)
                    rows = jnp.maximum(rows, sl)

                def cols(sref):
                    sref[:] = rows
                    acc = jnp.full(_shape4(L, c, ow, oh) + (nt,), -128,
                                   jnp.int32)
                    for dx in range(fh):
                        hsl = slice(dx, dx + (oh - 1) * stride + 1, stride)
                        acc = jnp.maximum(
                            acc, sref[_ix(L, slice(0, c), slice(0, ow),
                                          hsl)])
                    return acc

                out = pl.run_scoped(
                    cols, pltpu.VMEM(_shape4(L, c, ow, hp) + (nt,),
                                     jnp.int32))
                ctx.write(out_idx, 0, ow, out)

            arena_ops.append(ArenaOp(
                out_idx, [(x_idx, pads, fill, stride > 1 or _WIDE_WINDOWS)], [], emit))

        elif name == "AVERAGE_POOL_2D":
            x_idx, pads, _ = _input_req(graph, op)
            fh, fw = op.attrs["filter_h"], op.attrs["filter_w"]
            stride = op.attrs["stride_h"]
            in_h, in_w = t(x_idx).shape[1], t(x_idx).shape[2]
            # TFLite clipped-window semantics: zero-fill pads for the sum,
            # divide by the VALID tap count per position (host-precomputed)
            ones = np.zeros((in_w, in_h), np.int32)
            ones[:] = 1
            (pw0, pw1), (ph0, ph1) = pads
            onesp = np.pad(ones, ((pw0, pw1), (ph0, ph1)))
            counts = np.zeros((ow, oh), np.int32)
            for dy in range(fw):
                for dx in range(fh):
                    counts += onesp[dy:dy + (ow - 1) * stride + 1:stride,
                                    dx:dx + (oh - 1) * stride + 1:stride]

            def emit(ctx, opvals, x_idx=x_idx, out_idx=out_idx, fw=fw,
                     fh=fh, stride=stride, pads=pads, ow=ow, oh=oh):
                (cnt_v,) = opvals
                xr, c0, wb, hb = ctx.read_base(x_idx, pads, 0)
                c = ctx.shapes[x_idx][0]
                nt = xr.shape[-1]
                acc = jnp.zeros(_shape4(L, c, ow, oh) + (nt,), jnp.int32)
                for dy in range(fw):
                    for dx in range(fh):
                        wsl = slice(wb + dy,
                                    wb + dy + (ow - 1) * stride + 1, stride)
                        hsl = slice(hb + dx,
                                    hb + dx + (oh - 1) * stride + 1, stride)
                        acc = acc + xr[_ix(L, slice(c0, c0 + c), wsl, hsl)
                                       ].astype(jnp.int32)
                shape = ((1, ow, oh, 1) if L == "cwhn" else (ow, oh, 1, 1))
                cnt = cnt_v.reshape(shape)
                half = cnt // 2
                mean = jnp.where(acc >= 0, (acc + half) // cnt,
                                 -((-acc + half) // cnt))
                ctx.write(out_idx, 0, ow, jnp.clip(mean, -128, 127))

            arena_ops.append(ArenaOp(
                out_idx, [(x_idx, pads, 0, stride > 1 or _WIDE_WINDOWS)], [counts], emit))

        elif name in ("RELU", "RELU6", "LOGISTIC"):
            (x_idx,) = op.inputs
            fn_val = pk.activation_int32(name, t(x_idx).qparams)

            def emit(ctx, opvals, x_idx=x_idx, out_idx=out_idx,
                     fn_val=fn_val, ow=ow, oh=oh):
                xr, c0, wb, hb = ctx.read_base(x_idx)
                c = ctx.shapes[x_idx][0]
                v = xr[_ix(L, slice(c0, c0 + c), slice(wb, wb + ow),
                           slice(hb, hb + oh))]
                ctx.write(out_idx, 0, ow, fn_val(v))

            arena_ops.append(ArenaOp(out_idx, [(x_idx, NOPAD, 0, False)],
                                     [], emit))

        elif name == "ADD":
            a_idx, b_idx = op.inputs
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

            def emit(ctx, opvals, a_idx=a_idx, b_idx=b_idx, out_idx=out_idx,
                     spec=spec, ow=ow, oh=oh):
                ar, ca, wa, ha = ctx.read_base(a_idx)
                br, cb, wb2, hb2 = ctx.read_base(b_idx)
                c = ctx.shapes[a_idx][0]
                va = ar[_ix(L, slice(ca, ca + c), slice(wa, wa + ow),
                            slice(ha, ha + oh))].astype(jnp.int32) \
                    - spec["zp1"]
                vb = br[_ix(L, slice(cb, cb + c), slice(wb2, wb2 + ow),
                            slice(hb2, hb2 + oh))].astype(jnp.int32) \
                    - spec["zp2"]
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
                ctx.write(out_idx, 0, ow,
                          jnp.clip(o + spec["zp_out"], -128, 127))

            arena_ops.append(ArenaOp(
                out_idx, [(a_idx, NOPAD, 0, False),
                          (b_idx, NOPAD, 0, False)], [], emit))

        elif name == "QUANTIZE":
            (x_idx,) = op.inputs
            from yoloface_tpu.kernels.pallas_int8 import (apply_quantize_val,
                                                          quantize_spec)
            spec = quantize_spec(t(x_idx).qparams, out_t.qparams, exact)

            def emit(ctx, opvals, x_idx=x_idx, out_idx=out_idx, spec=spec,
                     ow=ow, oh=oh):
                xr, c0, wb, hb = ctx.read_base(x_idx)
                c = ctx.shapes[x_idx][0]
                v = xr[_ix(L, slice(c0, c0 + c), slice(wb, wb + ow),
                           slice(hb, hb + oh))]
                ctx.write(out_idx, 0, ow, apply_quantize_val(v, spec))

            arena_ops.append(ArenaOp(out_idx, [(x_idx, NOPAD, 0, False)],
                                     [], emit))

        elif name == "LEAKY_RELU":      # standalone (multi-consumer input)
            spec = _leaky_spec(graph, op, exact)
            x_idx = op.inputs[0]

            def emit(ctx, opvals, x_idx=x_idx, out_idx=out_idx, spec=spec,
                     ow=ow, oh=oh):
                xr, c0, wb, hb = ctx.read_base(x_idx)
                c = ctx.shapes[x_idx][0]
                v = xr[_ix(L, slice(c0, c0 + c), slice(wb, wb + ow),
                           slice(hb, hb + oh))]
                ctx.write(out_idx, 0, ow, spec.apply(v))

            arena_ops.append(ArenaOp(out_idx, [(x_idx, NOPAD, 0, False)],
                                     [], emit))

        elif name == "RESIZE_NEAREST_NEIGHBOR":
            x_idx = op.inputs[0]
            # shared guards (replication only without requant, default
            # sampling convention, integer upscale — ADVICE r2 #3)
            fw, fh = pk.resize_factors(t, op)
            ih, iw = t(x_idx).shape[1], t(x_idx).shape[2]

            def emit(ctx, opvals, x_idx=x_idx, out_idx=out_idx, fw=fw,
                     fh=fh, iw=iw, ih=ih):
                xr, c0, wb, hb = ctx.read_base(x_idx)
                c = ctx.shapes[x_idx][0]
                v = xr[_ix(L, slice(c0, c0 + c), slice(wb, wb + iw),
                           slice(hb, hb + ih))]
                wax, hax = (0, 1) if L == "whcn" else (1, 2)
                v = jnp.repeat(v, fw, axis=wax)   # plain-dim replication
                v = jnp.repeat(v, fh, axis=hax)
                ctx.write(out_idx, 0, iw * fw, v)

            arena_ops.append(ArenaOp(out_idx, [(x_idx, NOPAD, 0, False)],
                                     [], emit))

        elif name == "CONCATENATION":
            idxs = list(op.inputs)
            offs = np.cumsum([0] + [t(i).shape[3] for i in idxs]).tolist()

            def emit(ctx, opvals, idxs=idxs, offs=offs, out_idx=out_idx,
                     ow=ow, oh=oh, alias=concat_alias):
                out_views = ctx.views.get(out_idx, [])
                for i, coff in zip(idxs, offs):
                    ci = ctx.shapes[i][0]
                    aliased = (alias.get(i) == (out_idx, coff)
                               and i in ctx.views and ctx.views[i]
                               and out_views
                               and ctx.views[i][0].alloc
                               is out_views[0].alloc)
                    if aliased and out_idx not in ctx.out_refs:
                        continue        # producers already wrote in place
                    xr, c0, wb, hb = ctx.read_base(i)
                    val = xr[_ix(L, slice(c0, c0 + ci), slice(wb, wb + ow),
                                 slice(hb, hb + oh))]
                    if not aliased:
                        for v in out_views:
                            a = v.alloc
                            (pw0, _), (ph0, _) = a.pads
                            ctx.refs[a.id][_ix(
                                L, slice(v.c0 + coff, v.c0 + coff + ci),
                                slice(pw0, pw0 + ow),
                                slice(ph0, ph0 + oh))] = val.astype(a.dtype)
                    if out_idx in ctx.out_refs:
                        ctx.out_refs[out_idx][_ix(
                            L, slice(coff, coff + ci), slice(0, ow),
                            slice(0, oh))] = val.astype(jnp.int8)

            arena_ops.append(ArenaOp(
                out_idx, [(i, NOPAD, 0, False) for i in idxs], [], emit))

        else:
            raise NotImplementedError(f"arena plan: op {name}")

    return arena_ops, concat_alias


# --------------------------------------------------------------------------
# stage partitioning + pallas_call assembly
# --------------------------------------------------------------------------
def _tensor_cwh(graph: GraphDef, i: int) -> Tuple[int, int, int]:
    s = graph.tensor(i).shape
    return (int(s[3]), int(s[2]), int(s[1]))     # (C, W, H)


def build_arena_plan(graph: GraphDef, exact: bool,
                     budget: Optional[int] = None,
                     layout: str = "cwhn",
                     v2: bool = False,
                     ops: Optional[List] = None) -> List[Callable]:
    assert layout in ("cwhn", "whcn"), layout
    if budget is None:
        budget = (min(ARENA_BUDGET, _EXACT_BUDGET_CAP) if exact
                  else ARENA_BUDGET)
    arena_ops, concat_alias = lower_arena_ops(graph, exact, layout, v2=v2,
                                              ops=ops)
    graph_outputs = set(graph.outputs)

    # greedy stage partition on estimated alloc bytes
    def op_bytes(aop: ArenaOp) -> int:
        c, w, h = _tensor_cwh(graph, aop.out_idx)
        return Alloc(0, layout, c, w, h, ((1, 1), (1, 1)), 0).est_bytes

    stages: List[List[ArenaOp]] = []
    cur: List[ArenaOp] = []
    cur_bytes = 0
    for aop in arena_ops:
        b = op_bytes(aop)
        if b > _VMEM_CEILING:
            # a tiny ARENA_BUDGET only forces more stages; this fires when
            # ONE activation plane cannot fit VMEM at any partition
            c, w, h = _tensor_cwh(graph, aop.out_idx)
            raise NotImplementedError(
                f"arena plan: activation plane {c}x{w}x{h} needs ~{b} B of "
                f"VMEM (> {_VMEM_CEILING}); the arena modes target small "
                "embedded-resolution graphs — use mode='fast'/'exact' for "
                "large inputs (e.g. spatially retargeted graphs)")
        if cur and cur_bytes + b > budget:
            stages.append(cur)
            cur, cur_bytes = [], 0
        cur.append(aop)
        cur_bytes += b
    if cur:
        stages.append(cur)

    plan: List[Callable] = []
    for si in range(len(stages)):
        plan.append(_build_stage(graph, stages, si, concat_alias,
                                 graph_outputs, layout))
    return plan


def _build_stage(graph: GraphDef, stages, si, concat_alias, graph_outputs,
                 layout: str):
    L = layout
    stage = stages[si]
    internal = {aop.out_idx for aop in stage}
    ext_inputs: List[int] = []
    for aop in stage:
        for i in aop.in_idxs:
            if i not in internal and i not in ext_inputs:
                ext_inputs.append(i)
    later_needs = set(graph_outputs)
    for sj in range(si + 1, len(stages)):
        for aop in stages[sj]:
            later_needs.update(aop.in_idxs)
    outputs = [aop.out_idx for aop in stage if aop.out_idx in later_needs]

    # ------------------------------------------------------ arena planning
    allocs: List[Alloc] = []
    views: Dict[int, List[View]] = {}

    def new_alloc(tensor: int, pads: Pads, fill: int,
                  strided: bool = False) -> Alloc:
        c, w, h = _tensor_cwh(graph, tensor)
        # strided consumers need 32-bit loads (Mosaic limitation)
        a = Alloc(len(allocs), L, c, w, h, pads, fill,
                  jnp.int32 if strided else jnp.int8)
        allocs.append(a)
        return a

    # (pads, fill) -> strided? views needed by in-stage consumers
    stage_reqs: Dict[int, Dict[Tuple[Pads, int], bool]] = {}
    unpadded_read: Dict[int, bool] = {}
    for aop in stage:
        for tensor, pads, fill, strided in aop.in_reqs:
            if pads == NOPAD and not strided:
                unpadded_read[tensor] = True
            else:
                r = stage_reqs.setdefault(tensor, {})
                r[(pads, fill)] = r.get((pads, fill), False) or strided

    # aliased concat inputs: resolve views from the concat output later.
    # Aliasing needs the concat output to own at least one alloc, i.e. an
    # in-stage reader; otherwise inputs plan normally and the concat copies.
    def is_aliased(tensor: int) -> bool:
        if tensor not in concat_alias or tensor not in internal:
            return False
        cout, _ = concat_alias[tensor]
        return (cout in internal
                and (unpadded_read.get(cout) or cout in stage_reqs))

    for tensor in list(internal) + ext_inputs:
        if is_aliased(tensor):
            continue
        vlist = views.setdefault(tensor, [])
        for (pads, fill), strided in stage_reqs.get(tensor, {}).items():
            vlist.append(View(new_alloc(tensor, pads, fill, strided)))
        # internally-produced tensors read without pads need SOME alloc
        # (padded interiors serve unpadded reads; ext inputs read in_refs)
        if (tensor in internal and unpadded_read.get(tensor)
                and not vlist):
            vlist.append(View(new_alloc(tensor, NOPAD, 0)))

    # concat input views = channel ranges of the concat output's views
    for tensor, (cout, c0) in concat_alias.items():
        if is_aliased(tensor):
            views[tensor] = [View(v.alloc, v.c0 + c0)
                             for v in views.get(cout, [])]

    # ext inputs with padded views need an in-kernel staging copy
    staging = [tr for tr in ext_inputs if views.get(tr)]

    operand_arrays: List[np.ndarray] = []
    operand_slices: List[Tuple[int, int]] = []
    for aop in stage:
        start = len(operand_arrays)
        operand_arrays.extend(aop.operands)
        operand_slices.append((start, len(operand_arrays)))

    shapes = {i: _tensor_cwh(graph, i)
              for i in list(internal) + ext_inputs}

    n_in, n_op, n_out = len(ext_inputs), len(operand_arrays), len(outputs)

    def kernel(*refs):
        in_refs = dict(zip(ext_inputs, refs[:n_in]))
        op_refs = refs[n_in:n_in + n_op]
        out_refs = dict(zip(outputs,
                            refs[n_in + n_op:n_in + n_op + n_out]))
        arefs = {a.id: r for a, r in
                 zip(allocs, refs[n_in + n_op + n_out:])}
        ctx = _Ctx(L, views, in_refs, out_refs, arefs, shapes)

        # fill constant pad borders once; they persist across grid steps
        @pl.when(pl.program_id(0) == 0)
        def _fill():
            for a in allocs:
                if a.pads == NOPAD:
                    continue
                (pw0, pw1), (ph0, ph1) = a.pads
                r = arefs[a.id]
                nt = r.shape[-1]
                cS = a.c
                wS, hS = a.w + pw0 + pw1, a.h + ph0 + ph1
                f, dt = a.fill, a.dtype

                def fill(cs, ws, hs, shape):
                    r[_ix(L, cs, ws, hs)] = jnp.full(
                        _shape4(L, *shape) + (nt,), f, dt)

                call = slice(0, cS)
                if pw0:
                    fill(call, slice(0, pw0), slice(0, hS), (cS, pw0, hS))
                if pw1:
                    fill(call, slice(wS - pw1, wS), slice(0, hS),
                         (cS, pw1, hS))
                if ph0:
                    fill(call, slice(0, wS), slice(0, ph0), (cS, wS, ph0))
                if ph1:
                    fill(call, slice(0, wS), slice(hS - ph1, hS),
                         (cS, wS, ph1))

        # stage ext inputs into their padded views
        for tensor in staging:
            c, w, h = shapes[tensor]
            val = in_refs[tensor][:]
            for v in views[tensor]:
                a = v.alloc
                (pw0, _), (ph0, _) = a.pads
                arefs[a.id][_ix(L, slice(v.c0, v.c0 + c),
                                slice(pw0, pw0 + w),
                                slice(ph0, ph0 + h))] = val.astype(a.dtype)

        opvals = [r[:] for r in op_refs]
        for aop, (a, b) in zip(stage, operand_slices):
            aop.emit(ctx, opvals[a:b])

    def run(env_outer):
        xs = [env_outer[i] for i in ext_inputs]
        n = xs[0].shape[-1]
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
            pl.BlockSpec(_shape4(L, *shapes[o]) + (nt,),
                         lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM)
            for o in outputs)
        out_shape = tuple(
            jax.ShapeDtypeStruct(_shape4(L, *shapes[o]) + (n,), jnp.int8)
            for o in outputs)
        scratch = [pltpu.VMEM(a.shape + (nt,), a.dtype) for a in allocs]
        res = pl.pallas_call(
            kernel,
            grid=(n // nt,),
            in_specs=in_specs + op_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_interpret_mode(),
        )(*xs, *[jnp.asarray(a) for a in operand_arrays])
        if not isinstance(res, (tuple, list)):
            res = (res,)
        return dict(zip(outputs, res))

    def fn(env, run=run, outputs=outputs):
        env.update(run(env))
        return env[outputs[-1]]

    fn.out_idx = outputs[-1]                     # type: ignore
    fn.stage_outputs = outputs                   # type: ignore
    return fn

"""W-strip-tiled Pallas stages: the framework's kernels at 448-family scale.

The activation-arena lowering (kernels/pallas_arena.py) keeps whole
activation planes VMEM-resident, which caps it at embedded resolutions —
the spatially-retargeted scale family (graph/retarget.py, 64x MACC at
448px) previously had to serve on stock XLA.  This module generalizes the
measured 448 probe (tools/probe448.py: a W-strip stage beats XLA fast by
1.10x on the heaviest block, bit-exactly) into a full serving path:

  * the graph is split into SECTIONS: per-spatial-scale op chains and
    stride-2 transition pairs while planes are too big for the untiled
    arena, then the small-plane suffix runs on the normal arena stages;
  * each section is ONE pallas_call over grid (batch_tiles, NW W-strips).
    Section inputs live in HBM (pre-padded by the wrapper) and are DMA'd
    per strip with halo columns; intermediates live in strip-local VMEM
    refs; outputs leave through strip-aligned blocked out_specs;
  * halos use overlap-save with recompute: a backward pass accumulates
    per-tensor (left, right) W extents; every producer computes its full
    local window, so in-section consumers never need cross-strip reads.
    Per-scale chains keep halos at +-1 column; transition pairs
    (maxpool + strided dw sharing one input) read their own halo'd DMA
    windows;
  * beyond-image halo columns at the edge strips are overwritten with the
    consuming op's pad fill (per FILL-CLASS views: e.g. a maxpool (-128)
    and a zero-point-padded conv reading the same tensor get separate
    refs), so results are bit-identical to the untiled semantics twins;
  * stride-2 reads use plain-dim split-reshape phase selection on int8
    VALUES (probe-validated on hardware) — no 32-bit strided refs, so
    every alloc stays int8;
  * compute follows the arena's WHCN recipe: 1x1 convs and im2col k x k
    convs as per-(w,h) [Co,K]@[K,NT] MXU dots, depthwise as int32 VPU
    taps, pools separable — all inside H-chunked fori loops that bound
    both unrolling and the live int32 accumulator.

Reference roles: the binary kernel library serving the scale variant
(stm32 layers_conv2d.h:192 at yolov3_train_tf.py:31-32 resolutions) with
the static activation plan (network.c:2944-3100) applied per strip.
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
from yoloface_tpu.kernels.pallas_arena import (NT, _input_req,
                                               build_arena_plan)
from yoloface_tpu.kernels import pallas_int8 as pk
from yoloface_tpu.kernels.pallas_int8 import (_interpret_mode,
                                              set_conv_bounds as _set_conv_bounds,
                                              apply_requant_leaky,
                                              exact_add_rescale)

# planes above this (int8 bytes at the NT lane tile) force tiled sections;
# below it the untiled arena handles the suffix
TILE_THRESHOLD = int(os.environ.get("YOLOFACE_TPU_TILE_THRESHOLD",
                                    20 * 1024 * 1024))
# W strips per tiled section: smallest power of two (<= cap) whose VMEM
# estimate fits the target — fewer strips mean less halo recompute
_NW_CAP = int(os.environ.get("YOLOFACE_TPU_TILE_NW", 16))
_VMEM_TARGET = int(os.environ.get("YOLOFACE_TPU_TILE_VMEM", 64 << 20))
# a strided transition pair merges into the section producing its input
# when that section is shallow (halo recompute stays bounded); deeper
# chains keep transitions separate — measured: merging pool8+dw10 into
# the 3-op 224 chain wins, merging pool25+dw27 into the 13-op 112 chain
# would 1.9x the whole chain's recompute
_MERGE_MAX_MAINS = int(os.environ.get("YOLOFACE_TPU_TILE_MERGE", 3))
# live int32 accumulator bytes bound for the H-chunk size
_CHUNK_TARGET = int(os.environ.get("YOLOFACE_TPU_TILE_CHUNK", 16 << 20))
# batch-lane tile for tiled sections.  The arena is pinned at 128 by
# Mosaic's strided-load tiling; the tiled path has NO strided refs
# (stride-2 via value split-reshape), so larger tiles are legal and
# amortize per-grid-step overheads at the cost of 2x VMEM per view.
_TILE_NT = int(os.environ.get("YOLOFACE_TPU_TILE_NT", NT))
# default hybrid routing for tiled plans: section indices (or 'suffix')
# handed to the XLA twin lowering.  Default = the round-3 measured
# per-section winner map projected onto the current 4-section split
# (docs/PROFILE.md attribution: stem 9.9-vs-19.8 XLA, 224-chain+transition
# 10.9-vs-29.7 XLA, pool25+dw27 1.1-vs-4.0 XLA, 56-suffix 5.7-vs-8.8 XLA;
# the deep 112 chain 15.3-vs-18.8 TILED) — projected hybrid ~42.9 ms vs
# 46.4 pure XLA @1024, minus two boundary relayouts.  The armed round-4
# sweep (tools/when_tpu_returns.sh -> profile_tpu.py sweep448) re-measures
# candidates and the winner gets re-baked here; env YOLOFACE_TPU_TILE_XLA
# overrides ('none' = pure tiled).
DEFAULT_TILE_XLA = "0,1,3,suffix"

NOPAD = ((0, 0), (0, 0))


# --------------------------------------------------------------------------
# graph grouping: absorption + tiled/arena split + section cuts
# --------------------------------------------------------------------------
def _absorption(graph: GraphDef):
    """(absorbed op idx -> owner main op idx, tensor use counts) for
    LEAKY-after-conv and single-consumer PAD ops, mirroring
    lower_arena_ops' fusion rules."""
    from collections import Counter
    uses = Counter()
    for op in graph.ops:
        for i in op.inputs:
            if i >= 0:
                uses[i] += 1
    for i in graph.outputs:
        uses[i] += 1
    by_out = {op.outputs[0]: op for op in graph.ops if op.outputs}
    owner: Dict[int, int] = {}
    for op in graph.ops:
        if op.opname == "LEAKY_RELU":
            src = by_out.get(op.inputs[0])
            if (src is not None
                    and src.opname in ("CONV_2D", "DEPTHWISE_CONV_2D")
                    and uses[op.inputs[0]] == 1):
                owner[op.index] = src.index
        elif op.opname == "PAD":
            consumers = [c for c in graph.ops if op.outputs[0] in c.inputs]
            if len(consumers) == 1:
                owner[op.index] = consumers[0].index
    return owner, uses


_TILED_OPS = frozenset((
    "CONV_2D", "DEPTHWISE_CONV_2D", "MAX_POOL_2D", "ADD", "QUANTIZE",
    "RELU", "RELU6", "LOGISTIC", "LEAKY_RELU", "CONCATENATION"))


def _group_lowerable(graph: GraphDef, main) -> bool:
    """Whether _lower_section knows this absorption group's main op.
    Ops outside the tiled surface (e.g. RESIZE_NEAREST in an FPN graph,
    a strided 1x1 conv — the 1x1 lowering is stride-1-only — or a non-3x3
    depthwise) end the tiled prefix at plan time so the suffix (arena, or
    the XLA twin — build_tiled_plan forces the XLA twin when the arena
    can't run the suffix either) handles them, instead of _lower_section
    failing on a graph the other engine modes handle fine."""
    if main.opname not in _TILED_OPS:
        return False
    if main.opname == "CONV_2D":
        wd = graph.tensor(main.inputs[1]).data
        if (wd.shape[1] == wd.shape[2] == 1
                and (main.attrs.get("stride_h", 1) != 1
                     or main.attrs.get("stride_w", 1) != 1)):
            return False
    elif main.opname == "DEPTHWISE_CONV_2D":
        wd = graph.tensor(main.inputs[1]).data
        if not (wd.shape[1] == wd.shape[2] == 3):  # dw taps are 3x3-only
            return False
    return True


def _arena_can_run(graph: GraphDef, ops: List) -> bool:
    """Whether the arena suffix lowering handles every op: the arena
    shares the tiled path's stride-1-only 1x1 and 3x3-only depthwise
    constraints (pallas_arena.py); when it can't, build_tiled_plan
    forces the suffix onto the XLA twin so pure-tiled routing still
    executes any graph the XLA modes handle."""
    for op in ops:
        if op.opname == "CONV_2D":
            wd = graph.tensor(op.inputs[1]).data
            if (wd.shape[1] == wd.shape[2] == 1
                    and (op.attrs.get("stride_h", 1) != 1
                         or op.attrs.get("stride_w", 1) != 1)):
                return False
        elif op.opname == "DEPTHWISE_CONV_2D":
            wd = graph.tensor(op.inputs[1]).data
            if not (wd.shape[1] == wd.shape[2] == 3):
                return False
    return True


def plan_tiled_split(graph: GraphDef):
    """-> (sections: List[List[op]], suffix_ops: List[op]).

    Absorption groups (main op + its PAD/LEAKY) are 'tiled' while any
    touched activation plane exceeds TILE_THRESHOLD at the NT lane tile.
    The prefix ends early at the first op the section lowering does not
    support (_group_lowerable).  Within the tiled prefix, a new section
    starts at a spatial-scale change or at a stride-2 op (transition),
    except that consecutive strided ops sharing one input tensor stay
    together (pool + dw pairs).
    """
    owner, _ = _absorption(graph)
    t = graph.tensor

    def plane(i: int) -> int:
        s = t(i).shape
        return int(s[1]) * int(s[2]) * int(s[3]) * NT

    mains = [op for op in graph.ops if op.index not in owner]
    members: Dict[int, List] = {op.index: [op] for op in mains}
    for op in graph.ops:
        if op.index in owner:
            members[owner[op.index]].append(op)

    def group_tiled(main) -> bool:
        for op in members[main.index]:
            for i in list(op.inputs) + list(op.outputs):
                if (i >= 0 and t(i).data is None
                        and plane(i) > TILE_THRESHOLD):
                    return True
        return False

    # the tiled prefix runs through the LAST big group: small-plane ops in
    # the middle (e.g. C=6 squeeze convs at 112px) stay tiled with their
    # neighbours rather than punching holes in the prefix
    big = [group_tiled(m) for m in mains]
    last_big = max([k for k, b in enumerate(big) if b], default=-1)
    for k, m in enumerate(mains[:last_big + 1]):
        if not _group_lowerable(graph, m):
            last_big = k - 1
            break

    sections: List[List] = []
    suffix: List = []
    cur: List = []
    cur_scale = None
    cur_mains = 0
    cur_outs: set = set()
    prev_strided_x = None
    for k, main in enumerate(mains):
        if k > last_big:
            suffix.extend(sorted(members[main.index],
                                 key=lambda o: o.index))
            continue
        if main.opname in ("CONV_2D", "DEPTHWISE_CONV_2D", "MAX_POOL_2D",
                           "AVERAGE_POOL_2D"):
            x_idx, _, _ = _input_req(graph, main)
        else:
            x_idx = main.inputs[0]
        scale = int(t(x_idx).shape[2])
        strided = main.attrs.get("stride_h", 1) > 1
        if strided:
            # absorb the transition into a SHALLOW producing section (its
            # input stays VMEM-resident: no HBM re-read, no re-widen);
            # consecutive strided ops sharing one input always group
            cut = bool(cur) and not (
                prev_strided_x == x_idx
                or (x_idx in cur_outs and cur_mains <= _MERGE_MAX_MAINS))
        else:
            cut = bool(cur) and scale != cur_scale
        if cut:
            sections.append(cur)
            cur = []
            cur_mains = 0
            cur_outs = set()
        cur.extend(sorted(members[main.index], key=lambda o: o.index))
        cur_mains += 1
        cur_outs.update(o for op in members[main.index]
                        for o in op.outputs)
        if not strided or cur_scale is None:
            cur_scale = scale
        prev_strided_x = x_idx if strided else None
    if cur:
        sections.append(cur)
    if sections and suffix:
        last_tiled = max(op.index for s in sections for op in s)
        first_arena = min(op.index for op in suffix)
        if last_tiled > first_arena:
            raise NotImplementedError(
                "tiled plan: big-plane ops interleave with small-plane "
                "ops; the tiled prefix must be contiguous")
    sections.sort(key=lambda s: s[0].index)
    suffix.sort(key=lambda o: o.index)
    return sections, suffix


# --------------------------------------------------------------------------
# section planning structures
# --------------------------------------------------------------------------
class TView:
    """One VMEM ref of a tensor: fill class + W extents + H pads."""

    def __init__(self, fill: int):
        self.fill = fill
        self.li = 0                     # left halo columns
        self.ri = 0                     # right halo columns (+reshape slack)
        self.ph0 = 0                    # top H pad rows
        self.ph1 = 0                    # bottom H pad rows (+stride slack)

    def wl(self, ws: int) -> int:
        return self.li + ws + self.ri

    def hp(self, h: int) -> int:
        return self.ph0 + h + self.ph1


class TOp:
    """One lowered tiled op: operand arrays + emit(tc, opvals)."""

    def __init__(self, out_idx: int, operands: List, emit: Callable):
        self.out_idx = out_idx
        self.operands = operands
        self.emit = emit


class _TSec:
    """Planned section: ops, tensors' extents/views, strip geometry."""

    def __init__(self, graph: GraphDef, exact: bool, v2: bool):
        self.graph = graph
        self.exact = exact
        self.v2 = v2
        self.tops: List[TOp] = []
        self.inputs: List[int] = []     # external tensors (HBM)
        self.outputs: List[int] = []
        self.ext: Dict[int, Tuple[int, int]] = {}    # tensor -> (Li, Ri)
        self.views: Dict[int, List[TView]] = {}
        self.ws: Dict[int, int] = {}    # tensor -> core strip width
        self.cwh: Dict[int, Tuple[int, int, int]] = {}   # (C, W, H)
        self.cpad: Dict[int, int] = {}  # DMA'd inputs: padded channels
        self.nw = 1
        self.nt = _TILE_NT              # batch lane tile (set per trace)

    def chunk(self, h: int, cw: int, co: int) -> int:
        """Largest divisor of h (<=16) bounding the live int32 chunk."""
        per_row = cw * co * _TILE_NT * 4 * (6 if self.exact else 2)
        cap = max(1, _CHUNK_TARGET // max(per_row, 1))
        best = 1
        for d in range(1, min(h, 16) + 1):
            if h % d == 0 and d <= cap:
                best = d
        return best

    def view_of(self, tensor: int, fill: Optional[int]) -> TView:
        vl = self.views.setdefault(tensor, [])
        if fill is None:                # elementwise: any view will do
            if vl:
                return vl[0]
            fill = 0
        for v in vl:
            if v.fill == fill:
                return v
        v = TView(fill)
        vl.append(v)
        return v


class _TCtx:
    """In-kernel context for one grid step (batch tile i, strip j)."""

    def __init__(self, sec: _TSec, refs, out_refs, j):
        self.sec = sec
        self.refs = refs                # (tensor, view pos) -> ref
        self.out_refs = out_refs
        self.j = j

    def read(self, tensor: int, Lx: int, ph0_c: int, fill: Optional[int]):
        """(ref, woff, hoff) for a consumer needing left extent Lx and top
        H pad ph0_c from the given fill class."""
        sec = self.sec
        vl = sec.views[tensor]
        v = vl[0] if fill is None else next(
            x for x in vl if x.fill == fill)
        woff = v.li - Lx
        hoff = v.ph0 - ph0_c
        assert woff >= 0 and hoff >= 0, (tensor, Lx, ph0_c, v.li, v.ph0)
        return self.refs[(tensor, vl.index(v))], woff, hoff

    def write(self, tensor: int, val, h0, hc: int, c_off: int = 0,
              c_len: Optional[int] = None):
        """Store a computed chunk: ``val`` is [CW, hc, c_len, nt] spanning
        the tensor's full computed window (origin global j*ws - Li) at
        data rows [h0, h0+hc)."""
        sec = self.sec
        Li, _Ri = sec.ext[tensor]
        ws = sec.ws[tensor]
        c = sec.cwh[tensor][0]
        if c_len is None:
            c_len = c
        for pos, v in enumerate(sec.views.get(tensor, [])):
            x0 = Li - v.li
            r = self.refs[(tensor, pos)]
            r[0:v.wl(ws), pl.ds(v.ph0 + h0, hc),
              c_off:c_off + c_len, :] = val[x0:x0 + v.wl(ws)]
        if tensor in self.out_refs:
            self.out_refs[tensor][0:ws, pl.ds(h0, hc),
                                  c_off:c_off + c_len, :] = val[Li:Li + ws]

    def edge_fills(self, tensor: int):
        """Overwrite beyond-image halo columns at the edge strips with
        each view's pad fill (runs after the producer's writes)."""
        sec = self.sec
        ws = sec.ws[tensor]
        nt = sec.nt
        for pos, v in enumerate(sec.views.get(tensor, [])):
            r = self.refs[(tensor, pos)]
            hp, c = r.shape[1], r.shape[2]
            if v.li:
                @pl.when(self.j == 0)
                def _l(r=r, v=v, hp=hp, c=c):
                    r[0:v.li, :, :, :] = jnp.full(
                        (v.li, hp, c, nt), v.fill, jnp.int8)
            if v.ri:
                @pl.when(self.j == sec.nw - 1)
                def _r(r=r, v=v, hp=hp, c=c):
                    r[v.li + ws:v.li + ws + v.ri, :, :, :] = jnp.full(
                        (v.ri, hp, c, nt), v.fill, jnp.int8)

    def h_fills(self, tensor: int, always: bool = False):
        """Constant H pad border rows (j-invariant).  ``always`` for DMA'd
        inputs whose refs are overwritten every grid step."""
        nt = self.sec.nt
        for pos, v in enumerate(self.sec.views.get(tensor, [])):
            if not (v.ph0 or v.ph1):
                continue
            r = self.refs[(tensor, pos)]
            wl, hp, c = r.shape[0], r.shape[1], r.shape[2]

            def _fill(r=r, v=v, wl=wl, hp=hp, c=c):
                if v.ph0:
                    r[:, 0:v.ph0, :, :] = jnp.full(
                        (wl, v.ph0, c, nt), v.fill, jnp.int8)
                if v.ph1:
                    r[:, hp - v.ph1:hp, :, :] = jnp.full(
                        (wl, v.ph1, c, nt), v.fill, jnp.int8)

            if always:
                _fill()
            else:
                pl.when((pl.program_id(0) == 0) & (self.j == 0))(_fill)


# --------------------------------------------------------------------------
# phase selection: strided reads as plain-dim split-reshape on VALUES
# --------------------------------------------------------------------------
def _phase_w(x, dy: int, s: int, cw: int):
    """Select W positions dy, dy+s, ... (cw of them) from the leading
    plain dim (strided VALUE reads do not lower on Mosaic; split-reshape
    of a plain dim does, probe448_micro)."""
    if s == 1:
        return x[dy:dy + cw]
    return x[dy:dy + s * cw].reshape((cw, s) + x.shape[1:])[:, 0]


def _phase_h(x, dx: int, s: int, ch: int):
    """Same selection on the (plain) H axis of [W, H, C, nt]."""
    if s == 1:
        return x[:, dx:dx + ch]
    return x[:, dx:dx + s * ch].reshape(
        (x.shape[0], ch, s) + x.shape[2:])[:, :, 0]


# --------------------------------------------------------------------------
# per-kind emit generators (WHCN [W, H, C, nt]; H-chunked fori loops)
# --------------------------------------------------------------------------
def _pack_p(ch: int, ci: int, co: int) -> int:
    """Largest power-of-2 position-packing factor P dividing the H chunk
    with both packed dims on one MXU pass (P*ci, P*co <= 128).

    Per-position dots cost ~12 ns per 128-lane block nearly independent
    of ci,co (docs/PROFILE.md microbench) — the tiled conv floor is
    POSITION-count-bound.  Packing P consecutive H positions into one
    block-diagonal dot [P*co, P*ci] @ [P*ci, nt] divides the dot count
    by P at similar per-dot cost; bit-exact by construction (the
    off-diagonal weight blocks are zero).  YOLOFACE_TPU_PACK=0 disables;
    the default flips to ON once the hardware A/B lands (tunnel outage
    at edit time — CPU interpret parity is green, Mosaic lowering of the
    pack reshape+concat is still unproven on the chip).
    """
    if os.environ.get("YOLOFACE_TPU_PACK", "0") == "0":
        return 1
    p = 1
    while (2 * p <= 16 and 2 * p * ci <= 128 and 2 * p * co <= 128
           and ch % (2 * p) == 0):
        p *= 2
    return p


def _blockdiag(w: np.ndarray, p: int) -> np.ndarray:
    co, ci = w.shape
    wp = np.zeros((p * co, p * ci), w.dtype)
    for k in range(p):
        wp[k * co:(k + 1) * co, k * ci:(k + 1) * ci] = w
    return wp


def _packed_dots(w_v, xc, cw, ch, ci, co, p, nt):
    """The per-(w,h)-position dot loop, optionally position-packed.
    xc: [cw, ch, >=ci, nt] int8 window; -> list of [co, nt] int32 accs
    in (w, h) scan order."""
    outs = []
    for wp in range(cw):
        if p == 1:
            for hh in range(ch):
                outs.append(lax.dot_general(
                    w_v, xc[wp, hh, 0:ci], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32))
        else:
            xv = xc[wp, :, 0:ci]                     # [ch, ci, nt]
            xg = jnp.concatenate(
                [xv.reshape(ch // p, p, ci, nt)[:, k]
                 for k in range(p)], axis=1)         # [ch/p, p*ci, nt]
            for gi in range(ch // p):
                a = lax.dot_general(
                    w_v, xg[gi], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                for k in range(p):
                    outs.append(a[k * co:(k + 1) * co])
    return outs


def _gen_conv1x1(sec: _TSec, x_idx, out_idx, co, ci, requant, leaky,
                 operands=None):
    Li, Ri = sec.ext[out_idx]
    cw = Li + sec.ws[out_idx] + Ri
    h = sec.cwh[out_idx][2]
    ch = sec.chunk(h, cw, co)
    p = _pack_p(ch, ci, co)
    if p > 1 and operands is not None:
        operands[0] = _blockdiag(operands[0], p)

    def emit(tc, opvals):
        w_v, b_v, *rq = opvals
        xr, woff, hoff = tc.read(x_idx, Li, 0, None)
        nt = tc.sec.nt
        zero = jnp.zeros((), jnp.int32)

        def body(hc_i, _):
            h0 = hc_i * ch
            xc = xr[woff:woff + cw, pl.ds(hoff + h0, ch), 0:ci, :]
            outs = _packed_dots(w_v, xc, cw, ch, ci, co, p, nt)
            acc = (jnp.stack(outs, 0).reshape(cw, ch, co, nt)
                   + b_v.reshape(1, 1, co, 1))
            r = apply_requant_leaky(requant, leaky, acc, rq, ch_axis=2)
            tc.write(out_idx, r, h0, ch)
            return zero

        lax.fori_loop(0, h // ch, body, zero)
        tc.edge_fills(out_idx)

    return emit


def _gen_conv_im2col(sec: _TSec, x_idx, out_idx, co, ci, kh, kw_, stride,
                     pads, fill, requant, leaky, operands=None):
    """K x K conv: PER-CHUNK phase-split im2col values, then MXU dots.
    No scratch ref: the whole-plane im2col round trip was measured as the
    stem's dominant VMEM traffic; per-chunk [cw, ch, K, nt] values stay
    register/VMEM-small (the probe's register-spill failure was a
    whole-H concat).  The input view may be channel-padded for DMA
    alignment; the weight matrix carries zero columns for pad channels
    so their content never contributes (probe448's stem trick)."""
    (pl_w, _), _hp = pads
    ph0_c = pads[1][0]
    Li, Ri = sec.ext[out_idx]
    cw = Li + sec.ws[out_idx] + Ri
    h = sec.cwh[out_idx][2]
    c_eff = sec.cpad.get(x_idx, ci)
    Lx = Li * stride + pl_w
    ch = sec.chunk(h, cw, co)
    rh = stride * ch + kh - 1
    kdepth = kw_ * kh * c_eff
    p = _pack_p(ch, kdepth, co)
    if p > 1 and operands is not None:
        operands[0] = _blockdiag(operands[0], p)

    def emit(tc, opvals):
        w_v, b_v, *rq = opvals
        xr, woff, hoff = tc.read(x_idx, Lx, ph0_c, fill)
        nt = tc.sec.nt
        zero = jnp.zeros((), jnp.int32)

        def body(hc_i, _):
            h0 = hc_i * ch
            # one window read per chunk; W/H phases are value selections
            xw = xr[woff:woff + stride * cw + kw_ - 1,
                    pl.ds(hoff + stride * h0, rh), 0:c_eff, :]
            pieces = []
            for dy in range(kw_):
                wp = _phase_w(xw, dy, stride, cw)
                for dx in range(kh):
                    pieces.append(_phase_h(wp, dx, stride, ch))
            xc = jnp.concatenate(pieces, axis=2)   # [cw, ch, K, nt]
            outs = _packed_dots(w_v, xc, cw, ch, kdepth, co, p, nt)
            acc = (jnp.stack(outs, 0).reshape(cw, ch, co, nt)
                   + b_v.reshape(1, 1, co, 1))
            r = apply_requant_leaky(requant, leaky, acc, rq, ch_axis=2)
            tc.write(out_idx, r, h0, ch)
            return zero

        lax.fori_loop(0, h // ch, body, zero)
        tc.edge_fills(out_idx)

    return emit


def _gen_dw(sec: _TSec, x_idx, out_idx, c, stride, pads, fill,
            requant, leaky):
    (pl_w, _), _hp = pads
    ph0_c = pads[1][0]
    Li, Ri = sec.ext[out_idx]
    cw = Li + sec.ws[out_idx] + Ri
    h = sec.cwh[out_idx][2]
    Lx = Li * stride + pl_w
    ch = sec.chunk(h, cw, c)
    rw = stride * cw + 2

    def emit(tc, opvals):
        w_v, b_v, *rq = opvals
        xr, woff, hoff = tc.read(x_idx, Lx, ph0_c, fill)
        nt = tc.sec.nt
        zero = jnp.zeros((), jnp.int32)

        def body(hc_i, _):
            h0 = hc_i * ch
            xc = xr[woff:woff + rw,
                    pl.ds(hoff + stride * h0, stride * ch + 2),
                    0:c, :].astype(jnp.int32)
            acc = jnp.zeros((cw, ch, c, nt), jnp.int32) + b_v.reshape(
                1, 1, c, 1)
            for dy in range(3):
                wp = _phase_w(xc, dy, stride, cw)
                for dx in range(3):
                    acc = acc + (_phase_h(wp, dx, stride, ch)
                                 * w_v[:, dy * 3 + dx].reshape(1, 1, c, 1))
            r = apply_requant_leaky(requant, leaky, acc, rq, ch_axis=2)
            tc.write(out_idx, r, h0, ch)
            return zero

        lax.fori_loop(0, h // ch, body, zero)
        tc.edge_fills(out_idx)

    return emit


def _gen_maxpool(sec: _TSec, x_idx, out_idx, c, fw, fh, stride, pads,
                 fill):
    (pl_w, _), _hp = pads
    ph0_c = pads[1][0]
    Li, Ri = sec.ext[out_idx]
    cw = Li + sec.ws[out_idx] + Ri
    h = sec.cwh[out_idx][2]
    Lx = Li * stride + pl_w
    ch = sec.chunk(h, cw, c)
    rw = stride * cw + fw - 1

    def emit(tc, opvals):
        # fill comes from _input_req: -128 for the pool's OWN SAME padding
        # (excluded from the max, like the reference kernel's valid-region
        # max) but the PAD output's zero-point when an absorbed explicit
        # PAD feeds the pool — those padded positions are REAL inputs that
        # must participate in the max (pallas_arena honors the same fill)
        xr, woff, hoff = tc.read(x_idx, Lx, ph0_c, fill)
        zero = jnp.zeros((), jnp.int32)

        def body(hc_i, _):
            h0 = hc_i * ch
            xc = xr[woff:woff + rw,
                    pl.ds(hoff + stride * h0, stride * ch + fh - 1),
                    0:c, :].astype(jnp.int32)
            rows = None
            for dy in range(fw):
                p = _phase_w(xc, dy, stride, cw)
                rows = p if rows is None else jnp.maximum(rows, p)
            acc = None
            for dx in range(fh):
                p = _phase_h(rows, dx, stride, ch)
                acc = p if acc is None else jnp.maximum(acc, p)
            tc.write(out_idx, acc.astype(jnp.int8), h0, ch)
            return zero

        lax.fori_loop(0, h // ch, body, zero)
        tc.edge_fills(out_idx)

    return emit


def _gen_eltwise(sec: _TSec, out_idx, in_idxs, fn_val):
    """Shared chunked emitter for ADD / QUANTIZE / LEAKY (k=1, s=1)."""
    Li, Ri = sec.ext[out_idx]
    cw = Li + sec.ws[out_idx] + Ri
    c, _, h = sec.cwh[out_idx]
    ch = sec.chunk(h, cw, c)

    def emit(tc, opvals):
        rds = [tc.read(t, Li, 0, None) for t in in_idxs]
        zero = jnp.zeros((), jnp.int32)

        def body(hc_i, _):
            h0 = hc_i * ch
            vals = [r[woff:woff + cw, pl.ds(hoff + h0, ch), 0:c, :]
                    for (r, woff, hoff) in rds]
            tc.write(out_idx, fn_val(*vals), h0, ch)
            return zero

        lax.fori_loop(0, h // ch, body, zero)
        tc.edge_fills(out_idx)

    return emit


def _gen_concat(sec: _TSec, out_idx, parts):
    """parts: [(tensor, c_off, ci)]: copy each input's window into the
    concat output's channel range."""
    Li, Ri = sec.ext[out_idx]
    cw = Li + sec.ws[out_idx] + Ri
    h = sec.cwh[out_idx][2]
    ch = sec.chunk(h, cw, sec.cwh[out_idx][0])

    def emit(tc, opvals):
        zero = jnp.zeros((), jnp.int32)

        def body(hc_i, _):
            h0 = hc_i * ch
            for tensor, c_off, ci in parts:
                r, woff, hoff = tc.read(tensor, Li, 0, None)
                v = r[woff:woff + cw, pl.ds(hoff + h0, ch), 0:ci, :]
                tc.write(out_idx, v, h0, ch, c_off=c_off, c_len=ci)
            return zero

        lax.fori_loop(0, h // ch, body, zero)
        tc.edge_fills(out_idx)

    return emit


# --------------------------------------------------------------------------
# section lowering
# --------------------------------------------------------------------------
def _lower_section(graph: GraphDef, sec_ops: List, exact: bool, v2: bool,
                   later_needs: set) -> _TSec:
    from yoloface_tpu.runtime.pallas_plan import _leaky_spec, _requant_spec
    from yoloface_tpu.runtime.engine import _check_no_dilation

    sec = _TSec(graph, exact, v2)
    t = graph.tensor
    owner, _uses = _absorption(graph)
    sec_idx = {op.index for op in sec_ops}

    # consumer records drive the backward halo pass and the view planning:
    # (out_idx, x_idx, stride, pl_w, k_w, ph0, ph1, fill_or_None)
    consumers: List[Tuple] = []
    # deferred emit builders: (out_idx, operands, build(sec) -> emit)
    pending: List[Tuple[int, List, Callable]] = []
    im2col_meta: List[Tuple[int, int, int, int, int]] = []

    for op in sec_ops:
        if op.index in owner and owner[op.index] in sec_idx:
            continue                  # absorbed into its main op
        name = op.opname
        out_idx = op.outputs[0]
        leaky_op = next(
            (c for c in sec_ops if c.opname == "LEAKY_RELU"
             and owner.get(c.index) == op.index), None)
        if leaky_op is not None:
            out_idx = leaky_op.outputs[0]
        out_t = t(op.outputs[0])

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
            (pl_w, _), (ph0, ph1) = pads

            if name == "CONV_2D" and wd.shape[1] == wd.shape[2] == 1:
                if stride != 1 or op.attrs.get("stride_w", 1) != 1:
                    # the 1x1 lowering assumes stride 1 on BOTH axes (its
                    # consumer record hardcodes s=1); strided 1x1 convs
                    # are legal in darknet cfgs — fail loudly instead of
                    # lowering silently wrong (ADVICE r3)
                    raise NotImplementedError(
                        f"tiled 1x1 conv with stride "
                        f"({stride},{op.attrs.get('stride_w', 1)}) (op "
                        f"{op.index}); only stride 1 is lowered")
                co, ci = wd.shape[0], wd.shape[3]
                bias_eff = (b.data.astype(np.int64)
                            - zp_in * wd.astype(np.int64).sum((1, 2, 3))
                            ).astype(np.int32).reshape(co, 1)
                _set_conv_bounds(requant,
                    np.abs(wd.astype(np.int64)).sum((1, 2, 3)), bias_eff)
                w_arr = np.ascontiguousarray(
                    wd.reshape(co, ci)).astype(np.int8)
                consumers.append((out_idx, x_idx, 1, 0, 1, 0, 0, None))
                ops_1x1 = [w_arr, bias_eff, *requant.operand_arrays()]
                pending.append((
                    out_idx, ops_1x1,
                    lambda s_, x_idx=x_idx, out_idx=out_idx, co=co, ci=ci,
                    rq=requant, lk=leaky, o=ops_1x1:
                    _gen_conv1x1(s_, x_idx, out_idx, co, ci, rq, lk,
                                 operands=o)))

            elif name == "CONV_2D":
                co, kh, kw_, ci = (wd.shape[0], wd.shape[1], wd.shape[2],
                                   wd.shape[3])
                bias_eff = (b.data.astype(np.int64)
                            - zp_in * wd.astype(np.int64).sum((1, 2, 3))
                            ).astype(np.int32).reshape(co, 1)
                _set_conv_bounds(requant,
                    np.abs(wd.astype(np.int64)).sum((1, 2, 3)), bias_eff)
                im2col_meta.append((x_idx, out_idx, kh, kw_, ci))
                consumers.append((out_idx, x_idx, stride, pl_w, kw_,
                                  ph0, ph1, fill))

                def build_im2col(s_, x_idx=x_idx, out_idx=out_idx, co=co,
                                 ci=ci, kh=kh, kw_=kw_, stride=stride,
                                 pads=pads, fill=fill, rq=requant,
                                 lk=leaky, wd=wd, operands=None):
                    c_eff = s_.cpad.get(x_idx, ci)
                    w2 = np.zeros((co, kw_ * kh * c_eff), np.int8)
                    for dy in range(kw_):
                        for dx in range(kh):
                            k = dy * kh + dx
                            w2[:, c_eff * k:c_eff * k + ci] = wd[:, dx,
                                                                 dy, :]
                    operands[0] = w2     # patch the placeholder
                    return _gen_conv_im2col(
                        s_, x_idx, out_idx, co, ci, kh, kw_, stride, pads,
                        fill, rq, lk, operands=operands)

                ops_list = [None, bias_eff, *requant.operand_arrays()]
                pending.append((
                    out_idx, ops_list,
                    lambda s_, b=build_im2col, o=ops_list: b(s_,
                                                            operands=o)))

            else:                     # depthwise 3x3
                if not (wd.shape[1] == wd.shape[2] == 3):
                    raise NotImplementedError(
                        f"tiled depthwise taps are 3x3-only, got "
                        f"{wd.shape[1]}x{wd.shape[2]} (op {op.index})")
                c = wd.shape[3]
                bias_eff = (b.data.astype(np.int64)
                            - zp_in * wd.astype(np.int64).sum((0, 1, 2))
                            ).astype(np.int32).reshape(c, 1)
                _set_conv_bounds(requant,
                    np.abs(wd.astype(np.int64)).sum((0, 1, 2)), bias_eff)
                w_taps = np.asarray(
                    wd[0].transpose(2, 1, 0), np.int32).reshape(c, 9)
                consumers.append((out_idx, x_idx, stride, pl_w, 3,
                                  ph0, ph1, fill))
                pending.append((
                    out_idx,
                    [w_taps, bias_eff, *requant.operand_arrays()],
                    lambda s_, x_idx=x_idx, out_idx=out_idx, c=c,
                    stride=stride, pads=pads, fill=fill, rq=requant,
                    lk=leaky:
                    _gen_dw(s_, x_idx, out_idx, c, stride, pads, fill,
                            rq, lk)))

        elif name == "MAX_POOL_2D":
            # fill matters only when padding exists: the pool's own SAME
            # padding is excluded from the max (-128, from _input_req) but
            # an absorbed explicit PAD's zero-point cells are REAL inputs
            # (previously hardcoded -128 — silent divergence vs the arena
            # twin and the oracle on PAD->POOL imports); NOPAD keeps the
            # historical -128 so no fill cell is ever above a real value
            x_idx, pads, fill = _input_req(graph, op)
            if pads == NOPAD:
                fill = -128
            fh, fw = op.attrs["filter_h"], op.attrs["filter_w"]
            stride = op.attrs["stride_h"]
            (pl_w, _), (ph0, ph1) = pads
            c = t(x_idx).shape[3]
            consumers.append((out_idx, x_idx, stride, pl_w, fw,
                              ph0, ph1, fill))
            pending.append((
                out_idx, [],
                lambda s_, x_idx=x_idx, out_idx=out_idx, c=c, fw=fw,
                fh=fh, stride=stride, pads=pads, fill=fill:
                _gen_maxpool(s_, x_idx, out_idx, c, fw, fh, stride,
                             pads, fill)))

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
                spec["qm1"], spec["sh1"] = quantize_multiplier(
                    s1 / twice_max)
                spec["qm2"], spec["sh2"] = quantize_multiplier(
                    s2 / twice_max)
                spec["qmo"], spec["sho"] = quantize_multiplier(
                    twice_max / ((1 << 20) * so))
            else:
                spec["s1"] = np.float32(s1 / so)
                spec["s2"] = np.float32(s2 / so)

            def add_val(va, vb, spec=spec):
                va = va.astype(jnp.int32) - spec["zp1"]
                vb = vb.astype(jnp.int32) - spec["zp2"]
                if spec["exact"]:
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

            consumers.append((out_idx, a_idx, 1, 0, 1, 0, 0, None))
            consumers.append((out_idx, b_idx, 1, 0, 1, 0, 0, None))
            pending.append((
                out_idx, [],
                lambda s_, out_idx=out_idx, a_idx=a_idx, b_idx=b_idx,
                fv=add_val:
                _gen_eltwise(s_, out_idx, [a_idx, b_idx], fv)))

        elif name == "QUANTIZE":
            (x_idx,) = op.inputs
            from yoloface_tpu.kernels.pallas_int8 import (apply_quantize_val,
                                                          quantize_spec)
            spec = quantize_spec(t(x_idx).qparams, out_t.qparams, exact)

            def q_val(v, spec=spec):
                return apply_quantize_val(v, spec)

            consumers.append((out_idx, x_idx, 1, 0, 1, 0, 0, None))
            pending.append((
                out_idx, [],
                lambda s_, out_idx=out_idx, x_idx=x_idx, fv=q_val:
                _gen_eltwise(s_, out_idx, [x_idx], fv)))

        elif name in ("RELU", "RELU6", "LOGISTIC"):
            # shared activation math (pk.activation_int32); the tiled
            # refs are raw int8, so the int32 result stores back as int8
            (x_idx,) = op.inputs
            act = pk.activation_int32(name, t(x_idx).qparams)

            def fn_val(v, act=act):
                return act(v).astype(jnp.int8)

            consumers.append((out_idx, x_idx, 1, 0, 1, 0, 0, None))
            pending.append((
                out_idx, [],
                lambda s_, out_idx=out_idx, x_idx=x_idx, fv=fn_val:
                _gen_eltwise(s_, out_idx, [x_idx], fv)))

        elif name == "LEAKY_RELU":    # standalone (multi-consumer input)
            spec = _leaky_spec(graph, op, exact)
            x_idx = op.inputs[0]
            consumers.append((out_idx, x_idx, 1, 0, 1, 0, 0, None))
            pending.append((
                out_idx, [],
                lambda s_, out_idx=out_idx, x_idx=x_idx, sp=spec:
                _gen_eltwise(s_, out_idx, [x_idx],
                             lambda v, sp=sp: sp.apply(v))))

        elif name == "CONCATENATION":
            idxs = list(op.inputs)
            offs = np.cumsum([0] + [t(i).shape[3] for i in idxs]).tolist()
            for i in idxs:
                consumers.append((out_idx, i, 1, 0, 1, 0, 0, None))
            pending.append((
                out_idx, [],
                lambda s_, out_idx=out_idx, idxs=idxs, offs=offs:
                _gen_concat(s_, out_idx,
                            [(i, c0, s_.cwh[i][0])
                             for i, c0 in zip(idxs, offs)])))
        else:
            raise NotImplementedError(f"tiled plan: op {name}")

    # -------------------------------------------------------- W extents
    produced = [p[0] for p in pending]
    all_tensors = list(dict.fromkeys(
        produced + [c[1] for c in consumers]))
    sec.inputs = [i for i in all_tensors if i not in produced]
    sec.outputs = [i for i in produced if i in later_needs]

    for i in all_tensors:
        s = t(i).shape
        sec.cwh[i] = (int(s[3]), int(s[2]), int(s[1]))
        sec.ext[i] = (0, 0)

    # W width mismatch: the extent formulas below assume W_in == s * W_out
    # (true for the production SAME pools/convs).  An absorbed explicit
    # PAD breaks it (e.g. 12 -pad-> 14 -pool s2-> 7: s*W_out - W_in = 2);
    # the emit's read window is anchored at s*W_out per strip, so the
    # right halo must grow by the mismatch — and strips beyond the first
    # would drift by j*mis/nw, so such plans are pinned to NW=1.  (The H
    # axis needs no term: ph1 + (s-1) == mis_h + fh - 1 - ph0 whenever
    # the recorded pads exactly cover the op's input, an identity.)
    def _mis(out_idx: int, x_idx: int, s: int) -> int:
        return s * sec.cwh[out_idx][1] - sec.cwh[x_idx][1]

    mis_any = False
    for (out_idx, x_idx, s, pl_w, k_w, _ph0, _ph1, _f) in reversed(
            consumers):
        Lo, Ro = sec.ext[out_idx]
        li, ri = sec.ext[x_idx]
        mis = _mis(out_idx, x_idx, s)
        mis_any |= bool(mis)
        sec.ext[x_idx] = (max(li, Lo * s + pl_w),
                          max(ri, max(0, Ro * s + k_w - 1 - pl_w + mis)))

    # views: per fill class; extents/H pads maxed within the class
    for (out_idx, x_idx, s, pl_w, k_w, ph0, ph1, fill) in consumers:
        Lo, Ro = sec.ext[out_idx]
        v = sec.view_of(x_idx, fill)
        v.li = max(v.li, Lo * s + pl_w)
        v.ri = max(v.ri, max(0, Ro * s + k_w - 1 - pl_w
                             + _mis(out_idx, x_idx, s)))
        v.ph0 = max(v.ph0, ph0)
        v.ph1 = max(v.ph1, ph1 + (s - 1))
    for i in sec.outputs:
        sec.views.setdefault(i, [])

    # DMA'd inputs: pad channels for copy alignment.  Mosaic requires HBM
    # slice extents on the sublane dim aligned to the (8,128) tiling; a
    # whole-extent slice of a <=4-channel array also lowers (the probe's
    # RGB+pad stem input)
    for i in sec.inputs:
        c = sec.cwh[i][0]
        sec.cpad[i] = 4 if c <= 4 else -(-c // 8) * 8

    # strip geometry: SMALLEST power-of-two NW whose VMEM estimate fits
    # the target (fewer strips -> less halo recompute and fewer DMAs),
    # subject to divisibility and halo <= strip width (edge fills only
    # run on the extreme strips)
    ws_all = [sec.cwh[i][1] for i in all_tensors]

    def fits(nw: int) -> bool:
        if not all(w % nw == 0 for w in ws_all):
            return False
        for i in all_tensors:
            li, ri = sec.ext[i]
            if li > sec.cwh[i][1] // nw or ri > sec.cwh[i][1] // nw:
                return False
        tot = 0
        for tensor, vl in sec.views.items():
            c, w, h = sec.cwh[tensor]
            c = sec.cpad.get(tensor, c)
            for v in vl:
                tot += v.wl(w // nw) * v.hp(h) * c * _TILE_NT
        for (x_idx, out_idx, kh, kw_, ci) in im2col_meta:
            # per-chunk im2col VALUE (no scratch plane since the
            # per-chunk rewrite); bounded by the chunk cap of 16 rows
            Li, Ri = sec.ext[out_idx]
            _, w, _h = sec.cwh[out_idx]
            c_eff = sec.cpad.get(x_idx, ci)
            tot += (Li + w // nw + Ri) * 16 * kh * kw_ * c_eff * _TILE_NT
        # pallas_call OUTPUT windows: Mosaic allocates each grid-blocked
        # output window in VMEM with 2 buffering levels — measured on real
        # v5e: section 1 of the 448 plan (5 outputs) compiled at NW=8 under
        # the view-only estimate but the AOT compiler reported 137.66M of
        # 128M scoped vmem, ~70M of it `output window allocation ...
        # "This allocation has 2 buffering levels"` (tpu_smoke pure-tiled
        # HTTP-500 root cause).  Counting them here pushes such sections
        # to a finer NW instead of failing the remote compile.
        for o in sec.outputs:
            c, w, h = sec.cwh[o]
            tot += 2 * (w // nw) * h * c * _TILE_NT
        return tot + _CHUNK_TARGET // 2 <= _VMEM_TARGET

    nw_cap = 1 if mis_any else _NW_CAP   # width mismatch pins NW=1 (above)
    nw = None
    cand = 1
    while cand <= nw_cap:
        if fits(cand):
            nw = cand
            break
        cand *= 2
    if nw is None:                     # nothing fits: old largest-NW rule
        nw = 1
        cand = nw_cap
        while cand > 1:
            if all(w % cand == 0 and w // cand >= 7 for w in ws_all):
                nw = cand
                break
            cand //= 2
    sec.nw = nw
    for i in all_tensors:
        sec.ws[i] = sec.cwh[i][1] // nw
        li, ri = sec.ext[i]
        if li > sec.ws[i] or ri > sec.ws[i]:
            raise NotImplementedError(
                f"tiled plan: tensor {i} halo ({li},{ri}) exceeds its "
                f"strip width {sec.ws[i]} (NW={nw})")

    # finalize emits now that extents are known
    for out_idx, operands, build in pending:
        sec.tops.append(TOp(out_idx, operands, build(sec)))
    return sec


# --------------------------------------------------------------------------
# section assembly: one pallas_call per section
# --------------------------------------------------------------------------
def _build_tiled_section(graph: GraphDef, sec: _TSec) -> Callable:
    nw = sec.nw

    operand_arrays: List[np.ndarray] = []
    operand_slices: List[Tuple[int, int]] = []
    for top in sec.tops:
        start = len(operand_arrays)
        operand_arrays.extend(top.operands)
        operand_slices.append((start, len(operand_arrays)))
    assert all(a is not None for a in operand_arrays)

    view_slots: List[Tuple[int, int]] = []
    for tensor in sec.views:
        for pos in range(len(sec.views[tensor])):
            view_slots.append((tensor, pos))
    n_in = len(sec.inputs)
    n_ops = len(operand_arrays)
    n_out = len(sec.outputs)
    n_views = len(view_slots)
    n_dma = sum(len(sec.views[i]) for i in sec.inputs)

    # wrapper pad amounts per input: W union extents; H view maxima
    in_pad: Dict[int, Tuple[int, int, int, int, int]] = {}
    for i in sec.inputs:
        Li, Ri = sec.ext[i]
        vl = sec.views.get(i, [])
        ph0 = max([v.ph0 for v in vl] or [0])
        ph1 = max([v.ph1 for v in vl] or [0])
        in_pad[i] = (Li, Ri, ph0, ph1, sec.cpad[i] - sec.cwh[i][0])

    def kernel(*refs):
        hbm = dict(zip(sec.inputs, refs[:n_in]))
        op_refs = refs[n_in:n_in + n_ops]
        out_refs = dict(zip(sec.outputs,
                            refs[n_in + n_ops:n_in + n_ops + n_out]))
        base = n_in + n_ops + n_out
        vrefs: Dict[Tuple, object] = {}
        for k_i, key in enumerate(view_slots):
            vrefs[key] = refs[base + k_i]
        sems = refs[base + n_views]

        i = pl.program_id(0)
        j = pl.program_id(1)
        nt = sec.nt
        tc = _TCtx(sec, vrefs, out_refs, j)

        # DMA each input view's strip window, then restore its fills
        s_i = 0
        copies = []
        for tensor in sec.inputs:
            Li, _Ri, ph0M, _ph1M, _cp = in_pad[tensor]
            ws = sec.ws[tensor]
            h = sec.cwh[tensor][2]
            for pos, v in enumerate(sec.views[tensor]):
                dst = vrefs[(tensor, pos)]
                src = hbm[tensor].at[
                    pl.ds(j * ws + (Li - v.li), v.wl(ws)),
                    pl.ds(ph0M - v.ph0, v.hp(h)),
                    slice(None), pl.ds(i * nt, nt)]
                if _interpret_mode():
                    dst[...] = src[...]
                else:
                    cp = pltpu.make_async_copy(src, dst, sems.at[s_i])
                    cp.start()
                    copies.append(cp)
                s_i += 1
        for cp in copies:
            cp.wait()
        for tensor in sec.inputs:
            tc.h_fills(tensor, always=True)
            tc.edge_fills(tensor)

        # constant H borders of internal views persist across the grid
        for tensor in sec.views:
            if tensor not in sec.inputs:
                tc.h_fills(tensor)

        opvals = [r[:] for r in op_refs]
        for top, (a, b) in zip(sec.tops, operand_slices):
            top.emit(tc, opvals[a:b])

    def run(env_outer):
        xs = []
        for tensor in sec.inputs:
            x = env_outer[tensor]     # WHCN [W, H, C, N]
            Li, Ri, ph0M, ph1M, cpd = in_pad[tensor]
            if Li or Ri or ph0M or ph1M or cpd:
                x = jnp.pad(x, ((Li, Ri), (ph0M, ph1M), (0, cpd), (0, 0)))
            xs.append(x)
        n = xs[0].shape[-1]
        nt = (_TILE_NT if n % _TILE_NT == 0
              else (NT if n % NT == 0 else n))
        sec.nt = nt                   # read at trace time by the emits
        in_specs = [pl.BlockSpec(memory_space=pltpu.ANY) for _ in xs]
        op_specs = [
            pl.BlockSpec(a.shape,
                         (lambda i, j, nd=len(a.shape):
                          tuple(0 for _ in range(nd))),
                         memory_space=pltpu.VMEM)
            for a in operand_arrays]
        out_specs = tuple(
            pl.BlockSpec((sec.ws[o], sec.cwh[o][2], sec.cwh[o][0], nt),
                         lambda i, j: (j, 0, 0, i),
                         memory_space=pltpu.VMEM)
            for o in sec.outputs)
        out_shape = tuple(
            jax.ShapeDtypeStruct(
                (sec.cwh[o][1], sec.cwh[o][2], sec.cwh[o][0], n),
                jnp.int8)
            for o in sec.outputs)
        scratch = []
        for tensor, pos in view_slots:
            v = sec.views[tensor][pos]
            c = (sec.cpad[tensor] if tensor in sec.inputs
                 else sec.cwh[tensor][0])
            scratch.append(pltpu.VMEM(
                (v.wl(sec.ws[tensor]), v.hp(sec.cwh[tensor][2]), c, nt),
                jnp.int8))
        scratch.append(pltpu.SemaphoreType.DMA((max(n_dma, 1),)))
        res = pl.pallas_call(
            kernel,
            grid=(n // nt, nw),
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
        return dict(zip(sec.outputs, res))

    def fn(env, run=run, outputs=tuple(sec.outputs)):
        env.update(run(env))
        return env[outputs[-1]]

    fn.out_idx = sec.outputs[-1]                 # type: ignore
    fn.stage_outputs = list(sec.outputs)         # type: ignore
    return fn


# --------------------------------------------------------------------------
# full plan: tiled sections + arena suffix (+ optional XLA hybrid)
# --------------------------------------------------------------------------
def _build_xla_section(graph: GraphDef, sec_ops: List, exact: bool,
                      v2: bool, later_needs: set) -> Callable:
    """Run one section on the engine's XLA twin lowering (hybrid mode,
    env YOLOFACE_TPU_TILE_XLA).

    WHCN-NATIVE: the twin is built with ``xla_layout="whcn"`` so its fns
    consume/produce the plan's [W,H,C,N] env tensors directly — zero
    boundary relayouts.  This matters twice at 448 scale: (a) the
    WHCN<->NHWC transposes of >200 MB activations dominated the hybrid's
    cost, and (b) an int8 conv consuming a fused transpose-from-batch-minor
    is miscompiled on real v5e hardware (XLA-level divergence, CPU
    interpret exact — measured in tools/debug448_fix*.py; WHCN-native
    convs/depthwise/pools are bit-exact on the same chip).  Bit-identical
    to the NHWC twin by construction: the integer conv math and the
    elementwise requantization are layout-invariant.

    Env YOLOFACE_TPU_XSEC_NHWC=1 restores the transpose-wrapped NHWC twin
    (A/B debugging of exactly that hardware divergence)."""
    from yoloface_tpu.runtime.engine import Int8Engine

    mode = "exact" if exact else ("fast2" if v2 else "fast")
    nhwc = os.environ.get("YOLOFACE_TPU_XSEC_NHWC") == "1"
    eng = Int8Engine(graph, mode=mode,
                     xla_layout="nhwc" if nhwc else "whcn")
    by_out = {fn.out_idx: fn for fn in eng._plan}
    sec_idx = {op.index for op in sec_ops}
    owner, _ = _absorption(graph)
    fns = []
    for op in sec_ops:
        if op.index in owner and owner[op.index] in sec_idx \
                and op.outputs[0] in by_out and mode != "fast2":
            # fast/exact plans keep absorbed LEAKY/PAD as their own fns
            fns.append(by_out[op.outputs[0]])
            continue
        fn = by_out.get(op.outputs[0])
        if fn is not None and fn not in fns:
            fns.append(fn)
    produced = [o for op in sec_ops for o in op.outputs]
    outputs = [i for i in dict.fromkeys(produced) if i in later_needs]

    if nhwc:
        inputs = sorted({i for op in sec_ops for i in op.inputs
                         if i >= 0 and graph.tensor(i).data is None
                         and i not in produced})
        perm_in, perm_out = (3, 1, 0, 2), (2, 1, 3, 0)   # WHCN<->NHWC

        def fn(env):
            nenv = {i: jnp.transpose(env[i], perm_in) for i in inputs}
            for f in fns:
                nenv[f.out_idx] = f(nenv)
            for o in outputs:
                env[o] = jnp.transpose(nenv[o], perm_out)
            return env[outputs[-1]]
    else:
        def fn(env):
            for f in fns:
                env[f.out_idx] = f(env)
            return env[outputs[-1]]

    fn.out_idx = outputs[-1]                     # type: ignore
    fn.stage_outputs = list(outputs)             # type: ignore
    return fn


def build_tiled_plan(graph: GraphDef, exact: bool,
                     v2: bool = False) -> List[Callable]:
    sections, suffix = plan_tiled_split(graph)
    if not sections:                  # small graph: plain arena
        return build_arena_plan(graph, exact, layout="whcn", v2=v2)

    # hybrid routing: comma list of section indices (or 'suffix') to run
    # on the XLA twin lowering instead of the tiled kernels.  The default
    # is the measured per-section winner map (DEFAULT_TILE_XLA below);
    # env YOLOFACE_TPU_TILE_XLA overrides for sweeps ('' = pure tiled,
    # 'none' = explicit pure tiled).
    raw = os.environ.get("YOLOFACE_TPU_TILE_XLA")
    if raw is None:
        raw = DEFAULT_TILE_XLA
    elif raw == "none":
        raw = ""
    xla_secs = set(raw.split(","))
    if suffix and "suffix" not in xla_secs \
            and not _arena_can_run(graph, suffix):
        # the arena can't run this suffix either (strided 1x1 / non-3x3
        # depthwise cut out of the prefix): force the XLA twin so the
        # graph still executes under pure-tiled routing
        xla_secs.add("suffix")

    plan: List[Callable] = []
    all_groups = sections + ([suffix] if suffix else [])
    for si, sec_ops in enumerate(sections):
        later = set(graph.outputs)
        for grp in all_groups[si + 1:]:
            for op in grp:
                later.update(i for i in op.inputs if i >= 0)
        if str(si) in xla_secs:
            plan.append(_build_xla_section(graph, sec_ops, exact, v2,
                                           later))
        else:
            sec = _lower_section(graph, sec_ops, exact, v2, later)
            plan.append(_build_tiled_section(graph, sec))
    if suffix:
        if "suffix" in xla_secs:
            later = set(graph.outputs)
            plan.append(_build_xla_section(graph, suffix, exact, v2,
                                           later))
        else:
            plan.extend(build_arena_plan(graph, exact, layout="whcn",
                                         v2=v2, ops=suffix))
    return plan

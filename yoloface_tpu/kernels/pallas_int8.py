"""Pallas TPU kernels for the int8 inference hot path.

The TPU-native replacement for the reference's binary kernel library
(``NetworkRuntime700_CM7_Keil.lib``: ``forward_conv2d_integer_SSSA_ch``,
``forward_mp_integer_INT8`` …, headers in
``stm32/Middlewares/ST/AI/Inc/layers_*.h``).

Layout: activations live as ``[C, dim1, dim2, N]`` int8 — channels and
dim1 are plain dims, dim2 rides in sublanes, batch N in lanes.  The engine
feeds ``[C, W, H, N]`` (H in sublanes: H pads only to multiples of 8,
avoiding the 4.5x sublane waste 7-wide dims would pay) and passes spatially
transposed weights/pads, so the kernels themselves are written dimension-
symmetrically.  Tiny channel counts (3..48) never pad to 128-wide registers
the way NHWC convolutions do in XLA (the 1x1 conv kernel measured 4.7x
faster than XLA's ``lax.conv`` at batch 8192).  The grid tiles the batch;
each program processes ``NT`` frames with all weights resident in VMEM.

Requantization inside kernels supports both engine semantics:
  * fast: int32 accum -> float32 scale -> round-half-even -> clamp
    (bit-identical to ops/int8_fast.py); and
  * exact: gemmlowp fixed-point via core/fixedpoint.py (pure int32/uint32
    lane ops, bit-identical to ops/int8_ref.py and the TFLite reference
    kernels).

Conv kernels optionally fuse the following LEAKY_RELU op (single-consumer
fusion decided by the engine), saving one full HBM round-trip per conv —
the same fusion X-CUBE-AI bakes in via its per-conv int8 LUTs
(``network.c:2900-2921``).

Per-channel requant params ride as [C, 1] VMEM operands (Pallas forbids
captured array constants); scalar leaky params are baked into the kernel
closure.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yoloface_tpu.core.fixedpoint import (
    BOUNDED_MAX_ABS, derive_requant_rsm,
    multiply_by_quantized_multiplier,
    multiply_by_quantized_multiplier_bounded, quantize_multiplier)

DEFAULT_NT = 128  # frames per grid step (lane dim)


def _interpret_mode() -> bool:
    """Pallas kernels interpret on CPU (hermetic tests); compile on TPU."""
    return jax.default_backend() == "cpu"


def _pick_nt(n: int, nt: Optional[int]) -> int:
    """Batch tile: DEFAULT_NT when divisible, else the largest power-of-two
    divisor (small batches run as one grid step)."""
    if nt is not None:
        return nt
    if n % DEFAULT_NT == 0:
        return DEFAULT_NT
    for cand in (64, 32, 16, 8, 4, 2, 1):
        if n % cand == 0:
            return cand
    return 1



# --------------------------------------------------------------------------
# host-side op param containers
# --------------------------------------------------------------------------
class RequantSpec:
    """Per-channel requantization constants in both semantics.

    Device operands: fast -> (scale[C,1] f32, zeros[C,1] i32 placeholder);
    exact -> (qm[C,1] i32, shift[C,1] i32).  A fixed operand arity keeps the
    kernel signatures uniform.
    """

    def __init__(self, *, zp_out: int, scale: np.ndarray,
                 qm: Optional[np.ndarray] = None,
                 shift: Optional[np.ndarray] = None, exact: bool = False):
        self.zp_out = int(zp_out)
        self.exact = exact
        # fast-bits-v2 single-rounding fused epilogue (see
        # apply_requant_leaky); selected by the *2 engine modes, or forced
        # globally for A/B probes via YOLOFACE_TPU_EPILOGUE_V2=1
        self.v2 = os.environ.get("YOLOFACE_TPU_EPILOGUE_V2") == "1"
        # static |accumulator| bound (set by lowerings that know the
        # weights); enables the 2-multiply f32-assisted exact MBQM
        self.bound: Optional[int] = None
        # plan-time-derived pure-int32 reduced requant form (set by
        # derive_rsm when the lowering knows per-channel bounds):
        # (k1, k2, m1, m2, c_pos, c_neg, A_pos, A_neg) — see
        # core.fixedpoint.derive_requant_rsm
        self.rsm = None
        c = np.asarray(scale).size
        if exact:
            self.p1 = np.asarray(qm, np.int32).reshape(c, 1)
            self.p2 = np.asarray(shift, np.int32).reshape(c, 1)
        else:
            self.p1 = np.asarray(scale, np.float32).reshape(c, 1)
            self.p2 = np.zeros((c, 1), np.int32)

    def derive_rsm(self, abs_w_sum, bias_eff) -> None:
        """Derive the reduced pure-int32 requant form from the per-channel
        static accumulator bounds ``128*sum|w_c| + |bias_eff_c|``.  No-op
        for fast bits or when the derivation fails (bounded-MBQM fallback);
        disable globally with YOLOFACE_TPU_RSM=0 for A/B probes."""
        if not self.exact or os.environ.get("YOLOFACE_TPU_RSM") == "0":
            return
        bounds = (128 * np.abs(np.asarray(abs_w_sum, np.int64)).ravel()
                  + np.abs(np.asarray(bias_eff, np.int64)).ravel())
        c = self.p1.shape[0]
        if bounds.size != c:                 # per-tensor quant: broadcast
            bounds = np.full(c, int(bounds.max()), np.int64)
        self.rsm = derive_requant_rsm(self.p1.ravel(), self.p2.ravel(),
                                      bounds, 127 - self.zp_out,
                                      128 + self.zp_out)

    def operands(self):
        return jnp.asarray(self.p1), jnp.asarray(self.p2)

    def operand_arrays(self):
        """Device operand list for the in-kernel epilogue: the rsm constant
        set when derived, else the classic (p1, p2) pair.  Lowerings splat
        this into their operand lists; apply_in_kernel/apply_requant_leaky
        take the loaded values back as ``rq``."""
        if self.rsm is not None:
            c = self.p1.shape[0]
            return [jnp.asarray(a.reshape(c, 1)) for a in self.rsm[2:]]
        return [jnp.asarray(self.p1), jnp.asarray(self.p2)]

    def rsm_mag(self, acc_i32, rq, shape):
        """(neg, t1): the reduced-form clamped requant magnitude (pure
        int32; see core.fixedpoint.derive_requant_rsm).  ``clip(±t1 +
        zp_out)`` is a no-op by construction — t1 is already clamped at the
        branch saturation magnitude."""
        k1, k2 = self.rsm[0], self.rsm[1]
        m1, m2, c_p, c_n, a_p, a_n = (r.reshape(shape) for r in rq)
        neg = acc_i32 < 0
        a = jnp.where(neg, -acc_i32, acc_i32)
        a = jnp.minimum(a, jnp.where(neg, a_n, a_p))
        x = a * m2 + ((a * m1) >> k1) + jnp.where(neg, c_n, c_p)
        return neg, x >> k2

    def apply_in_kernel(self, acc_i32, rq, ch_axis: int = 0):
        """acc 4D with channels on ``ch_axis``; ``rq`` is the loaded
        operand_arrays() value list ([C,1] each)."""
        c = acc_i32.shape[ch_axis]
        shape = tuple(c if a == ch_axis else 1 for a in range(4))
        # NOTE: an all-f32-lane variant (round/clip/+zp in float, one int8
        # convert) is bit-identical but measured ~25% SLOWER end-to-end on
        # v5e — Mosaic lowers the int32 formulation better; keep it.
        if self.exact:
            if self.rsm is not None:
                neg, t1 = self.rsm_mag(acc_i32, rq, shape)
                # t1 is clamped at the saturation magnitude: +zp needs no clip
                return (jnp.where(neg, -t1, t1)
                        + self.zp_out).astype(jnp.int8)
            p1, p2 = rq
            mbqm = (multiply_by_quantized_multiplier_bounded
                    if self.bound is not None
                    and self.bound <= BOUNDED_MAX_ABS
                    else multiply_by_quantized_multiplier)
            v = mbqm(acc_i32, p1.reshape(shape), p2.reshape(shape))
        else:
            p1 = rq[0]
            v = jnp.round(acc_i32.astype(jnp.float32)
                          * p1.reshape(shape)).astype(jnp.int32)
        return jnp.clip(v + self.zp_out, -128, 127).astype(jnp.int8)


def apply_requant_sm(v, sm):
    """The derived single-multiply exact requant magnitude form on the
    zero-point-free int32 value ``v`` (see
    ``core.fixedpoint.derive_single_multiply``): ONE int32 multiply, no f32.
    Returns the pre-zero-point int32 value; ONLY valid when the caller
    applies the exact chain's ``clip(out + zp_out, -128, 127)`` afterwards —
    the derivation's exhaustive verification covers that composition."""
    k, m_id, c_id, m_al, c_al = sm
    neg_sel = v < 0
    a = jnp.where(neg_sel, -v, v)
    m = jnp.where(neg_sel, jnp.int32(m_al), jnp.int32(m_id))
    c = jnp.where(neg_sel, jnp.int32(c_al), jnp.int32(c_id))
    t2 = (a * m + c) >> k                         # k is python-static
    return jnp.where(neg_sel, -t2, t2)


class LeakySpec:
    """Scalar LEAKY_RELU constants (safe to close over in kernels).

    Exact bits: when the plan-time single-multiply derivation succeeds
    (``core.fixedpoint.derive_single_multiply`` — exhaustively verified over
    the full 256-value input domain, which it always does for this graph's
    17 leaky ops), ``sm = (k, m_id, c_id, m_al, c_al)`` replaces the
    2-multiply bounded MBQM with ONE int32 multiply + shift: ~9 VPU ops and
    no f32 round trip, bit-identical by construction."""

    def __init__(self, *, zp_in: int, zp_out: int, s_id: float, s_al: float,
                 qm_id=None, sh_id=None, qm_al=None, sh_al=None,
                 exact: bool = False, sm=None):
        self.zp_in, self.zp_out = int(zp_in), int(zp_out)
        self.s_id, self.s_al = float(s_id), float(s_al)
        self.qm_id, self.sh_id = qm_id, sh_id
        self.qm_al, self.sh_al = qm_al, sh_al
        self.exact = exact
        self.sm = sm

    def apply_exact_i32(self, v):
        """Exact leaky on the zero-point-free int32 value ``v`` (domain
        [-128 - zp_in, 127 - zp_in]); returns int8 output."""
        neg_sel = v < 0
        if self.sm is not None:
            out = apply_requant_sm(v, self.sm)
        else:
            # select (qm, shift) per element FIRST, then ONE fixed-point
            # chain — half the SRDHM cost of computing both branches
            qm = jnp.where(neg_sel, jnp.int32(self.qm_al),
                           jnp.int32(self.qm_id))
            sh = jnp.where(neg_sel, jnp.int32(self.sh_al),
                           jnp.int32(self.sh_id))
            # |v| <= 255 + |zp_in| << BOUNDED_MAX_ABS: always eligible for
            # the 2-multiply bounded MBQM
            out = multiply_by_quantized_multiplier_bounded(v, qm, sh)
        return jnp.clip(out + self.zp_out, -128, 127).astype(jnp.int8)

    def apply(self, t_i8):
        v = t_i8.astype(jnp.int32) - self.zp_in
        if self.exact:
            return self.apply_exact_i32(v)
        else:
            vf = v.astype(jnp.float32)
            sel = jnp.where(v >= 0, np.float32(self.s_id),
                            np.float32(self.s_al))
            out = jnp.round(vf * sel).astype(jnp.int32)
        return jnp.clip(out + self.zp_out, -128, 127).astype(jnp.int8)


def exact_add_rescale(v_i32, qm: int, sh: int, left_shift: int):
    """The exact ADD's input rescale MBQM(v << left_shift, qm, sh): the
    2-multiply pre-shift bounded path when sh <= 0 (always true for the
    TFLite ADD input multipliers s_i/(2*max) <= 0.5), limb fallback
    otherwise.  Bit-exact either way (property-tested)."""
    from yoloface_tpu.core.fixedpoint import (
        multiply_by_quantized_multiplier,
        multiply_by_quantized_multiplier_bounded_preshift)
    if sh <= 0:
        return multiply_by_quantized_multiplier_bounded_preshift(
            v_i32, jnp.int32(qm), jnp.int32(sh), left_shift)
    return multiply_by_quantized_multiplier(
        v_i32 << left_shift, jnp.int32(qm), jnp.int32(sh))


def acc_bound(abs_w_sum: np.ndarray, bias_eff: np.ndarray) -> int:
    """Static per-layer |int32 accumulator| bound for a conv: max over
    output channels of 128 * sum(|w_c|) + |bias_eff_c|.  Gates the
    2-multiply f32-assisted exact MBQM (fixedpoint.BOUNDED_MAX_ABS)."""
    return int((128 * np.asarray(abs_w_sum, np.int64).ravel()
                + np.abs(np.asarray(bias_eff, np.int64)).ravel()).max())


def quantize_spec(in_q, out_q, exact: bool) -> dict:
    """Plan-time spec of a TFLite QUANTIZE (requantize) op, shared by the
    arena and tiled lowerings (one source of truth for the sm-vs-bounded
    dispatch).  256-value input domain: the single-multiply derivation
    applies exactly like the leaky epilogue's (same deriver, one branch).
    Ref semantics: tensorflow/lite reference_ops Requantize."""
    ratio = np.float64(in_q.scale) / np.float64(out_q.scale)
    spec = {"exact": exact, "zp_in": in_q.zero_point,
            "zp_out": out_q.zero_point, "sm": None}
    if exact:
        from yoloface_tpu.core.fixedpoint import derive_single_multiply
        spec["qm"], spec["sh"] = quantize_multiplier(ratio)
        spec["sm"] = derive_single_multiply(
            spec["qm"], spec["sh"], spec["qm"], spec["sh"],
            in_q.zero_point, out_q.zero_point)
    else:
        spec["scale"] = np.float32(ratio)
    return spec


def apply_quantize_val(x, spec: dict):
    """In-kernel QUANTIZE on an int8 (or pre-widened int32) value."""
    v = x.astype(jnp.int32) - spec["zp_in"]
    if spec["exact"] and spec["sm"] is not None:
        o = apply_requant_sm(v, spec["sm"])
    elif spec["exact"]:
        # |v| <= 255 + |zp_in|: always within the bounded path's contract
        o = multiply_by_quantized_multiplier_bounded(
            v, jnp.int32(spec["qm"]), jnp.int32(spec["sh"]))
    else:
        o = jnp.round(v.astype(jnp.float32)
                      * spec["scale"]).astype(jnp.int32)
    return jnp.clip(o + spec["zp_out"], -128, 127).astype(jnp.int8)


def set_conv_bounds(requant: RequantSpec, abs_w_sum, bias_eff) -> None:
    """Attach the static accumulator bounds to a conv's RequantSpec: the
    scalar bound gates the 2-multiply bounded MBQM fallback, the
    per-channel bounds drive the reduced pure-int32 form derivation."""
    requant.bound = acc_bound(abs_w_sum, bias_eff)
    requant.derive_rsm(abs_w_sum, bias_eff)


def _maybe_leaky(t, leaky: Optional[LeakySpec]):
    return t if leaky is None else leaky.apply(t)


def apply_requant_leaky(requant: RequantSpec, leaky: Optional[LeakySpec],
                        acc_i32, rq, ch_axis: int = 0):
    """Fused conv requant + LEAKY_RELU epilogue, bit-identical to
    ``leaky.apply(requant.apply_in_kernel(...))`` but staying in int32
    between the two stages: the int8 pack / re-widen relayout pair in the
    middle is lossless after the clip (leaky.zp_in == requant.zp_out for a
    fused conv->leaky pair), and those two converts are a measurable share
    of the per-op epilogue cost on the VPU.  ``rq`` is the loaded
    ``requant.operand_arrays()`` value list."""
    if leaky is None:
        return requant.apply_in_kernel(acc_i32, rq, ch_axis)
    assert leaky.zp_in == requant.zp_out, "not a fused conv->leaky pair"
    c = acc_i32.shape[ch_axis]
    shape = tuple(c if a == ch_axis else 1 for a in range(4))
    if getattr(requant, "v2", False) and not requant.exact:
        # fast-bits-v2: ONE rounding across the fused pair (the reference's
        # own epilogue semantics — the int8 LUT applies conv requant and
        # LeakyReLU with a single quantization step, network.c:2900-2921).
        # The conv's saturation is applied as an f32 clamp on the UNROUNDED
        # conv-domain value; the only round is at the final output grid.
        t = acc_i32.astype(jnp.float32) * rq[0].reshape(shape)
        t = jnp.clip(t, np.float32(-128 - requant.zp_out),
                     np.float32(127 - requant.zp_out))
        sel = jnp.where(t >= 0, np.float32(leaky.s_id),
                        np.float32(leaky.s_al))
        out = jnp.round(t * sel).astype(jnp.int32)
        return jnp.clip(out + leaky.zp_out, -128, 127).astype(jnp.int8)
    if requant.exact:
        if requant.rsm is not None:
            # reduced pure-int32 requant magnitude (clamped at saturation
            # by construction — replaces the bounded MBQM + vmag min)
            neg, t1 = requant.rsm_mag(acc_i32, rq, shape)
            if leaky.exact and leaky.sm is not None:
                # sign-from-accumulator single-multiply leaky: t1 routes
                # through the branch's (m, c) directly; derivation made the
                # al branch exact at magnitude 0 (neg acc, zero magnitude)
                k, m_id, c_id, m_al, c_al = leaky.sm
                t2 = (t1 * jnp.where(neg, jnp.int32(m_al), jnp.int32(m_id))
                      + jnp.where(neg, jnp.int32(c_al),
                                  jnp.int32(c_id))) >> k
                out = jnp.where(neg, -t2, t2)
                return jnp.clip(out + leaky.zp_out, -128, 127
                                ).astype(jnp.int8)
            return leaky.apply_exact_i32(jnp.where(neg, -t1, t1))
        p1, p2 = rq
        bounded = (requant.bound is not None
                   and requant.bound <= BOUNDED_MAX_ABS)
        if bounded and leaky.exact and leaky.sm is not None:
            # fully-fused sign-from-accumulator chain: the conv requant's
            # (neg, magnitude) feeds the leaky single-multiply form
            # directly — skips the MBQM's final negate-select, the
            # leaky-side re-abs, and the signed clip.  neg == (acc < 0);
            # a zero magnitude under neg routes to the al branch, which
            # derive_single_multiply made exact at magnitude 0.  The
            # signed clip to [-128-zp, 127-zp] becomes a one-sided
            # magnitude min against the sign's own bound.
            from yoloface_tpu.core.fixedpoint import \
                multiply_by_quantized_multiplier_bounded_mag
            neg, mag = multiply_by_quantized_multiplier_bounded_mag(
                acc_i32, p1.reshape(shape), p2.reshape(shape))
            vmag = jnp.minimum(mag, jnp.where(
                neg, jnp.int32(128 + requant.zp_out),
                jnp.int32(127 - requant.zp_out)))
            k, m_id, c_id, m_al, c_al = leaky.sm
            t2 = (vmag * jnp.where(neg, jnp.int32(m_al), jnp.int32(m_id))
                  + jnp.where(neg, jnp.int32(c_al), jnp.int32(c_id))) >> k
            out = jnp.where(neg, -t2, t2)
            return jnp.clip(out + leaky.zp_out, -128, 127).astype(jnp.int8)
        mbqm = (multiply_by_quantized_multiplier_bounded if bounded
                else multiply_by_quantized_multiplier)
        v = mbqm(acc_i32, p1.reshape(shape), p2.reshape(shape))
    else:
        v = jnp.round(acc_i32.astype(jnp.float32)
                      * rq[0].reshape(shape)).astype(jnp.int32)
    # int8 store + reload elided: clip bounds v+zp to int8 range, so the
    # subtraction of leaky.zp_in (== zp_out) recovers the same int32 value;
    # clip(v+zp)-zp folds to ONE clip with shifted bounds (bit-identical)
    v = jnp.clip(v, -128 - requant.zp_out, 127 - requant.zp_out)
    if leaky.exact:
        # single-multiply form when derived at plan time, bounded MBQM
        # fallback — both bit-identical to the staged exact chain
        return leaky.apply_exact_i32(v)
    vf = v.astype(jnp.float32)
    # select the scalar factor, then ONE multiply (bit-identical to
    # selecting between the two products; saves a full-tensor multiply)
    sel = jnp.where(v >= 0, np.float32(leaky.s_id),
                    np.float32(leaky.s_al))
    out = jnp.round(vf * sel).astype(jnp.int32)
    return jnp.clip(out + leaky.zp_out, -128, 127).astype(jnp.int8)



def _write_out(o, acc, requant, leaky, rq, ho: int):
    """Requantize + (leaky) + store, strip-wise over H when the exact
    fixed-point path is active: SRDHM expands to ~6 int32 temporaries per
    element, so full-accumulator application can blow the 16 MB scoped-vmem
    budget — strips bound the live set.  Uses the fused epilogue (no int8
    pack/re-widen between requant and leaky) when the pair fuses."""
    fused = leaky is not None and leaky.zp_in == requant.zp_out

    def ep(a):
        if fused:
            return apply_requant_leaky(requant, leaky, a, rq)
        return _maybe_leaky(requant.apply_in_kernel(a, rq), leaky)

    if not requant.exact:
        o[:] = ep(acc)
        return
    strip = max(1, ho // 4)
    for h0 in range(0, ho, strip):
        h1 = min(h0 + strip, ho)
        o[:, h0:h1] = ep(acc[:, h0:h1])


def _param_spec(c):
    return pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)


# --------------------------------------------------------------------------
# 1x1 conv (pointwise): [Ci,H,W,N] @ [Ci,Co] -> [Co,H,W,N]
# --------------------------------------------------------------------------
def conv1x1(x, w_io: np.ndarray, bias_eff: np.ndarray, requant: RequantSpec,
            leaky: Optional[LeakySpec] = None, nt: Optional[int] = None):
    """Pointwise conv + requant (+ fused leaky) on the MXU.  ``bias_eff``
    already folds the input-zero-point correction (engine precomputes)."""
    ci, h, w, n = x.shape
    co = w_io.shape[1]
    nt = _pick_nt(n, nt)

    rq_ops = requant.operand_arrays()

    def kernel(wr, xr, br, *rest):
        *rqr, o = rest
        acc = lax.dot_general(wr[:], xr[:], (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        acc = acc + br[:].reshape(co, 1, 1, 1)
        _write_out(o, acc, requant, leaky, [r[:] for r in rqr], h)

    return pl.pallas_call(
        kernel,
        grid=(n // nt,),
        in_specs=[
            pl.BlockSpec((ci, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ci, h, w, nt), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            _param_spec(co),
        ] + [_param_spec(co)] * len(rq_ops),
        out_specs=pl.BlockSpec((co, h, w, nt), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((co, h, w, n), jnp.int8),
        interpret=_interpret_mode(),
    )(jnp.asarray(w_io), x,
      jnp.asarray(bias_eff, jnp.int32).reshape(co, 1), *rq_ops)



def phase_split(x_padded):
    """XLA-side stride-2 phase decomposition of [C, Hp, Wp, N]: returns the
    four polyphase components x[:, py::2, px::2, :].  Strided gathers are
    cheap in XLA/HBM but unsupported inside Mosaic kernels — the stride-2
    conv kernels consume these contiguous phases instead."""
    return tuple(x_padded[:, py::2, px::2, :]
                 for py in (0, 1) for px in (0, 1))


# --------------------------------------------------------------------------
# 3x3 depthwise conv: per-channel spatial taps on the VPU
# --------------------------------------------------------------------------
def dwconv3x3(x_padded, w_c33: np.ndarray, bias_eff: np.ndarray,
              requant: RequantSpec, *, stride: int, out_hw: Tuple[int, int],
              leaky: Optional[LeakySpec] = None, nt: Optional[int] = None):
    """Depthwise 3x3 over pre-padded input [C, Hp, Wp, N] (engine pads with
    the input zero-point in XLA).  Int32 tap FMAs on the VPU; stride-2 taps
    read the XLA-precomputed polyphase components (see phase_split)."""
    if stride == 2:
        phases = phase_split(x_padded)
        c, hp, wp, n = x_padded.shape
    else:
        c, hp, wp, n = x_padded.shape
    ho, wo = out_hw
    nt = _pick_nt(n, nt)
    w_taps = np.asarray(w_c33, np.int32).reshape(c, 9)

    # H-strip processing bounds the live int32 set (tap temporaries plus
    # the exact path's SRDHM expansion) under the 16 MB scoped-vmem limit.
    strip = max(1, -(-ho // (7 if requant.exact else 2)))

    rq_ops = requant.operand_arrays()
    if stride == 1:
        def kernel(xr, wr, br, *rest):
            *rqr, o = rest
            rq = [r[:] for r in rqr]
            for h0 in range(0, ho, strip):
                h1 = min(h0 + strip, ho)
                acc = (br[:].reshape(c, 1, 1, 1)
                       + jnp.zeros((c, h1 - h0, wo, nt), jnp.int32))
                for dy in range(3):
                    for dx in range(3):
                        tap = wr[:, dy * 3 + dx].reshape(c, 1, 1, 1)
                        sl = xr[:, h0 + dy:h1 + dy, dx:dx + wo,
                                :].astype(jnp.int32)
                        acc = acc + sl * tap
                t = requant.apply_in_kernel(acc, rq)
                o[:, h0:h1] = _maybe_leaky(t, leaky)

        return pl.pallas_call(
            kernel,
            grid=(n // nt,),
            in_specs=[
                pl.BlockSpec((c, hp, wp, nt), lambda i: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, 9), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                _param_spec(c),
            ] + [_param_spec(c)] * len(rq_ops),
            out_specs=pl.BlockSpec((c, ho, wo, nt), lambda i: (0, 0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, ho, wo, n), jnp.int8),
            interpret=_interpret_mode(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=(32 * 1024 * 1024 if requant.exact
                                  else None)),
        )(x_padded, jnp.asarray(w_taps),
          jnp.asarray(bias_eff, jnp.int32).reshape(c, 1), *rq_ops)

    # stride == 2: four polyphase inputs, contiguous tap slices
    def kernel(x00, x01, x10, x11, wr, br, *rest):
        *rqr, o = rest
        rq = [r[:] for r in rqr]
        ph = {(0, 0): x00, (0, 1): x01, (1, 0): x10, (1, 1): x11}
        for h0 in range(0, ho, strip):
            h1 = min(h0 + strip, ho)
            acc = (br[:].reshape(c, 1, 1, 1)
                   + jnp.zeros((c, h1 - h0, wo, nt), jnp.int32))
            for dy in range(3):
                for dx in range(3):
                    tap = wr[:, dy * 3 + dx].reshape(c, 1, 1, 1)
                    pr = ph[(dy % 2, dx % 2)]
                    oy, ox = dy // 2, dx // 2
                    sl = pr[:, oy + h0:oy + h1, ox:ox + wo,
                            :].astype(jnp.int32)
                    acc = acc + sl * tap
            t = requant.apply_in_kernel(acc, rq)
            o[:, h0:h1] = _maybe_leaky(t, leaky)

    phase_specs = [
        pl.BlockSpec((c,) + ph.shape[1:3] + (nt,), lambda i: (0, 0, 0, i),
                     memory_space=pltpu.VMEM)
        for ph in phases]
    return pl.pallas_call(
        kernel,
        grid=(n // nt,),
        in_specs=phase_specs + [
            pl.BlockSpec((c, 9), lambda i: (0, 0), memory_space=pltpu.VMEM),
            _param_spec(c),
        ] + [_param_spec(c)] * len(rq_ops),
        out_specs=pl.BlockSpec((c, ho, wo, nt), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, ho, wo, n), jnp.int8),
        interpret=_interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(32 * 1024 * 1024 if requant.exact else None)),
    )(*phases, jnp.asarray(w_taps),
      jnp.asarray(bias_eff, jnp.int32).reshape(c, 1), *rq_ops)


# --------------------------------------------------------------------------
# KxK standard conv (conv1: 3->8, stride 2, darknet-padded input)
# --------------------------------------------------------------------------
def conv3x3(x_padded, w_oihw: np.ndarray, bias_eff: np.ndarray,
            requant: RequantSpec, *, stride: int, out_hw: Tuple[int, int],
            leaky: Optional[LeakySpec] = None, nt: Optional[int] = None):
    """Standard KxK conv over pre-padded [Ci, Hp, Wp, N].  Mosaic has no
    int32 MXU matmul and Ci is tiny (3 for conv1), so taps accumulate as
    ci*co broadcast FMAs on the VPU; stride-2 reads XLA-precomputed
    polyphase components."""
    ci, hp, wp, n = x_padded.shape
    co, _, kh, kw = w_oihw.shape
    ho, wo = out_hw
    nt = _pick_nt(n, nt)
    # [K*K, Co, Ci] int32 tap matrices (Co in sublanes so the per-channel
    # column slice reshapes to (Co,1,1,1) without a lane->plain relayout)
    taps = np.stack([np.asarray(w_oihw[:, :, dy, dx], np.int32)
                     for dy in range(kh) for dx in range(kw)])
    phases = phase_split(x_padded) if stride == 2 else None

    strip = max(1, -(-ho // (7 if requant.exact else 2)))

    def stripe_out(get_slice, wr, br, rq, o):
        """Accumulate + requant + store, strip-wise over H (bounds the live
        int32 working set under the scoped-vmem limit)."""
        for h0 in range(0, ho, strip):
            h1 = min(h0 + strip, ho)
            acc = (br[:].reshape(co, 1, 1, 1)
                   + jnp.zeros((co, h1 - h0, wo, nt), jnp.int32))
            for dy in range(kh):
                for dx in range(kw):
                    k = dy * kw + dx
                    sl = get_slice(dy, dx, h0, h1)
                    for ci_i in range(ci):
                        w_col = wr[k:k + 1, :, ci_i:ci_i + 1].reshape(
                            co, 1, 1, 1)
                        acc = acc + sl[ci_i:ci_i + 1] * w_col
            t = requant.apply_in_kernel(acc, rq)
            o[:, h0:h1] = _maybe_leaky(t, leaky)

    rq_ops = requant.operand_arrays()
    if stride == 1:
        def kernel(xr, wr, br, *rest):
            *rqr, o = rest
            stripe_out(
                lambda dy, dx, h0, h1: xr[:, h0 + dy:h1 + dy, dx:dx + wo, :
                                          ].astype(jnp.int32),
                wr, br, [r[:] for r in rqr], o)

        return pl.pallas_call(
            kernel,
            grid=(n // nt,),
            in_specs=[
                pl.BlockSpec((ci, hp, wp, nt), lambda i: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kh * kw, co, ci), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                _param_spec(co),
            ] + [_param_spec(co)] * len(rq_ops),
            out_specs=pl.BlockSpec((co, ho, wo, nt),
                                   lambda i: (0, 0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((co, ho, wo, n), jnp.int8),
            interpret=_interpret_mode(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=(32 * 1024 * 1024 if requant.exact
                                  else None)),
        )(x_padded, jnp.asarray(taps),
          jnp.asarray(bias_eff, jnp.int32).reshape(co, 1), *rq_ops)

    def kernel(x00, x01, x10, x11, wr, br, *rest):
        *rqr, o = rest
        ph = {(0, 0): x00, (0, 1): x01, (1, 0): x10, (1, 1): x11}

        def get_slice(dy, dx, h0, h1):
            pr = ph[(dy % 2, dx % 2)]
            oy, ox = dy // 2, dx // 2
            return pr[:, oy + h0:oy + h1, ox:ox + wo, :].astype(jnp.int32)

        stripe_out(get_slice, wr, br, [r[:] for r in rqr], o)

    phase_specs = [
        pl.BlockSpec((ci,) + ph.shape[1:3] + (nt,), lambda i: (0, 0, 0, i),
                     memory_space=pltpu.VMEM)
        for ph in phases]
    return pl.pallas_call(
        kernel,
        grid=(n // nt,),
        in_specs=phase_specs + [
            pl.BlockSpec((kh * kw, co, ci), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            _param_spec(co),
        ] + [_param_spec(co)] * len(rq_ops),
        out_specs=pl.BlockSpec((co, ho, wo, nt), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((co, ho, wo, n), jnp.int8),
        interpret=_interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(32 * 1024 * 1024 if requant.exact else None)),
    )(*phases, jnp.asarray(taps),
      jnp.asarray(bias_eff, jnp.int32).reshape(co, 1), *rq_ops)


# --------------------------------------------------------------------------
# fused RGB565 preprocess: [H,W,N] u16 frames -> int8 net input
# --------------------------------------------------------------------------
def preprocess_rgb565(frames_hwn, nt: Optional[int] = None):
    """Bit-exact firmware preprocess (yoloface.c:26-93) as one kernel:
    field extract, 2x2 box average (>>2), 5/6/5 -> 8-bit expand, -128.

    [H,W,N] u16 frames -> [3,56,56,N] int8 (the CWHN engine layout; the
    WHCN pipeline permutes the leading dims afterwards).  The 2x2 phases
    are read as strided slices from an int32 VMEM scratch ref: strided
    loads are 32-bit-only in Mosaic, and value-level strided slicing does
    not lower at all — this staging is what lets the kernel compile on
    real TPUs."""
    h, w, n = frames_hwn.shape
    assert (h, w) == (112, 112)
    nt = _pick_nt(n, nt)

    def kernel(fr, o, s):
        s[:] = fr[:].astype(jnp.int32)
        phases = [s[dy:dy + 111:2, dx:dx + 111:2, :]
                  for dy in (0, 1) for dx in (0, 1)]

        def field(shift, mask):
            acc = (phases[0] >> shift) & mask
            for p in phases[1:]:
                acc = acc + ((p >> shift) & mask)
            return acc >> 2

        o[0] = ((field(11, 0x1F) << 3) - 128).astype(jnp.int8)
        o[1] = ((field(5, 0x3F) << 2) - 128).astype(jnp.int8)
        o[2] = ((field(0, 0x1F) << 3) - 128).astype(jnp.int8)

    return pl.pallas_call(
        kernel,
        grid=(n // nt,),
        in_specs=[pl.BlockSpec((h, w, nt), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, 56, 56, nt), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 56, 56, n), jnp.int8),
        scratch_shapes=[pltpu.VMEM((h, w, nt), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret_mode(),
    )(frames_hwn)

# --------------------------------------------------------------------------
# glue ops as kernels: pad / maxpool / add / requantize / concat
#
# Every graph op runs as a Pallas custom call so consecutive ops chain with
# identical (row-major) layouts — XLA otherwise interleaves its own tiled
# layouts and inserts relayout copies at every kernel boundary (measured
# ~35% of net time at batch 32k).
# --------------------------------------------------------------------------
def pad_int8(x, pads, zp: int, nt: Optional[int] = None):
    """[C,H,W,N] int8 -> zero-point-padded [C,H+ph,W+pw,N] (PAD op)."""
    c, h, w, n = x.shape
    (pt, pb), (pw_l, pw_r) = pads
    ho, wo = h + pt + pb, w + pw_l + pw_r
    nt = _pick_nt(n, nt)

    def kernel(xr, o):
        o[:] = jnp.full((c, ho, wo, nt), zp, jnp.int8)
        o[:, pt:pt + h, pw_l:pw_l + w, :] = xr[:]

    return pl.pallas_call(
        kernel,
        grid=(n // nt,),
        in_specs=[pl.BlockSpec((c, h, w, nt), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c, ho, wo, nt), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, ho, wo, n), jnp.int8),
        interpret=_interpret_mode(),
    )(x)


def maxpool_int8(x, *, filter_hw: Tuple[int, int], stride: int,
                 pads, out_hw: Tuple[int, int], nt: Optional[int] = None):
    """[C,H,W,N] int8 max pool (TFLite SAME clipped-window semantics via
    -128 pad).  Window taps read a padded int32 scratch ref (strided ref
    reads are the only strided access Mosaic supports)."""
    c, h, w, n = x.shape
    fh, fw = filter_hw
    (pt, pb), (pw_l, pw_r) = pads
    hp, wp = h + pt + pb, w + pw_l + pw_r
    ho, wo = out_hw
    nt = _pick_nt(n, nt)

    def kernel(xr, o, s):
        s[:] = jnp.full((c, hp, wp, nt), -128, jnp.int32)
        s[:, pt:pt + h, pw_l:pw_l + w, :] = xr[:].astype(jnp.int32)
        acc = jnp.full((c, ho, wo, nt), -128, jnp.int32)
        for dy in range(fh):
            for dx in range(fw):
                if stride == 1:
                    sl = s[:, dy:dy + ho, dx:dx + wo, :]
                else:
                    sl = s[:, dy:min(dy + stride * ho, hp):stride,
                           dx:min(dx + stride * wo, wp):stride, :]
                acc = jnp.maximum(acc, sl)
        o[:] = acc.astype(jnp.int8)

    return pl.pallas_call(
        kernel,
        grid=(n // nt,),
        in_specs=[pl.BlockSpec((c, h, w, nt), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c, ho, wo, nt), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, ho, wo, n), jnp.int8),
        scratch_shapes=[pltpu.VMEM((c, hp, wp, nt), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=_interpret_mode(),
    )(x)


def add_int8(a, b, spec: dict, nt: Optional[int] = None):
    """Quantized eltwise ADD; ``spec`` carries scalar params for either
    semantics (built by the plan)."""
    c, h, w, n = a.shape
    nt = _pick_nt(n, nt)
    exact = spec["exact"]

    def kernel(ar, br_, o):
        va = ar[:].astype(jnp.int32) - spec["zp1"]
        vb = br_[:].astype(jnp.int32) - spec["zp2"]
        if exact:
            sa = exact_add_rescale(va, spec["qm1"], spec["sh1"],
                                   spec["left_shift"])
            sb = exact_add_rescale(vb, spec["qm2"], spec["sh2"],
                                   spec["left_shift"])
            out = multiply_by_quantized_multiplier(
                sa + sb, jnp.int32(spec["qmo"]), jnp.int32(spec["sho"]))
        else:
            out = jnp.round(
                va.astype(jnp.float32) * np.float32(spec["s1"])
                + vb.astype(jnp.float32) * np.float32(spec["s2"])
            ).astype(jnp.int32)
        o[:] = jnp.clip(out + spec["zp_out"], -128, 127).astype(jnp.int8)

    return pl.pallas_call(
        kernel,
        grid=(n // nt,),
        in_specs=[pl.BlockSpec((c, h, w, nt), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((c, h, w, nt), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w, n), jnp.int8),
        interpret=_interpret_mode(),
    )(a, b)


def requantize_int8(x, spec: dict, nt: Optional[int] = None):
    """QUANTIZE op (int8 -> int8 rescale)."""
    c, h, w, n = x.shape
    nt = _pick_nt(n, nt)
    exact = spec["exact"]

    def kernel(xr, o):
        v = xr[:].astype(jnp.int32) - spec["zp_in"]
        if exact:
            out = multiply_by_quantized_multiplier(
                v, jnp.int32(spec["qm"]), jnp.int32(spec["sh"]))
        else:
            out = jnp.round(v.astype(jnp.float32)
                            * np.float32(spec["scale"])).astype(jnp.int32)
        o[:] = jnp.clip(out + spec["zp_out"], -128, 127).astype(jnp.int8)

    return pl.pallas_call(
        kernel,
        grid=(n // nt,),
        in_specs=[pl.BlockSpec((c, h, w, nt), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c, h, w, nt), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w, n), jnp.int8),
        interpret=_interpret_mode(),
    )(x)


def concat_channels(a, b, nt: Optional[int] = None):
    """CONCATENATION along channels (dim 0 of [C,H,W,N])."""
    c1, h, w, n = a.shape
    c2 = b.shape[0]
    nt = _pick_nt(n, nt)

    def kernel(ar, br_, o):
        o[:c1] = ar[:]
        o[c1:] = br_[:]

    return pl.pallas_call(
        kernel,
        grid=(n // nt,),
        in_specs=[
            pl.BlockSpec((c1, h, w, nt), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c2, h, w, nt), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c1 + c2, h, w, nt), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c1 + c2, h, w, n), jnp.int8),
        interpret=_interpret_mode(),
    )(a, b)


def activation_int32(name: str, q):
    """RELU / RELU6 / LOGISTIC on a pre-widened int32 (or int8) VALUES
    array -> int32 in [-128, 127]; `q` is the INPUT tensor's qparams.
    RELU/RELU6 are requant-free (output shares the input quant);
    LOGISTIC has the fixed 1/256-scale, zp -128 output quant.  Mosaic
    has no int8 vector select, so compute lifts to int32 (f32 for
    LOGISTIC).  Shared by the per-op, fused, arena and tiled lowerings.
    Reference semantics: the per-layer nl_func activation of the
    generated runtime (stm32/X-CUBE-AI/App/network.c:2920-2921)."""
    if name == "RELU":
        def fn_val(v, zp=q.zero_point):
            return jnp.maximum(v.astype(jnp.int32), zp)
    elif name == "RELU6":
        lo = int(q.zero_point)
        hi = int(round(6.0 / float(q.scale)) + q.zero_point)

        def fn_val(v, lo=max(lo, -128), hi=min(hi, 127)):
            return jnp.clip(v.astype(jnp.int32), lo, hi)
    elif name == "LOGISTIC":
        def fn_val(v, s=float(q.scale), zp=q.zero_point):
            x = (v.astype(jnp.float32) - zp) * s
            y = 1.0 / (1.0 + jnp.exp(-x))
            return jnp.clip(jnp.round(y * 256.0) - 128.0,
                            -128, 127).astype(jnp.int32)
    else:
        raise NotImplementedError(f"activation {name}")
    return fn_val


def eltwise_int8(x, fn_val, nt: Optional[int] = None):
    """Generic elementwise int8 -> int8 op (RELU/RELU6/LOGISTIC):
    fn_val maps the loaded values to int32 in [-128, 127]."""
    c, h, w, n = x.shape
    nt = _pick_nt(n, nt)

    def kernel(xr, o):
        o[:] = fn_val(xr[:]).astype(jnp.int8)

    return pl.pallas_call(
        kernel,
        grid=(n // nt,),
        in_specs=[pl.BlockSpec((c, h, w, nt), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c, h, w, nt), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w, n), jnp.int8),
        interpret=_interpret_mode(),
    )(x)


def resize_factors(graph_t, op):
    """Guarded integer replication factors for RESIZE_NEAREST_NEIGHBOR
    (same contract as engine._lower_op and the arena lowering: the quant
    params must pass through unchanged, only the default sampling
    convention, integer upscale only).  Returns (f_w, f_h) ordered for
    the [C, W, H, N] value layouts of the per-op/fused plans."""
    x_idx, out_idx = op.inputs[0], op.outputs[0]
    in_q, out_q = graph_t(x_idx).qparams, graph_t(out_idx).qparams
    if (in_q.scale != out_q.scale
            or in_q.zero_point != out_q.zero_point):
        raise NotImplementedError(
            "RESIZE_NEAREST_NEIGHBOR with requantization")
    if op.attrs.get("align_corners") or op.attrs.get(
            "half_pixel_centers"):
        raise NotImplementedError(
            "RESIZE_NEAREST_NEIGHBOR align_corners/half_pixel")
    in_h, in_w = graph_t(x_idx).shape[1], graph_t(x_idx).shape[2]
    out_h, out_w = graph_t(out_idx).shape[1], graph_t(out_idx).shape[2]
    if out_h % in_h or out_w % in_w:
        raise NotImplementedError(
            f"resize: non-integer scale {in_h}x{in_w} -> {out_h}x{out_w}")
    return out_w // in_w, out_h // in_h


def resize_nearest(x, factors, nt: Optional[int] = None):
    """RESIZE_NEAREST_NEIGHBOR as pixel replication on the two plain
    spatial dims of [C, d1, d2, N] (quant passes through; callers guard
    via resize_factors)."""
    c, d1, d2, n = x.shape
    f1, f2 = factors
    nt = _pick_nt(n, nt)

    def kernel(xr, o):
        o[:] = jnp.repeat(jnp.repeat(xr[:], f1, axis=1), f2, axis=2)

    return pl.pallas_call(
        kernel,
        grid=(n // nt,),
        in_specs=[pl.BlockSpec((c, d1, d2, nt), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c, d1 * f1, d2 * f2, nt),
                               lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, d1 * f1, d2 * f2, n), jnp.int8),
        interpret=_interpret_mode(),
    )(x)


def leaky_int8(x, leaky: "LeakySpec", nt: Optional[int] = None):
    """Standalone LEAKY_RELU (conv output with multiple consumers)."""
    return eltwise_int8(x, leaky.apply, nt)

"""Exact TFLite/gemmlowp fixed-point requantization arithmetic, TPU-native.

This is the correctness keystone of the framework: every int8 op in the
runtime requantizes int32 accumulators with *bit-exactly* the same semantics
as the TFLite builtin kernels (and therefore the reference's X-CUBE-AI C
runtime, whose intq tables at ``stm32/X-CUBE-AI/App/network.c:665+`` were
generated from the same ``yoloface_int8.tflite``).

TPU constraint: no int64.  ``SaturatingRoundingDoublingHighMul`` needs the
high 33 bits of a 63-bit product, so we compute the product in uint32
magnitude arithmetic with 16-bit limb splits and explicit carries.  All ops
here lower to plain VPU int32/uint32 instructions and work identically under
``jit`` on TPU/CPU and inside Pallas kernels.

Reference semantics (gemmlowp / tensorflow/lite/kernels/internal/common.h):

  SRDHM(a, b)         = round((a * b) / 2**31), rounding half away from zero,
                        saturating only for a == b == INT32_MIN (cannot occur
                        here because b = quantized multiplier > 0).
  RDivPOT(x, e)       = round(x / 2**e), rounding half away from zero.
  MBQM(x, qm, shift)  = RDivPOT(SRDHM(x * 2**max(shift,0), qm), max(-shift,0))
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "quantize_multiplier",
    "quantize_multiplier_arr",
    "saturating_rounding_doubling_high_mul",
    "rounding_divide_by_pot",
    "multiply_by_quantized_multiplier",
    "multiply_by_quantized_multiplier_bounded",
    "multiply_by_quantized_multiplier_bounded_mag",
    "multiply_by_quantized_multiplier_bounded_preshift",
    "mbqm_numpy",
    "derive_single_multiply",
    "derive_requant_rsm",
    "BOUNDED_MAX_ABS",
]


# --------------------------------------------------------------------------
# Host-side (import/compile time): real multiplier -> (int32 mantissa, shift)
# --------------------------------------------------------------------------
def quantize_multiplier(real_multiplier: float) -> Tuple[int, int]:
    """Decompose a positive real multiplier as ``qm * 2**(shift - 31)``.

    Bit-exact port of TFLite ``QuantizeMultiplier`` (double precision frexp,
    round half away from zero on the 31-bit mantissa).
    """
    if real_multiplier == 0.0:
        return 0, 0
    mant, shift = math.frexp(float(real_multiplier))
    q_fixed = math.floor(mant * (1 << 31) + 0.5)  # mant in [0.5, 1): positive
    if q_fixed == (1 << 31):
        q_fixed //= 2
        shift += 1
    if shift < -31:  # underflow: result always rounds to zero
        shift = 0
        q_fixed = 0
    if shift > 30:  # overflow guard (TFLite caps; cannot occur in-range here)
        shift = 30
        q_fixed = (1 << 31) - 1
    return int(q_fixed), int(shift)


def quantize_multiplier_arr(real_multipliers) -> Tuple[np.ndarray, np.ndarray]:
    """Vector version: arrays of (qm, shift) as int32 numpy, for per-channel."""
    qms, shifts = [], []
    for m in np.asarray(real_multipliers, dtype=np.float64).ravel():
        q, s = quantize_multiplier(float(m))
        qms.append(q)
        shifts.append(s)
    return (np.asarray(qms, dtype=np.int32), np.asarray(shifts, dtype=np.int32))


# --------------------------------------------------------------------------
# Device-side (traced): exact int32 fixed-point ops
# --------------------------------------------------------------------------
def saturating_rounding_doubling_high_mul(x, qm):
    """SRDHM(x, qm) for int32 ``x`` and positive int32 ``qm`` (broadcastable).

    Computes round((x * qm) / 2**31) with half-away-from-zero rounding using
    only 32-bit lanes: |x| * qm is formed as a 63-bit product from 16-bit
    limbs with explicit carry propagation.
    """
    x = jnp.asarray(x, jnp.int32)
    qm = jnp.asarray(qm, jnp.int32)
    neg = x < 0

    # |x| as uint32 (correct even for INT32_MIN via two's complement negate).
    ux = x.astype(jnp.uint32)
    ua = jnp.where(neg, (~ux) + jnp.uint32(1), ux)
    ub = qm.astype(jnp.uint32)  # qm > 0

    ah, al = ua >> 16, ua & jnp.uint32(0xFFFF)
    bh, bl = ub >> 16, ub & jnp.uint32(0xFFFF)

    ll = al * bl                    # < 2**32
    mid = al * bh + ah * bl         # each < 2**31, sum < 2**32
    hh = ah * bh                    # <= 2**30

    lo = ll + (mid << 16)
    carry = (lo < ll).astype(jnp.uint32)
    hi = hh + (mid >> 16) + carry   # p = hi * 2**32 + lo, p < 2**62

    # round half away from zero on the magnitude:
    #   result>=0: (p + 2**30)     >> 31
    #   result<0 : (p + 2**30 - 1) >> 31, then negate
    nudge = jnp.where(neg, jnp.uint32((1 << 30) - 1), jnp.uint32(1 << 30))
    lo2 = lo + nudge
    hi2 = hi + (lo2 < lo).astype(jnp.uint32)
    mag = ((hi2 << 1) | (lo2 >> 31)).astype(jnp.int32)  # hi2 < 2**30+1

    return jnp.where(neg, -mag, mag)


def rounding_divide_by_pot(x, exponent):
    """round(x / 2**exponent) with half-away-from-zero, exponent >= 0 (int32)."""
    x = jnp.asarray(x, jnp.int32)
    exponent = jnp.asarray(exponent, jnp.int32)
    mask = (jnp.int32(1) << exponent) - jnp.int32(1)
    remainder = jnp.bitwise_and(x, mask)
    threshold = (mask >> 1) + (x < 0).astype(jnp.int32)
    return (x >> exponent) + (remainder > threshold).astype(jnp.int32)


# --------------------------------------------------------------------------
# Host-side (plan time): numpy oracle + single-multiply form derivation
# --------------------------------------------------------------------------
def mbqm_numpy(x, qm: int, shift: int) -> np.ndarray:
    """Plan-time numpy int64 twin of ``multiply_by_quantized_multiplier``.

    Bit-exact by the same magnitude formulation the device limb kernel uses
    (property-tested against it): SRDHM as ``(p + 2**30 - neg) >> 31`` on the
    magnitude, RDivPOT folded as ``(mag + 2**(right-1)) >> right`` (half away
    from zero is odd-symmetric).  Exists so graph lowering can evaluate exact
    requant maps over small domains WITHOUT dispatching device ops (engine
    construction may run in a TPU-backend process where every eager jnp call
    is a ~24 ms tunnel round trip)."""
    x = np.asarray(x, np.int64) << max(int(shift), 0)
    right = max(-int(shift), 0)
    neg = x < 0
    p = np.abs(x) * np.int64(qm)                  # < 2**62
    mag = (p + np.int64((1 << 30)) - neg) >> 31
    if right:
        mag = (mag + np.int64(1 << (right - 1))) >> right
    return np.where(neg, -mag, mag)


def derive_single_multiply(qm_id: int, sh_id: int, qm_al: int, sh_al: int,
                           zp_in: int, zp_out: int):
    """Derive a verified single-multiply int32 form of the exact two-branch
    requant map ``v -> clip(MBQM(v, qm_b, sh_b) + zp_out)`` over the 256-value
    domain ``v in [-128 - zp_in, 127 - zp_in]`` (branch b = id for v >= 0,
    al for v < 0 — the fused conv->LEAKY epilogue's exact semantics; pass
    ``qm_id == qm_al`` for a single-branch requantize like QUANTIZE).

    Returns ``(k, m_id, c_id, m_al, c_al)`` such that

        a  = |v|;  m, c = (m_id, c_id) if v >= 0 else (m_al, c_al)
        t  = (a * m + c) >> k                     # one int32 multiply
        out = clip((-t if v < 0 else t) + zp_out, -128, 127)

    reproduces the exact chain for EVERY v in the domain (exhaustively
    verified here — the nested-floor identity makes the composed double
    rounding a single floor, so a reduced multiplier is exact whenever the
    per-a constant intervals intersect, which the tiny domain makes near
    certain), or ``None`` when no (k, m, c) qualifies.  All intermediates
    fit int32 by construction (``a*m + c <= 2**31 - 1`` is enforced).

    This replaces the leaky epilogue's 2-multiply bounded MBQM (u32 + f32
    product assembly, ~16 VPU ops) with ~9 int32 ops and ONE multiply —
    the round-4 exact-bits lever (docs/PROFILE.md "nested-floor" note).
    """
    v = np.arange(-128 - zp_in, 128 - zp_in, dtype=np.int64)
    # v == 0 is included in BOTH branches: the true map routes 0 to the
    # id branch, but the fused sign-from-accumulator epilogue
    # (pallas_int8.apply_requant_leaky) routes "negative input whose
    # requant magnitude is 0" to the al branch — (m_al, c_al) must then
    # reproduce the v == 0 output too (only tightens the interval
    # intersection; all graph leakys still derive)
    pos, neg = v[v >= 0], v[v <= 0]
    # shared k keeps the kernel's shift a static python scalar
    for k in (22, 21, 20, 19, 18):
        r_id = _sm_branch_at_k(pos, qm_id, sh_id, zp_out, k)
        r_al = _sm_branch_at_k(neg, qm_al, sh_al, zp_out, k)
        if r_id is not None and r_al is not None:
            return (k, r_id[0], r_id[1], r_al[0], r_al[1])
    return None


def _sm_branch_at_k(vv, qm, sh, zp_out, k):
    """One branch of :func:`derive_single_multiply` at a fixed k: find
    ``(m, c)`` with ``(|v|*m + c) >> k`` reproducing the exact magnitude map
    over this branch's domain (empty domain: trivially (1, 0)).  The search
    intersects the per-|v| intervals of admissible c (each target t2 admits
    ``c in [t2lo*2**k - a*m, (t2hi+1)*2**k - 1 - a*m]``) and re-verifies the
    winner exhaustively."""
    if vv.size == 0:
        return 1, 0
    a = np.abs(vv)
    t_exact = mbqm_numpy(vv, qm, sh)              # signed, sign == sign(vv)
    f = np.clip(t_exact + zp_out, -128, 127)      # final int8 target
    # allowed SIGNED t window from the clipped target (clip saturation
    # frees the corresponding side)
    lo = np.where(f == -128, np.int64(-(1 << 40)), f - zp_out)
    hi = np.where(f == 127, np.int64(1 << 40), f - zp_out)
    if (vv < 0).any():                            # t_signed = -t2 here
        lo, hi = -hi, -lo
    t2lo, t2hi = np.maximum(lo, 0), hi
    sigma = qm * 2.0 ** (sh - 31)                 # exact real slope
    amax = int(a.max())
    m0 = int(round(sigma * (1 << k)))
    for m in (m0, m0 - 1, m0 + 1, m0 - 2, m0 + 2):
        if m <= 0 or amax * m >= (1 << 31):
            continue
        clo = int(np.maximum(t2lo * (1 << k) - a * m, 0).max())
        chi = int(np.minimum((t2hi + 1) * (1 << k) - 1 - a * m,
                             (1 << 31) - 1 - amax * m).min())
        if clo > chi:
            continue
        t2 = (a * m + clo) >> k
        got = np.where(vv < 0, -t2, t2)
        if (np.clip(got + zp_out, -128, 127) == f).all():
            return m, clo
    return None


def _rsm_fold(qm: int, shift: int, neg: bool) -> Tuple[int, int, int]:
    """``(QM', N_b, K)`` of the collapsed single-floor magnitude map.

    The gemmlowp double rounding on a magnitude ``a = |x|`` nests two
    floors, which the nested-floor identity ``floor((floor(p/2**31)+h) /
    2**right) == floor((p + h*2**31) / 2**(31+right))`` collapses into ONE:

        |MBQM(±a, qm, shift)| = (a*QM' + N_b) >> K        (int64 plan-time)

    with ``QM' = qm << max(shift,0)``, ``K = 31 + max(-shift,0)``, and the
    branch nudge ``N_b = 2**30 + (h << 31) - neg`` (``h = 2**(right-1)``,
    0 when right == 0; SRDHM's negative-side nudge is one less).  Verified
    against :func:`mbqm_numpy` by the derivation's exhaustive check."""
    left, right = max(shift, 0), max(-shift, 0)
    h = (1 << right) >> 1
    return (int(qm) << left,
            (1 << 30) + (h << 31) - (1 if neg else 0),
            31 + right)


def _rsm_runs(qm: int, shift: int, bound: int, satmag: int, neg: bool):
    """Constant-value runs of the CLAMPED branch magnitude map.

    Returns ``(A, js, a_start, a_end)``: the input clamp ``A`` (the first
    ``a`` whose magnitude saturates at ``satmag``, or ``bound`` when the
    map never reaches it), and for every output value ``j`` taken on
    ``[0, A]`` the first/last input producing it.  Because the reduced form
    ``X(a)`` below is monotone nondecreasing in ``a``, bit-exactness over
    every run's two ENDPOINTS implies bit-exactness over the whole run —
    the endpoint check is exhaustive.

    Run boundaries are computed in PYTHON ints: ``K = 31 + right`` can
    exceed 55 for very negative shifts (near-zero effective scales in
    arbitrary imported templates), where an int64 ``j << K`` would silently
    wrap.  Every run endpoint is then cross-checked against the int64
    gemmlowp port (:func:`mbqm_numpy`) so the derivation verifies against
    the ground-truth double rounding, not against its own folded form;
    returns None on any mismatch (callers fall back to the bounded MBQM)."""
    QM, N, K = _rsm_fold(qm, shift, neg)
    if QM <= 0:                   # underflowed multiplier (qm == 0)
        return None
    if bound * QM >= (1 << 62):   # outside mbqm_numpy's exact int64 domain
        return None
    a_sat = max(0, -(-((satmag << K) - N) // QM))     # ceil division
    A = a_sat if a_sat <= bound else bound
    j_end = satmag if a_sat <= bound else int((A * QM + N) >> K)
    starts = [max(0, -(-((j << K) - N) // QM)) for j in range(j_end + 1)]
    js, a_start, a_end = [], [], []
    for j in range(j_end + 1):
        s = starts[j]
        e = (starts[j + 1] - 1) if j + 1 <= j_end else A
        if s <= e:
            js.append(j)
            a_start.append(s)
            a_end.append(e)
    js = np.asarray(js, np.int64)
    a_start = np.asarray(a_start, np.int64)
    a_end = np.asarray(a_end, np.int64)
    # independent ground-truth check of every run endpoint
    sgn = -1 if neg else 1
    for pts in (a_start, a_end):
        got = np.minimum(np.abs(mbqm_numpy(sgn * pts, qm, shift)),
                         np.int64(satmag))
        if not np.array_equal(got, js):
            return None
    return A, js, a_start, a_end


def derive_requant_rsm(qms, shifts, bounds, sat_pos: int, sat_neg: int):
    """Derive a verified two-int-multiply reduced form of the exact conv
    requant magnitude map (clamped at the int8 saturation point):

        neg = acc < 0;  a = min(|acc|, A_b)
        t1  = (a*m2 + ((a*m1) >> k1) + c_b) >> k2     # pure int32, no f32

    such that ``t1 == min(|MBQM(acc, qm, shift)|, satmag_b)`` bit-exactly
    for every reachable ``acc`` (``|acc| <= bound_c``, the static
    per-channel accumulator bound), where ``satmag_pos = 127 - zp_out`` and
    ``satmag_neg = 128 + zp_out`` are the magnitudes at which the signed
    int8 clip saturates.  The saturation clamp moves to the INPUT (``A_b``
    = first saturating ``a``), and the derivation pins the line to exactly
    ``satmag`` there, so no output min is needed: ``clip(±t1 + zp_out)``
    reduces to ``±t1 + zp_out``.

    Replaces the 2-multiply f32-assisted bounded MBQM
    (:func:`multiply_by_quantized_multiplier_bounded_mag`, ~19 VPU ops with
    two f32 converts, a round and a carry chain) with ~11 plain int32 ops.
    The single-multiply form (:func:`derive_single_multiply`) is infeasible
    at conv accumulator domains — int32 overflow (``bound*m < 2**31``)
    collides with the corridor precision it needs (``2**k > A*J``); the
    second multiply supplies slope granularity ``2**-(k1+k2)`` while both
    products stay below 2**31.

    Per-channel ``(m1, m2, c_pos, c_neg, A_pos, A_neg)`` share one static
    ``(k1, k2)`` per layer.  Exhaustively verified per channel via the
    monotone run-endpoint argument (see :func:`_rsm_runs`); returns None
    when any channel fails (callers fall back to the bounded MBQM).

    Parity anchor: the requant semantics of the reference's conv epilogue,
    ``/root/reference/stm32/X-CUBE-AI/App/network.c:2900-2921``.
    """
    qms = np.asarray(qms, np.int64).ravel()
    shifts = np.asarray(shifts, np.int64).ravel()
    bounds = np.asarray(bounds, np.int64).ravel()
    C = qms.size
    for k2 in range(23, 15, -1):
        for k1 in (12, 10, 8):
            res = [_rsm_channel(int(qms[c]), int(shifts[c]),
                                int(bounds[c]), sat_pos, sat_neg, k1, k2)
                   for c in range(C)]
            if all(r is not None for r in res):
                arr = np.asarray(res, np.int64)
                if (arr >= (1 << 31)).any():
                    continue
                return (k1, k2) + tuple(
                    arr[:, i].astype(np.int32) for i in range(6))
    return None


def _rsm_channel(qm, shift, bound, sat_pos, sat_neg, k1, k2):
    """One channel of :func:`derive_requant_rsm`: shared (m1, m2) across
    both sign branches (their maps differ only in the nudge), per-branch
    (c, A).  Returns (m1, m2, c_pos, c_neg, A_pos, A_neg) or None."""
    QM, _, K = _rsm_fold(qm, shift, False)
    sigma = QM / 2.0 ** K
    m2_0 = int(sigma * (1 << k2))
    for dm2 in (0, -1, 1):
        m2 = m2_0 + dm2
        if m2 < 0:
            continue
        m1_0 = int(round((sigma - m2 / 2.0 ** k2) * (1 << (k1 + k2))))
        for dm1 in (0, -1, 1, -2, 2):
            m1 = m1_0 + dm1
            if m1 < 0:
                continue
            cs, As = [], []
            ok = True
            for neg, satmag in ((False, sat_pos), (True, sat_neg)):
                runs = _rsm_runs(qm, shift, bound, satmag, neg)
                if runs is None:        # fold failed its ground-truth check
                    return None
                A, js, a_s, a_e = runs
                x_s = a_s * m2 + ((a_s * m1) >> k1)
                x_e = a_e * m2 + ((a_e * m1) >> k1)
                clo = max(int((js * (1 << k2) - x_s).max()), 0)
                chi = int((js * (1 << k2) + (1 << k2) - 1 - x_e).min())
                # int32 headroom for both products and the sum at the clamp
                x_A = A * m2 + ((A * m1) >> k1)
                chi = min(chi, (1 << 31) - 1 - x_A)
                if A * m1 >= (1 << 31) or clo > chi:
                    ok = False
                    break
                cs.append(clo)
                As.append(A)
            if ok:
                return m1, m2, cs[0], cs[1], As[0], As[1]
    return None


# Largest |x| for which the f32-assisted bounded path below is exact.
# Error budget: p = |x| * qm < 2**19 * 2**31 = 2**50; the f32 product chain
# carries <= ~3 ulp(p) <= 3 * 2**26 ~ 2**28 absolute error, and exact
# high-word recovery needs |error| < 2**30 (0.25 * 2**32).  2**19 leaves a
# 4x safety margin.
BOUNDED_MAX_ABS = 1 << 19


def multiply_by_quantized_multiplier_bounded_mag(x, qm, shift):
    """Bit-exact ``MultiplyByQuantizedMultiplier`` fast path for bounded x,
    returned in ``(neg, magnitude)`` form: ``where(neg, -mag, mag)`` is the
    signed result and ``neg == (x < 0)``.  NOTE a zero magnitude can carry
    ``neg=True`` — a caller fusing the sign into a downstream two-branch
    map must make its negative branch exact at magnitude 0
    (``derive_single_multiply`` guarantees this for the leaky epilogue).

    Requires |x| <= ``BOUNDED_MAX_ABS`` (caller-guaranteed, e.g. from the
    static per-channel conv accumulator bound sum(|w|)*128 + |bias|).  Uses
    2 multiplies instead of the 4 wide-limb multiplies of the general path:
    the low 32 product bits come from one lane-wise u32 multiply, and the
    high word is recovered exactly from an f32 product (error ~2**28 is
    far below the 2**30 rounding threshold for p < 2**50).

    Semantics are identical to :func:`multiply_by_quantized_multiplier`
    (gemmlowp double rounding: SRDHM then RoundingDivideByPOT), verified
    bit-exact by property test against the limb implementation.
    """
    x = jnp.asarray(x, jnp.int32)
    qm = jnp.asarray(qm, jnp.int32)
    shift = jnp.asarray(shift, jnp.int32)
    left = jnp.maximum(shift, 0)
    right = jnp.maximum(-shift, 0)
    e = jnp.uint32(31) - left.astype(jnp.uint32)      # 1..31 (shift <= 30)

    neg = x < 0
    ua_i = jnp.where(neg, -x, x)                      # |x| < 2**19, int32
    ua = ua_i.astype(jnp.uint32)
    ub = qm.astype(jnp.uint32)                        # qm in [2**30, 2**31)

    lo = ua * ub                                      # p mod 2**32 (exact)
    # high word p >> 32, exactly: the f32 product approximates p to within
    # ~2**27; subtracting only lo's top-2-bit contribution (int32-safe cast,
    # unlike a full uint32->f32 cast which Mosaic can't lower) leaves a
    # fractional residue in [0, 0.25) + ~2**-5 error -> integer-round is
    # exact.  Scalings folded: 2**-30 premultiplies qm (usually a [C,1]
    # channel constant -> near-free) so everything computes at 4x scale —
    # s = 4*hi_true + 4*delta with 4*delta in (-0.15, 1.17), hence
    # round(s) in {4*hi_true, 4*hi_true + 1} and one >> 2 recovers hi
    # exactly, replacing two full-tensor f32 multiplies with one.
    qm_pre4 = qm.astype(jnp.float32) * jnp.float32(2.0 ** -30)
    s4 = ua_i.astype(jnp.float32) * qm_pre4 \
        - (lo >> 30).astype(jnp.int32).astype(jnp.float32)
    hi = (jnp.round(s4).astype(jnp.int32) >> 2).astype(jnp.uint32)

    # SRDHM with the left shift folded into the rounding exponent e:
    #   pos: (p + 2**(e-1))     >> e
    #   neg: (p + 2**(e-1) - 1) >> e, then negate
    nudge = (jnp.uint32(1) << (e - jnp.uint32(1))) - neg.astype(jnp.uint32)
    lo2 = lo + nudge
    hi2 = hi + (lo2 < lo).astype(jnp.uint32)
    mag = (hi2 << (jnp.uint32(32) - e)) | (lo2 >> e)
    # RoundingDivideByPOT folded onto the magnitude: half-away-from-zero
    # is odd-symmetric, so RDivPOT(±mag, right) == ±((mag + h) >> right)
    # with h = 2**(right-1) (0 when right == 0) — saves the separate
    # signed mask/threshold chain AND the extra negate pass
    ur = right.astype(jnp.uint32)
    h = (jnp.uint32(1) << ur) >> 1
    mag2 = ((mag + h) >> ur).astype(jnp.int32)
    return neg, mag2


def multiply_by_quantized_multiplier_bounded(x, qm, shift):
    """Signed result of the (neg, magnitude) form above."""
    neg, mag2 = multiply_by_quantized_multiplier_bounded_mag(x, qm, shift)
    return jnp.where(neg, -mag2, mag2)


def multiply_by_quantized_multiplier_bounded_preshift(x, qm, shift, pre):
    """Bit-exact ``MBQM(x << pre, qm, shift)`` for small |x|.

    The exact int8 ADD (`ops/int8_ref.add_int8`, TFLite semantics) amplifies
    both inputs by ``1 << 20`` before their rescale MBQMs; the shifted value
    (~2**28.6) exceeds :data:`BOUNDED_MAX_ABS`, forcing the 4-multiply limb
    path (ROADMAP r2 gap 6).  This variant keeps the 2-multiply bounded
    machinery by folding the pre-shift into the product assembly instead:
    P0 = |x|*qm is recovered exactly (one u32 multiply for the low word,
    one f32 multiply for the high word — |x| < 2**10 keeps the f32 error
    ~2**18, far under the 2**30 rounding threshold), then p = P0 << pre is
    assembled in (hi, lo) words.  Requires |x| < 2**10, 0 < pre <= 20,
    and shift <= 0 (true for the ADD's input rescales: s_i/(2*max) <= 0.5).
    """
    # `pre` is Python-static: enforce the documented contract here —
    # pre == 0 would make `lo0 >> (32 - upre)` an undefined 32-bit shift,
    # and the e=31 rounding below silently assumes no left shift (the
    # shift <= 0 half of the contract is asserted where `shift` is still
    # static, in the callers' plan-time specs).  (ADVICE r3)
    assert 0 < pre <= 20, f"bounded_preshift requires 0 < pre <= 20, got {pre}"
    x = jnp.asarray(x, jnp.int32)
    qm = jnp.asarray(qm, jnp.int32)
    shift = jnp.asarray(shift, jnp.int32)
    right = jnp.maximum(-shift, 0)
    upre = jnp.uint32(pre)

    neg = x < 0
    ua_i = jnp.where(neg, -x, x)                      # |x| < 2**10
    ua = ua_i.astype(jnp.uint32)
    ub = qm.astype(jnp.uint32)

    lo0 = ua * ub                                     # P0 mod 2**32
    # 4x-scaled high-word recovery (see the bounded variant above):
    # |x| < 2**10 keeps the f32 error far inside the round margin
    qm_pre4 = qm.astype(jnp.float32) * jnp.float32(2.0 ** -30)
    s4 = ua_i.astype(jnp.float32) * qm_pre4 \
        - (lo0 >> 30).astype(jnp.int32).astype(jnp.float32)
    hi0 = (jnp.round(s4).astype(jnp.int32) >> 2).astype(jnp.uint32)

    hi = (hi0 << upre) | (lo0 >> (jnp.uint32(32) - upre))
    lo = lo0 << upre                                  # p = P0 << pre

    e = jnp.uint32(31)                                # shift <= 0: no left
    nudge = (jnp.uint32(1) << (e - jnp.uint32(1))) - neg.astype(jnp.uint32)
    lo2 = lo + nudge
    hi2 = hi + (lo2 < lo).astype(jnp.uint32)
    mag = (hi2 << (jnp.uint32(32) - e)) | (lo2 >> e)
    ur = right.astype(jnp.uint32)
    h = (jnp.uint32(1) << ur) >> 1
    mag2 = ((mag + h) >> ur).astype(jnp.int32)
    return jnp.where(neg, -mag2, mag2)


def multiply_by_quantized_multiplier(x, qm, shift):
    """TFLite ``MultiplyByQuantizedMultiplier``: x * qm * 2**(shift-31).

    ``qm``/``shift`` may be scalars or per-channel int32 arrays broadcastable
    against ``x``.
    """
    x = jnp.asarray(x, jnp.int32)
    shift = jnp.asarray(shift, jnp.int32)
    left = jnp.maximum(shift, 0)
    right = jnp.maximum(-shift, 0)
    return rounding_divide_by_pot(
        saturating_rounding_doubling_high_mul(x << left, qm), right)

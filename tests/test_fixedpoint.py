"""Property tests: the TPU 32-bit-lane fixed-point ops match a direct int64
port of the gemmlowp/TFLite reference functions on random and edge inputs."""

import numpy as np
import jax
import jax.numpy as jnp

from yoloface_tpu.core.fixedpoint import (
    multiply_by_quantized_multiplier,
    quantize_multiplier,
    rounding_divide_by_pot,
    saturating_rounding_doubling_high_mul,
)

I32_MIN, I32_MAX = -(2**31), 2**31 - 1


def srdhm_ref(a: int, b: int) -> int:
    """gemmlowp SaturatingRoundingDoublingHighMul in python ints."""
    if a == I32_MIN and b == I32_MIN:
        return I32_MAX
    ab = a * b
    nudge = (1 << 30) if ab >= 0 else 1 - (1 << 30)
    v = ab + nudge
    # C int64 division by 2**31 truncates toward zero.
    q = abs(v) >> 31
    return q if v >= 0 else -q


def rdivpot_ref(x: int, exponent: int) -> int:
    mask = (1 << exponent) - 1
    remainder = x & mask
    threshold = (mask >> 1) + (1 if x < 0 else 0)
    return (x >> exponent) + (1 if remainder > threshold else 0)


def mbqm_ref(x: int, qm: int, shift: int) -> int:
    left = max(shift, 0)
    right = max(-shift, 0)
    xs = (x * (1 << left)) & 0xFFFFFFFF
    if xs >= 2**31:
        xs -= 2**32  # int32 wrap, like the C code
    return rdivpot_ref(srdhm_ref(xs, qm), right)


def test_srdhm_matches_reference():
    rng = np.random.default_rng(0)
    xs = np.concatenate([
        rng.integers(I32_MIN, I32_MAX, 20000, dtype=np.int64),
        np.array([0, 1, -1, I32_MIN, I32_MAX, 2**30, -(2**30), 3, -3]),
    ]).astype(np.int32)
    qms = np.concatenate([
        rng.integers(1 << 30, I32_MAX, xs.size - 4, dtype=np.int64),
        np.array([1 << 30, I32_MAX, (1 << 30) + 1, I32_MAX - 1]),
    ]).astype(np.int32)
    got = np.asarray(saturating_rounding_doubling_high_mul(
        jnp.asarray(xs), jnp.asarray(qms)))
    want = np.array([srdhm_ref(int(a), int(b)) for a, b in zip(xs, qms)],
                    dtype=np.int32)
    np.testing.assert_array_equal(got, want)


def test_rdivpot_matches_reference():
    rng = np.random.default_rng(1)
    xs = rng.integers(I32_MIN, I32_MAX, 20000, dtype=np.int64).astype(np.int32)
    es = rng.integers(0, 31, xs.size).astype(np.int32)
    got = np.asarray(rounding_divide_by_pot(jnp.asarray(xs), jnp.asarray(es)))
    want = np.array([rdivpot_ref(int(x), int(e)) for x, e in zip(xs, es)],
                    dtype=np.int32)
    np.testing.assert_array_equal(got, want)


def test_mbqm_matches_reference():
    rng = np.random.default_rng(2)
    # accumulators in a realistic conv range plus extremes
    xs = np.concatenate([
        rng.integers(-(2**24), 2**24, 10000, dtype=np.int64),
        rng.integers(I32_MIN, I32_MAX, 2000, dtype=np.int64),
    ]).astype(np.int32)
    reals = np.exp(rng.uniform(np.log(1e-6), np.log(4.0), xs.size))
    qms, shifts = [], []
    for m in reals:
        q, s = quantize_multiplier(float(m))
        qms.append(q)
        shifts.append(s)
    qms = np.asarray(qms, np.int32)
    shifts = np.asarray(shifts, np.int32)
    # only negative-shift cases can use extreme accumulators without the
    # int32 left-shift wrap being exercised differently; test both anyway
    got = np.asarray(multiply_by_quantized_multiplier(
        jnp.asarray(xs), jnp.asarray(qms), jnp.asarray(shifts)))
    want = np.array([mbqm_ref(int(x), int(q), int(s))
                     for x, q, s in zip(xs, qms, shifts)], dtype=np.int32)
    np.testing.assert_array_equal(got, want)


def test_quantize_multiplier_known_values():
    # identity multiplier 0.5 -> mantissa 2**30, shift 0
    assert quantize_multiplier(0.5) == (1 << 30, 0)
    assert quantize_multiplier(1.0) == (1 << 30, 1)
    assert quantize_multiplier(0.0) == (0, 0)
    q, s = quantize_multiplier(0.25)
    assert q == 1 << 30 and s == -1


def test_jit_and_vmap_compatible():
    f = jax.jit(lambda x, q, s: multiply_by_quantized_multiplier(x, q, s))
    out = f(jnp.arange(-5, 5, dtype=jnp.int32),
            jnp.int32(1 << 30), jnp.int32(0))
    np.testing.assert_array_equal(
        np.asarray(out),
        [mbqm_ref(x, 1 << 30, 0) for x in range(-5, 5)])


def test_mbqm_bounded_matches_limb_path():
    """The f32-assisted bounded MBQM is bit-identical to the limb path (and
    the int64 reference) over its whole contract: |x| <= BOUNDED_MAX_ABS,
    any in-range (qm, shift)."""
    from yoloface_tpu.core.fixedpoint import (
        BOUNDED_MAX_ABS, multiply_by_quantized_multiplier_bounded)

    rng = np.random.default_rng(7)
    B = BOUNDED_MAX_ABS
    xs = np.concatenate([
        rng.integers(-B, B + 1, 20000, dtype=np.int64),
        np.array([0, 1, -1, B, -B, B - 1, -(B - 1)], dtype=np.int64),
    ]).astype(np.int32)
    reals = np.exp(rng.uniform(np.log(1e-6), np.log(4.0), xs.size))
    qms, shifts = [], []
    for m in reals:
        q, s = quantize_multiplier(float(m))
        qms.append(q)
        shifts.append(s)
    qms = np.asarray(qms, np.int32)
    shifts = np.asarray(shifts, np.int32)
    got = np.asarray(multiply_by_quantized_multiplier_bounded(
        jnp.asarray(xs), jnp.asarray(qms), jnp.asarray(shifts)))
    want = np.asarray(multiply_by_quantized_multiplier(
        jnp.asarray(xs), jnp.asarray(qms), jnp.asarray(shifts)))
    np.testing.assert_array_equal(got, want)
    ref = np.array([mbqm_ref(int(x), int(q), int(s))
                    for x, q, s in zip(xs, qms, shifts)], dtype=np.int32)
    np.testing.assert_array_equal(got, ref)


def test_bounded_preshift_matches_limb_composition():
    """MBQM(x << 20, qm, sh) via the 2-multiply pre-shift bounded path is
    bit-exact vs the limb composition over the whole exact-ADD input
    contract (|x| <= 511, multipliers in (0, 0.5], sh <= 0)."""
    import numpy as np
    import jax.numpy as jnp
    from yoloface_tpu.core.fixedpoint import (
        multiply_by_quantized_multiplier,
        multiply_by_quantized_multiplier_bounded_preshift,
        quantize_multiplier)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(np.arange(-511, 512, dtype=np.int32))
    for _ in range(50):
        qm, sh = quantize_multiplier(float(rng.uniform(0.01, 0.5)))
        assert sh <= 0
        want = np.asarray(multiply_by_quantized_multiplier(
            xs << 20, jnp.int32(qm), jnp.int32(sh)))
        got = np.asarray(multiply_by_quantized_multiplier_bounded_preshift(
            xs, jnp.int32(qm), jnp.int32(sh), 20))
        np.testing.assert_array_equal(got, want)


def test_mbqm_numpy_matches_reference():
    """The plan-time numpy oracle (used by the single-multiply derivation)
    is bit-exact vs the python-int gemmlowp port on random (x, qm, shift)."""
    from yoloface_tpu.core.fixedpoint import mbqm_numpy
    rng = np.random.default_rng(1)
    for _ in range(40):
        qm = int(rng.integers(1 << 30, I32_MAX))
        shift = int(rng.integers(-12, 3))
        xs = np.concatenate([
            rng.integers(-(1 << 18), 1 << 18, 2000),
            np.array([0, 1, -1, 255, -255, 383, -383])])
        got = mbqm_numpy(xs, qm, shift)
        want = np.array([mbqm_ref(int(x), qm, shift) for x in xs])
        np.testing.assert_array_equal(got, want)


def _exact_two_branch(v, qm_id, sh_id, qm_al, sh_al, zp_out):
    out = np.array([mbqm_ref(int(x), qm_al if x < 0 else qm_id,
                             sh_al if x < 0 else sh_id) for x in v])
    return np.clip(out + zp_out, -128, 127)


def test_single_multiply_form_bitexact_on_graph_leakys():
    """derive_single_multiply succeeds for EVERY leaky op in the shipped
    graph and the derived (k, m, c) form reproduces the exact two-branch
    MBQM chain over the full 256-value domain (the round-4 exact-bits
    epilogue lever, docs/PROFILE.md nested-floor note)."""
    from yoloface_tpu.core.fixedpoint import derive_single_multiply
    from yoloface_tpu.io.tflite_import import load_tflite
    g = load_tflite("/root/reference/yoloface/tflite/yoloface_int8.tflite")
    n = 0
    for op in g.ops:
        if op.opname != "LEAKY_RELU":
            continue
        in_q = g.tensor(op.inputs[0]).qparams
        out_q = g.tensor(op.outputs[0]).qparams
        ratio = np.float64(in_q.scale) / np.float64(out_q.scale)
        alpha = np.float64(op.attrs["alpha"])
        qm_id, sh_id = quantize_multiplier(float(ratio))
        qm_al, sh_al = quantize_multiplier(float(ratio * alpha))
        sm = derive_single_multiply(qm_id, sh_id, qm_al, sh_al,
                                    in_q.zero_point, out_q.zero_point)
        assert sm is not None, f"derivation failed for leaky op {op.index}"
        k, m_id, c_id, m_al, c_al = sm
        v = np.arange(-128 - in_q.zero_point, 128 - in_q.zero_point,
                      dtype=np.int64)
        a = np.abs(v)
        m = np.where(v < 0, m_al, m_id)
        c = np.where(v < 0, c_al, c_id)
        assert int((a * m + c).max()) <= I32_MAX  # int32-safe by contract
        t2 = (a * m + c) >> k
        got = np.clip(np.where(v < 0, -t2, t2) + out_q.zero_point, -128, 127)
        want = _exact_two_branch(v, qm_id, sh_id, qm_al, sh_al,
                                 out_q.zero_point)
        np.testing.assert_array_equal(got, want)
        n += 1
    assert n == 17


def test_single_multiply_form_random_params():
    """Randomized (qm, shift, zp) requant maps: whenever the derivation
    succeeds, the form is bit-exact over the whole domain (the deriver's
    own exhaustive check is re-verified independently here)."""
    from yoloface_tpu.core.fixedpoint import derive_single_multiply
    rng = np.random.default_rng(2)
    n_ok = 0
    for _ in range(60):
        qm_id = int(rng.integers(1 << 30, I32_MAX))
        qm_al = int(rng.integers(1 << 30, I32_MAX))
        sh_id = int(rng.integers(-6, 2))
        sh_al = int(rng.integers(-8, 0))
        zp_in = int(rng.integers(-128, 128))
        zp_out = int(rng.integers(-128, 128))
        sm = derive_single_multiply(qm_id, sh_id, qm_al, sh_al,
                                    zp_in, zp_out)
        if sm is None:
            continue
        n_ok += 1
        k, m_id, c_id, m_al, c_al = sm
        v = np.arange(-128 - zp_in, 128 - zp_in, dtype=np.int64)
        a = np.abs(v)
        t2 = (a * np.where(v < 0, m_al, m_id)
              + np.where(v < 0, c_al, c_id)) >> k
        got = np.clip(np.where(v < 0, -t2, t2) + zp_out, -128, 127)
        want = _exact_two_branch(v, qm_id, sh_id, qm_al, sh_al, zp_out)
        np.testing.assert_array_equal(got, want)
    assert n_ok >= 50  # the tiny domain makes derivation near-certain


def test_fused_sign_from_acc_epilogue_matches_staged_chain():
    """The fully-fused exact conv+leaky epilogue (bounded-MBQM magnitude
    feeding the leaky single-multiply form directly, skipping the
    negate-select / re-abs / signed clip) is bit-identical to the staged
    general-limb chain for every conv+leaky pair in the shipped graph,
    over dense accumulator sweeps inside each layer's static bound."""
    import jax.numpy as jnp

    from yoloface_tpu.core.fixedpoint import multiply_by_quantized_multiplier
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.kernels.pallas_int8 import (LeakySpec, acc_bound,
                                                  apply_requant_leaky)
    from yoloface_tpu.runtime.pallas_plan import _leaky_spec, _requant_spec

    g = load_tflite("/root/reference/yoloface/tflite/yoloface_int8.tflite")
    rng = np.random.default_rng(3)
    n_pairs = 0
    for op in g.ops:
        if op.opname not in ("CONV_2D", "DEPTHWISE_CONV_2D"):
            continue
        leaky_op = next((o for o in g.ops if o.opname == "LEAKY_RELU"
                         and o.inputs[0] == op.outputs[0]), None)
        if leaky_op is None:
            continue
        t = g.tensor
        w, b = t(op.inputs[1]), t(op.inputs[2])
        in_q, out_q = t(op.inputs[0]).qparams, t(op.outputs[0]).qparams
        rq = _requant_spec(in_q.scale, w.qparams.scales, out_q.scale,
                           out_q.zero_point, True)
        lk = _leaky_spec(g, leaky_op, True)
        assert lk.sm is not None
        wd = w.data.astype(np.int64)
        axes = (1, 2, 3) if op.opname == "CONV_2D" else (0, 1, 2)
        bias_eff = (b.data.astype(np.int64)
                    - in_q.zero_point * wd.sum(axes)).astype(np.int32)
        abs_w_sum = np.abs(wd).sum(axes)
        rq.bound = acc_bound(abs_w_sum, bias_eff)
        C = rq.p1.shape[0]
        accs = np.concatenate([
            np.arange(-800, 800),
            rng.integers(-rq.bound, rq.bound + 1, 3000),
            np.array([0, 1, -1, rq.bound, -rq.bound])]).astype(np.int32)
        acc4 = np.broadcast_to(accs[None, :, None, None],
                               (C, accs.size, 1, 1)).copy()
        # the reduced form's contract is the per-channel static bound
        # (the only accumulators reachable at runtime): clip the sweep
        bounds_c = (128 * np.abs(abs_w_sum.astype(np.int64))
                    + np.abs(bias_eff.astype(np.int64))).reshape(-1)
        if bounds_c.size == C:
            acc4 = np.clip(acc4, -bounds_c[:, None, None, None],
                           bounds_c[:, None, None, None]).astype(np.int32)
        p1, p2 = rq.operands()
        # staged reference: general limb MBQM -> folded clip -> bounded
        # leaky (sm disabled)
        v = np.asarray(multiply_by_quantized_multiplier(
            jnp.asarray(acc4), p1.reshape(C, 1, 1, 1),
            p2.reshape(C, 1, 1, 1)))
        v = np.clip(v, -128 - rq.zp_out, 127 - rq.zp_out)
        lk_nosm = LeakySpec(zp_in=lk.zp_in, zp_out=lk.zp_out, s_id=lk.s_id,
                            s_al=lk.s_al, qm_id=lk.qm_id, sh_id=lk.sh_id,
                            qm_al=lk.qm_al, sh_al=lk.sh_al, exact=True,
                            sm=None)
        want = np.asarray(lk_nosm.apply_exact_i32(jnp.asarray(v)))
        # bounded-MBQM fused chain (rsm not derived)
        fused = np.asarray(apply_requant_leaky(rq, lk, jnp.asarray(acc4),
                                               [p1, p2]))
        np.testing.assert_array_equal(fused, want,
                                      err_msg=f"conv op {op.index}")
        # reduced pure-int32 chain (rsm derived from per-channel bounds)
        rq.derive_rsm(abs_w_sum, bias_eff)
        assert rq.rsm is not None, f"conv op {op.index}: rsm did not derive"
        rq_ops = [np.asarray(a) for a in rq.operand_arrays()]
        fused_rsm = np.asarray(apply_requant_leaky(
            rq, lk, jnp.asarray(acc4), [jnp.asarray(a) for a in rq_ops]))
        np.testing.assert_array_equal(fused_rsm, want,
                                      err_msg=f"conv op {op.index} (rsm)")
        n_pairs += 1
    assert n_pairs == 17


def test_derive_requant_rsm_exhaustive_sweep():
    """The reduced two-multiply pure-int32 requant form derives for EVERY
    conv/dw in the shipped graph, and reproduces the exact clamped MBQM
    magnitude bit-for-bit over a FULL exhaustive sweep of sampled channels
    (plus the widest-bound channel) of every layer.  The monotone
    run-endpoint argument inside the derivation covers all channels; this
    sweep independently cross-checks it against mbqm_numpy ground truth."""
    from yoloface_tpu.core.fixedpoint import (derive_requant_rsm, mbqm_numpy,
                                              quantize_multiplier_arr)
    from yoloface_tpu.io.tflite_import import load_tflite

    g = load_tflite("/root/reference/yoloface/tflite/yoloface_int8.tflite")
    t = g.tensor
    rng = np.random.default_rng(7)
    n_layers = 0
    for op in g.ops:
        if op.opname not in ("CONV_2D", "DEPTHWISE_CONV_2D"):
            continue
        w, b = t(op.inputs[1]), t(op.inputs[2])
        in_q, out_q = t(op.inputs[0]).qparams, t(op.outputs[0]).qparams
        eff = (np.float64(in_q.scale) * np.asarray(w.qparams.scales,
                                                   np.float64)
               / np.float64(out_q.scale))
        qms, shifts = quantize_multiplier_arr(eff)
        wd = w.data.astype(np.int64)
        axes = (1, 2, 3) if op.opname == "CONV_2D" else (0, 1, 2)
        abs_w = np.abs(wd).sum(axes)
        bias_eff = b.data.astype(np.int64) - in_q.zero_point * wd.sum(axes)
        bounds = 128 * abs_w + np.abs(bias_eff)
        zp = out_q.zero_point
        sat_pos, sat_neg = 127 - zp, 128 + zp
        rsm = derive_requant_rsm(qms, shifts, bounds, sat_pos, sat_neg)
        assert rsm is not None, f"op {op.index} failed to derive"
        k1, k2, m1, m2, c_p, c_n, a_p, a_n = rsm
        C = qms.size
        chans = {int(np.argmax(bounds))} | set(
            rng.integers(0, C, 2).tolist())
        for c in chans:
            a = np.arange(0, int(bounds[c]) + 1, dtype=np.int64)
            for neg, satmag, cc, A in ((False, sat_pos, c_p[c], a_p[c]),
                                       (True, sat_neg, c_n[c], a_n[c])):
                signed = (-a if neg else a).astype(np.int64)
                truth = np.minimum(
                    np.abs(mbqm_numpy(signed, int(qms[c]), int(shifts[c]))),
                    satmag)
                ac = np.minimum(a, int(A))
                got = (ac * int(m2[c]) + ((ac * int(m1[c])) >> k1)
                       + int(cc)) >> k2
                np.testing.assert_array_equal(
                    got, truth, err_msg=f"op {op.index} ch {c} neg={neg}")
                # int32 headroom at the clamp point
                assert int(ac.max() * m2[c]
                           + ((ac.max() * m1[c]) >> k1) + cc) < 2 ** 31
                assert int(ac.max()) * int(m1[c]) < 2 ** 31
        n_layers += 1
    assert n_layers == 24


def test_rsm_requant_only_epilogue_dense_sweep():
    """apply_in_kernel with the derived reduced form == general limb MBQM +
    zero-point clip, for the graph's NON-leaky convs (head convs), over a
    dense per-channel-contract accumulator sweep."""
    from yoloface_tpu.core.fixedpoint import multiply_by_quantized_multiplier
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.runtime.pallas_plan import _requant_spec

    g = load_tflite("/root/reference/yoloface/tflite/yoloface_int8.tflite")
    t = g.tensor
    rng = np.random.default_rng(11)
    n_convs = 0
    leaky_srcs = {o.inputs[0] for o in g.ops if o.opname == "LEAKY_RELU"}
    for op in g.ops:
        if op.opname != "CONV_2D" or op.outputs[0] in leaky_srcs:
            continue
        w, b = t(op.inputs[1]), t(op.inputs[2])
        in_q, out_q = t(op.inputs[0]).qparams, t(op.outputs[0]).qparams
        rq = _requant_spec(in_q.scale, w.qparams.scales, out_q.scale,
                           out_q.zero_point, True)
        wd = w.data.astype(np.int64)
        abs_w = np.abs(wd).sum((1, 2, 3))
        bias_eff = (b.data.astype(np.int64)
                    - in_q.zero_point * wd.sum((1, 2, 3))).astype(np.int32)
        rq.derive_rsm(abs_w, bias_eff)
        assert rq.rsm is not None
        bounds_c = (128 * np.abs(abs_w) + np.abs(bias_eff.astype(np.int64)))
        C = rq.p1.shape[0]
        accs = np.concatenate([
            np.arange(-800, 800),
            rng.integers(-bounds_c.max(), bounds_c.max() + 1, 3000),
        ]).astype(np.int64)
        acc4 = np.clip(np.broadcast_to(accs[None, :, None, None],
                                       (C, accs.size, 1, 1)),
                       -bounds_c[:, None, None, None],
                       bounds_c[:, None, None, None]).astype(np.int32)
        p1, p2 = rq.operands()
        v = np.asarray(multiply_by_quantized_multiplier(
            jnp.asarray(acc4), p1.reshape(C, 1, 1, 1),
            p2.reshape(C, 1, 1, 1)))
        want = np.clip(v + rq.zp_out, -128, 127).astype(np.int8)
        got = np.asarray(rq.apply_in_kernel(
            jnp.asarray(acc4), [jnp.asarray(a) for a in rq.operand_arrays()]))
        np.testing.assert_array_equal(got, want,
                                      err_msg=f"conv op {op.index}")
        n_convs += 1
    assert n_convs == 7


def test_derive_requant_rsm_random_property():
    """Property test over random layer-like quant configs: whenever the
    reduced form derives, it is bit-exact over the FULL [0, bound] domain
    of every channel (both branches), all intermediates fit int32, and the
    clamp pins saturation; non-derivations are allowed (callers fall back
    to the bounded MBQM)."""
    from yoloface_tpu.core.fixedpoint import (derive_requant_rsm,
                                              mbqm_numpy,
                                              quantize_multiplier)

    rng = np.random.default_rng(23)
    derived = 0
    for trial in range(24):
        C = int(rng.integers(1, 9))
        reals = np.exp(rng.uniform(np.log(1e-4), np.log(0.3), C))
        qs = [quantize_multiplier(float(m)) for m in reals]
        qms = np.array([q for q, _ in qs], np.int64)
        shifts = np.array([s for _, s in qs], np.int64)
        bounds = rng.integers(64, 1 << 19, C).astype(np.int64)
        zp = int(rng.integers(-128, 128))
        sat_pos, sat_neg = 127 - zp, 128 + zp
        rsm = derive_requant_rsm(qms, shifts, bounds, sat_pos, sat_neg)
        if rsm is None:
            continue
        derived += 1
        k1, k2, m1, m2, c_p, c_n, a_p, a_n = rsm
        c = int(rng.integers(0, C))          # one random channel, full sweep
        a = np.arange(0, int(bounds[c]) + 1, dtype=np.int64)
        for neg, satmag, cc, A in ((False, sat_pos, c_p[c], a_p[c]),
                                   (True, sat_neg, c_n[c], a_n[c])):
            signed = (-a if neg else a)
            truth = np.minimum(
                np.abs(mbqm_numpy(signed, int(qms[c]), int(shifts[c]))),
                satmag)
            ac = np.minimum(a, int(A))
            got = (ac * int(m2[c]) + ((ac * int(m1[c])) >> k1)
                   + int(cc)) >> k2
            np.testing.assert_array_equal(
                got, truth, err_msg=f"trial {trial} ch {c} neg={neg}")
            assert int(ac.max()) * int(m1[c]) < 2 ** 31
            assert int(ac.max() * m2[c] + ((ac.max() * m1[c]) >> k1)
                       + cc) < 2 ** 31
    # the form should derive for the overwhelming majority of realistic
    # configs (24/24 on the shipped graph); require a healthy rate here
    assert derived >= 18, f"only {derived}/24 random configs derived"


def test_fused_epilogue_random_configs_property():
    """The fully-fused exact conv+leaky epilogue over RANDOM quant configs
    — the arbitrary-imported-template surface (darknet-cfg PTQ, QAT
    re-deploys, retargets), not just the shipped graph's 17 pairs.
    Whichever reduced forms derive for a config (single-multiply leaky,
    rsm requant, bounded-MBQM, or the general-limb fallback), the fused
    chain must equal the staged general-limb reference bit-for-bit within
    the per-channel static accumulator bound."""
    import jax.numpy as jnp

    from yoloface_tpu.core.fixedpoint import multiply_by_quantized_multiplier
    from yoloface_tpu.kernels.pallas_int8 import (LeakySpec, acc_bound,
                                                  apply_requant_leaky)
    from yoloface_tpu.runtime.pallas_plan import _requant_spec
    from yoloface_tpu.core.fixedpoint import (derive_single_multiply,
                                              quantize_multiplier)

    rng = np.random.default_rng(11)
    n_sm = n_rsm = 0
    for trial in range(14):
        C = int(rng.integers(1, 6))
        s_w = np.exp(rng.uniform(np.log(1e-4), np.log(0.5), C))
        s_in = float(np.exp(rng.uniform(np.log(1e-3), np.log(0.2))))
        # two trials push the effective scale to the extreme-shift regime
        # (the regime the rsm overflow fix guards)
        s_out = (1e6 if trial < 2
                 else float(np.exp(rng.uniform(np.log(1e-3), np.log(0.5)))))
        zp_conv = int(rng.integers(-128, 128))
        rq = _requant_spec(s_in, s_w, s_out, zp_conv, True)
        abs_w_sum = rng.integers(1, 2048, C)
        bias_eff = rng.integers(-(1 << 15), 1 << 15, C).astype(np.int32)
        rq.bound = acc_bound(abs_w_sum, bias_eff)

        alpha = float(rng.uniform(0.05, 0.3))
        ratio = float(rng.uniform(0.4, 2.5))
        zp_leaky = int(rng.integers(-128, 128))
        qm_id, sh_id = quantize_multiplier(ratio)
        qm_al, sh_al = quantize_multiplier(ratio * alpha)
        sm = derive_single_multiply(qm_id, sh_id, qm_al, sh_al,
                                    zp_conv, zp_leaky)
        lk = LeakySpec(zp_in=zp_conv, zp_out=zp_leaky, s_id=ratio,
                       s_al=ratio * alpha, qm_id=qm_id, sh_id=sh_id,
                       qm_al=qm_al, sh_al=sh_al, exact=True, sm=sm)
        n_sm += sm is not None

        bounds_c = (128 * np.abs(abs_w_sum.astype(np.int64))
                    + np.abs(bias_eff.astype(np.int64)))
        accs = np.concatenate([
            np.arange(-600, 600),
            rng.integers(-rq.bound, rq.bound + 1, 2000),
            np.array([0, 1, -1, rq.bound, -rq.bound])]).astype(np.int64)
        acc4 = np.broadcast_to(accs[None, :, None, None],
                               (C, accs.size, 1, 1))
        acc4 = np.clip(acc4, -bounds_c[:, None, None, None],
                       bounds_c[:, None, None, None]).astype(np.int32)

        # staged general-limb reference
        p1, p2 = rq.operands()
        v = np.asarray(multiply_by_quantized_multiplier(
            jnp.asarray(acc4), np.asarray(p1).reshape(C, 1, 1, 1),
            np.asarray(p2).reshape(C, 1, 1, 1)))
        v = np.clip(v, -128 - zp_conv, 127 - zp_conv)
        lk_nosm = LeakySpec(zp_in=zp_conv, zp_out=zp_leaky, s_id=ratio,
                            s_al=ratio * alpha, qm_id=qm_id, sh_id=sh_id,
                            qm_al=qm_al, sh_al=sh_al, exact=True, sm=None)
        want = np.asarray(lk_nosm.apply_exact_i32(jnp.asarray(v)))

        # fused, bounded/sm forms as available
        fused = np.asarray(apply_requant_leaky(rq, lk, jnp.asarray(acc4),
                                               [p1, p2]))
        np.testing.assert_array_equal(fused, want,
                                      err_msg=f"trial {trial} (bounded)")
        # fused, reduced rsm form when it derives
        rq.derive_rsm(abs_w_sum, bias_eff)
        if rq.rsm is not None:
            n_rsm += 1
            fused_rsm = np.asarray(apply_requant_leaky(
                rq, lk, jnp.asarray(acc4),
                [jnp.asarray(a) for a in rq.operand_arrays()]))
            np.testing.assert_array_equal(fused_rsm, want,
                                          err_msg=f"trial {trial} (rsm)")
    # the reduced forms must actually engage for most realistic configs
    assert n_sm >= 8, f"single-multiply leaky derived only {n_sm}/14"
    assert n_rsm >= 8, f"rsm requant derived only {n_rsm}/14"


def test_derive_requant_rsm_extreme_shift_never_wrong():
    """Regression: very negative requant shifts (near-zero effective scales,
    reachable through arbitrary imported templates) make the collapsed
    single-floor exponent K = 31 - shift exceed int64 headroom for the
    run-boundary ``j << K`` — the derivation must either return bit-exact
    constants or None, never silently-wrong constants (the run math now
    uses python ints and every run endpoint is cross-checked against the
    int64 gemmlowp port)."""
    from yoloface_tpu.core.fixedpoint import (derive_requant_rsm,
                                              mbqm_numpy,
                                              quantize_multiplier)

    rng = np.random.default_rng(7)

    # sub-2**-31 multipliers underflow to qm == 0 — must fall back (None),
    # not divide by zero
    assert derive_requant_rsm(np.array([0], np.int64),
                              np.array([0], np.int64),
                              np.array([1000], np.int64), 120, 135) is None

    checked = 0
    for real in (1e-9, 3e-10, 2.4e-8, 6e-10, 1.1e-9):
        qm, shift = quantize_multiplier(real)
        assert shift <= -24       # the overflowing regime pre-fix
        bounds = np.array([int(rng.integers(1 << 10, 1 << 19))], np.int64)
        zp = int(rng.integers(-100, 100))
        sat_pos, sat_neg = 127 - zp, 128 + zp
        rsm = derive_requant_rsm(np.array([qm], np.int64),
                                 np.array([shift], np.int64),
                                 bounds, sat_pos, sat_neg)
        if rsm is None:
            continue              # honest fallback is acceptable
        checked += 1
        k1, k2, m1, m2, c_p, c_n, a_p, a_n = rsm
        a = np.arange(0, int(bounds[0]) + 1, dtype=np.int64)
        for neg, satmag, cc, A in ((False, sat_pos, c_p[0], a_p[0]),
                                   (True, sat_neg, c_n[0], a_n[0])):
            truth = np.minimum(
                np.abs(mbqm_numpy(-a if neg else a, qm, shift)), satmag)
            ac = np.minimum(a, int(A))
            got = (ac * int(m2[0]) + ((ac * int(m1[0])) >> k1)
                   + int(cc)) >> k2
            np.testing.assert_array_equal(
                got, truth, err_msg=f"real={real} neg={neg}")
    # at these scales the whole domain maps to magnitude 0 or 1 — the
    # reduced form should derive trivially, so require it actually did
    assert checked >= 3, f"only {checked}/5 extreme-shift configs derived"

"""Engine-bit-exact QAT: the fake-quant forward IS the deployed engine.

The STE simulation in :mod:`yoloface_tpu.quantize.qat` tracks the
deployed ``Int8Engine`` to ~1 int8 step (its float single-rounding vs
the engine's gemmlowp double rounding).  This module closes the gap to
ZERO: forward activations are the exact integer codes the engine
computes (TFLite ``reference_integer_ops`` semantics, the same
arithmetic ``ops/int8_ref.py`` implements for ``mode='exact'``), while
gradients flow through a differentiable float twin via per-op value
substitution

    y = y_sim + stop_gradient(y_exact - y_sim)

so ``y``'s VALUE is bit-exact and ``dy/dw`` is the float-twin STE
gradient evaluated at the true integer activations.

The whole quantization grid is FROZEN from an already-built int8 graph
(``calibrate.build_int8_graph`` output or an imported .tflite): the
activation qparams, the per-channel weight scales, and therefore every
fixed-point multiplier (qm, shift) are static python constants.  The
trainable leaves are float weights/biases initialized by dequantizing
the graph's integer constants ({op_index: (w, b)}, the weight-space QAT
convention of ``qat.make_qat_step_weights``).  Re-snapping the trained
floats onto the frozen grid (``deploy``) yields a graph whose
``Int8Engine`` output equals the QAT forward bit for bit — what the
training loss saw is literally what deploys.

TPU notes: the convolution runs ONCE per op in f32 on integer-valued
operands (every partial sum is an integer < 2**24, hence exactly
representable — asserted against the graph's real integer weights at
plan time), and both the exact fixed-point epilogue and the float twin
read that accumulator; f32 convs hit the MXU.  Reference capability:
the PTQ flow of ``yoloface/tflite/tflite_quantize.py`` (the reference
stops at PTQ; QAT is the beyond-parity step, now with a deployment-grid
-exact forward).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from yoloface_tpu.core.fixedpoint import (multiply_by_quantized_multiplier,
                                          quantize_multiplier,
                                          quantize_multiplier_arr)
from yoloface_tpu.graph.ir import GraphDef
from yoloface_tpu.ops import int8_ref as ops

INT8_MIN, INT8_MAX = -128, 127
_ACC_LIMIT = float(1 << 24)   # f32 integer-exactness bound


def _ste(exact, sim):
    """Value = ``exact`` (bit-true codes), gradient = d(sim)."""
    return sim + lax.stop_gradient(exact.astype(sim.dtype) - sim)


def _round_ste(x):
    """Round to nearest-even (numpy/jnp.round — the grid
    ``calibrate.quantize_weights_per_channel`` snaps to) with an
    identity backward."""
    return x + lax.stop_gradient(jnp.round(x) - x)


# --------------------------------------------------------------------------
# trainable leaves
# --------------------------------------------------------------------------
def init_float_weights(g: GraphDef) -> Dict[int, Tuple[np.ndarray,
                                                       np.ndarray]]:
    """{conv_op_index: (w_f32, b_f32)} — the dequantized integer
    constants of a built int8 graph; the QAT trainable leaves."""
    out = {}
    for op in g.ops:
        if op.opname not in ("CONV_2D", "DEPTHWISE_CONV_2D"):
            continue
        w_t, b_t = g.tensor(op.inputs[1]), g.tensor(op.inputs[2])
        in_q = g.tensor(op.inputs[0]).qparams
        axis = w_t.qparams.quantized_dimension
        s_w = np.asarray(w_t.qparams.scales, np.float64)
        shape = [1] * w_t.data.ndim
        shape[axis] = -1
        w_f = (w_t.data.astype(np.float64) * s_w.reshape(shape))
        b_f = (b_t.data.astype(np.float64) * (in_q.scale * s_w))
        out[op.index] = (w_f.astype(np.float32), b_f.astype(np.float32))
    return out


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------
def _conv_static(g: GraphDef, op) -> dict:
    """Frozen per-op constants for a conv/dw op (engine-exact lowering,
    mirrors Int8Engine._lower_op CONV_2D branch)."""
    t = g.tensor
    w_t = t(op.inputs[1])
    in_q = t(op.inputs[0]).qparams
    out_q = t(op.outputs[0]).qparams
    s_in = np.float64(in_q.scale)
    s_w = np.asarray(w_t.qparams.scales, np.float64)
    s_out = np.float64(out_q.scale)
    qm, shift = quantize_multiplier_arr(s_in * s_w / s_out)
    # f32-exactness bound on the integer accumulator, from the REAL
    # integer constants (worst case |acc| = 127 * sum|w| + |bias'|)
    b_t = t(op.inputs[2])
    axes = tuple(i for i in range(w_t.data.ndim)
                 if i != w_t.qparams.quantized_dimension)
    wsum = np.abs(w_t.data.astype(np.int64)).sum(axis=axes)
    zp_corr = w_t.data.astype(np.int64).sum(axis=axes) * int(
        in_q.zero_point)
    worst = 127 * wsum + np.abs(b_t.data.astype(np.int64) - zp_corr)
    if worst.max() >= _ACC_LIMIT:
        raise ValueError(
            f"op {op.index}: int accumulator can reach {worst.max()} "
            f">= 2**24; the single-f32-conv formulation would lose bits")
    return dict(
        s_in=s_in, s_w=s_w, s_out=s_out,
        in_zp=int(in_q.zero_point), out_zp=int(out_q.zero_point),
        qm=qm, shift=shift,
        stride=(op.attrs["stride_h"], op.attrs["stride_w"]),
        padding=op.attrs["padding"],
        dw=op.opname == "DEPTHWISE_CONV_2D",
    )


def _conv_codes(x_codes, w_f, b_f, st: dict):
    """One conv/dw on integer-valued f32 codes: exact bits via the
    fixed-point epilogue on the (integer-exact) f32 accumulator,
    gradient via the float-scale twin."""
    axis = 3 if st["dw"] else 0
    s_w = st["s_w"].astype(np.float32).reshape(
        [-1 if i == axis else 1 for i in range(4)])
    w_codes = jnp.clip(_round_ste(w_f / s_w), -127, 127)
    b_scale = (st["s_in"] * st["s_w"]).astype(np.float32)
    b_codes = _round_ste(b_f / b_scale)

    kh, kw = w_codes.shape[1], w_codes.shape[2]
    if st["padding"] == "SAME":
        ph = ops._same_pad_amounts(x_codes.shape[1], st["stride"][0], kh)
        pw = ops._same_pad_amounts(x_codes.shape[2], st["stride"][1], kw)
        x_codes = jnp.pad(x_codes, ((0, 0), ph, pw, (0, 0)),
                          constant_values=np.float32(st["in_zp"]))
    xc = x_codes - np.float32(st["in_zp"])
    # HIGHEST precision: on TPU the default f32 conv runs bf16 passes on
    # the MXU, which would break the integer-exactness of the accumulator
    if st["dw"]:
        c = w_codes.shape[3]
        rhs = jnp.transpose(w_codes, (1, 2, 0, 3))      # [Kh,Kw,1,C]
        acc = lax.conv_general_dilated(
            xc, rhs, window_strides=st["stride"], padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c, precision=lax.Precision.HIGHEST)
    else:
        acc = lax.conv_general_dilated(
            xc, w_codes, window_strides=st["stride"], padding="VALID",
            dimension_numbers=("NHWC", "OHWI", "NHWC"),
            precision=lax.Precision.HIGHEST)
    acc = acc + b_codes.reshape(1, 1, 1, -1)

    # exact epilogue on the integer accumulator (value path)
    acc_i32 = lax.stop_gradient(acc).astype(jnp.int32)
    y_exact = multiply_by_quantized_multiplier(
        acc_i32, jnp.asarray(st["qm"]), jnp.asarray(st["shift"])
    ) + jnp.int32(st["out_zp"])
    y_exact = jnp.clip(y_exact, INT8_MIN, INT8_MAX)

    # float twin (gradient path)
    scale = (st["s_in"] * st["s_w"] / st["s_out"]).astype(np.float32)
    y_sim = jnp.clip(acc * scale.reshape(1, 1, 1, -1)
                     + np.float32(st["out_zp"]), INT8_MIN, INT8_MAX)
    return _ste(y_exact, y_sim)


def build_bitexact_forward(g: GraphDef):
    """-> fwd(weights, x8) computing the template's output CODES (f32
    holding the engine's exact int8 values) with gradients to the float
    ``weights`` leaves ({op_index: (w, b)}, see init_float_weights)."""
    t = g.tensor
    plan = []
    for op in g.ops:
        name, out_idx = op.opname, op.outputs[0]
        if name in ("CONV_2D", "DEPTHWISE_CONV_2D"):
            st = _conv_static(g, op)
            plan.append(("conv", op.index, op.inputs[0], out_idx, st))
        elif name == "LEAKY_RELU":
            in_q = t(op.inputs[0]).qparams
            out_q = t(out_idx).qparams
            alpha = np.float64(op.attrs["alpha"])
            ratio = np.float64(in_q.scale) / np.float64(out_q.scale)
            qm_id, sh_id = quantize_multiplier(ratio)
            qm_al, sh_al = quantize_multiplier(ratio * alpha)
            st = dict(in_zp=in_q.zero_point, out_zp=out_q.zero_point,
                      qm_id=qm_id, sh_id=sh_id, qm_al=qm_al, sh_al=sh_al,
                      ratio=np.float32(ratio),
                      ratio_al=np.float32(ratio * alpha))
            plan.append(("leaky", None, op.inputs[0], out_idx, st))
        elif name == "MAX_POOL_2D":
            st = dict(filter_hw=(op.attrs["filter_h"],
                                 op.attrs["filter_w"]),
                      stride=(op.attrs["stride_h"], op.attrs["stride_w"]),
                      padding=op.attrs["padding"])
            plan.append(("maxpool", None, op.inputs[0], out_idx, st))
        elif name == "PAD":
            paddings = t(op.inputs[1]).data.astype(np.int64)
            zp = t(out_idx).qparams.zero_point
            plan.append(("pad", None, op.inputs[0], out_idx,
                         dict(paddings=paddings, zp=zp)))
        elif name == "ADD":
            q1, q2 = t(op.inputs[0]).qparams, t(op.inputs[1]).qparams
            qo = t(out_idx).qparams
            s1, s2, so = (np.float64(q1.scale), np.float64(q2.scale),
                          np.float64(qo.scale))
            left_shift = 20
            twice_max = 2.0 * max(s1, s2)
            qm1, sh1 = quantize_multiplier(s1 / twice_max)
            qm2, sh2 = quantize_multiplier(s2 / twice_max)
            qmo, sho = quantize_multiplier(
                twice_max / ((1 << left_shift) * so))
            st = dict(zp1=q1.zero_point, zp2=q2.zero_point,
                      zp_out=qo.zero_point, qm1=qm1, shift1=sh1,
                      qm2=qm2, shift2=sh2, qm_out=qmo, shift_out=sho,
                      left_shift=left_shift,
                      f1=np.float32(s1 / so), f2=np.float32(s2 / so))
            plan.append(("add", None, tuple(op.inputs), out_idx, st))
        elif name == "QUANTIZE":
            in_q, out_q = t(op.inputs[0]).qparams, t(out_idx).qparams
            ratio = np.float64(in_q.scale) / np.float64(out_q.scale)
            qm, sh = quantize_multiplier(ratio)
            st = dict(in_zp=in_q.zero_point, out_zp=out_q.zero_point,
                      qm=qm, sh=sh, ratio=np.float32(ratio))
            plan.append(("quant", None, op.inputs[0], out_idx, st))
        elif name == "CONCATENATION":
            plan.append(("concat", None, tuple(op.inputs), out_idx,
                         dict(axis=op.attrs["axis"])))
        else:
            raise NotImplementedError(
                f"bit-exact QAT: op {name} not supported")

    def fwd(weights, x8):
        env = {g.inputs[0]: x8.astype(jnp.float32)}
        for kind, op_idx, in_idx, out_idx, st in plan:
            if kind == "conv":
                w_f, b_f = weights[op_idx]
                env[out_idx] = _conv_codes(env[in_idx], w_f, b_f, st)
            elif kind == "leaky":
                x = env[in_idx]
                v = lax.stop_gradient(x).astype(jnp.int32) - jnp.int32(
                    st["in_zp"])
                neg = v < 0
                qm = jnp.where(neg, jnp.int32(st["qm_al"]),
                               jnp.int32(st["qm_id"]))
                sh = jnp.where(neg, jnp.int32(st["sh_al"]),
                               jnp.int32(st["sh_id"]))
                y_exact = jnp.clip(
                    multiply_by_quantized_multiplier(v, qm, sh)
                    + jnp.int32(st["out_zp"]), INT8_MIN, INT8_MAX)
                vf = x - np.float32(st["in_zp"])
                y_sim = jnp.clip(
                    jnp.where(vf < 0, vf * st["ratio_al"],
                              vf * st["ratio"])
                    + np.float32(st["out_zp"]), INT8_MIN, INT8_MAX)
                env[out_idx] = _ste(y_exact, y_sim)
            elif kind == "maxpool":
                # max of integer codes is exact in f32 — no twin needed
                x = env[in_idx]
                if st["padding"] == "SAME":
                    ph = ops._same_pad_amounts(
                        x.shape[1], st["stride"][0], st["filter_hw"][0])
                    pw = ops._same_pad_amounts(
                        x.shape[2], st["stride"][1], st["filter_hw"][1])
                    pads = [(0, 0), ph, pw, (0, 0)]
                else:
                    pads = [(0, 0)] * 4
                # -inf init (not -128) selects the differentiable
                # reduce_window_max lowering; padded lanes never win the
                # max either way (every window holds a real value >= -128)
                env[out_idx] = lax.reduce_window(
                    x, -jnp.inf, lax.max,
                    window_dimensions=(1,) + st["filter_hw"] + (1,),
                    window_strides=(1,) + st["stride"] + (1,),
                    padding=pads)
            elif kind == "pad":
                env[out_idx] = jnp.pad(
                    env[in_idx],
                    [(int(lo), int(hi)) for lo, hi in st["paddings"]],
                    constant_values=np.float32(st["zp"]))
            elif kind == "add":
                a, b = env[in_idx[0]], env[in_idx[1]]
                y_exact = ops.add_int8(
                    lax.stop_gradient(a).astype(jnp.int8),
                    lax.stop_gradient(b).astype(jnp.int8),
                    zp1=st["zp1"], zp2=st["zp2"], zp_out=st["zp_out"],
                    qm1=st["qm1"], shift1=st["shift1"],
                    qm2=st["qm2"], shift2=st["shift2"],
                    qm_out=st["qm_out"], shift_out=st["shift_out"],
                    left_shift=st["left_shift"]).astype(jnp.int32)
                y_sim = jnp.clip(
                    (a - np.float32(st["zp1"])) * st["f1"]
                    + (b - np.float32(st["zp2"])) * st["f2"]
                    + np.float32(st["zp_out"]), INT8_MIN, INT8_MAX)
                env[out_idx] = _ste(y_exact, y_sim)
            elif kind == "quant":
                x = env[in_idx]
                v = lax.stop_gradient(x).astype(jnp.int32) - jnp.int32(
                    st["in_zp"])
                y_exact = jnp.clip(
                    multiply_by_quantized_multiplier(
                        v, jnp.int32(st["qm"]), jnp.int32(st["sh"]))
                    + jnp.int32(st["out_zp"]), INT8_MIN, INT8_MAX)
                y_sim = jnp.clip(
                    (x - np.float32(st["in_zp"])) * st["ratio"]
                    + np.float32(st["out_zp"]), INT8_MIN, INT8_MAX)
                env[out_idx] = _ste(y_exact, y_sim)
            elif kind == "concat":
                env[out_idx] = jnp.concatenate(
                    [env[i] for i in in_idx], axis=st["axis"])
        outs = [env[o] for o in g.outputs]
        return outs[0] if len(outs) == 1 else tuple(outs)

    return fwd


# --------------------------------------------------------------------------
# training step + deployment
# --------------------------------------------------------------------------
def make_bitexact_step(g: GraphDef, loss_fn, *, lr: float = 2e-4):
    """(step, init_opt, fwd): jitted fine-tune step on the frozen grid.

    ``loss_fn(y_dequant, targets)`` sees the engine-exact output in the
    float domain; step(weights, opt_state, x8, targets) -> (weights',
    opt_state', loss)."""
    fwd = build_bitexact_forward(g)
    out_q = g.tensor(g.outputs[0]).qparams
    tx = optax.adam(lr)

    def loss_of(weights, x8, targets):
        codes = fwd(weights, x8)
        y = (codes - np.float32(out_q.zero_point)) * np.float32(out_q.scale)
        return loss_fn(y, targets)

    @jax.jit
    def step(weights, opt_state, x8, targets):
        loss, grads = jax.value_and_grad(loss_of)(weights, x8, targets)
        updates, opt_state = tx.update(grads, opt_state, weights)
        return optax.apply_updates(weights, updates), opt_state, loss

    def init_opt(weights):
        return tx.init(jax.tree.map(jnp.asarray, weights))

    return step, init_opt, fwd


def deploy(g: GraphDef, weights) -> GraphDef:
    """Re-snap trained float weights onto the frozen grid: a new
    GraphDef with the same qparams and updated integer constants.  By
    construction ``Int8Engine(deploy(g, w), mode='exact')(x8)`` equals
    the bit-exact QAT forward codes."""
    import copy
    g2 = copy.deepcopy(g)
    for op in g2.ops:
        if op.index not in weights:
            continue
        w_f, b_f = (np.asarray(weights[op.index][0], np.float64),
                    np.asarray(weights[op.index][1], np.float64))
        w_t, b_t = g2.tensor(op.inputs[1]), g2.tensor(op.inputs[2])
        in_q = g2.tensor(op.inputs[0]).qparams
        axis = w_t.qparams.quantized_dimension
        s_w = np.asarray(w_t.qparams.scales, np.float64)
        shape = [1] * w_f.ndim
        shape[axis] = -1
        w_t.data = np.clip(np.round(w_f / s_w.reshape(shape)),
                           -127, 127).astype(np.int8)
        b_t.data = np.round(b_f / (in_q.scale * s_w)).astype(np.int32)
    return g2

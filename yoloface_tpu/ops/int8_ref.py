"""Quantized int8 operators with bit-exact TFLite builtin-kernel semantics.

These are the XLA-level implementations of every op in the yoloface int8
graph (the TPU-native re-design of the kernels that live in the reference's
binary runtime library — ``forward_conv2d_integer_SSSA_ch``,
``forward_mp_integer_INT8``, ``forward_eltwise_integer_INT8``,
``forward_concat``; see headers under
``/root/reference/stm32/Middlewares/ST/AI/Inc/layers_*.h``).

Design notes (TPU-first):
  * Convolutions run with int8 operands and ``preferred_element_type=int32``
    so XLA can use the MXU's native int8 path; the input zero-point term is
    folded into the bias (exact, since TFLite SAME padding is equivalent to
    padding with the input zero-point and subtracting it everywhere).
  * Requantization uses :mod:`yoloface_tpu.core.fixedpoint` — exact gemmlowp
    arithmetic in 32-bit lanes, fully fusable elementwise VPU code.
  * Everything is batched over a leading N dimension and shape-static, so a
    single jit covers any batch size per compilation.
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from yoloface_tpu.core.fixedpoint import multiply_by_quantized_multiplier

INT8_MIN, INT8_MAX = -128, 127

# Layout geometry for the 4-D activation ops.  "NHWC" is the TFLite
# reference layout; "WHCN" ([W,H,C,N]) is the framework's TPU activation
# layout (C on sublanes, batch on lanes).  Running the XLA twin natively
# in WHCN removes the boundary relayouts of hybrid tiled routing, which
# (a) dominate the hybrid's cost on 448-scale planes and (b) trip a
# hardware-only XLA miscompile when an int8 conv consumes a fused
# transpose-from-batch-minor (measured on v5e; tools/debug448_fix*.py).
# The integer conv/pool math and the elementwise requantization are
# layout-invariant, so both layouts produce bit-identical tensors.
_LAYOUTS = {
    "NHWC": dict(conv_dn=("NHWC", "OHWI", "NHWC"),
                 dw_dn=("NHWC", "HWIO", "NHWC"), h=1, w=2, c=3),
    "WHCN": dict(conv_dn=("WHCN", "OHWI", "WHCN"),
                 dw_dn=("WHCN", "HWIO", "WHCN"), h=1, w=0, c=2),
}


def _conv_acc(x, weights: np.ndarray, stride: Tuple[int, int], L,
              layout: str):
    """int32 conv accumulator on raw int8 operands (padding pre-applied).

    WHCN 1x1 stride-1 convs lower through ``lax.dot_general`` contracting
    the C axis instead of ``conv_general_dilated``: on real v5e hardware
    an int8 WHCN conv_general_dilated placed DOWNSTREAM of a Pallas custom
    call in the same program is miscompiled (~70% of output elements
    wrong — tools/debug448_obs.py, first bad tensor t78 = the 448 hybrid
    suffix's first 1x1 conv; 3x3 convs, depthwise convs and pools are
    bit-exact in the same composition, as are 1x1 convs UPSTREAM of the
    Pallas call: tools/debug448_fix.py / debug448_fix2.py).  The
    dot_general-contracting-C form with the int32-accumulator transpose
    was measured bit-exact in that composition (debug448_fix.py 'whcn').
    Bit-identical by construction — the same integer products feed an
    exact int32 sum either way.  Env YOLOFACE_TPU_WHCN_CGD1X1=1 restores
    conv_general_dilated for A/B hardware debugging.

    The v1 fast-bits WHCN program additionally needs per-op
    optimization_barrier wrapping (runtime/engine.py) — in ITS fusion
    shapes the dot_general form is miscompiled even with no pallas_call
    in the program, while conv_general is fine there but still wrong
    downstream of a pallas_call (tools/debug448_whcn2.py /
    debug448_v1ctx.py matrix).  With the barriers the default dot_general
    path is hardware-bit-exact in every measured composition; the
    CGD1X1=1 A/B knob remains NOT safe downstream of a pallas_call."""
    kh, kw = weights.shape[1], weights.shape[2]
    if (layout == "WHCN" and kh == 1 and kw == 1
            and tuple(stride) == (1, 1)
            and os.environ.get("YOLOFACE_TPU_WHCN_CGD1X1") != "1"):
        co, ci = weights.shape[0], weights.shape[3]
        w2 = jnp.asarray(np.ascontiguousarray(weights.reshape(co, ci)))
        acc = lax.dot_general(x, w2, (((2,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
        return jnp.transpose(acc, (0, 1, 3, 2))   # [W,H,N,Co]->[W,H,Co,N]
    return lax.conv_general_dilated(
        x, jnp.asarray(weights), window_strides=stride, padding="VALID",
        dimension_numbers=L["conv_dn"], preferred_element_type=jnp.int32)


def _per_channel(v, c_axis: int):
    """Broadcast-shape a per-channel [Co] constant for a 4-D activation."""
    shape = [1, 1, 1, 1]
    shape[c_axis] = -1
    return jnp.asarray(v).reshape(shape)


def _spatial_pad_cfg(ph, pw, h_axis: int, w_axis: int):
    cfg = [(0, 0, 0)] * 4
    cfg[h_axis] = (int(ph[0]), int(ph[1]), 0)
    cfg[w_axis] = (int(pw[0]), int(pw[1]), 0)
    return cfg


def _clamp_to_int8(x):
    return jnp.clip(x, INT8_MIN, INT8_MAX).astype(jnp.int8)


def _same_pad_amounts(in_size: int, stride: int, filt: int) -> Tuple[int, int]:
    """TFLite/TF 'SAME' padding: floor-before, remainder-after."""
    out_size = -(-in_size // stride)
    total = max((out_size - 1) * stride + filt - in_size, 0)
    before = total // 2
    return before, total - before


def pad_int8(x, paddings: np.ndarray, pad_value: int):
    """TFLite PAD on a quantized tensor: pads with the tensor's zero-point."""
    cfg = [(int(lo), int(hi), 0) for lo, hi in paddings]
    return lax.pad(x, jnp.int8(pad_value), cfg)


def conv2d_int8(
    x,                       # int8 [N,H,W,Ci]
    weights: np.ndarray,     # int8 [Co,Kh,Kw,Ci]  (TFLite OHWI layout)
    bias: np.ndarray,        # int32 [Co]
    *,
    input_zp: int,
    output_zp: int,
    qm: np.ndarray,          # int32 [Co] per-channel quantized multiplier
    shift: np.ndarray,       # int32 [Co]
    stride: Tuple[int, int],
    padding: str,            # "SAME" | "VALID"
    act_min: int = INT8_MIN,
    act_max: int = INT8_MAX,
    layout: str = "NHWC",
):
    """TFLite ``reference_integer_ops::ConvPerChannel``, bit-exact.

    acc = sum_taps (x - input_zp) * w + bias
        = conv(pad(x, input_zp), w) - input_zp * sum_taps(w) + bias
    so the zero-point correction folds into a per-channel bias constant and
    the conv itself runs on raw int8 operands (MXU int8 path).
    """
    L = _LAYOUTS[layout]
    kh, kw = weights.shape[1], weights.shape[2]
    if padding == "SAME":
        ph = _same_pad_amounts(x.shape[L["h"]], stride[0], kh)
        pw = _same_pad_amounts(x.shape[L["w"]], stride[1], kw)
        x = lax.pad(x, jnp.int8(input_zp),
                    _spatial_pad_cfg(ph, pw, L["h"], L["w"]))
    acc = _conv_acc(x, weights, stride, L, layout)
    zp_correction = (weights.astype(np.int64).sum(axis=(1, 2, 3))
                     * int(input_zp)).astype(np.int32)
    acc = acc + _per_channel(np.asarray(bias - zp_correction, np.int32),
                             L["c"])
    out = multiply_by_quantized_multiplier(
        acc, _per_channel(qm, L["c"]),
        _per_channel(shift, L["c"])) + jnp.int32(output_zp)
    return jnp.clip(out, act_min, act_max).astype(jnp.int8)


def depthwise_conv2d_int8(
    x,                       # int8 [N,H,W,C]
    weights: np.ndarray,     # int8 [1,Kh,Kw,C]  (TFLite layout, multiplier 1)
    bias: np.ndarray,        # int32 [C]
    *,
    input_zp: int,
    output_zp: int,
    qm: np.ndarray,
    shift: np.ndarray,
    stride: Tuple[int, int],
    padding: str,
    act_min: int = INT8_MIN,
    act_max: int = INT8_MAX,
    layout: str = "NHWC",
):
    """TFLite ``reference_integer_ops::DepthwiseConvPerChannel``, bit-exact."""
    assert weights.shape[0] == 1, "depth_multiplier > 1 not needed by yoloface"
    L = _LAYOUTS[layout]
    c = weights.shape[3]
    kh, kw = weights.shape[1], weights.shape[2]
    if padding == "SAME":
        ph = _same_pad_amounts(x.shape[L["h"]], stride[0], kh)
        pw = _same_pad_amounts(x.shape[L["w"]], stride[1], kw)
        x = lax.pad(x, jnp.int8(input_zp),
                    _spatial_pad_cfg(ph, pw, L["h"], L["w"]))
    # lax depthwise: rhs HWIO with I=1, O=C, feature_group_count=C
    rhs = jnp.asarray(np.transpose(weights, (1, 2, 0, 3)))  # [Kh,Kw,1,C]
    acc = lax.conv_general_dilated(
        x, rhs, window_strides=stride, padding="VALID",
        dimension_numbers=L["dw_dn"],
        feature_group_count=c,
        preferred_element_type=jnp.int32,
    )
    zp_correction = (weights.astype(np.int64).sum(axis=(0, 1, 2))
                     * int(input_zp)).astype(np.int32)
    acc = acc + _per_channel(np.asarray(bias - zp_correction, np.int32),
                             L["c"])
    out = multiply_by_quantized_multiplier(
        acc, _per_channel(qm, L["c"]),
        _per_channel(shift, L["c"])) + jnp.int32(output_zp)
    return jnp.clip(out, act_min, act_max).astype(jnp.int8)


def leaky_relu_int8(
    x,
    *,
    input_zp: int,
    output_zp: int,
    qm_identity: int,
    shift_identity: int,
    qm_alpha: int,
    shift_alpha: int,
):
    """TFLite ``reference_ops::QuantizeLeakyRelu``, bit-exact.

    The reference MCU runtime folds this into each conv's 256-entry int8 LUT
    (``network.c:2900-2921``); on TPU the exact arithmetic is cheaper than a
    gather, and fuses into the surrounding elementwise code.
    """
    v = x.astype(jnp.int32) - jnp.int32(input_zp)
    # select (qm, shift) per element, then ONE fixed-point chain —
    # elementwise-identical to evaluating both branches, at half the cost
    neg_sel = v < 0
    qm = jnp.where(neg_sel, jnp.int32(qm_alpha), jnp.int32(qm_identity))
    sh = jnp.where(neg_sel, jnp.int32(shift_alpha),
                   jnp.int32(shift_identity))
    out = multiply_by_quantized_multiplier(v, qm, sh) + jnp.int32(output_zp)
    return _clamp_to_int8(out)


def maxpool_int8(x, *, filter_hw: Tuple[int, int], stride: Tuple[int, int],
                 padding: str, act_min: int = INT8_MIN,
                 act_max: int = INT8_MAX, layout: str = "NHWC"):
    """TFLite MAX_POOL_2D: padded lanes use -128 and thus never win the max,
    matching the clipped-window semantics of the reference kernel."""
    L = _LAYOUTS[layout]
    window = [1, 1, 1, 1]
    strides = [1, 1, 1, 1]
    window[L["h"]], window[L["w"]] = filter_hw[0], filter_hw[1]
    strides[L["h"]], strides[L["w"]] = stride[0], stride[1]
    pads = [(0, 0)] * 4
    if padding == "SAME":
        pads[L["h"]] = _same_pad_amounts(x.shape[L["h"]], stride[0],
                                         filter_hw[0])
        pads[L["w"]] = _same_pad_amounts(x.shape[L["w"]], stride[1],
                                         filter_hw[1])
    out = lax.reduce_window(
        x, jnp.int8(INT8_MIN), lax.max,
        window_dimensions=tuple(window),
        window_strides=tuple(strides),
        padding=pads,
    )
    return jnp.clip(out, act_min, act_max).astype(jnp.int8)


def add_int8(
    x1, x2,
    *,
    zp1: int, zp2: int, zp_out: int,
    qm1: int, shift1: int,
    qm2: int, shift2: int,
    qm_out: int, shift_out: int,
    left_shift: int = 20,
    act_min: int = INT8_MIN,
    act_max: int = INT8_MAX,
):
    """TFLite quantized ADD (int8): both inputs are rescaled to a shared
    (1 << left_shift)-amplified scale, summed, then requantized.  Matches
    the reference's ``forward_eltwise_integer_INT8``."""
    from yoloface_tpu.core.fixedpoint import (
        multiply_by_quantized_multiplier_bounded_preshift as _mbqm_pre)
    v1 = x1.astype(jnp.int32) - jnp.int32(zp1)
    v2 = x2.astype(jnp.int32) - jnp.int32(zp2)
    if shift1 <= 0 and shift2 <= 0:
        # |v_i| <= 255+|zp| < 2**10 and the rescale shifts are <= 0 (the
        # multipliers are s_i/(2*max) <= 0.5): the 2-multiply pre-shift
        # bounded MBQM applies, bit-exactly (property-tested vs the limb
        # composition) — ROADMAP r2 gap 6
        s1 = _mbqm_pre(v1, jnp.int32(qm1), jnp.int32(shift1), left_shift)
        s2 = _mbqm_pre(v2, jnp.int32(qm2), jnp.int32(shift2), left_shift)
    else:
        s1 = multiply_by_quantized_multiplier(
            v1 << left_shift, jnp.int32(qm1), jnp.int32(shift1))
        s2 = multiply_by_quantized_multiplier(
            v2 << left_shift, jnp.int32(qm2), jnp.int32(shift2))
    out = multiply_by_quantized_multiplier(
        s1 + s2, jnp.int32(qm_out), jnp.int32(shift_out)) + jnp.int32(zp_out)
    return jnp.clip(out, act_min, act_max).astype(jnp.int8)


def requantize_int8(x, *, input_zp: int, output_zp: int, qm: int, shift: int):
    """TFLite QUANTIZE int8->int8 (``reference_ops::Requantize``)."""
    v = x.astype(jnp.int32) - jnp.int32(input_zp)
    out = multiply_by_quantized_multiplier(
        v, jnp.int32(qm), jnp.int32(shift)) + jnp.int32(output_zp)
    return _clamp_to_int8(out)


def concat_int8(xs: Sequence, axis: int):
    """TFLite int8 CONCATENATION (inputs already share output scale/zp)."""
    return jnp.concatenate(xs, axis=axis)


def avgpool_int8(x, *, filter_hw: Tuple[int, int], stride: Tuple[int, int],
                 padding: str, act_min: int = INT8_MIN,
                 act_max: int = INT8_MAX, layout: str = "NHWC"):
    """TFLite AVERAGE_POOL_2D (int8): clipped-window integer mean with
    round-half-away-from-zero (``(sum +- count/2) / count`` in C semantics).
    Edge windows divide by the number of VALID taps only, so the divisor is
    a static per-position array."""
    L = _LAYOUTS[layout]
    h, w = x.shape[L["h"]], x.shape[L["w"]]
    fh, fw = filter_hw
    window = [1, 1, 1, 1]
    strides = [1, 1, 1, 1]
    window[L["h"]], window[L["w"]] = fh, fw
    strides[L["h"]], strides[L["w"]] = stride[0], stride[1]
    pads = [(0, 0)] * 4
    if padding == "SAME":
        pads[L["h"]] = _same_pad_amounts(h, stride[0], fh)
        pads[L["w"]] = _same_pad_amounts(w, stride[1], fw)
    ones_shape = [1, 1, 1, 1]
    ones_shape[L["h"]], ones_shape[L["w"]] = h, w
    acc = lax.reduce_window(
        x.astype(jnp.int32), jnp.int32(0), lax.add,
        window_dimensions=tuple(window),
        window_strides=tuple(strides), padding=pads)
    counts = lax.reduce_window(
        jnp.ones(ones_shape, jnp.int32), jnp.int32(0), lax.add,
        window_dimensions=tuple(window),
        window_strides=tuple(strides), padding=pads)
    half = counts // 2
    mean = jnp.where(acc >= 0, (acc + half) // counts,
                     -((-acc + half) // counts))
    return jnp.clip(mean, act_min, act_max).astype(jnp.int8)


def logistic_int8(x, *, input_scale: float, input_zp: int):
    """TFLite LOGISTIC (int8): fixed output quantization scale 1/256,
    zero-point -128; computed in float32 like the reference kernel."""
    v = (x.astype(jnp.float32) - input_zp) * input_scale
    y = 1.0 / (1.0 + jnp.exp(-v))
    return jnp.clip(jnp.round(y * 256.0) - 128, INT8_MIN,
                    INT8_MAX).astype(jnp.int8)


def relu_int8(x, *, zero_point: int):
    """TFLite RELU (int8): max(x, zp), same quantization in/out."""
    return jnp.maximum(x, jnp.int8(zero_point))


def relu6_int8(x, *, scale: float, zero_point: int):
    """TFLite RELU6 (int8): clamp to the quantized [0, 6] range."""
    lo = int(zero_point)
    hi = int(round(6.0 / scale) + zero_point)
    return jnp.clip(x, max(lo, INT8_MIN), min(hi, INT8_MAX)).astype(jnp.int8)


def reshape_int8(x, new_shape):
    """TFLite RESHAPE: batch-aware (leading dim preserved)."""
    return x.reshape((x.shape[0],) + tuple(int(d) for d in new_shape[1:]))


def fully_connected_int8(
    x,                      # int8 [N, K] (or [N, ..., K] flattened by caller)
    weights: np.ndarray,    # int8 [Co, K]
    bias,                   # int32 [Co] or None
    *,
    input_zp: int,
    output_zp: int,
    qm,                     # int32 scalar or [Co]
    shift,
    act_min: int = INT8_MIN,
    act_max: int = INT8_MAX,
):
    """TFLite ``reference_integer_ops::FullyConnected``, bit-exact: the 1x1
    conv math on a flat feature axis (per-tensor or per-channel weights)."""
    acc = lax.dot_general(x, jnp.asarray(weights),
                          (((x.ndim - 1,), (1,)), ((), ())),
                          preferred_element_type=jnp.int32)
    zp_corr = (weights.astype(np.int64).sum(axis=1)
               * int(input_zp)).astype(np.int32)
    b = (bias.astype(np.int32) if bias is not None
         else np.zeros(weights.shape[0], np.int32))
    acc = acc + jnp.asarray(b - zp_corr, jnp.int32)
    out = multiply_by_quantized_multiplier(
        acc, jnp.asarray(qm), jnp.asarray(shift)) + jnp.int32(output_zp)
    return jnp.clip(out, act_min, act_max).astype(jnp.int8)


def softmax_int8(x, *, input_scale: float, input_zp: int, beta: float = 1.0):
    """TFLite SOFTMAX (int8): fixed output scale 1/256, zero-point -128.

    Computed in float32 (stable shifted exp); the reference kernel's
    gemmlowp fixed-point approximation rounds to the same int8 values at
    the coarse 1/256 output scale (bit-equality fuzzed over random inputs
    in tests/test_extended_ops.py)."""
    v = (x.astype(jnp.float32) - input_zp) * (input_scale * beta)
    v = v - jnp.max(v, axis=-1, keepdims=True)
    e = jnp.exp(v)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    return jnp.clip(jnp.round(p * 256.0) - 128, INT8_MIN,
                    INT8_MAX).astype(jnp.int8)


def resize_nearest_int8(x, *, out_hw: Tuple[int, int], layout: str = "NHWC"):
    """TFLite RESIZE_NEAREST_NEIGHBOR (int8, align_corners=False,
    half_pixel_centers=False) for integer upscale factors: pure pixel
    replication (``floor(i * in/out)`` == ``i // factor``), the darknet
    ``upsample`` layer's semantics (yolo_to_h5.py upsample handling).
    Quantization passes through unchanged (TFLite keeps in/out params
    equal for nearest resize)."""
    L = _LAYOUTS[layout]
    h, w = x.shape[L["h"]], x.shape[L["w"]]
    oh, ow = out_hw
    if oh % h or ow % w:
        raise NotImplementedError(
            f"resize_nearest_int8: non-integer scale {h}x{w} -> {oh}x{ow}")
    return jnp.repeat(jnp.repeat(x, oh // h, axis=L["h"]), ow // w,
                      axis=L["w"])

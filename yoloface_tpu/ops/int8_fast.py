"""Fast int8 operators: float32 requantization (production/serving mode).

Same int8 graph semantics as :mod:`yoloface_tpu.ops.int8_ref` but the int32
accumulator → int8 requantization uses one float32 multiply + round instead
of exact gemmlowp double rounding (~15 VPU ops saved per element; measured
~2x on the whole network).  XNNPACK makes the same trade on x86/ARM.

Divergence from the exact engine is the same class as TFLite's own
optimized-vs-reference backend divergence (which flips detection counts on
3/24 calibration images by itself): rounding-step differences compound
through the graph's >1 requant scale ratios, shifting confidences by ~0.1
near the threshold.  Bounds are enforced by tests/test_fast_mode.py.  Use
mode="exact" where bit parity matters.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from yoloface_tpu.ops.int8_ref import (INT8_MAX, INT8_MIN, _LAYOUTS,
                                       _conv_acc,
                                       _per_channel, _same_pad_amounts,
                                       _spatial_pad_cfg, concat_int8,
                                       maxpool_int8, pad_int8)

__all__ = [
    "conv2d_int8_fast", "depthwise_conv2d_int8_fast", "leaky_relu_int8_fast",
    "add_int8_fast", "requantize_int8_fast", "concat_int8", "maxpool_int8",
    "pad_int8",
]


def _requant_f32(acc_i32, scale, zero_point, act_min, act_max):
    v = jnp.round(acc_i32.astype(jnp.float32) * scale) + zero_point
    return jnp.clip(v, act_min, act_max).astype(jnp.int8)


def conv2d_int8_fast(x, weights, bias, *, input_zp, output_zp, scale,
                     stride, padding, act_min=INT8_MIN, act_max=INT8_MAX,
                     layout="NHWC"):
    """Per-channel int8 conv with float requant; ``scale`` is float32 [Co]
    = s_in * s_w[c] / s_out."""
    L = _LAYOUTS[layout]
    kh, kw = weights.shape[1], weights.shape[2]
    if padding == "SAME":
        ph = _same_pad_amounts(x.shape[L["h"]], stride[0], kh)
        pw = _same_pad_amounts(x.shape[L["w"]], stride[1], kw)
        x = lax.pad(x, jnp.int8(input_zp),
                    _spatial_pad_cfg(ph, pw, L["h"], L["w"]))
    acc = _conv_acc(x, weights, stride, L, layout)
    zp_corr = (weights.astype(np.int64).sum(axis=(1, 2, 3))
               * int(input_zp)).astype(np.int32)
    acc = acc + _per_channel(np.asarray(bias - zp_corr, np.int32), L["c"])
    return _requant_f32(acc,
                        _per_channel(np.asarray(scale, np.float32), L["c"]),
                        output_zp, act_min, act_max)


def depthwise_conv2d_int8_fast(x, weights, bias, *, input_zp, output_zp,
                               scale, stride, padding,
                               act_min=INT8_MIN, act_max=INT8_MAX,
                               layout="NHWC"):
    L = _LAYOUTS[layout]
    c = weights.shape[3]
    kh, kw = weights.shape[1], weights.shape[2]
    if padding == "SAME":
        ph = _same_pad_amounts(x.shape[L["h"]], stride[0], kh)
        pw = _same_pad_amounts(x.shape[L["w"]], stride[1], kw)
        x = lax.pad(x, jnp.int8(input_zp),
                    _spatial_pad_cfg(ph, pw, L["h"], L["w"]))
    rhs = jnp.asarray(np.transpose(weights, (1, 2, 0, 3)))
    acc = lax.conv_general_dilated(
        x, rhs, window_strides=stride, padding="VALID",
        dimension_numbers=L["dw_dn"], feature_group_count=c,
        preferred_element_type=jnp.int32)
    zp_corr = (weights.astype(np.int64).sum(axis=(0, 1, 2))
               * int(input_zp)).astype(np.int32)
    acc = acc + _per_channel(np.asarray(bias - zp_corr, np.int32), L["c"])
    return _requant_f32(acc,
                        _per_channel(np.asarray(scale, np.float32), L["c"]),
                        output_zp, act_min, act_max)


def leaky_relu_int8_fast(x, *, input_zp, output_zp, scale_identity,
                         scale_alpha):
    v = x.astype(jnp.int32) - jnp.int32(input_zp)
    vf = v.astype(jnp.float32)
    out = jnp.round(jnp.where(v >= 0, vf * scale_identity, vf * scale_alpha))
    return jnp.clip(out + output_zp, INT8_MIN, INT8_MAX).astype(jnp.int8)


def add_int8_fast(x1, x2, *, zp1, zp2, zp_out, scale1, scale2):
    """scale_i = s_i / s_out."""
    v = ((x1.astype(jnp.int32) - zp1).astype(jnp.float32) * scale1
         + (x2.astype(jnp.int32) - zp2).astype(jnp.float32) * scale2)
    return jnp.clip(jnp.round(v) + zp_out, INT8_MIN, INT8_MAX).astype(jnp.int8)


def requantize_int8_fast(x, *, input_zp, output_zp, scale):
    v = (x.astype(jnp.int32) - input_zp).astype(jnp.float32) * scale
    return jnp.clip(jnp.round(v) + output_zp, INT8_MIN, INT8_MAX).astype(jnp.int8)

"""Fast-bits-v2 operators: ONE rounding across a fused conv+LeakyReLU pair.

The reference's generated runtime applies conv requantization and
LeakyReLU in a single int8 quantization step — the 256-entry LUT epilogue
(`stm32/X-CUBE-AI/App/network.c:2900-2921`) maps the conv-scale int8 grid
to the leaky-output grid with one table lookup, i.e. one rounding, not
two.  The framework's "fast" twin (``ops/int8_fast.py``) rounds twice
(conv requant, then leaky requant); these v2 semantics round once:

    t   = acc_i32 * (s_in*s_w[c]/s_conv)          -- f32, unrounded
    t   = clamp(t, -128-zp_conv, 127-zp_conv)     -- conv saturation, f32
    out = round(t * (s_conv/s_leaky_out) * (1|alpha)) + zp_leaky_out

Divergence from "fast" is at most the one elided intermediate rounding
(<= 0.5 conv-grid step before the leaky scale ratio); detection-level
bounds are pinned by tests/test_fast_mode.py-style corpus checks.  The
Pallas arena epilogue (``kernels/pallas_int8.apply_requant_leaky`` with
``requant.v2``) implements the identical elementwise float ops, so the
``fast2`` XLA twin and the ``pallas_mxu2`` arena mode are bit-identical.

Everything except fused conv+leaky pairs (standalone convs, ADD,
QUANTIZE, pools, concat) is exactly the "fast" semantics.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from yoloface_tpu.ops.int8_ref import (INT8_MAX, INT8_MIN, _LAYOUTS,
                                       _conv_acc,
                                       _per_channel, _same_pad_amounts,
                                       _spatial_pad_cfg)

__all__ = ["conv2d_leaky_int8_fast2", "depthwise_conv2d_leaky_int8_fast2"]


def _epilogue_v2(acc_i32, scale, conv_zp, out_zp, s_id, s_al, c_axis=3):
    """The single-rounding fused epilogue — elementwise-identical to the
    arena kernel's v2 branch (kernels/pallas_int8.apply_requant_leaky)."""
    t = acc_i32.astype(jnp.float32) * _per_channel(scale, c_axis)
    t = jnp.clip(t, np.float32(INT8_MIN - conv_zp),
                 np.float32(INT8_MAX - conv_zp))
    sel = jnp.where(t >= 0, np.float32(s_id), np.float32(s_al))
    out = jnp.round(t * sel).astype(jnp.int32)
    return jnp.clip(out + out_zp, INT8_MIN, INT8_MAX).astype(jnp.int8)


def conv2d_leaky_int8_fast2(x, weights, bias, *, input_zp, conv_zp, out_zp,
                            scale, s_id, s_al, stride, padding,
                            layout="NHWC"):
    """Per-channel int8 conv fused with LeakyReLU, single rounding.

    ``scale`` f32 [Co] = s_in*s_w[c]/s_conv; ``s_id`` = s_conv/s_out;
    ``s_al`` = alpha * s_id (both f32 scalars)."""
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
    return _epilogue_v2(acc, jnp.asarray(scale, jnp.float32), conv_zp,
                        out_zp, s_id, s_al, c_axis=L["c"])


def depthwise_conv2d_leaky_int8_fast2(x, weights, bias, *, input_zp,
                                      conv_zp, out_zp, scale, s_id, s_al,
                                      stride, padding, layout="NHWC"):
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
    return _epilogue_v2(acc, jnp.asarray(scale, jnp.float32), conv_zp,
                        out_zp, s_id, s_al, c_axis=L["c"])

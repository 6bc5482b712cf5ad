"""Post-training int8 quantization with representative-dataset calibration.

TPU-native reproduction of the reference's PTQ flow
(`yoloface/tflite/tflite_quantize.py`): where the reference feeds a frozen
TF graph plus `representative_dataset_gen()` (24 images, resize 56x56, /255)
through the TFLite MLIR quantizer, we:

  1. fold BatchNorm into conv weights/biases (the converter does the same);
  2. interpret the *template graph topology* (the imported int8 graph IR,
     which fixes op order, PAD placement and the QUANTIZE-before-CONCAT
     structure) in float32 over the representative dataset, recording
     min/max for every activation tensor;
  3. choose TFLite-style quantization parameters (asymmetric per-tensor
     int8 activations with zero-point nudging; symmetric per-channel
     weights, absmax/127; int32 biases at scale s_in * s_w[c]);
  4. emit a fresh :class:`GraphDef` that runs on any Int8Engine mode.

Because the topology comes from the template, a newly trained checkpoint of
the same architecture quantizes to a graph structurally identical to the
shipped ``yoloface_int8.tflite`` — the property the reference pipeline
relies on when regenerating MCU code (`network_generate_report.txt:3`).
"""

from __future__ import annotations

import copy
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from yoloface_tpu.graph.ir import GraphDef, QParams
from yoloface_tpu.ops.int8_ref import _same_pad_amounts


# --------------------------------------------------------------------------
# 1. BatchNorm folding (Flax params -> float conv weights per template op)
# --------------------------------------------------------------------------
# Flax module path of the conv feeding each template CONV/DW op index
# (template = the imported yoloface_int8.tflite graph; op indices from its
# 54-op schedule, see tests/test_parity_int8.py graph dump).
FLAX_TO_TEMPLATE_OP = {
    1: "conv1", 3: "conv2/dw", 5: "conv2/pw", 6: "conv3",
    10: "conv4/dw", 12: "conv4/pw", 13: "conv5", 15: "conv6/dw",
    17: "conv6/pw", 19: "conv7", 23: "conv8", 27: "conv9/dw",
    29: "conv9/pw", 30: "conv10", 32: "conv11/dw", 34: "conv11/pw",
    36: "conv12", 38: "conv13/dw", 40: "conv13/pw", 42: "conv14",
    47: "conv15", 49: "conv16/dw", 51: "conv16/pw", 53: "conv17",
}


def _get_path(tree, path: str):
    node = tree
    for part in path.split("/"):
        node = node[part]
    return node


def fold_batchnorm(variables, eps: float = 1e-5) -> Dict[int, Tuple[np.ndarray, np.ndarray]]:
    """Flax YoloFace variables -> {template op index: (w_ohwi f32, bias f32)}.

    Folding: w' = w * gamma / sqrt(var + eps); b' = beta - mean * gamma /
    sqrt(var + eps).  Depthwise kernels (flax HWIO with I=1, O=C after
    feature_group_count=C) are emitted in the TFLite [1,Kh,Kw,C] layout;
    standard convs as [Co,Kh,Kw,Ci] (OHWI).
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    out = {}
    for op_idx, path in FLAX_TO_TEMPLATE_OP.items():
        mod = _get_path(params, path)
        bn_s = _get_path(stats, path)["bn"]
        kernel = np.asarray(mod["conv"]["kernel"], np.float64)  # HWIO
        gamma = np.asarray(mod["bn"]["scale"], np.float64)
        beta = np.asarray(mod["bn"]["bias"], np.float64)
        mean = np.asarray(bn_s["mean"], np.float64)
        var = np.asarray(bn_s["var"], np.float64)
        mult = gamma / np.sqrt(var + eps)
        folded = kernel * mult  # scales output channels (last dim of HWIO)
        bias = beta - mean * mult
        if path.endswith("dw"):
            w = folded.transpose(2, 0, 1, 3)   # HWIO [3,3,1,C] -> [1,3,3,C]
        else:
            w = folded.transpose(3, 0, 1, 2)   # HWIO -> OHWI
        out[op_idx] = (np.ascontiguousarray(w, dtype=np.float32),
                       bias.astype(np.float32))
    return out


# --------------------------------------------------------------------------
# 2. float-domain interpretation of the template graph, recording ranges
# --------------------------------------------------------------------------
def float_forward(template: GraphDef,
                  weights: Dict[int, Tuple[np.ndarray, np.ndarray]],
                  x_f32, alpha: float = 0.1,
                  fq=None) -> Dict[int, jnp.ndarray]:
    """Run the template topology in float32.  Returns env of every tensor.

    x_f32: [N,56,56,3] in the converter's input domain ([0,1] after /255).
    QUANTIZE ops are identity in float.  PAD pads with 0.0 (the float value
    the input zero-point represents... the darknet zero pad, which is 0 in
    the /255 domain only at black — the reference Keras graph zero-pads the
    *raw float* feature maps, so 0.0 is correct for every PAD here).

    fq: optional ``(tensor_idx, value) -> value`` hook applied to the input
    and every op output — the QAT fake-quantization insertion point
    (quantize/qat.py); None = plain float semantics.
    """
    x0 = jnp.asarray(x_f32)
    if fq is not None:
        x0 = fq(template.inputs[0], x0)
    env: Dict[int, jnp.ndarray] = {template.inputs[0]: x0}
    for op in template.ops:
        o = op.outputs[0]
        if op.opname == "PAD":
            p = template.tensor(op.inputs[1]).data.astype(int)
            env[o] = jnp.pad(env[op.inputs[0]],
                             [tuple(r) for r in p])
        elif op.opname in ("CONV_2D", "DEPTHWISE_CONV_2D"):
            x = env[op.inputs[0]]
            w, b = weights[op.index]
            stride = (op.attrs["stride_h"], op.attrs["stride_w"])
            if op.attrs["padding"] == "SAME":
                # kh/kw sit at dims 1,2 in both OHWI and [1,Kh,Kw,C] layouts
                ph = _same_pad_amounts(x.shape[1], stride[0], w.shape[1])
                pw = _same_pad_amounts(x.shape[2], stride[1], w.shape[2])
                x = jnp.pad(x, [(0, 0), ph, pw, (0, 0)])
            # HIGHEST: full-f32 accumulation on TPU (the default conv
            # precision there is bf16-based and drifts vs the CPU/TF
            # float oracles; no-op on CPU)
            if op.opname == "CONV_2D":
                acc = lax.conv_general_dilated(
                    x, jnp.asarray(w), stride, "VALID",
                    dimension_numbers=("NHWC", "OHWI", "NHWC"),
                    precision=lax.Precision.HIGHEST)
            else:
                c = w.shape[3]
                # jnp.transpose: w may be a traced fake-quant value (QAT)
                rhs = jnp.transpose(jnp.asarray(w), (1, 2, 0, 3))
                acc = lax.conv_general_dilated(
                    x, rhs, stride, "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=c,
                    precision=lax.Precision.HIGHEST)
            env[o] = acc + jnp.asarray(b)
        elif op.opname == "LEAKY_RELU":
            v = env[op.inputs[0]]
            env[o] = jnp.where(v >= 0, v, v * alpha)
        elif op.opname == "MAX_POOL_2D":
            x = env[op.inputs[0]]
            fh, fw = op.attrs["filter_h"], op.attrs["filter_w"]
            sh, sw = op.attrs["stride_h"], op.attrs["stride_w"]
            if op.attrs["padding"] == "SAME":
                ph = _same_pad_amounts(x.shape[1], sh, fh)
                pw = _same_pad_amounts(x.shape[2], sw, fw)
            else:
                ph = pw = (0, 0)
            env[o] = lax.reduce_window(
                x, -jnp.inf, lax.max, (1, fh, fw, 1), (1, sh, sw, 1),
                [(0, 0), ph, pw, (0, 0)])
        elif op.opname == "ADD":
            env[o] = env[op.inputs[0]] + env[op.inputs[1]]
        elif op.opname == "QUANTIZE":
            env[o] = env[op.inputs[0]]
        elif op.opname == "CONCATENATION":
            env[o] = jnp.concatenate([env[i] for i in op.inputs],
                                     axis=op.attrs["axis"])
        elif op.opname == "RELU":
            env[o] = jnp.maximum(env[op.inputs[0]], 0.0)
        elif op.opname == "RESIZE_NEAREST_NEIGHBOR":
            x = env[op.inputs[0]]
            oh, ow = template.tensor(o).shape[1:3]
            env[o] = jnp.repeat(jnp.repeat(x, oh // x.shape[1], axis=1),
                                ow // x.shape[2], axis=2)
        else:
            raise NotImplementedError(op.opname)
        if fq is not None:
            env[o] = fq(o, env[o])
    return env


def observe_ranges(template: GraphDef, weights, rep_images,
                   batch: int = 8, observer: str = "minmax",
                   percentile: float = 99.9,
                   ema_decay: float = 0.9) -> Dict[int, Tuple[float, float]]:
    """Per-tensor activation ranges over the representative dataset (the
    analogue of the TFLite quantizer's statistics pass over
    representative_dataset_gen, tflite_quantize.py:29-58).

    observer:
      * "minmax"     — global min/max (what TFLite PTQ does; the parity
                       default);
      * "percentile" — symmetric percentile clipping (lo = P(100-p),
                       hi = P(p)) — robust to activation outliers;
      * "ema"        — exponential moving average of per-batch min/max
                       (the torch.quantization MovingAverage observer
                       scheme) — hardening option for streaming
                       calibration.
    """
    if observer == "percentile":
        fwd = jax.jit(
            lambda xs: {k: (jnp.percentile(v, 100.0 - percentile),
                            jnp.percentile(v, percentile))
                        for k, v in float_forward(template, weights,
                                                  xs).items()})
    else:
        fwd = jax.jit(lambda xs: {
            k: (v.min(), v.max())
            for k, v in float_forward(template, weights, xs).items()})
    ranges: Dict[int, Tuple[float, float]] = {}
    rep = np.asarray(rep_images, np.float32)
    for i in range(0, len(rep), batch):
        out = fwd(rep[i:i + batch])
        for k, (lo, hi) in out.items():
            lo, hi = float(lo), float(hi)
            if k not in ranges:
                ranges[k] = (lo, hi)
            elif observer == "ema":
                d = ema_decay
                ranges[k] = (d * ranges[k][0] + (1 - d) * lo,
                             d * ranges[k][1] + (1 - d) * hi)
            else:   # minmax and percentile aggregate by envelope
                ranges[k] = (min(ranges[k][0], lo), max(ranges[k][1], hi))
    return ranges


# --------------------------------------------------------------------------
# 3. TFLite-style quantization parameter choice
# --------------------------------------------------------------------------
def choose_qparams(rmin: float, rmax: float,
                   qmin: int = -128, qmax: int = 127) -> QParams:
    """Asymmetric per-tensor int8 params with zero-point nudging (port of
    TFLite's ChooseQuantizationParams): zero must be exactly representable."""
    rmin = min(rmin, 0.0)
    rmax = max(rmax, 0.0)
    if rmax == rmin:
        return QParams((1.0,), (0,))
    scale = (rmax - rmin) / (qmax - qmin)
    zp_real = qmin - rmin / scale
    zp = int(np.clip(round(zp_real), qmin, qmax))
    return QParams((float(scale),), (zp,))


def quantize_weights_per_channel(w: np.ndarray, channel_axis: int
                                 ) -> Tuple[np.ndarray, QParams]:
    """Symmetric per-channel int8 (TFLite weight scheme): scale=absmax/127."""
    sw = np.moveaxis(w, channel_axis, 0).reshape(w.shape[channel_axis], -1)
    absmax = np.abs(sw).max(axis=1)
    absmax = np.where(absmax == 0, 1e-8, absmax)
    scales = (absmax / 127.0).astype(np.float64)
    shape = [1] * w.ndim
    shape[channel_axis] = -1
    q = np.clip(np.round(w / scales.reshape(shape)), -127, 127).astype(np.int8)
    return q, QParams(tuple(scales), tuple([0] * len(scales)), channel_axis)


# --------------------------------------------------------------------------
# 4. assemble the quantized GraphDef
# --------------------------------------------------------------------------
def derive_act_qparams(template: GraphDef, ranges,
                       input_qparams: Optional[QParams] = None
                       ) -> Dict[int, QParams]:
    """Activation qparams from observed ranges + the converter's structural
    sharing rules:
      * PAD output shares its input's qparams;
      * CONCATENATION inputs (the QUANTIZE outputs) share the concat
        output's qparams (that is why the converter inserted them);
      * MAX_POOL / RESIZE_NEAREST / RELU outputs share input qparams
        (TFLite requires same in/out quantization for those ops).
    Shared with the QAT fake-quant simulation (quantize/qat.py) so the
    training-time grid IS the deployment grid."""
    act_q: Dict[int, QParams] = {}
    for ti, (lo, hi) in ranges.items():
        act_q[ti] = choose_qparams(lo, hi)
    act_q[template.inputs[0]] = (input_qparams
                                 or QParams((1.0 / 255.0,), (-128,)))
    for op in template.ops:
        if op.opname == "PAD":
            act_q[op.outputs[0]] = act_q[op.inputs[0]]
    for op in template.ops:
        if op.opname == "CONCATENATION":
            for i in op.inputs:
                act_q[i] = act_q[op.outputs[0]]
    for op in template.ops:
        if op.opname in ("MAX_POOL_2D", "RESIZE_NEAREST_NEIGHBOR", "RELU"):
            act_q[op.outputs[0]] = act_q[op.inputs[0]]
    return act_q


def build_int8_graph(template: GraphDef, weights, ranges,
                     input_qparams: Optional[QParams] = None) -> GraphDef:
    """New GraphDef: template topology + fresh weights/activation qparams."""
    g = copy.deepcopy(template)
    act_q = derive_act_qparams(template, ranges, input_qparams)

    for ti, q in act_q.items():
        g.tensors[ti].qparams = q

    # weights + biases
    for op in g.ops:
        if op.opname not in ("CONV_2D", "DEPTHWISE_CONV_2D"):
            continue
        w_f, b_f = weights[op.index]
        channel_axis = 0 if op.opname == "CONV_2D" else 3
        q, wq = quantize_weights_per_channel(w_f, channel_axis)
        w_t = g.tensors[op.inputs[1]]
        w_t.data = q
        w_t.qparams = wq
        w_t.shape = tuple(q.shape)
        s_in = act_q[op.inputs[0]].scale
        bias_scales = s_in * np.asarray(wq.scales, np.float64)
        b_t = g.tensors[op.inputs[2]]
        b_t.data = np.round(np.asarray(b_f, np.float64)
                            / bias_scales).astype(np.int32)
        b_t.qparams = QParams(tuple(bias_scales),
                              tuple([0] * len(bias_scales)), 0)
    g.description = "calibrated by yoloface_tpu.quantize"
    return g


def calibrate(variables, rep_images, template: GraphDef,
              observer: str = "minmax", **observer_kw) -> GraphDef:
    """Flax YoloFace variables + representative images -> int8 GraphDef."""
    weights = fold_batchnorm(variables)
    ranges = observe_ranges(template, weights, rep_images,
                            observer=observer, **observer_kw)
    return build_int8_graph(template, weights, ranges)


def calibrate_from_weights(weights, rep_images, template: GraphDef,
                           observer: str = "minmax",
                           **observer_kw) -> GraphDef:
    """Same, from pre-folded float weights {op_index: (w, b)}."""
    ranges = observe_ranges(template, weights, rep_images,
                            observer=observer, **observer_kw)
    return build_int8_graph(template, weights, ranges)

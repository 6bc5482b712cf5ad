"""Quantization-aware training (QAT): fine-tune THROUGH the int8 grid.

Beyond-parity capability — the reference stops at post-training
quantization (``yoloface/tflite/tflite_quantize.py``); QAT is the standard
next step when PTQ costs accuracy.  TPU-native formulation: the whole
fake-quantized forward + backward runs in ONE jit (MXU convs, STE
gradients), reusing the framework's own machinery so the training-time
grid IS the deployment grid:

  * activations — asymmetric per-tensor int8 with zero-point nudging,
    FROZEN from a PTQ calibration pass and mapped through the converter's
    structural sharing rules (``calibrate.derive_act_qparams``: PAD shares
    input, concat inputs share the concat output, pools share input) —
    exactly the qparams ``build_int8_graph`` will assign;
  * weights — symmetric per-channel int8 (absmax/127), re-derived from the
    live weights every step: the grid ``quantize_weights_per_channel``
    snaps to at export;
  * BatchNorm — folded differentiably every step with frozen running
    stats, so training optimizes the folded conv the deployment runs;
  * gradients — straight-through estimators (identity through round/clip
    inside the observed range).

After fine-tuning, the variables feed the SAME ``calibrate`` ->
``io/tflite_export`` chain as PTQ: the artifact stays stock-interpreter
loadable and Int8Engine bit-exact.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from yoloface_tpu.graph.ir import GraphDef, QParams
from yoloface_tpu.quantize.calibrate import (FLAX_TO_TEMPLATE_OP,
                                             _get_path, derive_act_qparams,
                                             float_forward)


# --------------------------------------------------------------------------
# differentiable pieces
# --------------------------------------------------------------------------
def fake_quant_act(x, scale: float, zp: int):
    """Asymmetric per-tensor int8 fake-quantization with an STE backward:
    forward snaps to the int8 grid, backward is identity (the clip's
    saturation region still passes gradient — the frozen calibrated range
    already contains the data; hard-zeroing there destabilizes small
    fine-tunes)."""
    q = jnp.clip(jnp.round(x / scale + zp), -128, 127)
    return x + jax.lax.stop_gradient((q - zp) * scale - x)


def fake_quant_w(w, channel_axis: int):
    """Symmetric per-channel int8 fake-quantization on the TFLite weight
    layouts ([Co,Kh,Kw,Ci] axis 0 / depthwise [1,Kh,Kw,C] axis 3):
    absmax/127 grid with a stop-gradient scale (the standard LSQ-free QAT
    scheme) — exactly the grid quantize_weights_per_channel snaps to."""
    axis = tuple(i for i in range(w.ndim) if i != channel_axis)
    absmax = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(jnp.abs(w), axis=axis, keepdims=True), 1e-8))
    scale = absmax / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127)
    return w + jax.lax.stop_gradient(q * scale - w)


def fold_batchnorm_diff(variables):
    """Differentiable twin of ``calibrate.fold_batchnorm``: same math, jnp
    ops, frozen running stats (QAT fine-tunes the folded conv; see
    fold_batchnorm for the layout conventions)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    out = {}
    for op_idx, path in FLAX_TO_TEMPLATE_OP.items():
        mod = _get_path(params, path)
        bn_s = _get_path(stats, path)["bn"]
        kernel = mod["conv"]["kernel"]                       # HWIO
        mult = mod["bn"]["scale"] / jnp.sqrt(
            jax.lax.stop_gradient(bn_s["var"]) + 1e-5)
        folded = kernel * mult
        bias = mod["bn"]["bias"] - jax.lax.stop_gradient(bn_s["mean"]) * mult
        if path.endswith("dw"):
            w = jnp.transpose(folded, (2, 0, 1, 3))   # [3,3,1,C]->[1,3,3,C]
        else:
            w = jnp.transpose(folded, (3, 0, 1, 2))   # HWIO -> OHWI
        out[op_idx] = (w, bias)
    return out


# --------------------------------------------------------------------------
# fake-quantized forward on the template topology
# --------------------------------------------------------------------------
def qat_act_qparams(template: GraphDef, ranges,
                    input_qparams: Optional[QParams] = None
                    ) -> Dict[int, Tuple[float, int]]:
    """tensor -> (scale, zero_point) python constants for the QAT grid —
    the exact per-tensor params build_int8_graph will assign."""
    return {ti: (float(q.scale), int(q.zero_point))
            for ti, q in derive_act_qparams(template, ranges,
                                            input_qparams).items()}


def qat_forward(template: GraphDef, variables, x_f32, act_sz):
    """Fake-quantized forward of the template topology: returns the final
    head tensor (float, on the int8 grid).  Differentiable in
    ``variables['params']``."""
    dw_ops = {k for k, path in FLAX_TO_TEMPLATE_OP.items()
              if path.endswith("dw")}
    folded = {k: (fake_quant_w(w, 3 if k in dw_ops else 0), b)
              for k, (w, b) in fold_batchnorm_diff(variables).items()}

    def fq(ti, v):
        sz = act_sz.get(ti)
        if sz is None or v.dtype not in (jnp.float32, jnp.float64):
            return v
        return fake_quant_act(v, sz[0], sz[1])

    env = float_forward(template, folded, x_f32, fq=fq)
    return env[template.outputs[0]]


def make_qat_step(template: GraphDef, ranges, *, lr: float = 5e-4,
                  input_qparams: Optional[QParams] = None,
                  loss_fn=None):
    """(step, init_opt): jitted QAT fine-tune step on frozen act ranges.

    step(variables, opt_state, images01, targets) -> (variables',
    opt_state', loss).  ``images01`` are converter-domain inputs ([0,1]);
    ``loss_fn`` defaults to the framework's YoloLoss (train/loss.py)."""
    if loss_fn is None:
        from yoloface_tpu.train.loss import yolo_loss
        loss_fn = yolo_loss
    act_sz = qat_act_qparams(template, ranges, input_qparams)
    tx = optax.adam(lr)

    def loss_of(params, variables, images, targets):
        v = dict(variables)
        v["params"] = params
        out = qat_forward(template, v, images, act_sz)
        return loss_fn(out, targets)

    @jax.jit
    def step(variables, opt_state, images, targets):
        loss, grads = jax.value_and_grad(loss_of)(
            variables["params"], variables, images, targets)
        updates, opt_state = tx.update(grads, opt_state,
                                       variables["params"])
        new_params = optax.apply_updates(variables["params"], updates)
        new_vars = dict(variables)
        new_vars["params"] = new_params
        return new_vars, opt_state, loss

    def init_opt(variables):
        return tx.init(variables["params"])

    return step, init_opt


def qat_finetune(template: GraphDef, variables, ranges, batches, *,
                 lr: float = 5e-4, input_qparams: Optional[QParams] = None):
    """Run QAT over an iterable of (images01, targets) batches; returns
    (variables', losses).  Ranges stay frozen (calibrate-then-fine-tune)."""
    step, init_opt = make_qat_step(template, ranges, lr=lr,
                                   input_qparams=input_qparams)
    opt_state = init_opt(variables)
    losses = []
    for images, targets in batches:
        variables, opt_state, loss = step(variables, opt_state,
                                          jnp.asarray(images, jnp.float32),
                                          jnp.asarray(targets, jnp.float32))
        losses.append(float(loss))
    return variables, losses


# --------------------------------------------------------------------------
# weight-space QAT: ANY imported template (darknet-cfg family, retargets)
# --------------------------------------------------------------------------
def qat_forward_weights(template: GraphDef, weights, x_f32, act_sz,
                        dw_ops=None):
    """Fake-quantized forward where the FOLDED float weights
    ``{op_index: (w, b)}`` (the ``calibrate_from_weights`` convention —
    TFLite layouts, BN already folded) are themselves the trainable
    leaves.  Generalizes QAT to every graph the importer can produce:
    darknet .cfg templates (io/darknet_cfg.template_from_darknet),
    retargeted scales, multi-head FPNs."""
    if dw_ops is None:
        dw_ops = {op.index for op in template.ops
                  if op.opname == "DEPTHWISE_CONV_2D"}
    fq_w = {k: (fake_quant_w(jnp.asarray(w), 3 if k in dw_ops else 0),
                jnp.asarray(b))
            for k, (w, b) in weights.items()}

    def fq(ti, v):
        sz = act_sz.get(ti)
        if sz is None or v.dtype not in (jnp.float32, jnp.float64):
            return v
        return fake_quant_act(v, sz[0], sz[1])

    env = float_forward(template, fq_w, x_f32, fq=fq)
    outs = [env[o] for o in template.outputs]
    return outs[0] if len(outs) == 1 else tuple(outs)


def make_qat_step_weights(template: GraphDef, ranges, loss_fn, *,
                          lr: float = 5e-4,
                          input_qparams: Optional[QParams] = None):
    """(step, init_opt) optimizing the folded weights dict directly.

    ``loss_fn(outputs, targets)`` receives the template's output tensor
    (or tuple for multi-head graphs).  step(weights, opt_state, images01,
    targets) -> (weights', opt_state', loss).  The result feeds
    ``calibrate.build_int8_graph(template, weights', ranges)`` unchanged."""
    act_sz = qat_act_qparams(template, ranges, input_qparams)
    dw_ops = {op.index for op in template.ops
              if op.opname == "DEPTHWISE_CONV_2D"}
    tx = optax.adam(lr)

    def loss_of(weights, images, targets):
        out = qat_forward_weights(template, weights, images, act_sz,
                                  dw_ops=dw_ops)
        return loss_fn(out, targets)

    @jax.jit
    def step(weights, opt_state, images, targets):
        loss, grads = jax.value_and_grad(loss_of)(weights, images, targets)
        updates, opt_state = tx.update(grads, opt_state, weights)
        return optax.apply_updates(weights, updates), opt_state, loss

    def init_opt(weights):
        return tx.init(jax.tree.map(jnp.asarray, weights))

    return step, init_opt

"""Minimal ONNX evaluator: executes the emitted float ModelProto.

The reference *runs* its exported onnx artifact through onnxruntime
(`yoloface/pytorch/onnx_prediction.py:33-37`); onnxruntime is absent in
this environment, so this module closes execution parity with a small
interpreter over the op set the exporter emits (Conv incl. grouped /
LeakyRelu / Relu / Sigmoid / MaxPool / AveragePool / Add / Concat /
Identity).  Input is the structural parse from
:func:`yoloface_tpu.io.onnx_export.parse_model`; layout is NCHW as in the
emitted graph.  Conv/pool math runs through jax.lax so the evaluator is
jittable and numerically identical to the FloatEngine path.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _conv(x, w, b, strides, pads, group):
    # pads is ONNX (top, left, bottom, right)
    pt, pl, pb, pr = pads
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=strides,
        padding=((pt, pb), (pl, pr)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=group,
        precision=jax.lax.Precision.HIGHEST)
    return out + b.reshape(1, -1, 1, 1)


def _pool(x, kind, kernel, strides, pads, count_include_pad=0):
    pt, pl, pb, pr = pads
    window = (1, 1) + tuple(kernel)
    strid = (1, 1) + tuple(strides)
    padding = ((0, 0), (0, 0), (pt, pb), (pl, pr))
    if kind == "MaxPool":
        init = -jnp.inf
        return jax.lax.reduce_window(x, init, jax.lax.max, window, strid,
                                     padding)
    # AveragePool, count_include_pad=0: divide by the valid-window size
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strid,
                                   padding)
    if count_include_pad:
        return summed / float(np.prod(kernel))
    ones = jnp.ones(x.shape[2:], x.dtype)[None, None]
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strid,
                                   padding)
    return summed / counts


def _run(parsed: dict, inits: Dict[str, jnp.ndarray], x) -> jnp.ndarray:
    env: Dict[str, jnp.ndarray] = dict(inits)
    env[parsed["inputs"][0]] = x
    for n in parsed["nodes"]:
        op = n["op_type"]
        a = n["attrs"]

        def ints(name, default=None):
            if name in a:
                return tuple(int(v) for v in a[name]["ints"])
            return default

        ins = [env[i] for i in n["inputs"]]
        if op == "Conv":
            kh, kw = ints("kernel_shape")
            out = _conv(ins[0], ins[1],
                        ins[2] if len(ins) > 2 else
                        jnp.zeros((ins[1].shape[0],), ins[1].dtype),
                        ints("strides", (1, 1)),
                        ints("pads", (0, 0, 0, 0)),
                        int(a["group"]["i"]) if "group" in a else 1)
        elif op in ("MaxPool", "AveragePool"):
            out = _pool(ins[0], op, ints("kernel_shape"),
                        ints("strides", (1, 1)), ints("pads", (0, 0, 0, 0)),
                        int(a.get("count_include_pad", {}).get("i", 0))
                        if "count_include_pad" in a else 0)
        elif op == "LeakyRelu":
            alpha = float(a["alpha"]["f"]) if "alpha" in a else 0.01
            out = jnp.where(ins[0] >= 0, ins[0], alpha * ins[0])
        elif op == "Relu":
            out = jnp.maximum(ins[0], 0)
        elif op == "Sigmoid":
            out = jax.nn.sigmoid(ins[0])
        elif op == "Add":
            out = ins[0] + ins[1]
        elif op == "Concat":
            axis = int(a["axis"]["i"])
            out = jnp.concatenate(ins, axis=axis)
        elif op == "Identity":
            out = ins[0]
        else:
            raise NotImplementedError(f"onnx eval: op {op}")
        env[n["outputs"][0]] = out
    return env[parsed["outputs"][0]]


class OnnxEvaluator:
    """Executes a parsed ONNX model (NCHW float32) on the default backend.

    ``ev = OnnxEvaluator(model_bytes); y = ev(x_nchw)``
    """

    def __init__(self, model_bytes: bytes):
        from yoloface_tpu.io.onnx_export import parse_model
        self.parsed = parse_model(model_bytes)
        self.inits = {k: jnp.asarray(v[1])
                      for k, v in self.parsed["initializers"].items()}
        self._jit = jax.jit(partial(_run, self.parsed, self.inits))

    def __call__(self, x_nchw) -> np.ndarray:
        return np.asarray(self._jit(jnp.asarray(x_nchw, jnp.float32)))

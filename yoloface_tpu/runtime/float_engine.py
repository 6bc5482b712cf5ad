"""FP32 graph engine: runs float TFLite graphs (e.g. the reference's
``yoloface.tflite``) on TPU.

Covers the reference's float-artifact predictors (`tensorflow/
h5_predition.py`, `pb_prediction.py`, the FP32 branch of the tflite
predictor): the same importer IR, interpreted in float32 via the generic
float executor that also backs PTQ calibration
(:func:`yoloface_tpu.quantize.calibrate.float_forward`)."""

from __future__ import annotations

import functools
from typing import Dict

import jax
import numpy as np

from yoloface_tpu.graph.ir import GraphDef
from yoloface_tpu.quantize.calibrate import float_forward


class FloatEngine:
    """Executes a float32 TFLite graph (conv weights as constants)."""

    def __init__(self, graph: GraphDef):
        in_t = graph.tensor(graph.inputs[0])
        if in_t.dtype != np.dtype(np.float32):
            raise ValueError(
                f"FloatEngine requires a float32 graph; input tensor "
                f"{in_t.name!r} is {in_t.dtype}. Use Int8Engine for "
                f"quantized graphs.")
        self.graph = graph
        self.input_idx = graph.inputs[0]
        self.output_idx = graph.outputs[0]
        self.input_shape = tuple(in_t.shape[1:])
        # weights dict in the float_forward convention
        self.weights: Dict[int, tuple] = {}
        for op in graph.ops:
            if op.opname in ("CONV_2D", "DEPTHWISE_CONV_2D"):
                w = graph.tensor(op.inputs[1]).data
                b = (graph.tensor(op.inputs[2]).data
                     if len(op.inputs) > 2 and op.inputs[2] >= 0
                     else np.zeros(w.shape[0] if op.opname == "CONV_2D"
                                   else w.shape[3], np.float32))
                self.weights[op.index] = (np.asarray(w, np.float32),
                                          np.asarray(b, np.float32))
        self._jit_cache: Dict[int, callable] = {}

    def _forward(self, x):
        env = float_forward(self.graph, self.weights, x)
        return env[self.output_idx]

    def __call__(self, x):
        """float32 frames [N,56,56,3] in [0,1] -> raw head [N,7,7,18]."""
        x = np.asarray(x, np.float32) if isinstance(x, np.ndarray) else x
        key = x.shape[0]
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(self._forward)
        return self._jit_cache[key](x)

    def run_with_intermediates(self, x):
        env = jax.jit(functools.partial(float_forward, self.graph,
                                        self.weights))(x)
        return {k: np.asarray(v) for k, v in env.items()}

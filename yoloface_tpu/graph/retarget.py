"""Spatial retargeting of fully-convolutional int8 graphs.

The yoloface family is fully convolutional: the same weights run at any
input resolution that keeps the pooling alignments (multiples of 56).  The
reference ships a 416x416 trainer variant (`yolov3_train_tf.py:31-32`,
grid 13) as its "scale" axis; the TPU-native equivalent is cheaper and
stronger — clone the deployed int8 GraphDef at k x spatial resolution and
run it through the same engine / exporter / oracle toolchain:

  * activation tensors scale their H, W dims by k;
  * constants (weights, biases, PAD parameter tensors) are untouched —
    darknet top-left pads stay 1 px, strides stay 2;
  * SAME paddings are re-derived from the new shapes at lowering time;
  * per-tensor quantization parameters ride along unchanged, so the
    retargeted flatbuffer is bit-comparable against the stock TFLite
    interpreter at the new resolution.

At k=8 (448x448, grid 56, stride 8 px preserved) the net is 64x the MACC
of the embedded 56-input graph — the scale showcase for the XLA serving
path (the VMEM activation-arena modes target the small embedded family and
refuse planes that exceed the arena budget).
"""

from __future__ import annotations

import dataclasses
from typing import Set

from yoloface_tpu.graph.ir import GraphDef

_SPATIAL_OPS = {
    "CONV_2D", "DEPTHWISE_CONV_2D", "MAX_POOL_2D", "AVERAGE_POOL_2D",
    "PAD", "ADD", "CONCATENATION", "LEAKY_RELU", "QUANTIZE", "RELU",
    "RELU6", "LOGISTIC", "MUL", "SUB", "RESIZE_NEAREST_NEIGHBOR",
}


def retarget_spatial(graph: GraphDef, factor: int) -> GraphDef:
    """Clone ``graph`` with every activation's H, W scaled by ``factor``.

    Only fully-convolutional graphs are supported: an op outside the
    known spatially-covariant set (e.g. FULLY_CONNECTED, RESHAPE with a
    baked shape) raises, because its semantics do not scale.
    """
    if factor < 1 or int(factor) != factor:
        raise ValueError(f"factor must be a positive integer, got {factor}")
    for op in graph.ops:
        if op.opname not in _SPATIAL_OPS:
            raise NotImplementedError(
                f"retarget_spatial: op {op.opname} (#{op.index}) is not "
                "spatially covariant; only fully-convolutional graphs "
                "can be retargeted")

    # activations = non-const tensors referenced by ops / graph io
    referenced: Set[int] = set(graph.inputs) | set(graph.outputs)
    for op in graph.ops:
        referenced.update(i for i in op.inputs if i >= 0)
        referenced.update(op.outputs)

    tensors = []
    for t in graph.tensors:
        if (t.index in referenced and not t.is_const
                and len(t.shape) == 4):
            n, h, w, c = t.shape
            t = dataclasses.replace(
                t, shape=(n, h * factor, w * factor, c))
        tensors.append(t)
    ops = [dataclasses.replace(o, inputs=list(o.inputs),
                               outputs=list(o.outputs), attrs=dict(o.attrs))
           for o in graph.ops]

    # RESIZE_NEAREST_NEIGHBOR carries its output H,W as a (2,) int32 const
    # second input.  The engine derives out_hw from the (rescaled) output
    # tensor shape, but the exported flatbuffer must carry a consistent
    # size tensor or the stock TFLite interpreter would resize to the OLD
    # resolution — rewrite the const to factor*old.
    size_idx: Set[int] = {op.inputs[1] for op in ops
                          if op.opname == "RESIZE_NEAREST_NEIGHBOR"}
    for i, t in enumerate(tensors):
        if t.index in size_idx and t.is_const:
            tensors[i] = dataclasses.replace(
                t, data=(t.data * factor).astype(t.data.dtype))
    return GraphDef(tensors=tensors, ops=ops,
                    inputs=list(graph.inputs), outputs=list(graph.outputs),
                    name=f"{graph.name}@{factor}x",
                    description=graph.description)

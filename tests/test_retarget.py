"""Spatial retargeting: the fully-conv int8 graph at k x resolution runs
through the whole toolchain (engine modes, exporter, stock-interpreter
oracle) with the shipped weights and qparams.

The reference's scale axis is the 416x416 trainer variant
(`yolov3_train_tf.py:31-32`); here the deployed graph itself is retargeted
(56 -> 112 in tests for speed; tools/yoloface448.py exercises 448)."""

import numpy as np
import pytest

from yoloface_tpu.graph.retarget import retarget_spatial
from yoloface_tpu.io.tflite_export import export_tflite
from yoloface_tpu.runtime.engine import Int8Engine

TFLITE = "/root/reference/yoloface/tflite/yoloface_int8.tflite"


@pytest.fixture(scope="module")
def graph112(int8_graph):
    return retarget_spatial(int8_graph, 2)


def _rand_input(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-128, 128, shape, dtype=np.int64).astype(np.int8)


def test_retarget_shapes(int8_graph, graph112):
    ti = graph112.tensor(graph112.inputs[0])
    to = graph112.tensor(graph112.outputs[0])
    assert tuple(ti.shape) == (1, 112, 112, 3)
    assert tuple(to.shape) == (1, 14, 14, 18)
    # weights untouched, qparams ride along
    for t, t2 in zip(int8_graph.tensors, graph112.tensors):
        if t.is_const:
            assert t2.shape == t.shape
            np.testing.assert_array_equal(t2.data, t.data)
        assert t2.qparams == t.qparams
    # original graph unmodified
    assert tuple(int8_graph.tensor(int8_graph.inputs[0]).shape) == \
        (1, 56, 56, 3)


def test_retarget_engine_vs_stock_interpreter(graph112):
    """exact mode at 112 is bit-identical to the stock TFLite reference
    kernels running the retargeted flatbuffer."""
    tf = pytest.importorskip("tensorflow")
    buf = export_tflite(graph112)
    it = tf.lite.Interpreter(
        model_content=buf,
        experimental_op_resolver_type=(
            tf.lite.experimental.OpResolverType.BUILTIN_REF))
    it.allocate_tensors()
    x = _rand_input((1, 112, 112, 3))
    it.set_tensor(it.get_input_details()[0]["index"], x)
    it.invoke()
    want = it.get_tensor(it.get_output_details()[0]["index"])

    got = np.asarray(Int8Engine(graph112, mode="exact")(x))
    np.testing.assert_array_equal(got, want)


def test_retarget_arena_plans_or_guards(int8_graph, graph112):
    """The VMEM arena plans the 2x graph (more stages, same machinery); at
    8x (448) a single activation plane exceeds any VMEM budget and the
    plan refuses with a clear error instead of failing in Mosaic."""
    from yoloface_tpu.kernels.pallas_arena import build_arena_plan
    plan56 = build_arena_plan(int8_graph, exact=False, layout="whcn")
    plan112 = build_arena_plan(graph112, exact=False, layout="whcn")
    assert len(plan112) >= len(plan56)
    graph448 = retarget_spatial(int8_graph, 8)
    with pytest.raises(NotImplementedError, match="fast"):
        build_arena_plan(graph448, exact=False, layout="whcn")


def test_retarget_rejects_non_conv_graph(int8_graph):
    import dataclasses
    bad = dataclasses.replace(int8_graph)
    bad.ops = [dataclasses.replace(o) for o in int8_graph.ops]
    bad.ops[3] = dataclasses.replace(bad.ops[3], opname="FULLY_CONNECTED")
    with pytest.raises(NotImplementedError):
        retarget_spatial(bad, 2)


def test_retarget_bad_factor(int8_graph):
    with pytest.raises(ValueError):
        retarget_spatial(int8_graph, 0)

"""FloatEngine: the reference's FP32 yoloface.tflite runs with near-exact
parity vs the stock TFLite interpreter."""

import numpy as np
import pytest

from yoloface_tpu.io.tflite_import import load_tflite
from yoloface_tpu.runtime.engine import Int8Engine
from yoloface_tpu.runtime.float_engine import FloatEngine

FP32_TFLITE = "/root/reference/yoloface/tflite/yoloface.tflite"


@pytest.fixture(scope="module")
def float_graph():
    return load_tflite(FP32_TFLITE)


def test_float_graph_structure(float_graph):
    names = {op.opname for op in float_graph.ops}
    assert "CONV_2D" in names and "LEAKY_RELU" in names
    t = float_graph.tensor(float_graph.inputs[0])
    assert t.dtype == np.float32


def test_float_engine_matches_tflite(float_graph, dataset_images):
    tf = pytest.importorskip("tensorflow")
    eng = FloatEngine(float_graph)
    interp = tf.lite.Interpreter(
        model_path=FP32_TFLITE,
        experimental_op_resolver_type=(
            tf.lite.experimental.OpResolverType.BUILTIN_REF))
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    for name, x8 in sorted(dataset_images.items())[:4]:
        x = (x8.astype(np.float32) + 128.0) / 255.0
        interp.set_tensor(inp["index"], x)
        interp.invoke()
        want = interp.get_tensor(out["index"])
        got = np.asarray(eng(x))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-4,
                                   err_msg=name)


def test_float_engine_rejects_int8(int8_graph):
    with pytest.raises(ValueError, match="float32"):
        FloatEngine(int8_graph)


def test_int8_engine_rejects_float(float_graph):
    with pytest.raises(ValueError, match="full-int8"):
        Int8Engine(float_graph)

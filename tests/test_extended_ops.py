"""Extended op coverage (AVERAGE_POOL_2D, LOGISTIC, RELU, RELU6, RESHAPE):
single-op graphs built with OUR exporter, run in BOTH the stock TFLite
reference interpreter and our engine — bit-exact agreement.  This is what
lets the engine run int8 model families beyond yoloface."""

import numpy as np
import pytest

from yoloface_tpu.graph.ir import GraphDef, OpDef, QParams, TensorDef
from yoloface_tpu.io.tflite_export import export_tflite
from yoloface_tpu.io.tflite_import import load_tflite
from yoloface_tpu.runtime.engine import Int8Engine


def one_op_graph(opname, attrs, in_shape, out_shape, in_q, out_q):
    tensors = [TensorDef(0, "in", in_shape, np.dtype(np.int8), in_q),
               TensorDef(1, "out", out_shape, np.dtype(np.int8), out_q)]
    return GraphDef(tensors, [OpDef(0, opname, [0], [1], attrs)], [0], [1])


def run_both(graph, x):
    tf = pytest.importorskip("tensorflow")
    blob = export_tflite(graph)
    interp = tf.lite.Interpreter(
        model_content=blob,
        experimental_op_resolver_type=(
            tf.lite.experimental.OpResolverType.BUILTIN_REF))
    interp.allocate_tensors()
    interp.set_tensor(interp.get_input_details()[0]["index"], x)
    interp.invoke()
    want = interp.get_tensor(interp.get_output_details()[0]["index"])
    eng = Int8Engine(load_tflite(blob))
    got = np.asarray(eng(x))
    return got, want


@pytest.mark.parametrize("fh,fw,stride,pad", [
    (3, 3, 2, "SAME"), (2, 2, 2, "VALID"), (3, 3, 1, "SAME"),
    (4, 2, 2, "SAME")])
def test_avgpool_bit_exact(fh, fw, stride, pad):
    h = w = 8
    if pad == "SAME":
        oh, ow = -(-h // stride), -(-w // stride)
    else:
        oh = (h - fh) // stride + 1
        ow = (w - fw) // stride + 1
    g = one_op_graph("AVERAGE_POOL_2D",
                     {"padding": pad, "stride_w": stride, "stride_h": stride,
                      "filter_w": fw, "filter_h": fh, "activation": "NONE"},
                     (1, h, w, 4), (1, oh, ow, 4),
                     QParams((0.07,), (-5,)), QParams((0.07,), (-5,)))
    x = np.random.default_rng(fh * 10 + fw).integers(
        -128, 128, (1, h, w, 4), dtype=np.int64).astype(np.int8)
    got, want = run_both(g, x)
    np.testing.assert_array_equal(got, want)


def test_logistic_bit_exact():
    g = one_op_graph("LOGISTIC", {}, (1, 6, 6, 8), (1, 6, 6, 8),
                     QParams((0.08,), (7,)), QParams((1.0 / 256,), (-128,)))
    x = np.random.default_rng(3).integers(
        -128, 128, (1, 6, 6, 8), dtype=np.int64).astype(np.int8)
    got, want = run_both(g, x)
    np.testing.assert_array_equal(got, want)


def test_relu_bit_exact():
    g = one_op_graph("RELU", {}, (1, 4, 4, 8), (1, 4, 4, 8),
                     QParams((0.05,), (-10,)), QParams((0.05,), (-10,)))
    x = np.random.default_rng(4).integers(
        -128, 128, (1, 4, 4, 8), dtype=np.int64).astype(np.int8)
    got, want = run_both(g, x)
    np.testing.assert_array_equal(got, want)


def test_relu6_bit_exact():
    g = one_op_graph("RELU6", {}, (1, 4, 4, 8), (1, 4, 4, 8),
                     QParams((0.05,), (-100,)), QParams((0.05,), (-100,)))
    x = np.random.default_rng(5).integers(
        -128, 128, (1, 4, 4, 8), dtype=np.int64).astype(np.int8)
    got, want = run_both(g, x)
    np.testing.assert_array_equal(got, want)


def test_reshape():
    g = GraphDef(
        [TensorDef(0, "in", (1, 4, 4, 8), np.dtype(np.int8),
                   QParams((0.1,), (0,))),
         TensorDef(1, "out", (1, 2, 8, 8), np.dtype(np.int8),
                   QParams((0.1,), (0,)))],
        [OpDef(0, "RESHAPE", [0], [1], {"new_shape": [1, 2, 8, 8]})],
        [0], [1])
    x = np.random.default_rng(6).integers(
        -128, 128, (1, 4, 4, 8), dtype=np.int64).astype(np.int8)
    got, want = run_both(g, x)
    np.testing.assert_array_equal(got, want)


def test_composite_classifier_head():
    """A mobilenet-style tail: AVERAGE_POOL -> RESHAPE -> LOGISTIC, one
    graph through exporter + stock interpreter + our engine."""
    q = QParams((0.04,), (-3,))
    tensors = [
        TensorDef(0, "in", (1, 8, 8, 16), np.dtype(np.int8), q),
        TensorDef(1, "pooled", (1, 1, 1, 16), np.dtype(np.int8), q),
        TensorDef(2, "flat", (1, 16), np.dtype(np.int8), q),
        TensorDef(3, "probs", (1, 16), np.dtype(np.int8),
                  QParams((1.0 / 256,), (-128,))),
    ]
    ops = [
        OpDef(0, "AVERAGE_POOL_2D",
              [0], [1], {"padding": "VALID", "stride_w": 1, "stride_h": 1,
                         "filter_w": 8, "filter_h": 8,
                         "activation": "NONE"}),
        OpDef(1, "RESHAPE", [1], [2], {"new_shape": [1, 16]}),
        OpDef(2, "LOGISTIC", [2], [3], {}),
    ]
    g = GraphDef(tensors, ops, [0], [3])
    x = np.random.default_rng(9).integers(
        -128, 128, (1, 8, 8, 16), dtype=np.int64).astype(np.int8)
    got, want = run_both(g, x)
    np.testing.assert_array_equal(got, want)


def test_fully_connected_bit_exact():
    """int8 FULLY_CONNECTED (per-tensor weights) vs the stock reference
    kernel."""
    rng = np.random.default_rng(11)
    k, co = 24, 10
    w = rng.integers(-90, 90, (co, k), dtype=np.int64).astype(np.int8)
    b = rng.integers(-500, 500, co).astype(np.int32)
    in_q = QParams((0.05,), (4,))
    w_q = QParams((0.02,), (0,))
    out_q = QParams((0.11,), (-7,))
    tensors = [
        TensorDef(0, "in", (1, k), np.dtype(np.int8), in_q),
        TensorDef(1, "w", (co, k), np.dtype(np.int8), w_q, data=w),
        TensorDef(2, "b", (co,), np.dtype(np.int32),
                  QParams((0.05 * 0.02,), (0,)), data=b),
        TensorDef(3, "out", (1, co), np.dtype(np.int8), out_q),
    ]
    g = GraphDef(tensors,
                 [OpDef(0, "FULLY_CONNECTED", [0, 1, 2], [3],
                        {"activation": "NONE"})], [0], [3])
    x = rng.integers(-128, 128, (1, k), dtype=np.int64).astype(np.int8)
    got, want = run_both(g, x)
    np.testing.assert_array_equal(got, want)


def test_softmax_bit_exact_fuzzed():
    rng = np.random.default_rng(12)
    g = GraphDef(
        [TensorDef(0, "in", (1, 16), np.dtype(np.int8),
                   QParams((0.1,), (2,))),
         TensorDef(1, "out", (1, 16), np.dtype(np.int8),
                   QParams((1.0 / 256,), (-128,)))],
        [OpDef(0, "SOFTMAX", [0], [1], {"beta": 1.0})], [0], [1])
    for _ in range(10):
        x = rng.integers(-128, 128, (1, 16), dtype=np.int64).astype(np.int8)
        got, want = run_both(g, x)
        np.testing.assert_array_equal(got, want)


def test_fully_connected_per_channel():
    """FC with per-channel weight quantization (quantized_dimension=0)."""
    rng = np.random.default_rng(13)
    k, co = 16, 6
    w = rng.integers(-100, 100, (co, k), dtype=np.int64).astype(np.int8)
    b = rng.integers(-300, 300, co).astype(np.int32)
    scales = tuple(float(s) for s in rng.uniform(0.01, 0.05, co))
    in_q = QParams((0.06,), (-2,))
    tensors = [
        TensorDef(0, "in", (1, k), np.dtype(np.int8), in_q),
        TensorDef(1, "w", (co, k), np.dtype(np.int8),
                  QParams(scales, (0,) * co, 0), data=w),
        TensorDef(2, "b", (co,), np.dtype(np.int32),
                  QParams(tuple(0.06 * s for s in scales), (0,) * co, 0),
                  data=b),
        TensorDef(3, "out", (1, co), np.dtype(np.int8),
                  QParams((0.2,), (5,))),
    ]
    g = GraphDef(tensors,
                 [OpDef(0, "FULLY_CONNECTED", [0, 1, 2], [3],
                        {"activation": "NONE"})], [0], [3])
    x = rng.integers(-128, 128, (1, k), dtype=np.int64).astype(np.int8)
    got, want = run_both(g, x)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mode", ["pallas_arena", "pallas_mxu"])
def test_extended_ops_in_arena_modes(mode):
    """The arena lowerings (flagship serving modes) also run the extended
    op set bit-identically to the XLA engine — avgpool (SAME + VALID,
    strided), logistic, relu, relu6."""
    rng = np.random.default_rng(4)
    cases = [
        ("AVERAGE_POOL_2D",
         dict(filter_h=3, filter_w=3, stride_h=2, stride_w=2,
              padding="SAME", activation="NONE"),
         (1, 12, 12, 8), (1, 6, 6, 8)),
        ("AVERAGE_POOL_2D",
         dict(filter_h=2, filter_w=2, stride_h=2, stride_w=2,
              padding="VALID", activation="NONE"),
         (1, 12, 12, 8), (1, 6, 6, 8)),
        ("LOGISTIC", {}, (1, 8, 8, 4), (1, 8, 8, 4)),
        ("RELU", {}, (1, 8, 8, 4), (1, 8, 8, 4)),
        ("RELU6", {}, (1, 8, 8, 4), (1, 8, 8, 4)),
    ]
    for opname, attrs, ins, outs in cases:
        in_q = QParams((0.05,), (3,))
        out_q = (QParams((1.0 / 256,), (-128,)) if opname == "LOGISTIC"
                 else in_q)
        g = one_op_graph(opname, attrs, ins, outs, in_q, out_q)
        x = rng.integers(-128, 128, ins, dtype=np.int64).astype(np.int8)
        want = np.asarray(Int8Engine(g, mode="exact")(x))
        got = np.asarray(Int8Engine(g, mode=mode)(x))
        np.testing.assert_array_equal(got, want,
                                      err_msg=f"{opname} {mode}")


def test_resize_nearest_bit_exact():
    """RESIZE_NEAREST_NEIGHBOR (the darknet `upsample` layer): our
    exporter's flatbuffer runs in the stock reference interpreter and the
    engine matches it bit-for-bit; the arena modes agree too."""
    q = QParams((0.05,), (3,))
    tensors = [
        TensorDef(0, "in", (1, 8, 8, 4), np.dtype(np.int8), q),
        TensorDef(1, "size", (2,), np.dtype(np.int32), None,
                  np.array([16, 16], np.int32)),
        TensorDef(2, "out", (1, 16, 16, 4), np.dtype(np.int8), q),
    ]
    g = GraphDef(tensors,
                 [OpDef(0, "RESIZE_NEAREST_NEIGHBOR", [0, 1], [2],
                        {"align_corners": False,
                         "half_pixel_centers": False})],
                 [0], [2])
    x = np.random.default_rng(9).integers(
        -128, 128, (1, 8, 8, 4), dtype=np.int64).astype(np.int8)
    got, want = run_both(g, x)
    np.testing.assert_array_equal(got, want)
    for mode in ("pallas_arena", "pallas_mxu"):
        m = np.asarray(Int8Engine(g, mode=mode)(x))
        np.testing.assert_array_equal(m, want)

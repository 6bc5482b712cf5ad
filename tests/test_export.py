"""Exporter tests: GraphDef -> .tflite round-trip through our importer, and
interop with the stock TFLite interpreter; darknet .weights round-trip."""

import numpy as np
import pytest

import jax

from yoloface_tpu.io.darknet import (LAYER_ORDER, load_darknet_weights,
                                     save_darknet_weights)
from yoloface_tpu.io.tflite_export import export_tflite
from yoloface_tpu.io.tflite_import import load_tflite
from yoloface_tpu.models.yoloface import YoloFace
from yoloface_tpu.runtime.engine import Int8Engine


def test_tflite_roundtrip_through_importer(int8_graph):
    blob = export_tflite(int8_graph)
    g2 = load_tflite(blob)
    assert len(g2.tensors) == len(int8_graph.tensors)
    assert len(g2.ops) == len(int8_graph.ops)
    assert g2.inputs == int8_graph.inputs
    assert g2.outputs == int8_graph.outputs
    for t1, t2 in zip(int8_graph.tensors, g2.tensors):
        assert t1.name == t2.name
        assert tuple(t1.shape) == tuple(t2.shape)
        assert t1.dtype == t2.dtype
        if t1.qparams is not None:
            np.testing.assert_allclose(t2.qparams.scales, t1.qparams.scales,
                                       rtol=1e-7)
            assert t2.qparams.zero_points == t1.qparams.zero_points
        if t1.is_const:
            np.testing.assert_array_equal(t2.data, t1.data)
    for o1, o2 in zip(int8_graph.ops, g2.ops):
        assert o1.opname == o2.opname
        assert o1.inputs == o2.inputs and o1.outputs == o2.outputs
        for k, v in o1.attrs.items():
            assert o2.attrs[k] == pytest.approx(v), (o1.opname, k)


def test_exported_graph_runs_identically(int8_graph, dataset_images):
    blob = export_tflite(int8_graph)
    eng1 = Int8Engine(int8_graph)
    eng2 = Int8Engine(load_tflite(blob))
    x = dataset_images[sorted(dataset_images)[0]]
    np.testing.assert_array_equal(np.asarray(eng1(x)), np.asarray(eng2(x)))


def test_exported_tflite_runs_in_stock_interpreter(int8_graph,
                                                   dataset_images,
                                                   tmp_path):
    """Interop: the stock tf.lite.Interpreter must load and run our
    serialized flatbuffer and produce the SAME outputs as on the original
    file (same graph, same weights, same quant params)."""
    tf = pytest.importorskip("tensorflow")
    blob = export_tflite(int8_graph)
    p = tmp_path / "exported.tflite"
    p.write_bytes(blob)
    interp = tf.lite.Interpreter(
        model_path=str(p),
        experimental_op_resolver_type=tf.lite.experimental.OpResolverType.BUILTIN_REF)
    interp.allocate_tensors()
    ref = tf.lite.Interpreter(
        model_path="/root/reference/yoloface/tflite/yoloface_int8.tflite",
        experimental_op_resolver_type=tf.lite.experimental.OpResolverType.BUILTIN_REF)
    ref.allocate_tensors()
    for name, x in sorted(dataset_images.items())[:4]:
        interp.set_tensor(interp.get_input_details()[0]["index"], x)
        interp.invoke()
        got = interp.get_tensor(interp.get_output_details()[0]["index"])
        ref.set_tensor(ref.get_input_details()[0]["index"], x)
        ref.invoke()
        want = ref.get_tensor(ref.get_output_details()[0]["index"])
        np.testing.assert_array_equal(got, want, err_msg=name)


def test_darknet_roundtrip(tmp_path):
    """save -> load -> identical variables; and the stream is byte-stable."""
    model = YoloFace()
    variables = model.init(jax.random.PRNGKey(3),
                           np.zeros((1, 56, 56, 3), np.float32), train=True)
    # force identity-BN head like a darknet checkpoint
    v = jax.tree.map(np.asarray, dict(variables))
    p = str(tmp_path / "w.weights")
    save_darknet_weights(v, p)
    loaded = load_darknet_weights(p)
    for path, _ in LAYER_ORDER:
        node_s, node_l = v["params"], loaded["params"]
        for part in path.split("/"):
            node_s, node_l = node_s[part], node_l[part]
        np.testing.assert_allclose(node_l["conv"]["kernel"],
                                   node_s["conv"]["kernel"], rtol=1e-6)
        np.testing.assert_allclose(node_l["bn"]["scale"],
                                   node_s["bn"]["scale"], rtol=1e-6)
    # loaded darknet variables drive the model
    y = YoloFace().apply({"params": loaded["params"],
                          "batch_stats": loaded["batch_stats"]},
                         np.zeros((1, 56, 56, 3), np.float32), train=False)
    assert y.shape == (1, 7, 7, 18)


def test_darknet_truncated_file_rejected(tmp_path):
    p = tmp_path / "bad.weights"
    p.write_bytes(b"\0" * 100)
    with pytest.raises(ValueError, match="truncated"):
        load_darknet_weights(str(p))

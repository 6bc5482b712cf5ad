"""ONNX export: structural verification of the hand-rolled protobuf.

onnx/onnxruntime are absent in this environment (the reference's
`train.py:355-396` / `onnx_prediction.py` capability is validated
structurally): the emitted bytes are re-parsed with the module's own
wire-format reader and checked against the source GraphDef — node
topology, conv weight layout round-trip, pads, and graph io."""

import numpy as np
import pytest

from yoloface_tpu.io.onnx_export import export_onnx, parse_model
from yoloface_tpu.models.import_weights import dequantize_template_weights


@pytest.fixture(scope="module")
def onnx_bytes(int8_graph):
    weights = dequantize_template_weights(int8_graph)
    return export_onnx(int8_graph, weights), weights


def test_model_header(onnx_bytes):
    buf, _ = onnx_bytes
    m = parse_model(buf)
    assert m["ir_version"] == 8
    assert m["opset"] == 13
    assert m["inputs"] and m["outputs"]


def test_node_topology_matches_graph(int8_graph, onnx_bytes):
    buf, _ = onnx_bytes
    m = parse_model(buf)
    onnx_ops = [n["op_type"] for n in m["nodes"]]
    want = {"CONV_2D": "Conv", "DEPTHWISE_CONV_2D": "Conv",
            "MAX_POOL_2D": "MaxPool", "LEAKY_RELU": "LeakyRelu",
            "ADD": "Add", "CONCATENATION": "Concat",
            "QUANTIZE": "Identity"}
    expect = [want[o.opname] for o in int8_graph.ops if o.opname != "PAD"]
    assert onnx_ops == expect
    # every node input resolves to a prior output, an initializer, or the
    # graph input
    known = set(m["inputs"]) | set(m["initializers"])
    for n in m["nodes"]:
        for i in n["inputs"]:
            assert i in known, f"dangling input {i} of {n['name']}"
        known.update(n["outputs"])
    assert m["outputs"][0] in known


def test_conv_weights_roundtrip(int8_graph, onnx_bytes):
    buf, weights = onnx_bytes
    m = parse_model(buf)
    convs = [n for n in m["nodes"] if n["op_type"] == "Conv"]
    srcs = [o for o in int8_graph.ops
            if o.opname in ("CONV_2D", "DEPTHWISE_CONV_2D")]
    assert len(convs) == len(srcs)
    for n, op in zip(convs, srcs):
        w, b = weights[op.index]
        dims, data = m["initializers"][n["inputs"][1]]
        if op.opname == "CONV_2D":
            want = np.transpose(w, (0, 3, 1, 2))
            assert "group" not in n["attrs"]
        else:
            want = np.transpose(w, (3, 0, 1, 2))
            assert n["attrs"]["group"]["i"] == want.shape[0]
        assert dims == want.shape
        np.testing.assert_array_equal(data, want.astype(np.float32))
        _, bdata = m["initializers"][n["inputs"][2]]
        np.testing.assert_allclose(bdata, b, rtol=1e-6)
        assert tuple(n["attrs"]["strides"]["ints"]) == \
            (op.attrs["stride_h"], op.attrs["stride_w"])


def test_darknet_pad_absorbed(int8_graph, onnx_bytes):
    """The stem conv consumes a PAD op; its ONNX pads must be the darknet
    top-left (1,1,0,0) and no Pad node may remain."""
    buf, _ = onnx_bytes
    m = parse_model(buf)
    assert all(n["op_type"] != "Pad" for n in m["nodes"])
    stem = next(n for n in m["nodes"] if n["op_type"] == "Conv")
    assert tuple(stem["attrs"]["pads"]["ints"]) == (1, 1, 0, 0)


def test_maxpool_same_pads(int8_graph, onnx_bytes):
    """pool_8 (8x8 s2, 28->14) carries TFLite SAME pads: total 6 -> (3,3)
    per dim.  (X-CUBE-AI's network.c:2647 records its own (3,3,4,4)
    convention for the same layer; the TFLite bit-parity tests pin ours.)"""
    buf, _ = onnx_bytes
    m = parse_model(buf)
    pool8 = next(n for n in m["nodes"] if n["op_type"] == "MaxPool"
                 and tuple(n["attrs"]["kernel_shape"]["ints"]) == (8, 8))
    assert tuple(n for n in pool8["attrs"]["pads"]["ints"]) == (3, 3, 3, 3)


def test_save_and_size(tmp_path, int8_graph):
    from yoloface_tpu.io.onnx_export import save_onnx
    weights = dequantize_template_weights(int8_graph)
    p = tmp_path / "yoloface.onnx"
    save_onnx(int8_graph, weights, str(p))
    # float weights ~ 4x the 11,304 B int8 blob plus structure; the
    # reference's shipped onnx is 44,238 B (float32 too)
    assert 30_000 < p.stat().st_size < 200_000

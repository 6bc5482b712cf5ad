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


UPSAMPLE_CFG = """
[net]
width=16
height=16
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
activation=leaky

[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
activation=leaky

[upsample]
stride=2

[convolutional]
filters=18
size=1
stride=1
activation=linear

[yolo]
"""


def test_retarget_rewrites_resize_size_constant():
    """RESIZE_NEAREST_NEIGHBOR carries its out H,W as a (2,) int32 const;
    retargeting must rewrite it or the exported flatbuffer upsamples to
    the OLD resolution in the stock interpreter (ADVICE r2 #2).  Pin
    bit-parity of the retargeted-with-upsample flatbuffer."""
    tf = pytest.importorskip("tensorflow")
    from yoloface_tpu.io.darknet_cfg import DarknetNet, template_from_darknet
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.quantize.calibrate import calibrate_from_weights

    net = DarknetNet(UPSAMPLE_CFG)
    rng = np.random.default_rng(0)
    params = {}
    for i, layer in enumerate(net.layers):
        if layer.kind != "conv":
            continue
        k, co, ci = layer.size, layer.filters, layer.cin
        p = {"kernel": rng.normal(0, 0.4 / np.sqrt(k * k * ci),
                                  (k, k, ci, co)).astype(np.float32)}
        if layer.bn:
            p.update(bn_scale=rng.uniform(0.5, 1.5, co).astype(np.float32),
                     bn_bias=rng.normal(0, 0.2, co).astype(np.float32),
                     bn_mean=rng.normal(0, 0.2, co).astype(np.float32),
                     bn_var=rng.uniform(0.5, 1.5, co).astype(np.float32))
        else:
            p["bias"] = rng.normal(0, 0.2, co).astype(np.float32)
        params[f"layer{i}"] = p
    template, weights = template_from_darknet(net, params)
    rep = rng.uniform(0, 1, (8, 16, 16, 3)).astype(np.float32)
    int8 = calibrate_from_weights(weights, rep, template)

    g2 = retarget_spatial(int8, 2)
    resize = next(o for o in g2.ops
                  if o.opname == "RESIZE_NEAREST_NEIGHBOR")
    size = g2.tensor(resize.inputs[1]).data
    np.testing.assert_array_equal(size, [16, 16])       # 8x8 * 2(up) * 2(ret)

    buf = export_tflite(g2)
    it = tf.lite.Interpreter(
        model_content=buf,
        experimental_op_resolver_type=(
            tf.lite.experimental.OpResolverType.BUILTIN_REF))
    it.allocate_tensors()
    x = _rand_input((1, 32, 32, 3), seed=3)
    it.set_tensor(it.get_input_details()[0]["index"], x)
    it.invoke()
    want = it.get_tensor(it.get_output_details()[0]["index"])
    got = np.asarray(Int8Engine(load_tflite(buf), mode="exact")(x))
    np.testing.assert_array_equal(got, want)


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


def test_retargeted_detection_translation_invariance(int8_graph, graph112):
    """The retargeted family is a real DETECTOR at scale: a yoloface-56
    frame pasted into a 112 canvas at a stride-lattice offset must yield
    the SAME detection shifted by the offset (the fully-conv net is
    translation-equivariant on the x8 lattice; the head decodes grid 14
    with the same stride/anchors, boxes clamped to the 112 frame —
    pipeline/head.py clamp parametrization).  Reference role: the scale
    variant as a deployable detector (yolov3_train_tf.py:31-32)."""
    import cv2

    from yoloface_tpu.pipeline.e2e import FacePipeline
    from yoloface_tpu.pipeline.head import HeadConfig

    img = cv2.cvtColor(
        cv2.imread("/root/reference/yoloface/small_dataset/img_1087.jpg"),
        cv2.COLOR_BGR2RGB)
    x56 = (cv2.resize(img, (56, 56)).astype(np.float32)
           - 128.0).astype(np.int8)
    off = 48                                   # multiple of the x8 lattice
    zp = int8_graph.tensor(int8_graph.inputs[0]).qparams.zero_point
    canvas = np.full((112, 112, 3), zp, np.int8)
    canvas[off:off + 56, off:off + 56] = x56

    pipe56 = FacePipeline(Int8Engine(int8_graph, mode="fast"))
    det56 = pipe56.detect_int8(x56[None])
    pipe112 = FacePipeline(Int8Engine(graph112, mode="fast"),
                           HeadConfig(grid=14))
    det112 = pipe112.detect_int8(canvas[None])

    n56 = int(np.asarray(det56["count"])[0])
    assert n56 >= 1 and int(np.asarray(det112["count"])[0]) >= 1

    # equivariance is exact only away from frame borders (each layer's
    # SAME padding uses its own zero point, which a conv over the
    # canvas's zp background does not reproduce), so match the shifted
    # face box by IoU instead of comparing whole detection sets
    b56 = np.asarray(det56["boxes"])[0][np.asarray(det56["valid"])[0]]
    b112 = np.asarray(det112["boxes"])[0][np.asarray(det112["valid"])[0]]
    want = b56[0] + off                        # shifted by the paste

    def iou(a, b):
        ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
        iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
        inter = ix * iy
        ar = (a[2] - a[0]) * (a[3] - a[1])
        br = (b[2] - b[0]) * (b[3] - b[1])
        return inter / (ar + br - inter)

    best = max(iou(want, b) for b in b112)
    assert best > 0.8, (want, b112)
    # boxes beyond x=55 prove the clamp follows the retargeted frame
    assert b112.max() > 56.0

"""End-to-end int8 PTQ of an ARBITRARY darknet graph: a yolov3-tiny-style
two-headed FPN net (convs, maxpools, routes, upsample, two yolo heads)
goes cfg -> template -> calibrate -> flatbuffer -> stock-interpreter /
engine bit parity.

This generalizes the reference's fixed pipeline (yolo_to_h5.py -> h5_to_pb
-> tflite_quantize.py, which only ever quantized the one yoloface graph)
to every cfg the parser accepts, and exercises RESIZE_NEAREST_NEIGHBOR and
multi-output engine support."""

import numpy as np
import pytest

from yoloface_tpu.io.darknet_cfg import DarknetNet, template_from_darknet
from yoloface_tpu.io.tflite_export import export_tflite
from yoloface_tpu.io.tflite_import import load_tflite
from yoloface_tpu.quantize.calibrate import (calibrate_from_weights,
                                             float_forward)
from yoloface_tpu.runtime.engine import Int8Engine

V3_TINY_CFG = """
[net]
width=32
height=32
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=64
size=3
stride=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=1
stride=1
activation=leaky

[convolutional]
batch_normalize=1
filters=64
size=3
stride=1
activation=leaky

[convolutional]
filters=18
size=1
stride=1
activation=linear

[yolo]

[route]
layers=-4

[convolutional]
batch_normalize=1
filters=16
size=1
stride=1
activation=leaky

[upsample]
stride=2

[route]
layers=-1,4

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
activation=leaky

[convolutional]
filters=18
size=1
stride=1
activation=linear

[yolo]
"""


def _random_params(net: DarknetNet, seed=0):
    rng = np.random.default_rng(seed)
    params = {}
    for i, layer in enumerate(net.layers):
        if layer.kind != "conv":
            continue
        k, co = layer.size, layer.filters
        ci = 1 if layer.depthwise else layer.cin
        p = {"kernel": rng.normal(
            0, 0.4 / np.sqrt(k * k * ci),
            (k, k, ci, co)).astype(np.float32)}
        if layer.bn:
            p["bn_scale"] = rng.uniform(0.5, 1.5, co).astype(np.float32)
            p["bn_bias"] = rng.normal(0, 0.2, co).astype(np.float32)
            p["bn_mean"] = rng.normal(0, 0.2, co).astype(np.float32)
            p["bn_var"] = rng.uniform(0.5, 1.5, co).astype(np.float32)
        else:
            p["bias"] = rng.normal(0, 0.2, co).astype(np.float32)
        params[f"layer{i}"] = p
    return params


@pytest.fixture(scope="module")
def v3tiny():
    net = DarknetNet(V3_TINY_CFG)
    params = _random_params(net)
    template, weights = template_from_darknet(net, params)
    return net, params, template, weights


def test_template_matches_darknet_forward(v3tiny):
    """The GraphDef template's float interpretation == DarknetNet.apply
    (BN folding, darknet pads, routes, upsample, two heads)."""
    net, params, template, weights = v3tiny
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    env = float_forward(template, weights, x)
    heads = [np.asarray(env[o]) for o in template.outputs]
    want = [np.asarray(h) for h in net.apply(params, x)]
    assert len(heads) == len(want) == 2
    assert heads[0].shape == (2, 4, 4, 18)
    assert heads[1].shape == (2, 8, 8, 18)
    for got, exp in zip(heads, want):
        np.testing.assert_allclose(got, exp, rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def v3tiny_int8(v3tiny):
    _, _, template, weights = v3tiny
    rng = np.random.default_rng(5)
    rep = rng.uniform(0, 1, (16, 32, 32, 3)).astype(np.float32)
    return calibrate_from_weights(weights, rep, template)


def test_v3tiny_engine_vs_stock_interpreter(v3tiny_int8):
    """Exported flatbuffer runs in the stock TFLite reference interpreter;
    the exact engine matches BOTH heads bit-for-bit."""
    tf = pytest.importorskip("tensorflow")
    blob = export_tflite(v3tiny_int8)
    it = tf.lite.Interpreter(
        model_content=blob,
        experimental_op_resolver_type=(
            tf.lite.experimental.OpResolverType.BUILTIN_REF))
    it.allocate_tensors()
    x = np.random.default_rng(7).integers(
        -128, 128, (1, 32, 32, 3), dtype=np.int64).astype(np.int8)
    it.set_tensor(it.get_input_details()[0]["index"], x)
    it.invoke()
    want = {tuple(d["shape"]): it.get_tensor(d["index"])
            for d in it.get_output_details()}

    eng = Int8Engine(load_tflite(blob), mode="exact")
    outs = eng(x)
    assert isinstance(outs, tuple) and len(outs) == 2
    for o in outs:
        o = np.asarray(o)
        np.testing.assert_array_equal(o, want[o.shape])


def test_v3tiny_all_mode_twins(v3tiny_int8):
    """fast == pallas_mxu and exact == pallas_mxu_exact on the two-headed
    graph (multi-output arena plans, RESIZE in-kernel)."""
    x = np.random.default_rng(11).integers(
        -128, 128, (4, 32, 32, 3), dtype=np.int64).astype(np.int8)
    ref = {m: [np.asarray(o) for o in Int8Engine(v3tiny_int8, mode=m)(x)]
           for m in ("fast", "exact")}
    for mode, twin in (("pallas_mxu", "fast"),
                       ("pallas_mxu_exact", "exact")):
        got = [np.asarray(o) for o in Int8Engine(v3tiny_int8, mode=mode)(x)]
        for g_, w_ in zip(got, ref[twin]):
            np.testing.assert_array_equal(g_, w_)


@pytest.mark.slow
def test_v3tiny_perop_fused_tiled_twins(v3tiny_int8, monkeypatch):
    """The per-op, fused AND tiled mode families on the two-headed FPN
    graph (1-input route pass-through, RESIZE/eltwise op widening, tiled
    prefix-cut at the upsample): every family bit-exact vs its XLA twin
    on both heads.  Tiled knobs force real tiling of the 32px planes."""
    monkeypatch.setenv("YOLOFACE_TPU_TILE_XLA", "none")
    import yoloface_tpu.kernels.pallas_tiled as pt
    monkeypatch.setattr(pt, "TILE_THRESHOLD", 0)
    monkeypatch.setattr(pt, "_NW_CAP", 2)
    monkeypatch.setattr(pt, "_VMEM_TARGET", 1)
    monkeypatch.setattr(pt, "_CHUNK_TARGET", 1 << 20)
    x = np.random.default_rng(11).integers(
        -128, 128, (2, 32, 32, 3), dtype=np.int64).astype(np.int8)
    ref = {m: [np.asarray(o) for o in Int8Engine(v3tiny_int8, mode=m)(x)]
           for m in ("fast", "fast2", "exact")}
    for mode, twin in (("pallas", "fast"), ("pallas_exact", "exact"),
                       ("pallas_fused", "fast"),
                       ("pallas_fused_exact", "exact"),
                       ("pallas_tiled2", "fast2"),
                       ("pallas_tiled_exact", "exact")):
        got = [np.asarray(o) for o in Int8Engine(v3tiny_int8, mode=mode)(x)]
        for g_, w_ in zip(got, ref[twin]):
            np.testing.assert_array_equal(g_, w_)


def _random_cfg(rng):
    """A random small darknet net: conv/dw/maxpool/route/shortcut/upsample
    with legal shapes, ending in a linear head."""
    lines = ["[net]", "width=16", "height=16", "channels=3", ""]
    chans = []          # out channels per layer
    sizes = []          # spatial size per layer
    cur_c, cur_s = 3, 16
    n_layers = rng.integers(4, 9)
    for i in range(int(n_layers)):
        kinds = ["conv", "conv", "dw", "maxpool"]
        if cur_s >= 2 and chans:
            kinds.append("upsample" if cur_s <= 8 else "maxpool")
        same_sized = [j for j in range(len(chans)) if sizes[j] == cur_s]
        if same_sized:
            kinds.append("route")
        same_shape = [j for j in range(len(chans))
                      if sizes[j] == cur_s and chans[j] == cur_c]
        if same_shape:
            kinds.append("shortcut")
        kind = kinds[rng.integers(len(kinds))]
        if kind == "conv":
            f = int(rng.choice([4, 8, 12, 16]))
            k = int(rng.choice([1, 3]))
            act = str(rng.choice(["leaky", "leaky", "relu"]))
            lines += ["[convolutional]", "batch_normalize=1",
                      f"filters={f}", f"size={k}", "stride=1",
                      f"activation={act}", ""]
            cur_c = f
        elif kind == "dw":
            lines += ["[convolutional]", "batch_normalize=1",
                      f"filters={cur_c}", "size=3", "stride=1",
                      f"groups={cur_c}", "activation=leaky", ""]
        elif kind == "maxpool" and cur_s >= 2:
            lines += ["[maxpool]", "size=2", "stride=2", ""]
            cur_s //= 2
        elif kind == "upsample":
            lines += ["[upsample]", "stride=2", ""]
            cur_s *= 2
        elif kind == "route":
            j = int(rng.choice(same_sized))
            rel = j - len(chans)
            lines += ["[route]", f"layers=-1,{rel}", ""]
            cur_c = cur_c + chans[j]
        elif kind == "shortcut":
            j = int(rng.choice(same_shape))
            rel = j - len(chans)
            lines += ["[shortcut]", f"from={rel}", ""]
        else:
            lines += ["[maxpool]", "size=2", "stride=1", ""]
        chans.append(cur_c)
        sizes.append(cur_s)
    lines += ["[convolutional]", "filters=6", "size=1", "stride=1",
              "activation=linear", ""]
    return "\n".join(lines)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_cfg_int8_fuzz(seed):
    """Property test of the WHOLE generic chain: random legal cfg ->
    template (float parity vs DarknetNet.apply) -> calibrate -> flatbuffer
    -> exact engine bit-identical to the stock reference interpreter."""
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(100 + seed)
    cfg = _random_cfg(rng)
    net = DarknetNet(cfg)
    params = _random_params(net, seed=seed)
    template, weights = template_from_darknet(net, params)

    x_f = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    env = float_forward(template, weights, x_f)
    got_f = [np.asarray(env[o]) for o in template.outputs]
    want_f = net.apply(params, x_f)
    if not isinstance(want_f, list):
        want_f = [want_f]
    for a, b in zip(got_f, want_f):
        np.testing.assert_allclose(a, np.asarray(b), rtol=2e-4, atol=2e-4)

    rep = rng.uniform(0, 1, (8, 16, 16, 3)).astype(np.float32)
    g = calibrate_from_weights(weights, rep, template)
    blob = export_tflite(g)
    it = tf.lite.Interpreter(
        model_content=blob,
        experimental_op_resolver_type=(
            tf.lite.experimental.OpResolverType.BUILTIN_REF))
    it.allocate_tensors()
    x = rng.integers(-128, 128, (1, 16, 16, 3),
                     dtype=np.int64).astype(np.int8)
    it.set_tensor(it.get_input_details()[0]["index"], x)
    it.invoke()
    want = it.get_tensor(it.get_output_details()[0]["index"])
    got = np.asarray(Int8Engine(load_tflite(blob), mode="exact")(x))
    np.testing.assert_array_equal(got, want)


def test_multihead_detection_decode(v3tiny_int8):
    """detect_multihead pools both FPN heads' candidates and applies one
    cross-head NMS — the deployment-side decode the reference only has as
    trainer-side eval (yolov3_train_tf.py:697-760)."""
    from yoloface_tpu.pipeline.head import HeadConfig, detect_multihead
    eng = Int8Engine(v3tiny_int8, mode="exact")
    x = np.random.default_rng(21).integers(
        -128, 128, (3, 32, 32, 3), dtype=np.int64).astype(np.int8)
    heads = eng(x)
    qs = [v3tiny_int8.tensor(o).qparams for o in v3tiny_int8.outputs]
    cfgs = [HeadConfig(grid=4, stride=8,
                       anchors=((9, 14), (12, 17), (22, 21))),
            HeadConfig(grid=8, stride=4,
                       anchors=((4, 7), (6, 8), (11, 10)))]
    boxes, scores, valid = detect_multihead(
        heads, cfgs, scales=[q.scale for q in qs],
        zero_points=[q.zero_point for q in qs], input_size=32.0,
        conf_threshold=0.5)
    boxes, scores, valid = map(np.asarray, (boxes, scores, valid))
    assert boxes.shape == (3, 16, 4) and valid.dtype == bool
    # candidates pooled across heads: 4*4*3 + 8*8*3 = 240 cells ranked
    assert scores.shape == (3, 16)
    # geometric sanity: every valid box inside the 32px frame, nonneg area
    for b, v in zip(boxes.reshape(-1, 4), valid.ravel()):
        if v:
            x1, y1, x2, y2 = b
            assert 0.0 <= x1 <= x2 <= 31.0 and 0.0 <= y1 <= y2 <= 31.0
    # NMS property: no two valid boxes in one frame overlap > iou 0.5
    from yoloface_tpu.pipeline.head import _iou_matrix
    import jax.numpy as jnp
    for n in range(3):
        vmask = valid[n]
        iou = np.asarray(_iou_matrix(jnp.asarray(boxes[n])))
        for i in range(16):
            for j in range(i):
                if vmask[i] and vmask[j]:
                    assert iou[i, j] <= 0.5 + 1e-6

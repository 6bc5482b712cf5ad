"""Differential fuzz of the W-strip tiled lowering (kernels/pallas_tiled.py).

Random small darknet graphs over the tiled op surface — 1x1/3x3 convs
(stride 1 SAME and darknet stride-2 PAD+VALID), depthwise convs, SAME
maxpools landing on odd widths (pad-induced width mismatch -> NW pinning),
routes (CONCAT), shortcuts (ADD), leaky/relu/linear activations — are
carried through the real PTQ chain (template -> calibrate -> int8
GraphDef), then `pallas_tiled2` must be bit-identical to the `fast2` XLA
twin (and `pallas_tiled_exact` to `exact`) on CPU interpret.

This is the planner's property test: halo extents, PAD absorption and
fill classes, section cuts, view aliasing and the requant epilogues must
hold for every sampled topology, not just the shipped yoloface shapes.
The absorbed-PAD->MAX_POOL fill bug (pad cells must participate in the
max at the PAD output's zero-point) was exactly this class of silent
divergence; tests/test_tiled.py pins that one deterministically.

Reference role: the binary kernel library consuming arbitrary generated
graphs (stm32 layers_conv2d.h:192), generalized the way yolo_to_h5.py:60-353
accepts arbitrary cfgs."""
import numpy as np
import pytest

from yoloface_tpu.io.darknet_cfg import DarknetNet, template_from_darknet
from yoloface_tpu.quantize.calibrate import calibrate_from_weights
from yoloface_tpu.runtime.engine import Int8Engine


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


def _random_tiled_cfg(rng):
    """A random darknet net over the tiled surface plus the occasional
    upsample (RESIZE_NEAREST_NEIGHBOR ends the tiled prefix at plan time;
    the tail runs in the suffix).  14x14 input so stride-2 chains land on
    odd sizes and SAME pools get real padding."""
    lines = ["[net]", "width=14", "height=14", "channels=3", ""]
    chans, sizes = [], []
    cur_c, cur_s = 3, 14
    for _ in range(int(rng.integers(4, 9))):
        kinds = ["conv", "conv", "dw", "maxpool1"]
        if cur_s >= 4:
            kinds += ["maxpool", "sconv", "sdw"]
        if cur_s <= 7:
            kinds.append("upsample")
        same_sized = [j for j in range(len(chans)) if sizes[j] == cur_s]
        if same_sized:
            kinds.append("route")
        same_shape = [j for j in range(len(chans))
                      if sizes[j] == cur_s and chans[j] == cur_c]
        if same_shape:
            kinds.append("shortcut")
        kind = kinds[int(rng.integers(len(kinds)))]
        act = str(rng.choice(["leaky", "leaky", "relu", "linear"]))
        if kind in ("conv", "sconv"):
            f = int(rng.choice([4, 8, 12]))
            k = 3 if kind == "sconv" else int(rng.choice([1, 3]))
            s = 2 if kind == "sconv" else 1
            lines += ["[convolutional]", "batch_normalize=1",
                      f"filters={f}", f"size={k}", f"stride={s}",
                      f"activation={act}", ""]
            cur_c = f
            if s == 2:
                cur_s = (cur_s + 1 - 3) // 2 + 1   # darknet pad + VALID
        elif kind in ("dw", "sdw"):
            s = 2 if kind == "sdw" else 1
            lines += ["[convolutional]", "batch_normalize=1",
                      f"filters={cur_c}", "size=3", f"stride={s}",
                      f"groups={cur_c}", f"activation={act}", ""]
            if s == 2:
                cur_s = (cur_s + 1 - 3) // 2 + 1
        elif kind == "maxpool":
            lines += ["[maxpool]", "size=2", "stride=2", ""]
            cur_s = -(-cur_s // 2)                 # SAME: ceil
        elif kind == "maxpool1":                   # v3-tiny tail style
            lines += ["[maxpool]", "size=2", "stride=1", ""]
        elif kind == "upsample":
            lines += ["[upsample]", "stride=2", ""]
            cur_s *= 2
        elif kind == "route":
            j = int(rng.choice(same_sized))
            lines += ["[route]", f"layers=-1,{j - len(chans)}", ""]
            cur_c = cur_c + chans[j]
        else:                                      # shortcut
            j = int(rng.choice(same_shape))
            lines += ["[shortcut]", f"from={j - len(chans)}", ""]
        chans.append(cur_c)
        sizes.append(cur_s)
    lines += ["[convolutional]", "filters=6", "size=1", "stride=1",
              "activation=linear", ""]
    return "\n".join(lines)


def _int8_graph(seed):
    rng = np.random.default_rng(1000 + seed)
    net = DarknetNet(_random_tiled_cfg(rng))
    template, weights = template_from_darknet(net, _random_params(net,
                                                                  seed=seed))
    rep = rng.uniform(0, 1, (8, 14, 14, 3)).astype(np.float32)
    return calibrate_from_weights(weights, rep, template), rng


def _tile_everything(monkeypatch):
    """Tiny threshold so every 14px plane tiles; small strips/chunks keep
    XLA-CPU interpret compile time bounded (mirrors test_tiled.py)."""
    monkeypatch.setenv("YOLOFACE_TPU_TILE_XLA", "none")
    import yoloface_tpu.kernels.pallas_tiled as pt
    monkeypatch.setattr(pt, "TILE_THRESHOLD", 0)
    monkeypatch.setattr(pt, "_NW_CAP", 2)
    monkeypatch.setattr(pt, "_VMEM_TARGET", 1)
    monkeypatch.setattr(pt, "_CHUNK_TARGET", 1 << 20)


@pytest.mark.parametrize("seed", [0, 1, 2,
                                  pytest.param(3, marks=pytest.mark.slow),
                                  pytest.param(4, marks=pytest.mark.slow)])
def test_tiled_fuzz_fast_bits(seed, monkeypatch):
    _tile_everything(monkeypatch)
    g, rng = _int8_graph(seed)
    from yoloface_tpu.kernels.pallas_tiled import plan_tiled_split
    sections, suffix = plan_tiled_split(g)
    if any(op.opname == "RESIZE_NEAREST_NEIGHBOR" for op in g.ops):
        assert suffix                     # upsample ends the tiled prefix
    else:
        assert sections and not suffix    # the whole net runs tiled
    x = rng.integers(-128, 128, (2, 14, 14, 3),
                     dtype=np.int64).astype(np.int8)
    ref = np.asarray(Int8Engine(g, mode="fast2")(x))
    out = np.asarray(Int8Engine(g, mode="pallas_tiled2")(x))
    np.testing.assert_array_equal(ref, out)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 3])
def test_tiled_fuzz_exact_bits(seed, monkeypatch):
    _tile_everything(monkeypatch)
    g, rng = _int8_graph(seed)
    x = rng.integers(-128, 128, (2, 14, 14, 3),
                     dtype=np.int64).astype(np.int8)
    ref = np.asarray(Int8Engine(g, mode="exact")(x))
    out = np.asarray(Int8Engine(g, mode="pallas_tiled_exact")(x))
    np.testing.assert_array_equal(ref, out)


def _cfg_graph(cfg_text, seed=11):
    rng = np.random.default_rng(seed)
    net = DarknetNet(cfg_text)
    template, weights = template_from_darknet(net, _random_params(net,
                                                                  seed=seed))
    rep = rng.uniform(0, 1, (8, 14, 14, 3)).astype(np.float32)
    return calibrate_from_weights(weights, rep, template), rng


UPSAMPLE_CFG = """[net]
width=14
height=14
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
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
filters=6
size=1
stride=1
activation=linear
"""

STRIDED_1X1_CFG = """[net]
width=14
height=14
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
activation=leaky

[convolutional]
batch_normalize=1
filters=8
size=1
stride=2
activation=leaky

[convolutional]
filters=6
size=1
stride=1
activation=linear
"""

DW5_CFG = """[net]
width=14
height=14
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
activation=leaky

[convolutional]
batch_normalize=1
filters=8
size=5
stride=1
groups=8
activation=leaky

[convolutional]
filters=6
size=1
stride=1
activation=linear
"""


def _has_cut_op(g, suffix):
    """The suffix holds the op that ended the tiled prefix."""
    for op in suffix:
        if op.opname == "RESIZE_NEAREST_NEIGHBOR":
            return True
        if op.opname == "CONV_2D":
            wd = g.tensor(op.inputs[1]).data
            if (wd.shape[1] == wd.shape[2] == 1
                    and op.attrs.get("stride_h", 1) != 1):
                return True
        if op.opname == "DEPTHWISE_CONV_2D":
            wd = g.tensor(op.inputs[1]).data
            if wd.shape[1] != 3:
                return True
    return False


@pytest.mark.parametrize("cfg,routing", [
    (UPSAMPLE_CFG, "none"),        # suffix on the arena
    (UPSAMPLE_CFG, "suffix"),      # suffix on the XLA twin
    (STRIDED_1X1_CFG, "suffix"),   # strided 1x1 only lowers on XLA...
    (STRIDED_1X1_CFG, "none"),     # ...so pure-tiled auto-forces XLA
    (DW5_CFG, "none"),             # 5x5 dw: same auto-forcing
])
def test_tiled_prefix_cut_at_unsupported_op(cfg, routing, monkeypatch):
    """Ops outside the tiled surface (RESIZE_NEAREST upsample, strided
    1x1 conv, non-3x3 depthwise) must END the tiled prefix at plan time,
    not crash the lowering: the plan splits into tiled sections + a
    suffix holding the unsupported op (forced onto the XLA twin when the
    arena can't run it either), and the engine stays bit-exact vs the
    XLA twin."""
    _tile_everything(monkeypatch)
    monkeypatch.setenv("YOLOFACE_TPU_TILE_XLA", routing)
    g, rng = _cfg_graph(cfg)
    from yoloface_tpu.kernels.pallas_tiled import plan_tiled_split
    sections, suffix = plan_tiled_split(g)
    assert sections, "prefix before the unsupported op should tile"
    assert suffix, "the unsupported op and its tail must land in suffix"
    assert _has_cut_op(g, suffix)
    x = rng.integers(-128, 128, (2, 14, 14, 3),
                     dtype=np.int64).astype(np.int8)
    ref = np.asarray(Int8Engine(g, mode="fast2")(x))
    out = np.asarray(Int8Engine(g, mode="pallas_tiled2")(x))
    np.testing.assert_array_equal(ref, out)


@pytest.mark.parametrize("mode,twin", [
    ("pallas_tiled2", "fast2"),
    ("pallas", "fast"),
    ("pallas_exact", "exact"),
    ("pallas_fused", "fast"),
    ("pallas_fused_exact", "exact"),
])
def test_eltwise_activation_ops(mode, twin, monkeypatch):
    """RELU / RELU6 / LOGISTIC as standalone eltwise ops (shared
    activation math, pallas_int8.activation_int32): a hand-built graph
    chains all three plus a QUANTIZE; every Pallas lowering must match
    its XLA twin bit-for-bit."""
    _tile_everything(monkeypatch)
    from yoloface_tpu.graph.ir import GraphDef, OpDef, QParams, TensorDef
    q_in = QParams((0.043,), (-7,))
    tensors = [
        TensorDef(0, "in", (1, 10, 10, 5), np.dtype(np.int8), q_in),
        TensorDef(1, "r", (1, 10, 10, 5), np.dtype(np.int8), q_in),
        TensorDef(2, "r6", (1, 10, 10, 5), np.dtype(np.int8), q_in),
        TensorDef(3, "q", (1, 10, 10, 5), np.dtype(np.int8),
                  QParams((0.021,), (4,))),
        TensorDef(4, "sig", (1, 10, 10, 5), np.dtype(np.int8),
                  QParams((1.0 / 256.0,), (-128,))),
    ]
    ops = [
        OpDef(0, "RELU", [0], [1], {}),
        OpDef(1, "RELU6", [1], [2], {}),
        OpDef(2, "QUANTIZE", [2], [3], {}),
        OpDef(3, "LOGISTIC", [3], [4], {}),
    ]
    g = GraphDef(tensors, ops, [0], [4])
    rng = np.random.default_rng(7)
    x = rng.integers(-128, 128, (2, 10, 10, 5),
                     dtype=np.int64).astype(np.int8)
    ref = np.asarray(Int8Engine(g, mode=twin)(x))
    assert (ref != x.reshape(ref.shape)).any()    # chain actually acts
    out = np.asarray(Int8Engine(g, mode=mode)(x))
    np.testing.assert_array_equal(ref, out)

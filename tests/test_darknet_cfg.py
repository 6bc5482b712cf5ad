"""Generic darknet .cfg parser / graph builder / weights streamer.

Parity targets (`yolo_to_h5.py:60-353`): arbitrary cfg section graphs
(convolutional incl. depthwise groups, route, shortcut, maxpool, upsample,
yolo), darknet weight-stream order, depthwise transpose convention — plus
the VERDICT requirement that the reconstructed yoloface cfg reproduces the
fixed-order importer (io/darknet.py) bit-for-bit and the Flax model's
forward numerically."""

import os

import numpy as np
import pytest

from yoloface_tpu.io.darknet import save_darknet_weights
from yoloface_tpu.io.darknet_cfg import DarknetNet, parse_cfg

CFG_PATH = os.path.join(os.path.dirname(__file__), "..",
                        "yoloface_tpu", "io", "yoloface50k.cfg")


@pytest.fixture(scope="module")
def yoloface_cfg_text():
    with open(CFG_PATH) as f:
        return f.read()


@pytest.fixture(scope="module")
def flax_variables():
    import jax
    from yoloface_tpu.models.yoloface import YoloFace

    return YoloFace().init(jax.random.key(7),
                           np.zeros((1, 56, 56, 3), np.float32),
                           train=False)


@pytest.fixture(scope="module")
def weight_bytes(flax_variables, tmp_path_factory):
    p = tmp_path_factory.mktemp("dk") / "yoloface.weights"
    save_darknet_weights(flax_variables, str(p))
    return p.read_bytes()


def test_parse_sections(yoloface_cfg_text):
    sections = parse_cfg(yoloface_cfg_text)
    kinds = [k for k, _ in sections]
    assert kinds[0] == "net"
    assert kinds.count("convolutional") == 24   # 23 conv+BN blocks + head
    assert kinds.count("route") == 4
    assert kinds.count("maxpool") == 2
    assert kinds.count("shortcut") == 3
    assert kinds.count("yolo") == 1


def test_yoloface_cfg_matches_fixed_importer(yoloface_cfg_text,
                                             flax_variables, weight_bytes):
    """The generic streamer consumes the same bytes as io/darknet.py's
    fixed-order importer and recovers bit-identical kernels/BN arrays."""
    from yoloface_tpu.io.darknet import LAYER_ORDER

    net = DarknetNet(yoloface_cfg_text)
    assert net.num_weight_floats() * 4 + 20 == len(weight_bytes)
    params = net.load_weights(weight_bytes)

    conv_layers = [i for i, l in enumerate(net.layers) if l.kind == "conv"]
    assert len(conv_layers) == len(LAYER_ORDER) + 1   # + biased head

    fp = flax_variables["params"]
    fs = flax_variables["batch_stats"]

    def flax_node(path):
        pn, sn = fp, fs
        for part in path.split("/"):
            pn, sn = pn[part], sn[part]
        return pn, sn

    for (path, _), li in zip(LAYER_ORDER, conv_layers):
        got = params[f"layer{li}"]
        pn, sn = flax_node(path)
        np.testing.assert_array_equal(got["kernel"], pn["conv"]["kernel"],
                                      err_msg=path)
        np.testing.assert_array_equal(got["bn_scale"], pn["bn"]["scale"])
        np.testing.assert_array_equal(got["bn_bias"], pn["bn"]["bias"])
        np.testing.assert_array_equal(got["bn_mean"], sn["bn"]["mean"])
        np.testing.assert_array_equal(got["bn_var"], sn["bn"]["var"])
    # head: bias conv, no BN
    head = params[f"layer{conv_layers[-1]}"]
    np.testing.assert_array_equal(head["kernel"],
                                  fp["conv17"]["conv"]["kernel"])
    np.testing.assert_array_equal(head["bias"], fp["conv17"]["bn"]["bias"])


def test_yoloface_cfg_forward_matches_flax(yoloface_cfg_text,
                                           flax_variables, weight_bytes):
    import jax
    from yoloface_tpu.models.yoloface import YoloFace

    net = DarknetNet(yoloface_cfg_text)
    params = net.load_weights(weight_bytes)
    rng = np.random.default_rng(3)
    x = rng.random((2, 56, 56, 3)).astype(np.float32)
    outs = jax.jit(net.apply)(params, x)
    assert isinstance(outs, list) and len(outs) == 1
    want = np.asarray(YoloFace().apply(flax_variables, x))
    np.testing.assert_allclose(np.asarray(outs[0]), want, atol=1e-4)


SYNTH_CFG = """
[net]
channels=4
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
stride=1
groups=8
activation=relu
[route]
layers=0
[upsample]
stride=2
[convolutional]
filters=4
size=1
activation=linear
[yolo]
[route]
layers=1,0
[convolutional]
filters=6
size=1
activation=linear
[yolo]
"""


def test_synthetic_cfg_graph():
    """Arbitrary-graph coverage: route (single + multi), upsample,
    depthwise relu, two yolo heads, mixed bias/bn convs."""
    import jax

    net = DarknetNet(SYNTH_CFG)
    n = net.num_weight_floats()
    rng = np.random.default_rng(0)
    blob = (np.zeros(5, np.int32).tobytes()
            + (rng.standard_normal(n).astype(np.float32) * 0.1).tobytes())
    params = net.load_weights(blob)
    x = rng.random((2, 16, 16, 4)).astype(np.float32)
    outs = jax.jit(net.apply)(params, x)
    assert len(outs) == 2
    assert outs[0].shape == (2, 16, 16, 4)    # upsampled 8 -> 16
    assert outs[1].shape == (2, 8, 8, 6)      # concat 8+8 channels -> 6


def test_truncated_weights_error(yoloface_cfg_text, weight_bytes):
    net = DarknetNet(yoloface_cfg_text)
    with pytest.raises(ValueError, match="truncated"):
        net.load_weights(weight_bytes[:1000])

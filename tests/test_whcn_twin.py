"""WHCN-layout XLA twin parity (Int8Engine xla_layout="whcn").

The hybrid tiled routing runs its XLA sections natively in the framework's
[W,H,C,N] activation layout — no boundary relayouts — because (a) the
WHCN<->NHWC transposes of 448-scale planes dominated the hybrid's cost
and (b) an int8 conv consuming a fused transpose-from-batch-minor is
miscompiled on real v5e hardware (tools/debug448_fix*.py).  The math is
layout-invariant, so the WHCN twin must be bit-identical to the NHWC twin
on every op of every mode.

Reference role: the same generated-runtime kernels
(stm32/X-CUBE-AI/App/network.c:3272-3417) under a relayouted activation
arena — the reference's arena is layout-free bytes, so layout invariance
is the honest parity bar.
"""
import numpy as np
import pytest

from yoloface_tpu.io.tflite_import import load_tflite
from yoloface_tpu.runtime.engine import Int8Engine

TFLITE = "/root/reference/yoloface/tflite/yoloface_int8.tflite"
MODES = ("exact", "fast", "fast2")


@pytest.fixture(scope="module")
def graph():
    return load_tflite(TFLITE)


@pytest.mark.parametrize("mode", MODES)
def test_whcn_twin_every_tensor_bit_exact(graph, mode):
    """Every intermediate activation matches the NHWC twin bit-for-bit
    (run_with_intermediates relayouts WHCN results back to NHWC)."""
    rng = np.random.default_rng(7)
    x = rng.integers(-128, 128, (3, 56, 56, 3)).astype(np.int8)
    ref = Int8Engine(graph, mode).run_with_intermediates(x)
    got = Int8Engine(graph, mode, xla_layout="whcn").run_with_intermediates(x)
    assert set(ref) == set(got)
    for k in ref:
        assert np.array_equal(ref[k], got[k]), f"tensor {k} diverges"


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("mode", MODES)
def test_whcn_twin_random_graphs(seed, mode):
    """Random darknet topologies (concat/shortcut/upsample/pools/strided
    convs through the real PTQ chain): WHCN == NHWC bit-for-bit."""
    from test_tiled_fuzz import _int8_graph

    g, _ = _int8_graph(seed)
    rng = np.random.default_rng(50 + seed)
    shape = (2,) + tuple(g.tensor(g.inputs[0]).shape[1:])
    x = rng.integers(-128, 128, shape).astype(np.int8)
    a = Int8Engine(g, mode)(x)
    b = Int8Engine(g, mode, xla_layout="whcn")(x)
    a = a if isinstance(a, tuple) else (a,)
    b = b if isinstance(b, tuple) else (b,)
    for ya, yb in zip(a, b):
        assert np.array_equal(np.asarray(ya), np.asarray(yb))


def test_whcn_layout_rejected_for_pallas_modes(graph):
    with pytest.raises(ValueError, match="base XLA modes"):
        Int8Engine(graph, "pallas_mxu2", xla_layout="whcn")
    with pytest.raises(ValueError, match="xla_layout"):
        Int8Engine(graph, "fast", xla_layout="nchw")


def test_whcn_flat_head_ops_lazy_raise():
    """RESHAPE/FC/SOFTMAX lower to a fail-loud fn under WHCN: the graph
    builds (hybrid routing may never run them) but running one raises."""
    from yoloface_tpu.graph.ir import GraphDef, OpDef, QParams, TensorDef

    q = QParams((0.05,), (0,))
    tensors = [
        TensorDef(0, "in", (1, 4, 4, 2), np.dtype(np.int8), q),
        TensorDef(1, "out", (1, 32), np.dtype(np.int8), q),
    ]
    ops = [OpDef(0, "RESHAPE", [0], [1], {})]
    g = GraphDef(tensors, ops, [0], [1])
    eng = Int8Engine(g, "fast", xla_layout="whcn")
    with pytest.raises(NotImplementedError, match="WHCN"):
        eng(np.zeros((1, 4, 4, 2), np.int8))

"""Differential fuzz of the activation-arena Pallas modes (the serving
flagship, kernels/pallas_arena.py) over random imported graphs.

The same random darknet topologies as tests/test_tiled_fuzz.py — strided
PAD+VALID convs, depthwise, SAME pools on odd widths, routes, shortcuts,
upsamples, leaky/relu/linear — carried through the real PTQ chain, then
every arena mode must be bit-identical to its XLA twin on CPU interpret:
pallas_mxu == fast, pallas_mxu2 == fast2, pallas_mxu_exact == exact.

The fixed-topology twins (test_darknet_ptq.py::test_v3tiny_all_mode_twins,
test_fast_mode.py) pin the shipped graphs; this is the property test for
arbitrary ones — WHCN staging, in-kernel RESIZE, requant epilogues (rsm
reduced form included) and the arena planner must hold for every sampled
topology.

Reference role: the binary kernel library consuming arbitrary generated
graphs (stm32 layers_conv2d.h:192), the way yolo_to_h5.py:60-353 accepts
arbitrary cfgs."""
import numpy as np
import pytest

from yoloface_tpu.runtime.engine import Int8Engine

from test_tiled_fuzz import _int8_graph


@pytest.mark.parametrize("seed", [0, 1, 2,
                                  pytest.param(3, marks=pytest.mark.slow),
                                  pytest.param(4, marks=pytest.mark.slow)])
def test_arena_fuzz_fast_bits(seed):
    g, rng = _int8_graph(seed)
    x = rng.integers(-128, 128, (2, 14, 14, 3),
                     dtype=np.int64).astype(np.int8)
    for mode, twin in (("pallas_mxu", "fast"), ("pallas_mxu2", "fast2")):
        ref = np.asarray(Int8Engine(g, mode=twin)(x))
        out = np.asarray(Int8Engine(g, mode=mode)(x))
        np.testing.assert_array_equal(ref, out)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 3])
def test_arena_fuzz_exact_bits(seed):
    g, rng = _int8_graph(seed)
    x = rng.integers(-128, 128, (2, 14, 14, 3),
                     dtype=np.int64).astype(np.int8)
    ref = np.asarray(Int8Engine(g, mode="exact")(x))
    out = np.asarray(Int8Engine(g, mode="pallas_mxu_exact")(x))
    np.testing.assert_array_equal(ref, out)


@pytest.mark.parametrize("seed", [2,
                                  pytest.param(0, marks=pytest.mark.slow),
                                  pytest.param(4, marks=pytest.mark.slow)])
def test_perop_fused_fuzz(seed):
    """The per-op (pallas[_exact]) and fused (pallas_fused[_exact]) modes
    on the same random graphs — full eltwise/RESIZE op-surface coverage
    (seed 2 samples an upsample in the default run)."""
    g, rng = _int8_graph(seed)
    x = rng.integers(-128, 128, (2, 14, 14, 3),
                     dtype=np.int64).astype(np.int8)
    for mode, twin in (("pallas", "fast"), ("pallas_exact", "exact"),
                       ("pallas_fused", "fast"),
                       ("pallas_fused_exact", "exact")):
        ref = np.asarray(Int8Engine(g, mode=twin)(x))
        out = np.asarray(Int8Engine(g, mode=mode)(x))
        np.testing.assert_array_equal(ref, out)

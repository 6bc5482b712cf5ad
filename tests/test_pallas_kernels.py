"""Pallas kernel parity (interpret mode on CPU; the TPU-compiled path is
exercised by bench.py and the driver's real-chip runs).

Gate: the pallas engines are BIT-IDENTICAL to their XLA twins — "pallas" vs
"fast" and "pallas_exact" vs "exact" — which transitively pins pallas_exact
to the TFLite reference kernels."""

import numpy as np
import pytest

from yoloface_tpu.kernels import pallas_int8 as pk
from yoloface_tpu.runtime.engine import Int8Engine


@pytest.fixture(scope="module")
def random_batch():
    rng = np.random.default_rng(0)
    return rng.integers(-128, 128, (4, 56, 56, 3),
                        dtype=np.int64).astype(np.int8)


def test_pallas_bitexact_vs_fast(int8_graph, random_batch):
    yf = np.asarray(Int8Engine(int8_graph, mode="fast")(random_batch))
    yp = np.asarray(Int8Engine(int8_graph, mode="pallas")(random_batch))
    np.testing.assert_array_equal(yp, yf)


def test_pallas_exact_bitexact_vs_exact(int8_graph, random_batch):
    ye = np.asarray(Int8Engine(int8_graph, mode="exact")(random_batch))
    yp = np.asarray(Int8Engine(int8_graph, mode="pallas_exact")(random_batch))
    np.testing.assert_array_equal(yp, ye)


def test_fused_stages_bitexact(int8_graph, random_batch):
    """The multi-op fused-stage plan (3 kernels for the whole net) matches
    both requant semantics bit-for-bit."""
    yf = np.asarray(Int8Engine(int8_graph, mode="fast")(random_batch))
    yp = np.asarray(Int8Engine(int8_graph,
                               mode="pallas_fused")(random_batch))
    np.testing.assert_array_equal(yp, yf)
    ye = np.asarray(Int8Engine(int8_graph, mode="exact")(random_batch))
    ype = np.asarray(Int8Engine(int8_graph,
                                mode="pallas_fused_exact")(random_batch))
    np.testing.assert_array_equal(ype, ye)


def test_arena_stages_bitexact(int8_graph, random_batch):
    """The arena plan (VMEM ref arena, padded views, concat aliasing)
    matches both requant semantics bit-for-bit."""
    yf = np.asarray(Int8Engine(int8_graph, mode="fast")(random_batch))
    yp = np.asarray(Int8Engine(int8_graph,
                               mode="pallas_arena")(random_batch))
    np.testing.assert_array_equal(yp, yf)
    ye = np.asarray(Int8Engine(int8_graph, mode="exact")(random_batch))
    ype = np.asarray(Int8Engine(int8_graph,
                                mode="pallas_arena_exact")(random_batch))
    np.testing.assert_array_equal(ype, ye)


def test_arena_partition_budgets(int8_graph, random_batch, monkeypatch):
    """Arena stage partitioning is semantics-preserving at any budget:
    mega-kernel (one stage, all aliasing active) down to one-op stages
    (every tensor crosses stage boundaries through HBM)."""
    from yoloface_tpu.kernels import pallas_arena
    want = np.asarray(Int8Engine(int8_graph, mode="fast")(random_batch))
    for budget in (1, 8 << 20, 10**9):
        monkeypatch.setattr(pallas_arena, "ARENA_BUDGET", budget)
        eng = Int8Engine(int8_graph, mode="pallas_arena")
        got = np.asarray(eng(random_batch))
        np.testing.assert_array_equal(got, want, err_msg=f"budget={budget}")
    monkeypatch.setattr(pallas_arena, "ARENA_BUDGET", 10**9)
    assert len(Int8Engine(int8_graph, mode="pallas_arena")._plan) == 1
    monkeypatch.setattr(pallas_arena, "ARENA_BUDGET", 1)
    assert len(Int8Engine(int8_graph, mode="pallas_arena")._plan) > 20


def test_pallas_exact_all_intermediates(int8_graph, dataset_images):
    """Every surviving tensor (conv+leaky fusion skips the pre-activation
    conv outputs) matches the exact XLA engine bit-for-bit."""
    x = dataset_images[sorted(dataset_images)[0]]
    exact = Int8Engine(int8_graph, mode="exact")
    pallas = Int8Engine(int8_graph, mode="pallas_exact")
    env_e = exact.run_with_intermediates(x)
    env_p = pallas.run_with_intermediates(x)
    checked = 0
    for idx, val in env_p.items():
        np.testing.assert_array_equal(val, env_e[idx],
                                      err_msg=f"tensor {idx}")
        checked += 1
    assert checked > 30  # input + all unfused op outputs


def test_pallas_preprocess_kernel_bit_exact():
    from yoloface_tpu.pipeline.preprocess import rgb565_to_int8_input
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 1 << 16, (2, 112, 112),
                          dtype=np.int64).astype(np.uint16)
    # kernel layout: [H,W,N] -> [3,56,56,N]
    hwn = np.ascontiguousarray(frames.transpose(1, 2, 0))
    got = np.asarray(pk.preprocess_rgb565(hwn))          # [3,56,56,N]
    want = np.asarray(rgb565_to_int8_input(frames))      # [N,56,56,3]
    np.testing.assert_array_equal(got.transpose(3, 1, 2, 0), want)


def test_pallas_conv1x1_kernel_standalone():
    """Unit-level: conv1x1 + requant vs a numpy computation."""
    rng = np.random.default_rng(2)
    ci, co, h, w, n = 8, 16, 7, 7, 4
    x = rng.integers(-128, 128, (ci, h, w, n), dtype=np.int64).astype(np.int8)
    w_io = rng.integers(-20, 20, (ci, co), dtype=np.int64).astype(np.int8)
    bias = rng.integers(-100, 100, co).astype(np.int32)
    scale = np.full(co, 0.01, np.float32)
    spec = pk.RequantSpec(zp_out=3, scale=scale)
    got = np.asarray(pk.conv1x1(x, w_io, bias, spec))
    acc = np.einsum("io,ihwn->ohwn", w_io.astype(np.int64),
                    x.astype(np.int64)) + bias[:, None, None, None]
    want = np.clip(np.round(acc.astype(np.float64) * 0.01) + 3,
                   -128, 127).astype(np.int8)
    np.testing.assert_array_equal(got, want)


def test_fused_stage_partition_budgets(int8_graph, random_batch,
                                       monkeypatch):
    """The stage partitioner must produce bit-identical results at any
    budget (many tiny stages or one mega-stage)."""
    from yoloface_tpu.kernels import pallas_fused
    want = np.asarray(Int8Engine(int8_graph, mode="fast")(random_batch))
    for budget in (1, 512 * 1024, 10**9):
        monkeypatch.setattr(pallas_fused, "STAGE_BUDGET_BYTES", budget)
        eng = Int8Engine(int8_graph, mode="pallas_fused")
        got = np.asarray(eng(random_batch))
        np.testing.assert_array_equal(got, want, err_msg=f"budget={budget}")
    n_many = len(Int8Engine(int8_graph, mode="pallas_fused")._plan)
    monkeypatch.setattr(pallas_fused, "STAGE_BUDGET_BYTES", 10**9)
    assert len(Int8Engine(int8_graph, mode="pallas_fused")._plan) == 1
    monkeypatch.setattr(pallas_fused, "STAGE_BUDGET_BYTES", 1)
    assert len(Int8Engine(int8_graph, mode="pallas_fused")._plan) > 20

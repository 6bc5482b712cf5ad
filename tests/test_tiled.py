"""W-strip tiled engine modes (kernels/pallas_tiled.py).

Bit-parity of the tiled sections against the untiled semantics twins on a
spatially-retargeted graph (graph/retarget.py), exercising every section
kind: the im2col stem, per-scale chains, both pool+strided-dw transition
pairs (two fill classes on one tensor), ADD / QUANTIZE / CONCATENATION
elementwise sections, and the arena suffix.  Runs at retarget factor 2
with a lowered plane threshold so CPU interpret stays fast; the hardware
smoke (tools/tpu_smoke.py) covers the real 448 graph on the TPU.

Reference role: the binary kernel library serving the scale variant
(stm32 layers_conv2d.h:192 at yolov3_train_tf.py:31-32 resolutions).
"""
import numpy as np
import pytest

from yoloface_tpu.graph.retarget import retarget_spatial
from yoloface_tpu.io.tflite_import import load_tflite
from yoloface_tpu.runtime.engine import Int8Engine

TFLITE = "/root/reference/yoloface/tflite/yoloface_int8.tflite"


@pytest.fixture(scope="module")
def g2(monkeypatch_module=None):
    return retarget_spatial(load_tflite(TFLITE), 2)


def _lower_threshold(monkeypatch):
    import yoloface_tpu.kernels.pallas_tiled as pt
    monkeypatch.setattr(pt, "TILE_THRESHOLD", 1_500_000)
    # pin NW=2: small strips bound the per-chunk unrolling (XLA CPU
    # compile time) while still exercising both edge-strip fill paths;
    # the hardware smoke runs the real strip counts.  _VMEM_TARGET=1
    # forces the fallback largest-NW rule under the cap.
    monkeypatch.setattr(pt, "_NW_CAP", 2)
    monkeypatch.setattr(pt, "_VMEM_TARGET", 1)
    # small H chunks cut the per-chunk dot unrolling ~4x (compile time
    # dominates these CPU-interpret runs)
    monkeypatch.setattr(pt, "_CHUNK_TARGET", 1 << 20)


def test_split_structure(g2, monkeypatch):
    _lower_threshold(monkeypatch)
    from yoloface_tpu.kernels.pallas_tiled import plan_tiled_split
    sections, suffix = plan_tiled_split(g2)
    idx = [[op.index for op in s] for s in sections]
    # stem / 2x-scale chain WITH its absorbed pool+dw transitions
    # (shallow-producer merge) / 1x-scale chain with ADD+QUANTIZE+CONCAT
    # / second transition pair (NOT merged: the 13-op chain is deep)
    assert idx[0] == [0, 1, 2]
    assert idx[1] == [3, 4, 5, 6, 7, 8, 9, 10, 11]
    assert 18 in idx[2] and 21 in idx[2] and 22 in idx[2]
    assert idx[3][0] == 25
    assert suffix and suffix[0].index == idx[3][-1] + 1
    # the merged transition's shared input carries two fill classes
    # (maxpool -128 vs the zero-point-padded strided dw)
    from yoloface_tpu.kernels.pallas_tiled import _lower_section
    sec = _lower_section(g2, sections[1], exact=False, v2=False,
                         later_needs={op.outputs[0]
                                      for op in g2.ops})
    t7 = next(op for op in g2.ops if op.index == 8).inputs[0]
    assert len(sec.views[t7]) == 2
    assert {v.fill for v in sec.views[t7]} == {-128,
                                               g2.tensor(t7).qparams
                                               .zero_point}


@pytest.mark.parametrize("mode,twin", [("pallas_tiled2", "fast2"),
                                       pytest.param("pallas_tiled_exact",
                                                    "exact",
                                                    marks=pytest.mark.slow),
                                       pytest.param("pallas_tiled", "fast",
                                                    marks=pytest.mark.slow)])
def test_tiled_bit_parity(g2, monkeypatch, mode, twin):
    # pure tiled: the baked DEFAULT_TILE_XLA hybrid default would route
    # most sections to the XLA twin on BOTH sides, silently gutting the
    # tiled-kernel coverage (incl. the exact rsm epilogues) this test owns
    monkeypatch.setenv("YOLOFACE_TPU_TILE_XLA", "none")
    _lower_threshold(monkeypatch)
    rng = np.random.default_rng(0)
    x = rng.integers(-128, 128, (2, 112, 112, 3)).astype(np.int8)
    ref = np.asarray(Int8Engine(g2, mode=twin)(x))
    out = np.asarray(Int8Engine(g2, mode=mode)(x))
    assert np.array_equal(ref, out)


@pytest.mark.parametrize("xla_secs", ["0,3", "suffix",
                                      pytest.param("1",
                                                   marks=pytest.mark.slow)])
def test_hybrid_xla_routing_bit_parity(g2, monkeypatch, xla_secs):
    """YOLOFACE_TPU_TILE_XLA routes the named sections (or the suffix) to
    the XLA twin lowering inside the tiled plan; the mixed plan must stay
    bit-identical to the all-XLA twin.  '0,3' covers the im2col stem and a
    transition pair on XLA with tiled chains between (the hybrid serving
    split from docs/PROFILE.md); 'suffix' covers the arena tail on XLA;
    '1' covers a deep tiled chain handed to XLA mid-plan."""
    _lower_threshold(monkeypatch)
    monkeypatch.setenv("YOLOFACE_TPU_TILE_XLA", xla_secs)
    rng = np.random.default_rng(1)
    x = rng.integers(-128, 128, (2, 112, 112, 3)).astype(np.int8)
    ref = np.asarray(Int8Engine(g2, mode="fast2")(x))
    out = np.asarray(Int8Engine(g2, mode="pallas_tiled2")(x))
    assert np.array_equal(ref, out)


def test_position_packed_dots_bit_parity(g2, monkeypatch):
    """Position-packed MXU dots (YOLOFACE_TPU_PACK=1): P consecutive H
    positions per dot via block-diagonal weights (_pack_p/_blockdiag/
    _packed_dots).  Must be bit-identical to the per-position emission —
    the off-diagonal weight blocks are zero, so equality is structural,
    but this pins the operand-patch wiring (the 1x1 list mutation and the
    im2col kdepth blockdiag) and the pack reshape+concat numerics.  The
    chunk target is raised vs the other tiled tests so even H chunks
    actually trigger P>1 (ch=1 never packs)."""
    monkeypatch.setenv("YOLOFACE_TPU_TILE_XLA", "none")
    _lower_threshold(monkeypatch)
    import yoloface_tpu.kernels.pallas_tiled as pt
    monkeypatch.setattr(pt, "_CHUNK_TARGET", 4 << 20)

    # the packing factors actually chosen must include P>1 for both the
    # 1x1 and the im2col generators, or this test is vacuous
    seen = []
    orig = pt._pack_p

    def spy(ch, ci, co):
        p = orig(ch, ci, co)
        seen.append(p)
        return p

    monkeypatch.setattr(pt, "_pack_p", spy)
    monkeypatch.setenv("YOLOFACE_TPU_PACK", "1")
    rng = np.random.default_rng(2)
    x = rng.integers(-128, 128, (2, 112, 112, 3)).astype(np.int8)
    out = np.asarray(Int8Engine(g2, mode="pallas_tiled2")(x))
    assert max(seen) > 1
    monkeypatch.setenv("YOLOFACE_TPU_PACK", "0")
    ref = np.asarray(Int8Engine(g2, mode="pallas_tiled2")(x))
    assert np.array_equal(ref, out)


def test_tiled_pad_into_maxpool_honors_pad_fill(monkeypatch):
    """Regression: an explicit PAD feeding MAX_POOL_2D pads with the PAD
    output's zero-point — those cells are REAL pool inputs that must
    participate in the max (the tiled lowering used to hardcode the -128
    'excluded' fill, silently diverging from the arena/XLA twins at image
    borders whenever the zero-point exceeds the local values)."""
    _lower_threshold(monkeypatch)
    monkeypatch.setenv("YOLOFACE_TPU_TILE_XLA", "none")
    import yoloface_tpu.kernels.pallas_tiled as pt
    monkeypatch.setattr(pt, "TILE_THRESHOLD", 10_000)  # tiny graph tiles
    from yoloface_tpu.graph.ir import GraphDef, OpDef, QParams, TensorDef

    q = QParams((0.05,), (90,))   # zp ABOVE the value range below
    pads = np.array([[0, 0], [1, 1], [1, 1], [0, 0]], np.int32)
    tensors = [
        TensorDef(0, "in", (1, 12, 12, 4), np.dtype(np.int8), q),
        TensorDef(1, "pads", (4, 2), np.dtype(np.int32), None, pads),
        TensorDef(2, "padded", (1, 14, 14, 4), np.dtype(np.int8), q),
        TensorDef(3, "out", (1, 7, 7, 4), np.dtype(np.int8), q),
    ]
    ops = [
        OpDef(0, "PAD", [0, 1], [2], {}),
        OpDef(1, "MAX_POOL_2D", [2], [3],
              {"padding": "VALID", "stride_w": 2, "stride_h": 2,
               "filter_w": 2, "filter_h": 2, "activation": "NONE"}),
    ]
    g = GraphDef(tensors, ops, [0], [3])
    from yoloface_tpu.kernels.pallas_tiled import plan_tiled_split
    sections, suffix = plan_tiled_split(g)
    assert sections and not suffix    # the pool MUST run the tiled kernel
    rng = np.random.default_rng(5)
    x = rng.integers(-128, 80, (2, 12, 12, 4)).astype(np.int8)
    ref = np.asarray(Int8Engine(g, mode="fast2")(x))
    # the border maxes must actually be decided by the pad fill, or the
    # regression is vacuous
    assert (ref[:, 0, :, :] == 90).any()
    out = np.asarray(Int8Engine(g, mode="pallas_tiled2")(x))
    assert np.array_equal(ref, out)


def test_small_graph_falls_back_to_arena():
    g = load_tflite(TFLITE)
    from yoloface_tpu.kernels.pallas_tiled import (build_tiled_plan,
                                                   plan_tiled_split)
    sections, suffix = plan_tiled_split(g)
    assert sections == [] and len(suffix) == len(g.ops)
    # the plan IS the arena plan (same stage count and outputs); the arena
    # modes' own parity tests cover its numerics
    from yoloface_tpu.kernels.pallas_arena import build_arena_plan
    tiled = build_tiled_plan(g, exact=False)
    arena = build_arena_plan(g, exact=False, layout="whcn")
    assert [f.out_idx for f in tiled] == [f.out_idx for f in arena]

"""verify_setup + profiler tests."""

import numpy as np

from yoloface_tpu.runtime.engine import Int8Engine
from yoloface_tpu.runtime.profiler import (format_profile, macc_per_op,
                                           profile_engine)
from yoloface_tpu.utils import verify_setup


def test_macc_matches_reference_total(int8_graph):
    """The static MACC count must reproduce the X-CUBE-AI report's figure of
    1,344,320 MACC/frame (network_generate_report.txt:20) for the conv ops.

    Note: the report also counts pool window comparisons, eltwise adds and
    copies as 'MACC' (e.g. pool_8 alone is 225,792 = 64 x 14x14x18); the
    conv-only sum is exactly 1,029,000 = 76.5% of the report total."""
    maccs = macc_per_op(int8_graph)
    conv_total = sum(maccs.values())
    assert conv_total == 1_029_000
    assert conv_total / 1_344_320 > 0.75


def test_profile_engine_runs(int8_graph):
    eng = Int8Engine(int8_graph)
    rows = profile_engine(eng, np.zeros((1, 56, 56, 3), np.int8), iters=1,
                          warmup=0)
    assert len(rows) == len(int8_graph.ops)
    assert all(r["ms"] >= 0 for r in rows)
    table = format_profile(rows)
    assert "MACC" in table and "CONV_2D" in table


def test_verify_setup_passes_here(capsys):
    rc = verify_setup.main()
    out = capsys.readouterr().out
    assert "PASS" in out
    assert rc == 0

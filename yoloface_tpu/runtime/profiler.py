"""Tracing & per-op profiling — the observability subsystem.

The reference ships (unused) per-node inspection hooks
(`Middlewares/ST/AI/Inc/ai_network_inspector.h`) and a static per-node MACC
report (`network_generate_report.txt:488-515`).  TPU-native equivalents:

  * :func:`trace` — Perfetto/TensorBoard trace capture around any section
    (jax.profiler), viewable in ui.perfetto.dev;
  * :func:`profile_engine` — per-op wall time + MACC table for an
    Int8Engine, measured by executing each lowered op standalone on its
    recorded inputs (the dynamic analogue of the codegen report);
  * :func:`macc_per_op` — static MACC counts from the graph (sums to the
    reference's 1,344,320 MACC/frame figure for yoloface, report :20).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/trace'): run()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def macc_per_op(graph) -> Dict[int, int]:
    """Static multiply-accumulate counts per op index (batch 1)."""
    out: Dict[int, int] = {}
    for op in graph.ops:
        if op.opname == "CONV_2D":
            w = graph.tensor(op.inputs[1]).data
            o = graph.tensor(op.outputs[0]).shape
            out[op.index] = int(np.prod(w.shape) * o[1] * o[2])
        elif op.opname == "DEPTHWISE_CONV_2D":
            w = graph.tensor(op.inputs[1]).data
            o = graph.tensor(op.outputs[0]).shape
            out[op.index] = int(np.prod(w.shape) * o[1] * o[2])
        else:
            out[op.index] = 0
    return out


def profile_engine(engine, x, iters: int = 5,
                   warmup: int = 1) -> List[dict]:
    """Per-op timing table for one batch.  Each lowered op runs standalone
    (jitted) on the env produced by the full forward; times include
    dispatch, so compare relatively.  Returns rows sorted by time."""
    import jax.numpy as jnp

    chwn = engine.mode.startswith("pallas")
    # NHWC -> the engine's pallas layout (see Int8Engine._forward)
    xin = (jnp.transpose(jnp.asarray(x), engine._perm_in) if chwn
           else jnp.asarray(x))
    env = {engine.input_idx: xin}
    for fn in engine._plan:
        env[fn.out_idx] = fn(env)
    jax.block_until_ready(list(env.values()))

    maccs = macc_per_op(engine.graph)
    op_by_out = {}
    for op in engine.graph.ops:
        op_by_out[op.outputs[0]] = op
    def sync(out):
        # force completion through a SCALAR fetch: device_get of a full
        # activation would crawl over the ~60 MB/s tunnel and the tunnel's
        # block_until_ready can return before remote execution finishes
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])

    rows = []
    for fn in engine._plan:
        jfn = jax.jit(fn)
        sync(jfn(env))
        for _ in range(warmup):
            jfn(env)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jfn(env)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        op = op_by_out.get(fn.out_idx)
        name = op.opname if op is not None else "?"
        idx = op.index if op is not None else -1
        rows.append({"op_index": idx, "op": name,
                     "out_tensor": fn.out_idx, "ms": dt * 1e3,
                     "macc_per_frame": maccs.get(idx, 0)})
    rows.sort(key=lambda r: -r["ms"])
    return rows


def format_profile(rows: List[dict]) -> str:
    total_ms = sum(r["ms"] for r in rows)
    total_macc = sum(r["macc_per_frame"] for r in rows)
    lines = [f"{'op':<22s} {'idx':>4s} {'ms':>9s} {'%time':>6s} "
             f"{'MACC':>9s} {'%MACC':>6s}"]
    for r in rows:
        lines.append(
            f"{r['op']:<22s} {r['op_index']:>4d} {r['ms']:>9.3f} "
            f"{100 * r['ms'] / max(total_ms, 1e-9):>5.1f}% "
            f"{r['macc_per_frame']:>9d} "
            f"{100 * r['macc_per_frame'] / max(total_macc, 1):>5.1f}%")
    lines.append(f"total: {total_ms:.3f} ms, {total_macc} MACC/frame")
    return "\n".join(lines)

"""Spatial partitioning (SP): one large frame sharded across chips.

The data-parallel axis (``parallel/mesh.py``) scales frames-per-second;
this module scales a SINGLE large frame — the scale family's 448 inputs
(and anything larger produced by ``graph/retarget.py``) — by sharding the
activation **H** dimension over a mesh axis and letting XLA's GSPMD
partitioner insert the halo exchanges every SAME-padded conv/pool needs
(collective-permutes riding ICI).  This is the TPU-native design: annotate
shardings on the jit boundary, let the compiler place the collectives —
no hand-written halo logic, and bit-exactness is untouched because the
partitioned program computes the identical convolution.

The engine's XLA lowerings (``exact`` / ``fast`` / ``fast2`` modes) are
pure jnp ops, so GSPMD may repartition them freely.  The Pallas modes pin
their own data layouts inside custom calls, which GSPMD cannot re-shard —
they are rejected loudly.

Role in the blueprint: the reference is a single-MCU superloop
(SURVEY.md §2c) with no multi-device analogue; SP is a beyond-parity
scaling axis for the retargeted large-input family
(``yolov3_train_tf.py:31-32`` resolution axis) on real TPU pods.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from yoloface_tpu.graph.ir import GraphDef
from yoloface_tpu.runtime.engine import Int8Engine

SP_AXIS = "sp"

_XLA_MODES = ("exact", "fast", "fast2")


def make_sp_mesh(n_sp: int, n_dp: int = 1, devices=None) -> Mesh:
    """(dp, sp) mesh: batch over ``dp``, frame rows over ``sp``."""
    import numpy as np
    if devices is None:
        devices = jax.devices()
    need = n_sp * n_dp
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:need]).reshape(n_dp, n_sp),
                ("data", SP_AXIS))


def make_spatial_infer(graph: GraphDef, mesh: Mesh, *, mode: str = "fast2",
                       engine: Optional[Int8Engine] = None):
    """Jitted ``x[N,H,W,C] -> y`` with H sharded over the mesh's sp axis
    (and batch over its data axis when present).

    GSPMD handles the inter-device halos; the output (tiny head grid) is
    gathered to batch-sharded/replicated form.  Input H must be divisible
    by the sp-axis size for an even row split (XLA would otherwise pad —
    rejected to keep the cost model predictable).
    """
    eng = engine or Int8Engine(graph, mode=mode)
    if eng.mode not in _XLA_MODES:
        raise NotImplementedError(
            f"spatial partitioning requires an XLA engine mode "
            f"{_XLA_MODES}; pallas modes pin their own layouts inside "
            f"custom calls, which GSPMD cannot re-shard (got "
            f"{eng.mode!r})")
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_sp = axes.get(SP_AXIS, 1)
    if n_sp <= 1:
        raise ValueError(f"mesh has no {SP_AXIS!r} axis to shard H over")
    dp = "data" if axes.get("data", 1) > 1 else None
    in_s = NamedSharding(mesh, P(dp, SP_AXIS, None, None))
    out_s = NamedSharding(mesh, P(dp))
    import functools
    fwd = jax.jit(functools.partial(eng._forward, collect=False),
                  in_shardings=in_s, out_shardings=out_s)

    n_dp = axes.get("data", 1)

    def run(x):
        eng._check_input(x)
        if x.shape[1] % n_sp:
            raise ValueError(
                f"H={x.shape[1]} not divisible by sp={n_sp}")
        if x.shape[0] % n_dp:
            raise ValueError(
                f"batch={x.shape[0]} not divisible by dp={n_dp}")
        return fwd(jax.device_put(x, in_s))

    run.engine = eng
    run.in_sharding = in_s
    return run

"""Pallas top-K confidence selection for the YOLO head.

``jax.lax.top_k`` over the [N, 147] ranked-confidence matrix costs ~2-3 ms
@32k (it lowers as a sort); this kernel selects the top K=16 candidates
per frame with K iterative masked argmax rounds over the raw int8
confidence channel — a few dozen (sublane-reducing) VPU ops per round.

Bit-compatibility (pinned by tests/test_pipeline.py): the ranking key is
the SAME zeroed-below-threshold f32 sigmoid score the lax.top_k path
computes — NOT the raw int8 value, because f32 sigmoid saturation
collapses distinct high q's to exactly 1.0f and top_k then tie-breaks
them by index; a raw-q key would order those by q instead (measured 34%
NMS divergence on random tensors).  Each masked-argmax round resolves
ties by minimum flat index, matching lax.top_k.

Reference role: the firmware's ``post_process`` scan over 49x3 candidates
(``yoloface.c:105-175``) — here a fixed-K on-device selection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yoloface_tpu.kernels.pallas_int8 import _interpret_mode

NT = 128


def topk_conf_int8(y_nhwc_int8, k: int, grid_g: int, anchors_a: int, *,
                   scale: float, zero_point: int, conf_threshold: float):
    """[N, g, g, a*6] int8 head output -> top-K flat candidate indices
    [N, K] (anchor-major flat order a*g*g + row*g + col, like decode()).

    The NHWC->[g,g,C,N] transpose here cancels against the engine's
    WHCN->NHWC output permutation under jit for the arena modes.
    """
    n, g, _, c6 = y_nhwc_int8.shape
    a = anchors_a
    assert g == grid_g and c6 == a * 6
    yt = jnp.transpose(y_nhwc_int8, (1, 2, 3, 0))     # [g, g, a*6, N]
    nt = NT if n % NT == 0 else n
    s = float(scale)
    zp = float(zero_point)
    thr = float(conf_threshold)

    def kernel(y_ref, idx_ref):
        chans = [y_ref[:, :, 6 * ai + 4:6 * ai + 5, :].astype(jnp.float32)
                 for ai in range(a)]                   # [g, g, 1, nt] each
        q = jnp.concatenate(chans, axis=2)             # [g, g, a, nt]
        # the lax.top_k path's exact f32 key: zeroed-below-threshold sigmoid
        conf = 1.0 / (1.0 + jnp.exp(-((q - zp) * s)))
        key = jnp.where(conf >= thr, conf, 0.0)
        ir = lax.broadcasted_iota(jnp.int32, (g, g, a, nt), 0)
        ic = lax.broadcasted_iota(jnp.int32, (g, g, a, nt), 1)
        ia = lax.broadcasted_iota(jnp.int32, (g, g, a, nt), 2)
        flat = ia * (g * g) + ir * g + ic              # (anchor,row,col)
        big = jnp.int32(a * g * g + 1)
        for kk in range(k):
            m = jnp.max(key, axis=(0, 1, 2), keepdims=True)
            cand = jnp.where(key == m, flat, big)
            sel = jnp.min(cand, axis=(0, 1, 2))        # [nt], lowest index
            idx_ref[kk, :] = sel
            key = jnp.where(flat == sel.reshape(1, 1, 1, nt),
                            jnp.float32(-1.0), key)

    idx = pl.pallas_call(
        kernel,
        grid=(max(n // nt, 1),),
        in_specs=[pl.BlockSpec((g, g, a * 6, nt), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((k, nt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n), jnp.int32),
        interpret=_interpret_mode(),
    )(yt)
    return idx.T                                       # [N, K]

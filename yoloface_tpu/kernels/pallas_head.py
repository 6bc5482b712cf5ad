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


def detect_head_fused(y_nhwc_int8, *, scale: float, zero_point: int,
                      grid_g: int, anchors_a: int, anchors, stride: float,
                      conf_threshold: float, iou_threshold: float,
                      k: int, apply_nms: bool, box_limit: float = 55.0):
    """The ENTIRE threshold-first head in one Pallas kernel: K masked-
    argmax top-K rounds + per-survivor decode + greedy K^2 NMS, VMEM-
    resident — no full-tensor dequant, no [N,K,147] one-hot einsum, no
    HBM round-trips between stages (VERDICT r2 next #3).

    Bit-compatibility contract (pinned by tests/test_pipeline.py): every
    f32 op replicates pipeline/head.detect_int8_head elementwise — the
    same zeroed-below-threshold sigmoid ranking key (saturation-tie
    classes and min-flat-index tie-break identical to lax.top_k), the
    same decode formulas in the same order, the same +1-pixel IoU NMS.
    Candidate extraction uses one-hot masked SUMS (exactly one match per
    round; x+0.0 preserves bits), so the decoded t-vectors are the same
    f32 values the einsum gather produces.

    Returns (boxes [N,K,4] f32, scores [N,K] f32, valid [N,K] bool).
    Reference role: the firmware post_process scan, yoloface.c:105-175.
    """
    n, g, _, c6 = y_nhwc_int8.shape
    a = anchors_a
    assert g == grid_g and c6 == a * 6
    yt = jnp.transpose(y_nhwc_int8, (1, 2, 3, 0))     # [g, g, a*6, N]
    nt = NT if n % NT == 0 else n
    s = float(scale)
    zp = float(zero_point)
    thr = float(conf_threshold)
    anc_w = [float(w) for w, _ in anchors]
    anc_h = [float(h) for _, h in anchors]

    def kernel(y_ref, boxes_ref, scores_ref, valid_ref):
        # per-channel [g, g, a, nt] f32 views of the int8 head (offset
        # reads only -- no strided int8 loads)
        def chan(ch):
            cs = [y_ref[:, :, 6 * ai + ch:6 * ai + ch + 1, :]
                  .astype(jnp.float32) for ai in range(a)]
            return jnp.concatenate(cs, axis=2)

        q4 = chan(4)
        conf_all = 1.0 / (1.0 + jnp.exp(-((q4 - zp) * s)))
        key = jnp.where(conf_all >= thr, conf_all, 0.0)
        x6 = [chan(ch) for ch in range(6)]             # raw q, f32
        ir = lax.broadcasted_iota(jnp.int32, (g, g, a, nt), 0)
        ic = lax.broadcasted_iota(jnp.int32, (g, g, a, nt), 1)
        ia = lax.broadcasted_iota(jnp.int32, (g, g, a, nt), 2)
        flat = ia * (g * g) + ir * g + ic              # (anchor,row,col)

        ts = []                                        # [6][K] of [nt] f32
        rows_l, cols_l, anc_l = [], [], []
        for kk in range(k):
            m = jnp.max(key, axis=(0, 1, 2), keepdims=True)
            big = jnp.int32(a * g * g + 1)
            cand = jnp.where(key == m, flat, big)
            sel = jnp.min(cand, axis=(0, 1, 2))        # [nt]
            mask = flat == sel.reshape(1, 1, 1, nt)
            # one-hot extraction: exactly one element matches
            ts.append([jnp.sum(jnp.where(mask, x6[ch], 0.0), axis=(0, 1, 2))
                       for ch in range(6)])
            fm = mask.astype(jnp.float32)
            rows_l.append(jnp.sum(fm * ir.astype(jnp.float32), (0, 1, 2)))
            cols_l.append(jnp.sum(fm * ic.astype(jnp.float32), (0, 1, 2)))
            anc_l.append(jnp.sum(fm * ia.astype(jnp.float32), (0, 1, 2)))
            key = jnp.where(mask, jnp.float32(-1.0), key)

        def sig(v):
            return 1.0 / (1.0 + jnp.exp(-v))

        x1s, y1s, x2s, y2s, confs, valids = [], [], [], [], [], []
        for kk in range(k):
            t = [(ts[kk][ch] - zp) * s for ch in range(6)]
            aw = sum(jnp.where(anc_l[kk] == float(i), anc_w[i], 0.0)
                     for i in range(a))
            ah = sum(jnp.where(anc_l[kk] == float(i), anc_h[i], 0.0)
                     for i in range(a))
            cx = (sig(t[0]) + cols_l[kk]) * stride
            cy = (sig(t[1]) + rows_l[kk]) * stride
            w = jnp.exp(t[2]) * aw
            h = jnp.exp(t[3]) * ah
            cf = sig(t[4])
            x1s.append(jnp.clip(cx - w / 2, 0.0, box_limit))
            y1s.append(jnp.clip(cy - h / 2, 0.0, box_limit))
            x2s.append(jnp.clip(cx + w / 2, 0.0, box_limit))
            y2s.append(jnp.clip(cy + h / 2, 0.0, box_limit))
            confs.append(cf)
            valids.append(cf >= thr)

        if apply_nms and k > 1:
            # greedy: keep[i] iff valid and no higher-ranked kept box
            # overlaps > iou_threshold (+1-pixel area convention)
            areas = [(x2s[i] - x1s[i] + 1.0) * (y2s[i] - y1s[i] + 1.0)
                     for i in range(k)]
            keeps = [valids[0]]
            for i in range(1, k):
                over = None
                for j in range(i):
                    xx1 = jnp.maximum(x1s[i], x1s[j])
                    yy1 = jnp.maximum(y1s[i], y1s[j])
                    xx2 = jnp.minimum(x2s[i], x2s[j])
                    yy2 = jnp.minimum(y2s[i], y2s[j])
                    ww = jnp.maximum(0.0, xx2 - xx1 + 1.0)
                    hh = jnp.maximum(0.0, yy2 - yy1 + 1.0)
                    inter = ww * hh
                    iou = inter / (areas[i] + areas[j] - inter)
                    o = (iou > iou_threshold) & keeps[j]
                    over = o if over is None else (over | o)
                keeps.append(valids[i] & ~over)
            valids = keeps

        for kk in range(k):
            v = valids[kk]
            boxes_ref[kk, 0, :] = jnp.where(v, x1s[kk], 0.0)
            boxes_ref[kk, 1, :] = jnp.where(v, y1s[kk], 0.0)
            boxes_ref[kk, 2, :] = jnp.where(v, x2s[kk], 0.0)
            boxes_ref[kk, 3, :] = jnp.where(v, y2s[kk], 0.0)
            scores_ref[kk, :] = jnp.where(v, confs[kk], 0.0)
            valid_ref[kk, :] = v.astype(jnp.int32)

    boxes, scores, valid = pl.pallas_call(
        kernel,
        grid=(max(n // nt, 1),),
        in_specs=[pl.BlockSpec((g, g, a * 6, nt), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((k, 4, nt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, nt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, nt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, 4, n), jnp.float32),
            jax.ShapeDtypeStruct((k, n), jnp.float32),
            jax.ShapeDtypeStruct((k, n), jnp.int32),
        ],
        interpret=_interpret_mode(),
    )(yt)
    return (jnp.transpose(boxes, (2, 0, 1)), scores.T,
            valid.T.astype(jnp.bool_))

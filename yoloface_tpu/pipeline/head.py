"""On-device YOLO head: dequantize, grid decode, confidence filter, NMS.

Moves the reference's host-side / C post-processing onto the TPU inside the
same jit as inference:

  * decode constants and ordering replicate ``tflite_prediction.py:43-57``
    and the firmware ``post_process`` (``yoloface.c:105-175``): grid 7,
    stride 8, anchors [9,14] [12,17] [22,21], dequant
    ``(q + 15) * 0.14218327403068542``, cx = (sigmoid+col)*8, w = exp*anchor;
  * IoU NMS replicates ``yoloface_test.py:148-199`` (the +1-pixel area
    convention) as a fixed-shape O(K^2) greedy pass — data-dependent box
    counts become a validity mask so the whole head stays jit-compatible.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_ANCHORS = ((9.0, 14.0), (12.0, 17.0), (22.0, 21.0))


@dataclasses.dataclass(frozen=True)
class HeadConfig:
    grid: int = 7
    stride: int = 8
    anchors: Tuple[Tuple[float, float], ...] = DEFAULT_ANCHORS
    conf_threshold: float = 0.7           # yoloface.c:123
    iou_threshold: float = 0.5
    max_detections: int = 16              # fixed-shape NMS capacity
    apply_nms: bool = True
    # rank candidates with the Pallas masked-argmax kernel instead of
    # lax.top_k (bit-identical outputs; see kernels/pallas_head.py)
    use_pallas_topk: bool = True
    # run the ENTIRE head (top-K + decode + NMS) as one Pallas kernel —
    # bit-identical to the staged path (tests/test_pipeline.py), no
    # full-tensor dequant / one-hot einsum / HBM round-trips
    use_fused_head: bool = True

    @property
    def num_cells(self) -> int:
        return self.grid * self.grid * len(self.anchors)


def decode(y_int8, *, scale: float, zero_point: int,
           cfg: HeadConfig = HeadConfig()):
    """int8 head output [N,G,G,A*6] -> (boxes_xyxy [N,C,4], conf [N,C], cls [N,C]).

    C = G*G*A, flattened in (anchor, row, col) order like the reference
    predictor's ``transpose([2,0,1,3])``.
    """
    n = y_int8.shape[0]
    g = cfg.grid
    a = len(cfg.anchors)
    t = (y_int8.astype(jnp.float32) - zero_point) * scale
    t = t.reshape(n, g, g, a, 6).transpose(0, 3, 1, 2, 4)  # [N,A,G,G,6]

    rows = jnp.arange(g, dtype=jnp.float32).reshape(1, 1, g, 1)
    cols = jnp.arange(g, dtype=jnp.float32).reshape(1, 1, 1, g)
    anchors = jnp.asarray(cfg.anchors, jnp.float32)        # [A,2]
    aw = anchors[:, 0].reshape(1, a, 1, 1)
    ah = anchors[:, 1].reshape(1, a, 1, 1)

    cx = (jax_sigmoid(t[..., 0]) + cols) * cfg.stride
    cy = (jax_sigmoid(t[..., 1]) + rows) * cfg.stride
    w = jnp.exp(t[..., 2]) * aw
    h = jnp.exp(t[..., 3]) * ah
    conf = jax_sigmoid(t[..., 4])
    cls = jax_sigmoid(t[..., 5])

    boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                      axis=-1)
    c = cfg.num_cells
    return (boxes.reshape(n, c, 4), conf.reshape(n, c), cls.reshape(n, c))


def jax_sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def _iou_matrix(boxes):
    """Pairwise IoU [K,K] with the reference's +1-pixel convention
    (yoloface_test.py:166-196)."""
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.maximum(0.0, xx2 - xx1 + 1.0)
    h = jnp.maximum(0.0, yy2 - yy1 + 1.0)
    inter = w * h
    return inter / (area[:, None] + area[None, :] - inter)


def select_detections(boxes, conf, cfg: HeadConfig = HeadConfig()):
    """Threshold + top-K + (optional) greedy NMS, all fixed-shape.

    Returns (boxes [N,K,4], scores [N,K], valid [N,K] bool); invalid slots
    carry zeros.  Greedy NMS: a box survives iff no higher-scoring surviving
    box overlaps it above the IoU threshold — computed as a K-step masked
    scan, equivalent to the reference's while-loop NMS for K candidates.
    """
    k = min(cfg.max_detections, conf.shape[-1])
    passed = conf >= cfg.conf_threshold
    scores = jnp.where(passed, conf, 0.0)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    valid = top_scores > 0.0

    if cfg.apply_nms:
        def nms_one(b, v):
            iou = _iou_matrix(b)
            # keep[i] = valid and no higher-scoring kept box overlaps it.
            # top_k already sorted by score; unrolled over fixed (small) K.
            keep = v
            for i in range(1, k):
                over = (iou[i, :i] > cfg.iou_threshold) & keep[:i]
                keep = keep.at[i].set(keep[i] & ~jnp.any(over))
            return keep

        keep = jax.vmap(nms_one)(top_boxes, valid)
        valid = valid & keep
    top_boxes = jnp.where(valid[..., None], top_boxes, 0.0)
    top_scores = jnp.where(valid, top_scores, 0.0)
    return top_boxes, top_scores, valid


def clamp_boxes(boxes, limit: float = 55.0):
    """Clamp to the frame like the firmware (yoloface.c:143-147); the
    limit is grid*stride - 1 (55 for the 56-net, 447 for the retargeted
    448 family)."""
    return jnp.clip(boxes, 0.0, limit)


def detect_int8_head(y_int8, *, scale: float, zero_point: int,
                     cfg: HeadConfig = HeadConfig()):
    """Threshold-first head: rank by RAW int8 confidence, decode only the
    top K candidates.

    Only the confidence channel is dequantized/sigmoided for the ranking
    (the SAME zeroed-below-threshold f32 scores as select_detections, so
    ordering and tie-breaks — including sigmoid saturation ties — are
    identical); the K survivors then pay the remaining dequantize /
    sigmoid / exp / NMS — ~9x less decode work and no [N,147,6] float
    relayout.  Detections are bit-identical to decode+select_detections
    (pinned by tests/test_pipeline.py)."""
    n = y_int8.shape[0]
    g = cfg.grid
    a = len(cfg.anchors)
    k = min(cfg.max_detections, cfg.num_cells)

    if cfg.use_fused_head:
        from yoloface_tpu.kernels.pallas_head import detect_head_fused
        return detect_head_fused(
            y_int8.reshape(n, g, g, a * 6), scale=float(scale),
            zero_point=int(zero_point), grid_g=g, anchors_a=a,
            anchors=cfg.anchors, stride=float(cfg.stride),
            conf_threshold=float(cfg.conf_threshold),
            iou_threshold=float(cfg.iou_threshold), k=k,
            apply_nms=cfg.apply_nms,
            box_limit=float(cfg.grid * cfg.stride - 1))

    # dequantize ONCE up front: int8 slices/transposes/gathers all lower
    # ~10x slower than their f32 twins on TPU (measured; an int8 one-hot
    # einsum variant also measured slower), so every layout-touching op
    # below runs on f32
    qf = ((y_int8.astype(jnp.float32) - zero_point) * scale
          ).reshape(n, g, g, a, 6)
    if cfg.use_pallas_topk:
        # K masked-argmax rounds in one Pallas kernel over the identical
        # zeroed-below-threshold f32 sigmoid key (same saturation-tie
        # classes and index tie-break as the lax.top_k path below)
        from yoloface_tpu.kernels.pallas_head import topk_conf_int8
        top_idx = topk_conf_int8(
            y_int8.reshape(n, g, g, a * 6), k, g, a, scale=scale,
            zero_point=zero_point, conf_threshold=cfg.conf_threshold)
    else:
        # candidate order = (anchor, row, col), like decode()'s flattening
        conf_all = jax_sigmoid(
            jnp.transpose(qf[..., 4], (0, 3, 1, 2)).reshape(n, -1))
        rank = jnp.where(conf_all >= cfg.conf_threshold, conf_all, 0.0)
        _, top_idx = jax.lax.top_k(rank, k)

    cells = g * g
    anc = top_idx // cells
    rows = (top_idx % cells) // g
    cols = top_idx % g

    # select the K candidates' 6-vectors by ONE-HOT MATMUL from the native
    # (row,col,anchor) table: take_along_axis gathers measured ~8 ms @32k
    # on TPU, the batched [K,147]@[147,6] dot is essentially free
    gidx = (rows * g + cols) * a + anc
    onehot = (gidx[:, :, None]
              == jnp.arange(cells * a)[None, None, :]).astype(jnp.float32)
    t = jnp.einsum("nkc,ncd->nkd", onehot,
                   qf.reshape(n, -1, 6))                     # [N,K,6]
    # anchor lookup as selects over the (3) anchors — no gather
    anchors = np.asarray(cfg.anchors, np.float32)
    ancf = anc.astype(jnp.float32)
    aw = sum(jnp.where(ancf == i, float(anchors[i, 0]), 0.0)
             for i in range(a))
    ah = sum(jnp.where(ancf == i, float(anchors[i, 1]), 0.0)
             for i in range(a))
    cx = (jax_sigmoid(t[..., 0]) + cols.astype(jnp.float32)) * cfg.stride
    cy = (jax_sigmoid(t[..., 1]) + rows.astype(jnp.float32)) * cfg.stride
    w = jnp.exp(t[..., 2]) * aw
    h = jnp.exp(t[..., 3]) * ah
    conf = jax_sigmoid(t[..., 4])
    boxes = clamp_boxes(
        jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                  axis=-1),
        limit=float(cfg.grid * cfg.stride - 1))

    valid = conf >= cfg.conf_threshold
    scores = jnp.where(valid, conf, 0.0)
    if cfg.apply_nms:
        # scatter-free greedy: batched [N,K,K] IoU, keep flags built as a
        # functional stack (no .at[] updates — those lower as scatters)
        iou = jax.vmap(_iou_matrix)(boxes)
        keeps = [valid[:, 0]]
        for i in range(1, k):
            over = ((iou[:, i, :i] > cfg.iou_threshold)
                    & jnp.stack(keeps, axis=-1))
            keeps.append(valid[:, i] & ~jnp.any(over, axis=-1))
        valid = jnp.stack(keeps, axis=-1)
    boxes = jnp.where(valid[..., None], boxes, 0.0)
    scores = jnp.where(valid, scores, 0.0)
    return boxes, scores, valid


def detect_multihead(head_outputs, head_cfgs, *, scales, zero_points,
                     input_size: float, iou_threshold: float = 0.5,
                     conf_threshold: float = 0.7, max_detections: int = 16):
    """Multi-scale YOLO detection: decode each head at its own grid/anchors,
    pool all candidates, one confidence top-K + greedy NMS across heads.

    The deployment-side counterpart of the v3 trainer's eval decode
    (reference `yolov3_train_tf.py:697-760` evaluates multi-scale heads;
    the reference never deploys them — this closes that loop for int8
    multi-head graphs such as the two-headed FPN from
    `io/darknet_cfg.template_from_darknet`).

    head_outputs: list of int8 tensors [N, g_i, g_i, A_i*6];
    head_cfgs:    list of HeadConfig (grid/stride/anchors per head).
    Returns (boxes [N,K,4], scores [N,K], valid [N,K]).
    """
    all_boxes, all_conf = [], []
    for y, cfg, s, zp in zip(head_outputs, head_cfgs, scales, zero_points):
        b, c, _ = decode(y, scale=float(s), zero_point=int(zp), cfg=cfg)
        all_boxes.append(clamp_boxes(b, limit=input_size - 1.0))
        all_conf.append(c)
    boxes = jnp.concatenate(all_boxes, axis=1)
    conf = jnp.concatenate(all_conf, axis=1)
    sel_cfg = HeadConfig(conf_threshold=conf_threshold,
                         iou_threshold=iou_threshold,
                         max_detections=max_detections)
    return select_detections(boxes, conf, sel_cfg)

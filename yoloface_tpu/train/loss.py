"""YOLO training loss — functional port of the reference ``YoloLoss``
(`yoloface/pytorch/train.py:204-261`).

Semantics preserved exactly:
  * coordinate MSE (sum) on raw tx,ty,tw,th at object cells, weight 5.0;
  * objectness BCE-with-logits (sum): weight 1.0 at object cells, 0.5 at
    no-object cells;
  * class BCE-with-logits (sum) at object cells;
  * total divided by batch size.

Shapes are TPU-friendly: predictions come in NHWC [B, G, G, A*6] straight
from the Flax model; targets are [B, A, G, G, 6] as built by the dataset's
best-anchor assignment (`train.py:66-137`).  Masked sums replace the
reference's boolean indexing (data-dependent shapes don't jit)."""

from __future__ import annotations

import jax.numpy as jnp

LAMBDA_COORD = 5.0
LAMBDA_NOOBJ = 0.5


def _bce_with_logits(logits, labels):
    """Elementwise BCEWithLogits, the numerically-stable log-sum-exp form."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def yolo_loss(predictions, targets):
    """predictions [B,G,G,A*6] raw head output; targets [B,A,G,G,6].

    Returns scalar loss (sum-reduced, / batch), matching train.py:204-261.
    """
    b, g = predictions.shape[0], predictions.shape[1]
    a = targets.shape[1]
    # NHWC [B,G,G,A*6] -> [B,A,G,G,6]; channel layout A*6 means anchor-major
    # groups of 6, identical to the reference's view(B, A, 6, G, G) on NCHW.
    pred = predictions.reshape(b, g, g, a, 6).transpose(0, 3, 1, 2, 4)

    obj = (targets[..., 4] == 1.0).astype(pred.dtype)    # [B,A,G,G]
    noobj = (targets[..., 4] == 0.0).astype(pred.dtype)

    coord_se = jnp.square(pred[..., 0:4] - targets[..., 0:4]).sum(-1)
    loss_coord = (coord_se * obj).sum()

    bce_obj = _bce_with_logits(pred[..., 4], targets[..., 4])
    loss_obj = (bce_obj * obj).sum()
    loss_noobj = (bce_obj * noobj).sum()

    bce_cls = _bce_with_logits(pred[..., 5], targets[..., 5])
    loss_cls = (bce_cls * obj).sum()

    total = (LAMBDA_COORD * loss_coord + loss_obj
             + LAMBDA_NOOBJ * loss_noobj + loss_cls)
    return total / b

"""YOLOv3-variant tests: loss parity vs a numpy port of the reference
YoloV3Loss, mosaic augmentation geometry, multiscale config, train step."""

import numpy as np
import jax
import jax.numpy as jnp

from yoloface_tpu.train.yolov3 import (YoloV3Config, build_v3_target,
                                       make_v3_train_step,
                                       mosaic_augmentation, yolov3_loss)


def numpy_reference_v3_loss(y_pred, y_true, anchors, grid_size):
    """Direct numpy port of YoloV3Loss.call (yolov3_train_tf.py:374-436)."""
    sig = lambda x: 1 / (1 + np.exp(-x))
    b = y_pred.shape[0]
    a = anchors.shape[0]
    pred = y_pred.reshape(b, grid_size, grid_size, a, 6)
    gx, gy = np.meshgrid(np.arange(grid_size), np.arange(grid_size))
    grid = np.stack([gx, gy], -1).reshape(1, grid_size, grid_size, 1,
                                          2).astype(np.float64)
    anc = anchors.reshape(1, 1, 1, a, 2)

    pxy, pwh = sig(pred[..., :2]), pred[..., 2:4]
    pconf, pcls = sig(pred[..., 4:5]), sig(pred[..., 5:6])
    obj = y_true[..., 4:5]
    noobj = 1 - obj

    def decode(xy, wh):
        xy = (xy + grid) / grid_size
        wh = np.exp(wh) * anc / grid_size
        return np.concatenate([xy - wh / 2, xy + wh / 2], -1)

    def iou(b1, b2):
        x1 = np.maximum(b1[..., 0:1], b2[..., 0:1])
        y1 = np.maximum(b1[..., 1:2], b2[..., 1:2])
        x2 = np.minimum(b1[..., 2:3], b2[..., 2:3])
        y2 = np.minimum(b1[..., 3:4], b2[..., 3:4])
        inter = np.maximum(0, x2 - x1) * np.maximum(0, y2 - y1)
        a1 = (b1[..., 2:3] - b1[..., 0:1]) * (b1[..., 3:4] - b1[..., 1:2])
        a2 = (b2[..., 2:3] - b2[..., 0:1]) * (b2[..., 3:4] - b2[..., 1:2])
        return inter / (a1 + a2 - inter + 1e-10)

    coord = (obj * np.square(pxy - y_true[..., :2])).sum()
    pwh_s = np.sign(pwh) * np.sqrt(np.abs(pwh) + 1e-10)
    twh = y_true[..., 2:4]
    twh_s = np.sign(twh) * np.sqrt(np.abs(twh) + 1e-10)  # NaN-safe variant
    coord += (obj * np.square(pwh_s - twh_s)).sum()
    loss = 5.0 * coord
    i = iou(decode(pxy, pwh), decode(y_true[..., :2], y_true[..., 2:4]))
    loss += (obj * np.square(pconf - i)).sum()
    hard = noobj * (i < 0.5)
    loss += 0.5 * (hard * np.square(pconf)).sum()
    loss += (obj * np.square(pcls - y_true[..., 5:6])).sum()
    return loss / max(1.0, obj.sum())


def test_v3_loss_matches_reference_port():
    cfg = YoloV3Config(img_size=64)  # grid 8, fast
    rng = np.random.default_rng(0)
    g, a = cfg.grid_size, cfg.num_anchors
    y_pred = rng.normal(0, 1, (2, g, g, a * 6)).astype(np.float32)
    y_true = np.zeros((2, g, g, a, 6), np.float32)
    for _ in range(5):
        bi, gi, gj, ai = (int(rng.integers(0, d)) for d in (2, g, g, a))
        y_true[bi, gi, gj, ai] = [*rng.uniform(0.1, 0.9, 2),
                                  *rng.normal(0, 0.5, 2), 1.0, 1.0]
    got = float(yolov3_loss(jnp.asarray(y_pred), jnp.asarray(y_true),
                            jnp.asarray(cfg.anchors), g))
    want = numpy_reference_v3_loss(y_pred.astype(np.float64),
                                   y_true.astype(np.float64),
                                   cfg.anchors.astype(np.float64), g)
    assert abs(got - want) / max(abs(want), 1.0) < 1e-4


def test_mosaic_geometry():
    rng = np.random.default_rng(3)
    imgs = [np.full((100, 100, 3), i * 40, np.uint8) for i in range(4)]
    labels = [np.array([[0.0, 0.5, 0.5, 0.2, 0.2]]) for _ in range(4)]
    mosaic, merged = mosaic_augmentation(imgs, labels, 416, rng)
    assert mosaic.shape == (416, 416, 3)
    assert merged.shape[1] == 5
    assert len(merged) <= 4
    assert np.all((merged[:, 1] > 0) & (merged[:, 1] < 1))


def test_random_rotate_labels():
    """Label transform properties (yolov3_train_tf.py:521-547): the center
    follows the image rotation exactly; w/h stay untouched; a centered box
    is a fixed point; surviving labels stay normalized."""
    from yoloface_tpu.train.yolov3 import random_rotate
    import cv2
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (100, 100, 3)).astype(np.uint8)
    labels = np.array([[0.0, 0.5, 0.5, 0.2, 0.3],     # centered: fixed pt
                       [1.0, 0.8, 0.3, 0.1, 0.1]])
    out, lab = random_rotate(img, labels.copy(), rng)
    assert out.shape == img.shape
    assert len(lab) >= 1
    np.testing.assert_allclose(lab[0, 1:3], [0.5, 0.5], atol=1e-5)
    np.testing.assert_array_equal(lab[:, 3:], labels[:len(lab), 3:])
    assert np.all((lab[:, 1:3] > 0) & (lab[:, 1:3] < 1))
    # hand-computed case: rotation by exactly +90 deg via the same affine
    M = cv2.getRotationMatrix2D((50, 50), 90, 1.0)
    c = cv2.transform(np.array([[[80.0, 30.0]]], np.float32), M)[0, 0]
    # (80,30) about (50,50) by +90 (cv2 y-down -> clockwise): (30, 20)
    np.testing.assert_allclose(c, [30.0, 20.0], atol=1e-4)


def test_random_crop_labels():
    """Crop transform (yolov3_train_tf.py:549-575): surviving boxes keep
    their absolute pixel geometry (IoU 1.0 against the hand-transformed
    box); out-of-crop centers are dropped; outputs stay normalized."""
    from yoloface_tpu.train.yolov3 import random_crop

    class FixedRng:
        def uniform(self, lo, hi):
            return 0.5                      # crop fraction 0.5

        def integers(self, lo, hi):
            return 25                       # x1 = y1 = 25

    img = np.zeros((100, 100, 3), np.uint8)
    labels = np.array([[0.0, 0.5, 0.5, 0.2, 0.2],    # inside the crop
                       [1.0, 0.05, 0.05, 0.1, 0.1]])  # outside -> dropped
    out, lab = random_crop(img, labels.copy(), FixedRng())
    assert out.shape == (50, 50, 3)
    assert len(lab) == 1
    # center (50,50)px -> (25,25) in crop -> 0.5 norm; w 20px -> 0.4
    np.testing.assert_allclose(lab[0], [0.0, 0.5, 0.5, 0.4, 0.4],
                               atol=1e-9)


def test_augments_wired_into_trainer():
    from yoloface_tpu.train.yolov3 import YoloV3Trainer
    cfg = YoloV3Config(img_size=96, multiscale=False, mosaic=False,
                       rotate=True, crop=True, rotate_prob=1.0,
                       crop_prob=1.0, batch_size=2, epochs=1)
    tr = YoloV3Trainer(cfg, "/root/reference/yoloface/small_dataset",
                       seed=0)
    imgs, tgts = tr._make_batch(96, 2)
    assert imgs.shape == (2, 96, 96, 3)
    assert np.isfinite(imgs).all() and np.isfinite(tgts).all()


def test_multiscale_sampling():
    cfg = YoloV3Config()
    rng = np.random.default_rng(0)
    sizes = {cfg.sample_scale(rng) for _ in range(100)}
    assert min(sizes) >= 320 and max(sizes) <= 608
    assert all(s % 32 == 0 for s in sizes)
    assert len(sizes) > 3


def test_v3_target_and_train_step():
    cfg = YoloV3Config(img_size=64, epochs=2, batch_size=2,
                       multiscale=False)
    labels = np.array([[0.0, 0.5, 0.5, 0.3, 0.3]])
    tgt = build_v3_target(labels, cfg)
    assert tgt.shape == (8, 8, 3, 6)
    assert tgt[..., 4].sum() == 1.0

    init, step = make_v3_train_step(cfg)
    state = init(jax.random.PRNGKey(0))
    images = np.random.default_rng(1).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32)
    targets = np.stack([tgt, tgt])
    losses = []
    for _ in range(5):
        state, m = step(state, images, targets)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_v3_trainer_multiscale_mosaic():
    """The v3 trainer loop runs with mosaic batches at multiple scales and
    produces finite losses (yolov3_train_tf.py's multiscale_training +
    mosaic_augmentation wiring)."""
    from yoloface_tpu.train.yolov3 import YoloV3Trainer
    cfg = YoloV3Config(img_size=128, multiscale=True, multiscale_min=96,
                       multiscale_max=160, mosaic=True, batch_size=2,
                       epochs=3)
    tr = YoloV3Trainer(cfg, "/root/reference/yoloface/small_dataset",
                       seed=1)
    hist = tr.fit(epochs=3, steps_per_epoch=2, batch=2)
    assert len(hist) == 3
    assert all(np.isfinite(hist))
    assert all(96 <= s <= 160 and s % 32 == 0 for s in tr.scales_used)

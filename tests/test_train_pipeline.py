"""Trainer pipeline tests: target assignment parity, dataset iteration,
augmentations, checkpoint save/resume, and the mAP evaluator."""

import os

import numpy as np
import pytest

from yoloface_tpu.train.data import (AugmentConfig, FaceDataset, augment,
                                     build_target, load_labels_for)
from yoloface_tpu.train.evaluate import (box_iou, calculate_ap,
                                         calculate_map)

SMALL_DATASET = "/root/reference/yoloface/small_dataset"


def torch_reference_target(labels, img_size=56, grid=7,
                           anchors=np.array([[9., 14.], [12., 17.],
                                             [22., 21.]])):
    """Direct port of FaceDataset.__getitem__ target assignment
    (train.py:96-134) as the oracle."""
    target = np.zeros((3, grid, grid, 6), np.float32)
    lab = labels.copy()
    lab[:, :4] *= img_size
    for x_c, y_c, w, h, cls in lab:
        gx = int(x_c / (img_size / grid))
        gy = int(y_c / (img_size / grid))
        gx, gy = min(gx, grid - 1), min(gy, grid - 1)
        tx = x_c / (img_size / grid) - gx
        ty = y_c / (img_size / grid) - gy
        tw = np.log(w / anchors[:, 0])
        th = np.log(h / anchors[:, 1])
        ious = []
        for aw, ah in anchors:
            inter = min(w, aw) * min(h, ah)
            union = w * h + aw * ah - inter
            ious.append(inter / union if union else 0)
        best = int(np.argmax(ious))
        target[best, gy, gx, 0] = tx
        target[best, gy, gx, 1] = ty
        target[best, gy, gx, 2] = tw[best]
        target[best, gy, gx, 3] = th[best]
        target[best, gy, gx, 4] = 1.0
        target[best, gy, gx, 5] = cls
    return target


def test_target_assignment_matches_reference():
    rng = np.random.default_rng(0)
    for _ in range(20):
        m = rng.integers(1, 4)
        labels = np.stack([
            rng.uniform(0.1, 0.9, m), rng.uniform(0.1, 0.9, m),
            rng.uniform(0.05, 0.5, m), rng.uniform(0.05, 0.5, m),
            np.zeros(m)], axis=-1)
        got = build_target(labels)
        want = torch_reference_target(labels)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_default_label_when_no_sidecar(tmp_path):
    labels = load_labels_for(str(tmp_path / "nonexistent.jpg"))
    np.testing.assert_array_equal(labels, [[0.5, 0.5, 0.3, 0.3, 0.0]])


def test_sidecar_labels(tmp_path):
    p = tmp_path / "img.txt"
    p.write_text("0 0.5 0.4 0.2 0.3\n1 0.1 0.2 0.05 0.05\n")
    labels = load_labels_for(str(tmp_path / "img.jpg"))
    assert labels.shape == (2, 5)
    np.testing.assert_allclose(labels[0], [0.5, 0.4, 0.2, 0.3, 0.0])
    np.testing.assert_allclose(labels[1], [0.1, 0.2, 0.05, 0.05, 1.0])


def test_dataset_batches():
    ds = FaceDataset(SMALL_DATASET, augment_cfg=AugmentConfig())
    batches = list(ds.batches(8, epochs=1))
    assert len(batches) == len(ds) // 8
    imgs, tgts = batches[0]
    assert imgs.shape == (8, 56, 56, 3) and imgs.dtype == np.float32
    assert tgts.shape == (8, 3, 7, 7, 6)
    assert imgs.min() >= 0 and imgs.max() <= 1
    assert (tgts[..., 4] == 1).sum() == 8  # one default face per image


def test_flip_augment_flips_labels():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (56, 56, 3)).astype(np.float32)
    labels = np.array([[0.3, 0.5, 0.2, 0.2, 0.0]])
    cfg = AugmentConfig(hsv_jitter=False, brightness_delta=0.0,
                        contrast_range=None)
    flipped = False
    for seed in range(20):
        rng2 = np.random.default_rng(seed)
        out_img, out_lab = augment(img, labels, rng2, cfg)
        if abs(out_lab[0, 0] - 0.7) < 1e-9:
            flipped = True
            np.testing.assert_allclose(out_img, img[:, ::-1])
    assert flipped


def test_calculate_ap_perfect_and_zero():
    assert calculate_ap(np.array([1.0]), np.array([1.0])) == 1.0
    assert calculate_ap(np.array([0.0]), np.array([0.0])) == 0.0


def test_calculate_map_synthetic():
    gt = [{"boxes": np.array([[10, 10, 30, 30], [40, 40, 50, 50]])}]
    # perfect predictions
    pred = [{"boxes": np.array([[10, 10, 30, 30], [40, 40, 50, 50]]),
             "scores": np.array([0.9, 0.8])}]
    m = calculate_map(pred, gt)
    assert m["ap"] == pytest.approx(1.0)
    assert m["recall"] == pytest.approx(1.0)
    # one miss, one false positive
    pred = [{"boxes": np.array([[10, 10, 30, 30], [0, 0, 5, 5]]),
             "scores": np.array([0.9, 0.8])}]
    m = calculate_map(pred, gt)
    assert m["ap"] == pytest.approx(0.5)


def test_trainer_smoke_with_checkpoint_resume(tmp_path):
    """Two short trainer runs: the second must resume from the first's
    checkpoint (train_tf.py:944-960 auto-resume behavior)."""
    from yoloface_tpu.train.trainer import Trainer, TrainerConfig
    cfg = TrainerConfig(
        train_dir=SMALL_DATASET, val_dir=SMALL_DATASET,
        checkpoint_dir=str(tmp_path / "ckpt"), epochs=1, batch_size=8,
        save_interval=1, use_mesh=False, log_every=1)
    t1 = Trainer(cfg)
    h1 = t1.fit(epochs=1)
    assert len(h1["train_loss"]) == 1
    assert os.path.exists(tmp_path / "ckpt" / "metrics.jsonl")
    # resume
    cfg2 = TrainerConfig(
        train_dir=SMALL_DATASET, val_dir=SMALL_DATASET,
        checkpoint_dir=str(tmp_path / "ckpt"), epochs=2, batch_size=8,
        save_interval=1, use_mesh=False, log_every=1)
    t2 = Trainer(cfg2)
    assert t2.start_epoch == 1
    h2 = t2.fit(epochs=2)
    assert len(h2["train_loss"]) == 1  # only epoch 2 ran
    assert os.path.exists(tmp_path / "ckpt" / "best_model.npz")

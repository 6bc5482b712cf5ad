"""End-to-end learning demo: train yoloface on synthetic targets, quantize,
deploy on the int8 engine, and measure detection quality.

This exercises the WHOLE framework loop the reference implements across
train.py -> tflite_quantize.py -> the MCU runtime, as one script:
  1. synthesize a detection task (bright square on textured background);
  2. train the Flax model (data-parallel-ready train step);
  3. PTQ-calibrate to int8 and run through Int8Engine + the decode head;
  4. report IoU/hit-rate of the deployed int8 detector.

Run: python -m examples.train_synthetic [--steps 400]
"""

from __future__ import annotations

import argparse

import numpy as np


def make_sample(rng: np.random.Generator):
    """One 56x56 image: textured background + one bright square; returns
    (image f32 [56,56,3], normalized label [cx, cy, w, h, cls])."""
    img = rng.uniform(0.0, 0.35, (56, 56, 3)).astype(np.float32)
    size = int(rng.integers(14, 28))
    x0 = int(rng.integers(0, 56 - size))
    y0 = int(rng.integers(0, 56 - size))
    color = rng.uniform(0.75, 1.0, 3).astype(np.float32)
    img[y0:y0 + size, x0:x0 + size] = color
    cx = (x0 + size / 2) / 56.0
    cy = (y0 + size / 2) / 56.0
    return img, np.array([[cx, cy, size / 56.0, size / 56.0, 0.0]])


def make_batch(rng, n):
    from yoloface_tpu.train.data import build_target
    imgs, tgts, labels = [], [], []
    for _ in range(n):
        img, lab = make_sample(rng)
        imgs.append(img)
        tgts.append(build_target(lab))
        labels.append(lab[0])
    return (np.stack(imgs), np.stack(tgts), np.stack(labels))


def train(steps: int = 400, batch: int = 32, lr: float = 3e-3, seed: int = 0):
    import jax
    from yoloface_tpu.train.steps import (TrainConfig, init_state,
                                          make_train_step)
    cfg = TrainConfig(learning_rate=lr, epochs=1, steps_per_epoch=steps,
                      batch_size=batch)
    state = init_state(jax.random.PRNGKey(seed), cfg)
    step = jax.jit(make_train_step(cfg))
    rng = np.random.default_rng(seed)
    for i in range(steps):
        imgs, tgts, _ = make_batch(rng, batch)
        state, metrics = step(state, imgs, tgts)
        if (i + 1) % max(steps // 8, 1) == 0:
            print(f"step {i + 1}/{steps}  loss={float(metrics['loss']):.3f}")
    return state


def evaluate_deployed(state, n_eval: int = 24, conf: float = 0.5,
                      seed: int = 123):
    """Quantize the trained model and measure the INT8 detector."""
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.pipeline.e2e import FacePipeline
    from yoloface_tpu.pipeline.head import HeadConfig
    from yoloface_tpu.quantize.calibrate import calibrate
    from yoloface_tpu.runtime.engine import Int8Engine
    from yoloface_tpu.train.evaluate import box_iou

    template = load_tflite(
        "/root/reference/yoloface/tflite/yoloface_int8.tflite")
    rng = np.random.default_rng(seed)
    rep_imgs, _, _ = make_batch(rng, 16)
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    graph = calibrate(variables, rep_imgs, template)
    pipe = FacePipeline(Int8Engine(graph),
                        HeadConfig(conf_threshold=conf))

    imgs, _, labels = make_batch(rng, n_eval)
    x = np.clip(np.round(imgs * 255) - 128, -128, 127).astype(np.int8)
    det = pipe.detect_int8(x)
    hits, ious = 0, []
    for i in range(n_eval):
        gt = labels[i]
        gt_box = np.array([[(gt[0] - gt[2] / 2) * 56,
                            (gt[1] - gt[3] / 2) * 56,
                            (gt[0] + gt[2] / 2) * 56,
                            (gt[1] + gt[3] / 2) * 56]])
        v = det["valid"][i]
        if not v.any():
            continue
        best = det["boxes"][i][v][np.argmax(det["scores"][i][v])]
        iou = float(box_iou(best[None], gt_box)[0, 0])
        ious.append(iou)
        if iou >= 0.5:
            hits += 1
    return {"hit_rate": hits / n_eval,
            "mean_iou": float(np.mean(ious)) if ious else 0.0,
            "detected": len(ious), "n_eval": n_eval}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-3)
    args = p.parse_args(argv)
    state = train(args.steps, args.batch, args.lr)
    metrics = evaluate_deployed(state)
    print("deployed int8 detector:", metrics)
    return metrics


if __name__ == "__main__":
    main()

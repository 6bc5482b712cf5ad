"""Real-faces learning closure: overfit the 24-image corpus from scratch,
deploy through BOTH PTQ paths, and measure recall on the corpus faces.

The reference's training→quantize→deploy arc (`train_tf.py` →
`tflite_quantize.py` → firmware) never travels end-to-end on real faces in
this environment because no labeled face dataset ships with it; the only
ground truth available is the shipped int8 detector itself.  So this
script closes the arc with pseudo-labels:

  1. pseudo-label `small_dataset/` with the shipped `yoloface_int8.tflite`
     running on the exact engine (its detections == the reference
     firmware's detections, bit-for-bit — see tests/test_parity_int8.py);
  2. train a Flax YoloFace FROM SCRATCH to overfit the 24 images
     (flip/HSV augments from `train/data.py`);
  3. deploy via (a) the native PTQ flow (`quantize/calibrate.py`) and
     (b) the reference's literal converter chain
     (`quantize/tf_convert.checkpoint_to_int8_tflite`: Flax → Keras h5 →
     frozen pb → MLIR-quantized int8 tflite);
  4. run both deployed int8 graphs on the int8 engine and report recall
     of the corpus faces vs the pseudo-labels (+ the trained checkpoint's
     ONNX export, executed by io/onnx_eval, cross-checked against the
     float path).

Run: python -m examples.train_corpus [--steps 600]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

REFERENCE = "/root/reference"
TFLITE = REFERENCE + "/yoloface/tflite/yoloface_int8.tflite"
SMALL_DATASET = REFERENCE + "/yoloface/small_dataset"


def load_corpus():
    """[N,56,56,3] float32 in [0,1], preprocessed exactly like the
    reference predictor (tflite_prediction.py:30-37)."""
    import cv2

    imgs = []
    for fname in sorted(os.listdir(SMALL_DATASET)):
        if not fname.lower().endswith((".jpg", ".jpeg", ".png")):
            continue
        img = cv2.imread(os.path.join(SMALL_DATASET, fname))
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        imgs.append(cv2.resize(img, (56, 56)).astype(np.float32) / 255.0)
    return np.stack(imgs)


def pseudo_labels(images_f32, conf: float = 0.7):
    """Detections of the shipped graph (exact engine) as normalized
    [M,5] (cx, cy, w, h, cls) labels per image."""
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.pipeline.e2e import FacePipeline
    from yoloface_tpu.pipeline.head import HeadConfig
    from yoloface_tpu.runtime.engine import Int8Engine

    pipe = FacePipeline(Int8Engine(load_tflite(TFLITE), mode="exact"),
                        HeadConfig(conf_threshold=conf))
    x = np.clip(np.round(images_f32 * 255) - 128, -128, 127).astype(np.int8)
    det = pipe.detect_int8(x)
    labels = []
    for i in range(len(images_f32)):
        v = np.asarray(det["valid"][i])
        boxes = np.asarray(det["boxes"][i])[v]          # xyxy, 56-px frame
        lab = np.zeros((len(boxes), 5), np.float32)
        if len(boxes):
            lab[:, 0] = (boxes[:, 0] + boxes[:, 2]) / 2 / 56.0
            lab[:, 1] = (boxes[:, 1] + boxes[:, 3]) / 2 / 56.0
            lab[:, 2] = (boxes[:, 2] - boxes[:, 0]) / 56.0
            lab[:, 3] = (boxes[:, 3] - boxes[:, 1]) / 56.0
        labels.append(lab)
    return labels


def train(images, labels, steps: int = 600, lr: float = 3e-3,
          seed: int = 0, log=print):
    """Overfit the corpus from scratch with flip/HSV augmentation."""
    import jax

    from yoloface_tpu.train.data import augment, build_target
    from yoloface_tpu.train.steps import (TrainConfig, init_state,
                                          make_train_step)

    n = len(images)
    cfg = TrainConfig(learning_rate=lr, epochs=1, steps_per_epoch=steps,
                      batch_size=n, warmup_steps=20)
    state = init_state(jax.random.PRNGKey(seed), cfg)
    step = jax.jit(make_train_step(cfg))
    rng = np.random.default_rng(seed)
    for i in range(steps):
        imgs, tgts = [], []
        for j in range(n):
            img, lab = ((images[j], labels[j]) if not len(labels[j])
                        else augment(images[j], labels[j], rng))
            imgs.append(img)
            tgts.append(build_target(lab) if len(lab)
                        else np.zeros((3, 7, 7, 6), np.float32))
        state, metrics = step(state, np.stack(imgs), np.stack(tgts))
        if (i + 1) % max(steps // 6, 1) == 0:
            log(f"step {i + 1}/{steps}  loss={float(metrics['loss']):.3f}")
    return state


def _recall(det, labels, iou_thr: float = 0.4):
    """Fraction of pseudo-label faces matched by a detection."""
    from yoloface_tpu.train.evaluate import box_iou

    total = hit = 0
    for i, lab in enumerate(labels):
        if not len(lab):
            continue
        gt = np.stack([(lab[:, 0] - lab[:, 2] / 2) * 56,
                       (lab[:, 1] - lab[:, 3] / 2) * 56,
                       (lab[:, 0] + lab[:, 2] / 2) * 56,
                       (lab[:, 1] + lab[:, 3] / 2) * 56], axis=1)
        v = np.asarray(det["valid"][i])
        boxes = np.asarray(det["boxes"][i])[v]
        total += len(gt)
        if not len(boxes):
            continue
        iou = box_iou(boxes, gt)                     # [D, G]
        hit += int((iou.max(axis=0) >= iou_thr).sum())
    return hit, total


def evaluate_deployed(graph, images, labels, conf: float = 0.5):
    from yoloface_tpu.pipeline.e2e import FacePipeline
    from yoloface_tpu.pipeline.head import HeadConfig
    from yoloface_tpu.runtime.engine import Int8Engine

    pipe = FacePipeline(Int8Engine(graph, mode="exact"),
                        HeadConfig(conf_threshold=conf))
    x = np.clip(np.round(images * 255) - 128, -128, 127).astype(np.int8)
    det = pipe.detect_int8(x)
    hit, total = _recall(det, labels)
    return {"recall": hit / max(total, 1), "faces": total, "matched": hit}


def deploy_native(state, images):
    """PTQ path (a): native calibration on the corpus itself."""
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.quantize.calibrate import calibrate

    template = load_tflite(TFLITE)
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    return calibrate(variables, images, template)


def deploy_reference_chain(state, workdir: str):
    """PTQ path (b): the reference's literal converter toolchain."""
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.quantize.tf_convert import checkpoint_to_int8_tflite

    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    path = checkpoint_to_int8_tflite(
        variables, os.path.join(workdir, "corpus_int8.tflite"), workdir,
        rep_dir=SMALL_DATASET)
    return load_tflite(path)


def onnx_closure(state, images):
    """Trained checkpoint -> ONNX -> executed by OnnxEvaluator; head must
    match the float path (the reference runs its trained onnx through
    onnxruntime, onnx_prediction.py:33-37)."""
    from yoloface_tpu.io.onnx_eval import OnnxEvaluator
    from yoloface_tpu.io.onnx_export import export_onnx
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.quantize.calibrate import float_forward, fold_batchnorm

    template = load_tflite(TFLITE)
    weights = fold_batchnorm({"params": state["params"],
                              "batch_stats": state["batch_stats"]})
    buf = export_onnx(template, weights)
    got = OnnxEvaluator(buf)(images.transpose(0, 3, 1, 2))
    want = np.asarray(float_forward(template, weights,
                                    images)[template.outputs[0]])
    err = float(np.abs(got.transpose(0, 2, 3, 1) - want).max())
    return {"onnx_max_abs_err": err, "onnx_ok": err < 1e-3}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--out", default="checkpoints/corpus_metrics.json")
    args = p.parse_args(argv)

    images = load_corpus()
    labels = pseudo_labels(images)
    n_faces = int(sum(len(x) for x in labels))
    print(f"corpus: {len(images)} images, {n_faces} pseudo-label faces "
          f"from the shipped detector")

    state = train(images, labels, steps=args.steps, lr=args.lr)

    import tempfile

    native = evaluate_deployed(deploy_native(state, images), images, labels)
    with tempfile.TemporaryDirectory() as wd:
        refchain = evaluate_deployed(deploy_reference_chain(state, wd),
                                     images, labels)
    onnx = onnx_closure(state, images)

    metrics = {"n_images": len(images), "n_faces": n_faces,
               "steps": args.steps,
               "native_ptq": native, "reference_chain_ptq": refchain,
               **onnx}
    print("deployed:", json.dumps(metrics))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=1)
    return metrics


if __name__ == "__main__":
    main()

"""Detection CLI: ``python -m yoloface_tpu.detect --image face.jpg``.

The user-facing predictor, covering the reference's per-artifact inference
scripts (`tflite/tflite_prediction.py`, `tensorflow/h5_predition.py`,
`pb_prediction.py`, `pytorch/onnx_prediction.py`) and `yoloface_test.py`'s
image / batch / video modes with a report file.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def preprocess_image(path: str, size: int = 56):
    import cv2
    img = cv2.imread(path)
    if img is None:
        raise SystemExit(f"cannot read image: {path}")
    h, w = img.shape[:2]
    rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    x = cv2.resize(rgb, (size, size)).astype(np.float32)
    x = (x - 128.0).astype(np.int8)  # tflite_prediction.py:34-37
    return img, x, (w / size, h / size)


def detections_to_records(det, i, scales=(1.0, 1.0)):
    wx, hy = scales
    out = []
    for box, score, ok in zip(det["boxes"][i], det["scores"][i],
                              det["valid"][i]):
        if not ok:
            continue
        x1, y1, x2, y2 = box
        out.append({
            "box_net": [float(v) for v in box],
            "box_image": [float(x1 * wx), float(y1 * hy),
                          float(x2 * wx), float(y2 * hy)],
            "confidence": float(score),
        })
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description="yoloface TPU detector")
    p.add_argument("--tflite",
                   default="/root/reference/yoloface/tflite/yoloface_int8.tflite")
    p.add_argument("--mode", default="exact",
                   choices=["exact", "fast", "fast2", "pallas",
                            "pallas_exact", "pallas_fused",
                            "pallas_fused_exact", "pallas_arena",
                            "pallas_arena_exact", "pallas_mxu",
                            "pallas_mxu_exact", "pallas_mxu2",
                            "pallas_tiled", "pallas_tiled2",
                            "pallas_tiled_exact"])
    p.add_argument("--retarget", type=int, default=1, metavar="K",
                   help="run the spatially retargeted graph at 56*K px "
                        "(graph/retarget.py): detects yoloface-scale "
                        "faces on a K-times larger frame at full "
                        "resolution (grid 7*K, same stride/anchors)")
    p.add_argument("--conf", type=float, default=0.7)
    p.add_argument("--iou", type=float, default=0.5)
    p.add_argument("--image", help="single image path")
    p.add_argument("--batch-dir", help="directory of images")
    p.add_argument("--video", help="video file (frame-by-frame)")
    p.add_argument("--save-vis", help="write annotated image(s) here")
    p.add_argument("--report", help="write a JSON report here")
    args = p.parse_args(argv)

    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.pipeline.e2e import FacePipeline
    from yoloface_tpu.pipeline.head import HeadConfig
    from yoloface_tpu.runtime.engine import Int8Engine

    graph = load_tflite(args.tflite)
    size = 56 * args.retarget
    if args.retarget > 1:
        from yoloface_tpu.graph.retarget import retarget_spatial
        graph = retarget_spatial(graph, args.retarget)
    pipe = FacePipeline(
        Int8Engine(graph, mode=args.mode),
        HeadConfig(grid=7 * args.retarget, conf_threshold=args.conf,
                   iou_threshold=args.iou))

    results = {}
    if args.image:
        img, x, scales = preprocess_image(args.image, size)
        det = pipe.detect_int8(x[None])
        recs = detections_to_records(det, 0, scales)
        results[os.path.basename(args.image)] = recs
        _maybe_draw(img, recs, args.save_vis, args.image)
    elif args.batch_dir:
        files = sorted(f for f in os.listdir(args.batch_dir)
                       if f.lower().endswith((".jpg", ".jpeg", ".png")))
        imgs, xs, scales_l = [], [], []
        for f in files:
            img, x, scales = preprocess_image(
                os.path.join(args.batch_dir, f), size)
            imgs.append(img)
            xs.append(x)
            scales_l.append(scales)
        det = pipe.detect_int8(np.stack(xs))
        for i, f in enumerate(files):
            recs = detections_to_records(det, i, scales_l[i])
            results[f] = recs
            if args.save_vis:
                _maybe_draw(imgs[i], recs, args.save_vis, f)
    elif args.video:
        import cv2
        cap = cv2.VideoCapture(args.video)
        idx = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            x = (cv2.resize(rgb, (size, size)).astype(np.float32)
                 - 128.0).astype(np.int8)
            det = pipe.detect_int8(x[None])
            results[f"frame_{idx}"] = detections_to_records(det, 0)
            idx += 1
        cap.release()
    else:
        p.error("one of --image / --batch-dir / --video is required")

    n_total = sum(len(v) for v in results.values())
    summary = {"inputs": len(results), "faces": n_total,
               "detections": results}
    if args.report:
        with open(args.report, "w") as f:
            json.dump(summary, f, indent=2)
    for name, recs in results.items():
        print(f"{name}: {len(recs)} face(s)")
        for r in recs:
            b = ", ".join(f"{v:.1f}" for v in r["box_image"])
            print(f"  [{b}]  conf={r['confidence']:.2f}")
    print(f"total: {n_total} face(s) in {len(results)} input(s)")
    return 0


def _maybe_draw(img, recs, save_dir, name):
    if not save_dir:
        return
    import cv2
    os.makedirs(save_dir, exist_ok=True)
    for r in recs:
        x1, y1, x2, y2 = (int(v) for v in r["box_image"])
        cv2.rectangle(img, (x1, y1), (x2, y2), (0, 0, 255), 2)
    cv2.imwrite(os.path.join(save_dir, os.path.basename(name)), img)


if __name__ == "__main__":
    sys.exit(main())

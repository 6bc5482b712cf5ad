"""Detection CLI tests: image mode, batch mode, report file, visualization."""

import json
import os

from yoloface_tpu import detect

IMG = "/root/reference/yoloface/small_dataset/img_1087.jpg"
DATASET = "/root/reference/yoloface/small_dataset"


def test_single_image_with_report(tmp_path, capsys):
    report = tmp_path / "r.json"
    vis = tmp_path / "vis"
    rc = detect.main(["--image", IMG, "--report", str(report),
                      "--save-vis", str(vis)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "face(s)" in out
    data = json.loads(report.read_text())
    assert data["inputs"] == 1
    assert data["faces"] >= 1
    assert any(r["confidence"] >= 0.7
               for r in data["detections"]["img_1087.jpg"])
    assert os.path.exists(vis / "img_1087.jpg")


def test_batch_mode(tmp_path, capsys):
    report = tmp_path / "r.json"
    rc = detect.main(["--batch-dir", DATASET, "--report", str(report)])
    assert rc == 0
    data = json.loads(report.read_text())
    assert data["inputs"] == 27
    assert data["faces"] >= 20


def test_video_mode(tmp_path):
    """detect --video on a synthesized MJPG clip of dataset faces."""
    import cv2
    import numpy as np
    vid = str(tmp_path / "faces.avi")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"), 5, (112, 112))
    for f in sorted(os.listdir(DATASET))[:4]:
        img = cv2.imread(os.path.join(DATASET, f))
        w.write(cv2.resize(img, (112, 112)))
    w.release()
    report = tmp_path / "v.json"
    rc = detect.main(["--video", vid, "--report", str(report)])
    assert rc == 0
    data = json.loads(report.read_text())
    assert data["inputs"] == 4
    assert data["faces"] >= 3  # MJPG compression may cost a borderline one

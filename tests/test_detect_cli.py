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

"""Pipeline tests: firmware-exact preprocessing, reference decode parity,
NMS equivalence, and end-to-end detection parity on small_dataset."""

import numpy as np
import pytest

from yoloface_tpu.pipeline import preprocess
from yoloface_tpu.pipeline.e2e import FacePipeline
from yoloface_tpu.pipeline.head import HeadConfig, decode, select_detections
from yoloface_tpu.runtime.engine import Int8Engine


# ---------------------------------------------------------------- oracles
def firmware_preprocess_ref(frame_u16: np.ndarray) -> np.ndarray:
    """Direct numpy port of resize_rgb565_uint8_112_to_56_direct +
    prepare_yolo_data (yoloface.c:26-93), as the bit-exactness oracle."""
    out = np.zeros((56, 56, 3), np.int8)
    for y in range(56):
        for x in range(56):
            sr = sg = sb = 0
            for dy in range(2):
                for dx in range(2):
                    p = int(frame_u16[y * 2 + dy, x * 2 + dx])
                    sr += (p >> 11) & 0x1F
                    sg += (p >> 5) & 0x3F
                    sb += p & 0x1F
            ar, ag, ab = sr >> 2, sg >> 2, sb >> 2
            color = ((ar & 0x1F) << 11) | ((ag & 0x3F) << 5) | (ab & 0x1F)
            r = (color & 0xF800) >> 8
            g = (color & 0x07E0) >> 3
            b = (color & 0x001F) << 3
            out[y, x] = (np.int16(r) - 128, np.int16(g) - 128,
                         np.int16(b) - 128)
    return out


def reference_decode(y_int8_single: np.ndarray):
    """Numpy port of tflite_prediction.py:43-57 decode (the oracle)."""
    output = y_int8_single.astype(np.float32)
    output = (output + 15) * 0.14218327403068542
    anchors = np.array([[[[9, 14]]], [[[12, 17]]], [[[22, 21]]]], np.float32)
    output = output.reshape((7, 7, 3, 6)).transpose([2, 0, 1, 3])
    yv, xv = np.meshgrid(np.arange(7), np.arange(7))
    grid = np.stack((yv, xv), 2).reshape((1, 7, 7, 2)).astype(np.float32)
    sig = lambda v: 1 / (1 + np.exp(-v))
    output[..., 0:2] = (sig(output[..., 0:2]) + grid) * 8
    output[..., 2:4] = np.exp(output[..., 2:4]) * anchors
    output[..., 4:] = sig(output[..., 4:])
    return output.reshape((-1, 6))


def reference_nms(boxes_conf: np.ndarray, iou_threshold: float):
    """Numpy port of yoloface_test.py:148-199 greedy IoU NMS."""
    if boxes_conf.shape[0] == 0:
        return []
    x1, y1, x2, y2, conf = (boxes_conf[:, i] for i in range(5))
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = conf.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (area[i] + area[order[1:]] - inter)
        order = order[np.where(iou <= iou_threshold)[0] + 1]
    return keep


# ------------------------------------------------------------------ tests
def test_preprocess_bit_exact_vs_firmware():
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 1 << 16, (2, 112, 112), dtype=np.int64).astype(np.uint16)
    got = np.asarray(preprocess.rgb565_to_int8_input(frames))
    for n in range(frames.shape[0]):
        want = firmware_preprocess_ref(frames[n])
        np.testing.assert_array_equal(got[n], want)


def test_encode_decode_rgb565_roundtrip():
    rng = np.random.default_rng(8)
    rgb = rng.integers(0, 256, (1, 112, 112, 3), dtype=np.int64).astype(np.uint8)
    frames = preprocess.encode_rgb565(rgb)
    x = np.asarray(preprocess.rgb565_to_int8_input(frames))
    # int8 input must stay within quantization truncation error of the
    # original pixels: 5-bit fields -> max error 8+- on R/B, 4 on G, plus
    # box-average of 4 neighbours
    assert x.shape == (1, 56, 56, 3)
    assert x.dtype == np.int8


def test_decode_matches_reference_decoder(int8_graph, dataset_images):
    eng = Int8Engine(int8_graph)
    name = sorted(dataset_images)[0]
    y = np.asarray(eng(dataset_images[name]))
    boxes, conf, cls = decode(y, scale=eng.output_qparams.scale,
                              zero_point=eng.output_qparams.zero_point)
    want = reference_decode(y[0])
    want_xyxy = np.stack([
        want[:, 0] - want[:, 2] / 2, want[:, 1] - want[:, 3] / 2,
        want[:, 0] + want[:, 2] / 2, want[:, 1] + want[:, 3] / 2], axis=-1)
    np.testing.assert_allclose(np.asarray(boxes)[0], want_xyxy,
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(conf)[0], want[:, 4],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cls)[0], want[:, 5],
                               rtol=1e-5, atol=1e-5)


def test_nms_matches_reference_nms():
    rng = np.random.default_rng(9)
    cfg = HeadConfig(conf_threshold=0.3, iou_threshold=0.5,
                     max_detections=16)
    for trial in range(8):
        k = 12
        cx = rng.uniform(5, 50, k)
        cy = rng.uniform(5, 50, k)
        w = rng.uniform(4, 25, k)
        h = rng.uniform(4, 25, k)
        conf = rng.uniform(0, 1, k).astype(np.float32)
        boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                         axis=-1).astype(np.float32)
        b, s, valid = select_detections(boxes[None], conf[None], cfg)
        got = {tuple(np.round(bb, 3)) for bb, vv in
               zip(np.asarray(b)[0], np.asarray(valid)[0]) if vv}

        passed = conf >= cfg.conf_threshold
        cand = np.concatenate([boxes[passed], conf[passed, None]], axis=-1)
        keep = reference_nms(cand, cfg.iou_threshold)
        want = {tuple(np.round(cand[i, :4], 3)) for i in keep}
        assert got == want, f"trial {trial}: {got} != {want}"


def test_e2e_detections_match_oracle(int8_graph, tflite_oracle,
                                     dataset_images):
    """Full pipeline vs (TFLite reference interpreter + numpy decode + numpy
    NMS): same count, boxes and confidences on every small_dataset image."""
    pipe = FacePipeline(Int8Engine(int8_graph))
    cfg = pipe.head_config
    inp = tflite_oracle.get_input_details()[0]
    out = tflite_oracle.get_output_details()[0]
    n_with_faces = 0
    for name, x in sorted(dataset_images.items()):
        tflite_oracle.set_tensor(inp["index"], x)
        tflite_oracle.invoke()
        y = tflite_oracle.get_tensor(out["index"])
        det = reference_decode(y[0])
        det[:, 0:4] = np.stack([
            det[:, 0] - det[:, 2] / 2, det[:, 1] - det[:, 3] / 2,
            det[:, 0] + det[:, 2] / 2, det[:, 1] + det[:, 3] / 2], -1)
        det[:, 0:4] = np.clip(det[:, 0:4], 0.0, 55.0)
        cand = det[det[:, 4] >= cfg.conf_threshold]
        keep = reference_nms(cand[:, :5], cfg.iou_threshold)
        want = cand[keep]

        got = pipe.detect_int8(x)
        assert int(got["count"][0]) == len(keep), f"{name}: count mismatch"
        if len(keep):
            n_with_faces += 1
            gb = got["boxes"][0][got["valid"][0]]
            gs = got["scores"][0][got["valid"][0]]
            # order-independent comparison (ties in conf may sort either way)
            order = np.lexsort(gb.T)
            worder = np.lexsort(want[:, :4].T)
            np.testing.assert_allclose(gb[order], want[worder][:, :4],
                                       atol=5e-3, err_msg=name)
            np.testing.assert_allclose(gs[order], want[worder][:, 4],
                                       atol=1e-5, err_msg=name)
    assert n_with_faces >= 20, "expected faces detected on most images"


def test_threshold_first_head_matches_full_decode():
    """detect_int8_head (int8 top-k, decode-K-survivors) is bit-identical
    to the full decode + select_detections path on random head tensors —
    the monotonicity argument (sigmoid of q ordering == conf ordering,
    same tie-break) holds end to end."""
    from yoloface_tpu.pipeline import head as head_lib
    rng = np.random.default_rng(11)
    scale, zp = 0.14218327403068542, -15
    cfg = head_lib.HeadConfig()
    y = rng.integers(-128, 128, (64, 7, 7, 18), dtype=np.int64
                     ).astype(np.int8)
    boxes, conf, _ = head_lib.decode(y, scale=scale, zero_point=zp, cfg=cfg)
    boxes = head_lib.clamp_boxes(boxes)
    b0, s0, v0 = head_lib.select_detections(boxes, conf, cfg)
    b1, s1, v1 = head_lib.detect_int8_head(y, scale=scale, zero_point=zp,
                                           cfg=cfg)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s0))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b0))


@pytest.mark.slow
def test_pallas_rgb565_path_matches_fast(int8_graph):
    """The zero-relayout Pallas serving path (in-kernel preprocess feeding
    the engine layout directly) produces detections IDENTICAL to the XLA
    fast path — same bits end to end, for both arena layouts."""
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 1 << 16, (4, 112, 112),
                          dtype=np.int64).astype(np.uint16)
    want = FacePipeline(Int8Engine(int8_graph, mode="fast")
                        ).detect_rgb565(frames)
    for mode in ("pallas_arena", "pallas_mxu"):
        got = FacePipeline(Int8Engine(int8_graph, mode=mode)
                           ).detect_rgb565(frames)
        np.testing.assert_array_equal(got["count"], want["count"], mode)
        np.testing.assert_array_equal(got["boxes"], want["boxes"], mode)
        np.testing.assert_array_equal(got["scores"], want["scores"], mode)


def test_e2e_from_rgb565_frames(int8_graph):
    """Camera-emulation path: encode dataset images to 112x112 RGB565 frames
    and run the fused preprocess+infer+decode pipeline."""
    import cv2
    import os
    pipe = FacePipeline(Int8Engine(int8_graph))
    d = "/root/reference/yoloface/small_dataset"
    names = sorted(os.listdir(d))[:8]
    rgbs = []
    for f in names:
        img = cv2.cvtColor(cv2.imread(os.path.join(d, f)), cv2.COLOR_BGR2RGB)
        rgbs.append(cv2.resize(img, (112, 112)))
    frames = preprocess.encode_rgb565(np.stack(rgbs))
    det = pipe.detect_rgb565(frames)
    assert det["boxes"].shape == (8, pipe.head_config.max_detections, 4)
    # RGB565 5/6/5 truncation + box downsample still detects most faces
    assert (det["count"] > 0).sum() >= 6


def test_pallas_topk_matches_lax_topk_path():
    """The Pallas masked-argmax selection (use_pallas_topk=True) and the
    lax.top_k ranking produce identical visible outputs, including on
    tie-heavy random int8 tensors and frames with zero detections."""
    import dataclasses
    from yoloface_tpu.pipeline import head as head_lib
    rng = np.random.default_rng(17)
    scale, zp = 0.14218327403068542, -15
    y = rng.integers(-128, 128, (48, 7, 7, 18), dtype=np.int64
                     ).astype(np.int8)
    y[:4] = -128                       # all-below-threshold frames
    y[5] = 127                         # saturation ties everywhere
    cfg_p = head_lib.HeadConfig(use_pallas_topk=True, use_fused_head=False)
    cfg_x = head_lib.HeadConfig(use_pallas_topk=False, use_fused_head=False)
    outs = [head_lib.detect_int8_head(y, scale=scale, zero_point=zp,
                                      cfg=c) for c in (cfg_p, cfg_x)]
    for a, b in zip(*outs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_head_kernel_matches_staged_path():
    """The one-kernel head (use_fused_head=True: top-K + decode + NMS in
    a single Pallas call) is bit-identical to the staged path, including
    zero-detection frames, saturation-tie frames, and NMS-heavy frames."""
    import dataclasses
    from yoloface_tpu.pipeline import head as head_lib
    rng = np.random.default_rng(23)
    scale, zp = 0.14218327403068542, -15
    y = rng.integers(-128, 128, (48, 7, 7, 18), dtype=np.int64
                     ).astype(np.int8)
    y[:4] = -128                       # all-below-threshold frames
    y[5] = 127                         # saturation ties everywhere
    y[6, :, :, 4::6] = 127             # every candidate passes -> NMS-heavy
    cfg_f = head_lib.HeadConfig(use_fused_head=True)
    cfg_s = dataclasses.replace(cfg_f, use_fused_head=False)
    outs = [head_lib.detect_int8_head(y, scale=scale, zero_point=zp,
                                      cfg=c) for c in (cfg_f, cfg_s)]
    for a, b in zip(*outs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and without NMS
    outs = [head_lib.detect_int8_head(
        y, scale=scale, zero_point=zp,
        cfg=dataclasses.replace(c, apply_nms=False))
        for c in (cfg_f, cfg_s)]
    for a, b in zip(*outs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

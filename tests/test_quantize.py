"""PTQ calibration flow tests: FP32-twin parity, qparams math, and the
train->quantize->deploy closure (calibrate the dequantized reference weights
and get detections matching the shipped int8 graph)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yoloface_tpu.graph.ir import QParams
from yoloface_tpu.models.import_weights import (dequantize_template_weights,
                                                variables_from_template)
from yoloface_tpu.models.yoloface import YoloFace
from yoloface_tpu.pipeline.e2e import FacePipeline
from yoloface_tpu.quantize.calibrate import (calibrate, calibrate_from_weights,
                                             choose_qparams, float_forward,
                                             quantize_weights_per_channel)
from yoloface_tpu.runtime.engine import Int8Engine


@pytest.fixture(scope="module")
def rep_images(dataset_images):
    """Representative dataset in the converter's float domain
    (tflite_quantize.py:29-58: resize 56x56, /255)."""
    xs = np.stack([x[0] for x in dataset_images.values()])
    return (xs.astype(np.float32) + 128.0) / 255.0


def test_choose_qparams_nudging():
    q = choose_qparams(0.0, 1.0)
    assert q.zero_point == -128 and abs(q.scale - 1 / 255) < 1e-9
    q = choose_qparams(-1.0, 1.0)
    assert q.zero_point == 0
    # range not containing zero gets extended to include it
    q = choose_qparams(0.5, 1.5)
    assert q.zero_point == -128
    # affine scheme: dequant(zp) == 0 by construction; zp stays in range and
    # the rounding of zp (the "nudge") shifts the range by < scale/2
    q = choose_qparams(-0.3, 0.7)
    assert -128 <= q.zero_point <= 127 and q.scale > 0
    rmin_back = (-128 - q.zero_point) * q.scale
    assert abs(rmin_back - (-0.3)) <= q.scale


def test_weight_quantization_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.2, (24, 3, 3, 12)).astype(np.float32)
    q, qp = quantize_weights_per_channel(w, 0)
    scales = np.asarray(qp.scales).reshape(-1, 1, 1, 1)
    err = np.abs(q.astype(np.float64) * scales - w)
    assert err.max() <= scales.max() * 0.5 + 1e-7
    assert q.dtype == np.int8 and np.all(q >= -127)


def test_float_twin_matches_int8_reference(int8_graph, dataset_images):
    """The dequantized-weights float network's decoded detections agree with
    the int8 engine on most images (int8 quantization noise is the only
    difference)."""
    weights = dequantize_template_weights(int8_graph)
    eng = Int8Engine(int8_graph)
    agree = 0
    for name, x in sorted(dataset_images.items())[:8]:
        xf = (x[0].astype(np.float32) + 128.0) / 255.0
        env = float_forward(int8_graph, weights, xf[None])
        y_float = np.asarray(env[int8_graph.outputs[0]])[0]
        y_int8 = np.asarray(eng(x))[0]
        oq = eng.output_qparams
        y_deq = (y_int8.astype(np.float32) - oq.zero_point) * oq.scale
        # confidence channel comparison at the argmax cell
        conf_f = y_float.reshape(-1, 6)[:, 4]
        conf_q = y_deq.reshape(-1, 6)[:, 4]
        if conf_f.argmax() == conf_q.argmax():
            agree += 1
        assert abs(conf_f.max() - conf_q.max()) < 1.0
    assert agree >= 6


def test_flax_twin_equals_float_forward(int8_graph, dataset_images):
    """variables_from_template + YoloFace.apply == float_forward of the
    template (same folded network, two execution paths)."""
    variables = variables_from_template(int8_graph)
    weights = dequantize_template_weights(int8_graph)
    model = YoloFace()
    x = dataset_images[sorted(dataset_images)[0]]
    xf = ((x.astype(np.float32) + 128.0) / 255.0)
    y_flax = np.asarray(model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, jnp.asarray(xf),
        train=False))
    env = float_forward(int8_graph, weights, xf)
    y_ref = np.asarray(env[int8_graph.outputs[0]])
    np.testing.assert_allclose(y_flax, y_ref, atol=2e-4, rtol=1e-4)


def test_calibration_closure(int8_graph, dataset_images, rep_images):
    """Re-quantize the dequantized reference weights with OUR calibration on
    the SAME 24-image rep dataset the reference used; detections from the
    freshly calibrated graph must match the shipped graph's detections."""
    weights = dequantize_template_weights(int8_graph)
    new_graph = calibrate_from_weights(weights, rep_images, int8_graph)

    pipe_ref = FacePipeline(Int8Engine(int8_graph))
    pipe_new = FacePipeline(Int8Engine(new_graph))
    match, total = 0, 0
    for name, x in sorted(dataset_images.items()):
        dr = pipe_ref.detect_int8(x)
        dn = pipe_new.detect_int8(x)
        total += 1
        if int(dr["count"][0]) == int(dn["count"][0]):
            br = np.sort(dr["boxes"][0][dr["valid"][0]], axis=0)
            bn = np.sort(dn["boxes"][0][dn["valid"][0]], axis=0)
            if br.size and np.abs(br - bn).max() < 4.0:
                match += 1
            elif not br.size:
                match += 1
    assert match >= total - 4, (match, total)


def test_calibration_scale_level_parity(int8_graph, rep_images):
    """Stronger than the detection-level closure: the per-tensor activation
    SCALES and ZERO-POINTS chosen by our min/max observer agree with the
    shipped graph's (MLIR-quantizer) values within tolerance on nearly all
    activation tensors — catches silent min/max observation drift."""
    weights = dequantize_template_weights(int8_graph)
    new_graph = calibrate_from_weights(weights, rep_images, int8_graph)

    checked, close = 0, 0
    worst = []
    for op in int8_graph.ops:
        for ti in op.outputs:
            q_ref = int8_graph.tensor(ti).qparams
            q_new = new_graph.tensor(ti).qparams
            if q_ref is None or len(q_ref.scales) != 1:
                continue
            checked += 1
            rel = abs(q_new.scale - q_ref.scale) / q_ref.scale
            zp_d = abs(q_new.zero_point - q_ref.zero_point)
            if rel < 0.15 and zp_d <= 20:
                close += 1
            else:
                worst.append((ti, rel, zp_d))
    assert checked > 30
    # the dequantized weights are not bit-identical to the original floats,
    # and the MLIR quantizer's observation differs in minor details, so a
    # couple of tensors may drift — but the bulk must agree tightly
    assert close >= checked - 3, (close, checked, sorted(
        worst, key=lambda t: -t[1])[:5])


def test_observer_options(int8_graph, rep_images):
    """percentile clips the range (scale <= minmax scale); ema produces a
    valid graph; both calibrate to working engines."""
    from yoloface_tpu.quantize.calibrate import observe_ranges
    weights = dequantize_template_weights(int8_graph)
    r_mm = observe_ranges(int8_graph, weights, rep_images[:8])
    r_pct = observe_ranges(int8_graph, weights, rep_images[:8],
                           observer="percentile", percentile=99.0)
    r_ema = observe_ranges(int8_graph, weights, rep_images[:8], batch=2,
                           observer="ema", ema_decay=0.5)
    tighter = sum((r_pct[k][1] - r_pct[k][0])
                  <= (r_mm[k][1] - r_mm[k][0]) + 1e-6 for k in r_mm)
    assert tighter == len(r_mm)          # percentile never widens
    strictly = sum((r_pct[k][1] - r_pct[k][0])
                   < (r_mm[k][1] - r_mm[k][0]) - 1e-6 for k in r_mm)
    assert strictly > len(r_mm) // 2     # and actually clips most tensors
    for k in r_mm:                       # ema stays inside the envelope
        assert r_ema[k][0] >= r_mm[k][0] - 1e-6
        assert r_ema[k][1] <= r_mm[k][1] + 1e-6
    g = calibrate_from_weights(weights, rep_images[:8], int8_graph,
                               observer="percentile", percentile=99.0)
    y = np.asarray(Int8Engine(g)(np.zeros((1, 56, 56, 3), np.int8)))
    assert y.shape == (1, 7, 7, 18)


def test_calibrate_flax_model_runs(int8_graph, rep_images):
    """End-to-end: Flax variables -> calibrate -> Int8Engine runs."""
    variables = variables_from_template(int8_graph)
    g = calibrate(variables, rep_images[:8], int8_graph)
    eng = Int8Engine(g)
    y = np.asarray(eng(np.zeros((1, 56, 56, 3), np.int8)))
    assert y.shape == (1, 7, 7, 18)

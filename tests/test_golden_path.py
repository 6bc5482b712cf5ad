"""The golden path, end to end: train a few steps -> PTQ calibrate ->
export .tflite -> the artifact runs in BOTH our engine and the stock TFLite
interpreter with identical outputs.  This is the whole reference toolchain
(train_tf.py -> h5 -> pb -> tflite_quantize.py -> deploy) in one test."""

import numpy as np
import pytest

import jax

from yoloface_tpu.io.tflite_export import export_tflite
from yoloface_tpu.io.tflite_import import load_tflite
from yoloface_tpu.quantize.calibrate import calibrate
from yoloface_tpu.runtime.engine import Int8Engine
from yoloface_tpu.train.data import FaceDataset
from yoloface_tpu.train.steps import TrainConfig, init_state, make_train_step

SMALL_DATASET = "/root/reference/yoloface/small_dataset"


def test_train_quantize_export_deploy(tmp_path, int8_graph):
    # 1. train a few steps on the calibration corpus (default labels)
    cfg = TrainConfig(epochs=1, steps_per_epoch=3, batch_size=8,
                      learning_rate=1e-3)
    state = init_state(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_train_step(cfg))
    ds = FaceDataset(SMALL_DATASET)
    for i, (imgs, tgts) in enumerate(ds.batches(8, epochs=1)):
        state, metrics = step(state, imgs, tgts)
        if i >= 2:
            break
    assert np.isfinite(float(metrics["loss"]))

    # 2. PTQ calibration on the representative dataset
    rep = np.stack([ds.load(i)[0] for i in range(16)])
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    graph = calibrate(variables, rep, int8_graph)

    # 3. export to .tflite
    blob = export_tflite(graph)
    path = tmp_path / "trained_int8.tflite"
    path.write_bytes(blob)

    # 4a. the artifact runs in our engine
    eng = Int8Engine(load_tflite(str(path)))
    x = np.clip(np.round(rep[:2] * 255) - 128, -128, 127).astype(np.int8)
    ours = np.asarray(eng(x))
    assert ours.shape == (2, 7, 7, 18)

    # 4b. ... and bit-identically in the stock TFLite interpreter
    tf = pytest.importorskip("tensorflow")
    interp = tf.lite.Interpreter(
        model_path=str(path),
        experimental_op_resolver_type=(
            tf.lite.experimental.OpResolverType.BUILTIN_REF))
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    for i in range(2):
        interp.set_tensor(inp["index"], x[i:i + 1])
        interp.invoke()
        want = interp.get_tensor(out["index"])
        np.testing.assert_array_equal(ours[i:i + 1], want)

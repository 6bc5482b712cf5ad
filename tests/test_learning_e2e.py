"""The framework LEARNS: train on a synthetic detection task, PTQ-quantize,
deploy on the int8 engine, and verify detection quality — the full
reference loop (train.py -> tflite_quantize.py -> MCU runtime) as one
assertion.  (~3 min on the 1-core CPU; the deepest integration test.)"""

from examples.train_synthetic import evaluate_deployed, train


def test_train_quantize_deploy_learns():
    state = train(steps=300, batch=32, seed=0)
    metrics = evaluate_deployed(state)
    assert metrics["detected"] >= 20, metrics
    assert metrics["hit_rate"] >= 0.7, metrics
    assert metrics["mean_iou"] >= 0.45, metrics

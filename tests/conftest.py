"""Test configuration: run the suite on a hermetic 8-device CPU mesh.

All int8 math in the framework is exact integer arithmetic, so CPU results
are bit-identical to TPU results; forcing CPU keeps the suite deterministic
and lets sharding tests exercise an 8-device `jax.sharding.Mesh` without
TPU hardware (the driver separately dry-runs the multi-chip path).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Silence TF (used only as the parity oracle) log spam.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

import jax  # noqa: E402

# The container's axon sitecustomize registers the TPU backend with
# jax.config directly, overriding JAX_PLATFORMS — force CPU explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"
INT8_TFLITE = REFERENCE + "/yoloface/tflite/yoloface_int8.tflite"
FP32_TFLITE = REFERENCE + "/yoloface/tflite/yoloface.tflite"


@pytest.fixture(autouse=True)
def _isolate_ab_env(monkeypatch):
    """A/B perf knobs must not leak into the suite: a leftover
    YOLOFACE_TPU_RSM=0 (etc.) from a hardware sweep shell would silently
    switch which epilogue paths the parity tests cover and fail the
    rsm-derivation asserts with no hint of the cause.  Only the
    plan-time-read knobs can be isolated here; the import-time arena
    constants (NT / budgets / strip target) are perf-only."""
    for var in ("YOLOFACE_TPU_RSM", "YOLOFACE_TPU_EPILOGUE_V2",
                "YOLOFACE_TPU_TILE_XLA"):
        monkeypatch.delenv(var, raising=False)
SMALL_DATASET = REFERENCE + "/yoloface/small_dataset"


@pytest.fixture(scope="session")
def int8_graph():
    from yoloface_tpu.io.tflite_import import load_tflite
    return load_tflite(INT8_TFLITE)


@pytest.fixture(scope="session")
def tflite_oracle():
    """TFLite interpreter on the builtin REFERENCE kernels with all
    intermediate tensors preserved — the bit-exactness oracle.

    Note on backend rounding: TFLite's reference kernels requantize with
    gemmlowp double rounding (SRDHM then RoundingDivideByPOT); the optimized
    x86 path (ruy) and XNNPACK use single rounding and may differ by ±1 on
    ~0.03% of elements.  The framework matches the reference kernels exactly
    and stays within ±1 of every other backend (see
    test_parity_int8.test_within_one_of_optimized_kernels)."""
    tf = pytest.importorskip("tensorflow")
    interp = tf.lite.Interpreter(
        model_path=INT8_TFLITE,
        experimental_op_resolver_type=(
            tf.lite.experimental.OpResolverType.BUILTIN_REF),
        experimental_preserve_all_tensors=True,
    )
    interp.allocate_tensors()
    return interp


@pytest.fixture(scope="session")
def dataset_images():
    """All small_dataset images preprocessed to int8 [1,56,56,3] exactly like
    the reference predictor (tflite_prediction.py:30-37): BGR->RGB, resize to
    56x56 (cv2 INTER_LINEAR), float32, minus 128, cast int8."""
    import cv2

    out = {}
    for fname in sorted(os.listdir(SMALL_DATASET)):
        img = cv2.imread(os.path.join(SMALL_DATASET, fname))
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (56, 56)).astype(np.float32)
        out[fname] = (img - 128.0).astype(np.int8)[None]
    return out

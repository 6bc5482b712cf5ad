"""Importer robustness: corrupted/truncated files raise clean ValueErrors."""

import numpy as np
import pytest

from yoloface_tpu.io.tflite_import import load_tflite

INT8 = "/root/reference/yoloface/tflite/yoloface_int8.tflite"


def test_rejects_tiny_and_wrong_magic():
    with pytest.raises(ValueError, match="too small"):
        load_tflite(b"abc")
    with pytest.raises(ValueError, match="identifier"):
        load_tflite(b"\0\0\0\0NOPE" + b"\0" * 100)


def test_fuzz_never_crashes():
    blob = open(INT8, "rb").read()
    rng = np.random.default_rng(7)
    for trial in range(60):
        kind = trial % 3
        if kind == 0:
            b = blob[: int(rng.integers(8, len(blob)))]
        elif kind == 1:
            arr = bytearray(blob)
            for _ in range(8):
                arr[int(rng.integers(8, len(arr)))] = int(
                    rng.integers(0, 256))
            b = bytes(arr)
        else:
            b = blob[:8] + bytes(
                rng.integers(0, 256, 500).astype(np.uint8))
        try:
            g = load_tflite(b)
            assert g.ops is not None  # parsed by luck — still structured
        except ValueError:
            pass  # the only acceptable failure mode

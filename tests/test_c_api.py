"""C-style API facade tests (ai_network_* signature parity)."""

import numpy as np

from yoloface_tpu.runtime.api import (AI_ERROR_INIT_FAILED,
                                      AI_ERROR_INVALID_INPUT, AI_ERROR_NONE,
                                      ai_network_create, ai_network_destroy,
                                      ai_network_get_error,
                                      ai_network_get_report, ai_network_init,
                                      ai_network_run)

TFLITE = "/root/reference/yoloface/tflite/yoloface_int8.tflite"


def test_lifecycle_and_run():
    net = ai_network_create()
    assert ai_network_get_error(net) == AI_ERROR_NONE
    assert ai_network_init(net, TFLITE)
    x = np.zeros((2, 56, 56, 3), np.int8)
    out = np.empty((2, 7, 7, 18), np.int8)
    n = ai_network_run(net, x, out)
    assert n == 2
    assert ai_network_get_error(net) == AI_ERROR_NONE
    report = ai_network_get_report(net)
    assert report["n_ops"] == 54
    assert report["input_shape"] == [1, 56, 56, 3]
    assert report["output_shape"] == [1, 7, 7, 18]
    assert report["n_batches_processed"] == 2
    ai_network_destroy(net)
    assert not ai_network_get_report(net)["initialized"]


def test_error_paths():
    net = ai_network_create()
    assert ai_network_run(net, np.zeros((1, 56, 56, 3), np.int8)) == 0
    assert ai_network_get_error(net) == AI_ERROR_INIT_FAILED
    assert not ai_network_init(net, "/nonexistent.tflite")
    assert ai_network_get_error(net) == AI_ERROR_INIT_FAILED
    assert ai_network_init(net, TFLITE)
    assert ai_network_run(net, np.zeros((56, 56, 3), np.int8)) == 0
    assert ai_network_get_error(net) == AI_ERROR_INVALID_INPUT

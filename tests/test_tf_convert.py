"""The reference's literal PTQ toolchain, end to end with the installed TF.

Chain under test (the exact reference flow, `tflite_quantize.py:29-99` fed
by `yolo_to_h5.py`/`h5_to_pb.py` outputs): Flax variables -> Keras .h5 ->
frozen pb -> TFLite MLIR quantizer (full int8, small_dataset rep set) ->
OUR importer -> Int8Engine.  The produced graph differs structurally from
the shipped one (the modern converter emits 51 ops, without the
QUANTIZE-before-CONCAT rescales), so this also proves the engine + arena
kernels generalize beyond the shipped graph's exact topology."""

import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")


@pytest.fixture(scope="module")
def converted(tmp_path_factory, int8_graph):
    from yoloface_tpu.models.import_weights import variables_from_template
    from yoloface_tpu.quantize.tf_convert import checkpoint_to_int8_tflite

    d = str(tmp_path_factory.mktemp("tfconv"))
    variables = variables_from_template(int8_graph)
    path = checkpoint_to_int8_tflite(variables, os.path.join(d, "q.tflite"),
                                     d)
    return path


def test_mlir_quantized_graph_imports(converted):
    from yoloface_tpu.io.tflite_import import load_tflite

    g = load_tflite(converted)
    names = {op.opname for op in g.ops}
    assert names == {"ADD", "CONCATENATION", "CONV_2D",
                     "DEPTHWISE_CONV_2D", "LEAKY_RELU", "MAX_POOL_2D",
                     "PAD"}
    assert g.tensor(g.inputs[0]).dtype == np.dtype(np.int8)


def test_engine_bit_exact_on_mlir_quantized_graph(converted):
    """Exact engine vs the stock interpreter's reference kernels on the
    freshly MLIR-quantized blob — the same oracle relation the shipped
    graph has, proven on a converter-produced topology."""
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.runtime.engine import Int8Engine

    g = load_tflite(converted)
    eng = Int8Engine(g, mode="exact")
    rng = np.random.default_rng(1)
    x = rng.integers(-128, 128, (2, 56, 56, 3), dtype=np.int64
                     ).astype(np.int8)
    y = np.asarray(eng(x))

    it = tf.lite.Interpreter(
        model_path=converted,
        experimental_op_resolver_type=(
            tf.lite.experimental.OpResolverType.BUILTIN_REF))
    it.allocate_tensors()
    for i in range(2):
        it.set_tensor(it.get_input_details()[0]["index"], x[i:i + 1])
        it.invoke()
        ref = it.get_tensor(it.get_output_details()[0]["index"])
        np.testing.assert_array_equal(y[i:i + 1], ref)


@pytest.mark.slow
def test_arena_modes_run_mlir_quantized_graph(converted):
    """The arena lowerings handle the converter-produced topology (concat
    without explicit QUANTIZE rescales) bit-identically to their twins."""
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.runtime.engine import Int8Engine

    g = load_tflite(converted)
    rng = np.random.default_rng(2)
    x = rng.integers(-128, 128, (2, 56, 56, 3), dtype=np.int64
                     ).astype(np.int8)
    want_fast = np.asarray(Int8Engine(g, mode="fast")(x))
    for mode in ("pallas_arena", "pallas_mxu"):
        got = np.asarray(Int8Engine(g, mode=mode)(x))
        np.testing.assert_array_equal(got, want_fast, err_msg=mode)


def test_detections_match_shipped_graph(converted, int8_graph,
                                        dataset_images):
    """Round-tripping the dequantized reference weights through the REAL
    converter reproduces the shipped graph's detections on most corpus
    images (the same closure property our native calibration flow holds)."""
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.pipeline.e2e import FacePipeline
    from yoloface_tpu.runtime.engine import Int8Engine

    pipe_ref = FacePipeline(Int8Engine(int8_graph))
    pipe_new = FacePipeline(Int8Engine(load_tflite(converted)))
    match = total = 0
    for name, x in sorted(dataset_images.items())[:12]:
        dr = pipe_ref.detect_int8(x)
        dn = pipe_new.detect_int8(x)
        total += 1
        match += int(int(dr["count"][0]) == int(dn["count"][0]))
    assert match >= total - 2, (match, total)

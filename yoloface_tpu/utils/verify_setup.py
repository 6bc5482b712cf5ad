"""Environment verifier — `python -m yoloface_tpu.utils.verify_setup`.

Capability port of `yoloface/tensorflow/verify_setup.py` (309 LoC): checks
dependencies, accelerator presence, framework imports, reference artifacts,
model initialization and checkpoint directories, with colored PASS/FAIL
output and a summary exit code.  (The reference script has two bugs — a
`{vcolors.ENDC}` literal typo at :245 and a check against a nonexistent
config field at :153 — reproduced here as working checks instead, per
SURVEY.md §2d.)
"""

from __future__ import annotations

import importlib
import os
import sys

GREEN, RED, YELLOW, END = "\033[92m", "\033[91m", "\033[93m", "\033[0m"

REFERENCE_TFLITE = "/root/reference/yoloface/tflite/yoloface_int8.tflite"
SMALL_DATASET = "/root/reference/yoloface/small_dataset"


def _report(name: str, ok: bool, detail: str = "") -> bool:
    mark = f"{GREEN}PASS{END}" if ok else f"{RED}FAIL{END}"
    print(f"  [{mark}] {name}" + (f" — {detail}" if detail else ""))
    return ok


def check_requirements() -> bool:
    print("Dependencies:")
    ok = True
    for mod, required in [("jax", True), ("flax", True), ("optax", True),
                          ("numpy", True), ("cv2", False),
                          ("orbax.checkpoint", False),
                          ("tensorflow", False), ("flatbuffers", False)]:
        try:
            m = importlib.import_module(mod)
            _report(mod, True, getattr(m, "__version__", ""))
        except ImportError:
            if required:
                ok = _report(mod, False, "required") and ok
            else:
                print(f"  [{YELLOW}SKIP{END}] {mod} (optional)")
    return ok


def check_accelerator() -> bool:
    print("Accelerator:")
    import jax
    devs = jax.devices()
    kinds = {d.platform for d in devs}
    return _report("jax devices", len(devs) > 0,
                   f"{len(devs)} x {sorted(kinds)}")


def check_framework_imports() -> bool:
    print("Framework imports:")
    ok = True
    for mod in ["yoloface_tpu.runtime.engine", "yoloface_tpu.pipeline.e2e",
                "yoloface_tpu.models.yoloface", "yoloface_tpu.train.trainer",
                "yoloface_tpu.quantize.calibrate",
                "yoloface_tpu.kernels.pallas_int8"]:
        try:
            importlib.import_module(mod)
            _report(mod, True)
        except Exception as e:
            ok = _report(mod, False, str(e)[:60]) and ok
    return ok


def check_artifacts() -> bool:
    print("Reference artifacts:")
    ok = _report("int8 tflite", os.path.exists(REFERENCE_TFLITE),
                 REFERENCE_TFLITE)
    n = (len([f for f in os.listdir(SMALL_DATASET) if f.endswith(".jpg")])
         if os.path.isdir(SMALL_DATASET) else 0)
    ok = _report("calibration dataset", n >= 20, f"{n} images") and ok
    return ok


def check_model_init() -> bool:
    print("Model initialization:")
    try:
        import jax
        import jax.numpy as jnp
        from yoloface_tpu.models.yoloface import YoloFace, count_params
        v = YoloFace().init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 56, 56, 3)), train=True)
        n = count_params(v["params"])
        return _report("YoloFace init", n == 10214,
                       f"{n} trainable params (expect 10214)")
    except Exception as e:
        return _report("YoloFace init", False, str(e)[:80])


def check_engine() -> bool:
    print("Inference engine:")
    try:
        import numpy as np
        from yoloface_tpu.io.tflite_import import load_tflite
        from yoloface_tpu.runtime.engine import Int8Engine
        eng = Int8Engine(load_tflite(REFERENCE_TFLITE))
        y = np.asarray(eng(np.zeros((1, 56, 56, 3), np.int8)))
        return _report("engine forward", y.shape == (1, 7, 7, 18),
                       f"output {y.shape}")
    except Exception as e:
        return _report("engine forward", False, str(e)[:80])


def check_checkpoint_dirs(path: str = "checkpoints") -> bool:
    print("Checkpoint directory:")
    try:
        os.makedirs(path, exist_ok=True)
        return _report("writable", os.access(path, os.W_OK), path)
    except OSError as e:
        return _report("writable", False, str(e))


def main() -> int:
    checks = [check_requirements, check_accelerator,
              check_framework_imports, check_artifacts, check_model_init,
              check_engine, check_checkpoint_dirs]
    results = [c() for c in checks]
    passed = sum(results)
    print(f"\n{passed}/{len(results)} check groups passed")
    return 0 if all(results) else 1


if __name__ == "__main__":
    sys.exit(main())

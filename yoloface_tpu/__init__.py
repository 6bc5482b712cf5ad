"""yoloface_tpu: TPU-native face-detection framework.

See README.md for the overview and PARITY.md for the component map to the
stm32H7-YOLO reference system.
"""

import os as _os

# Persistent XLA compilation cache: kernels and jitted programs (including
# the per-engine Pallas kernel set) compile once per machine, not once per
# process.  Opt out with YOLOFACE_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("YOLOFACE_TPU_NO_COMPILE_CACHE"):
    _cache = _os.environ.get(
        "YOLOFACE_TPU_COMPILE_CACHE",
        _os.path.expanduser("~/.cache/yoloface_tpu/jax"))
    try:
        _os.makedirs(_cache, exist_ok=True)
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is an optimization, never a hard dependency
        pass

__version__ = "0.1.0"

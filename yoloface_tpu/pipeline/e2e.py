"""Fused end-to-end face-detection pipeline: one jit from camera frames to boxes.

The TPU-native equivalent of the reference's per-frame superloop
(``stm32/User/main.c:42-54``: GetImage → resize → prepare → aiRun →
post_process), batched over N frames and compiled as a single XLA program so
preprocessing, the int8 network, dequantize/decode and NMS all fuse — no
host round-trips between stages.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from yoloface_tpu.pipeline import head as head_lib
from yoloface_tpu.pipeline import preprocess
from yoloface_tpu.pipeline.head import HeadConfig
from yoloface_tpu.runtime.engine import Int8Engine


class FacePipeline:
    """Batched camera-frames → detections pipeline around an Int8Engine."""

    def __init__(self, engine: Int8Engine,
                 head_config: Optional[HeadConfig] = None):
        self.engine = engine
        self.head_config = head_config or HeadConfig()
        oq = engine.output_qparams
        self._out_scale = float(oq.scale)
        self._out_zp = int(oq.zero_point)
        self._jit_cache: Dict[tuple, callable] = {}

    # ------------------------------------------------------------- tracing
    def _head(self, y_nhwc):
        # threshold-first head: int8 top-k, decode only the K survivors
        # (bit-identical to decode+select_detections; see head.py)
        b, s, v = head_lib.detect_int8_head(
            y_nhwc, scale=self._out_scale, zero_point=self._out_zp,
            cfg=self.head_config)
        return {"boxes": b, "scores": s, "valid": v,
                "count": jnp.sum(v, axis=-1).astype(jnp.int32)}

    def _detect_from_int8(self, x_int8):
        return self._head(self.engine._forward(x_int8))

    def _detect_from_rgb565(self, frames_u16):
        if self.engine.mode.startswith("pallas"):
            # zero-relayout serving path: the Pallas preprocess kernel
            # emits the engine's activation layout directly (XLA's strided
            # 2x2 preprocess measured 34 ms @32k vs ~2 ms in-kernel)
            from yoloface_tpu.kernels import pallas_int8 as pk
            f = jnp.asarray(frames_u16)
            n = f.shape[0]
            if jax.default_backend() != "cpu" and n % 128 != 0:
                pad = (-n) % 128
                f = jnp.concatenate(
                    [f, jnp.zeros((pad,) + f.shape[1:], f.dtype)], axis=0)
            x = pk.preprocess_rgb565(jnp.transpose(f, (2, 1, 0)))
            if self.engine._perm_in == (2, 1, 3, 0):     # WHCN
                x = jnp.transpose(x, (1, 2, 0, 3))
            return self._head(self.engine.forward_native(x)[:n])
        return self._detect_from_int8(
            preprocess.rgb565_to_int8_input(frames_u16))

    def _get(self, kind: str, batch: int):
        key = (kind, batch)
        if key not in self._jit_cache:
            fn = (self._detect_from_rgb565 if kind == "rgb565"
                  else self._detect_from_int8)
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    # -------------------------------------------------------------- public
    def detect_rgb565(self, frames) -> Dict[str, np.ndarray]:
        """uint16 RGB565 camera frames [N,112,112] -> detections dict.

        Fused analogue of resize_rgb565…+prepare_yolo_data+aiRun+post_process.
        Keys: boxes [N,K,4] xyxy in the 56x56 frame, scores [N,K],
        valid [N,K] bool, count [N].
        """
        frames = np.ascontiguousarray(frames)
        return jax.tree.map(np.asarray,
                            self._get("rgb565", frames.shape[0])(frames))

    def detect_int8(self, x_int8) -> Dict[str, np.ndarray]:
        """int8 network inputs [N,56,56,3] -> detections dict."""
        return jax.tree.map(np.asarray,
                            self._get("int8", x_int8.shape[0])(x_int8))

    # device-resident variants (no host transfer), for benchmarking/serving
    def detect_rgb565_device(self, frames):
        return self._get("rgb565", frames.shape[0])(frames)

    def detect_int8_device(self, x_int8):
        return self._get("int8", x_int8.shape[0])(x_int8)

    # ------------------------------------------------- multi-chip serving
    def make_sharded(self, mesh, kind: str = "rgb565"):
        """Data-parallel inference over a device mesh: frames batch-sharded
        along the 'data' axis, weights replicated — the scaling axis the
        workload actually has (SURVEY.md §2c: embarrassingly parallel per
        frame; collectives ride ICI only for the final gather).

        Returns a jitted fn(frames)->detections; feed a global batch
        divisible by mesh size."""
        from yoloface_tpu.parallel import mesh as mesh_lib

        fn = (self._detect_from_rgb565 if kind == "rgb565"
              else self._detect_from_int8)
        batch = mesh_lib.batch_sharding(mesh)
        return jax.jit(fn, in_shardings=(batch,), out_shardings=batch)


def load_pipeline(tflite_path: str,
                  head_config: Optional[HeadConfig] = None) -> FacePipeline:
    """Convenience: path to int8 .tflite -> ready FacePipeline."""
    from yoloface_tpu.io.tflite_import import load_tflite
    return FacePipeline(Int8Engine(load_tflite(tflite_path)), head_config)

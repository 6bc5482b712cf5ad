"""ctypes binding for the native frame pipeline (native/framepipe.cpp).

Builds ``libframepipe.so`` on demand (``make -C native``) and exposes the
C++ preprocess / ring-buffer / protocol functions; every entry point has a
pure-Python fallback so the framework works without a compiler.  Bit parity
between the two implementations is enforced by tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libframepipe.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it if needed; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # make is incremental: rebuilds only when framepipe.cpp is newer
        # than the .so (a stale library would miss newer entry points)
        if not _build() and not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.fp_rgb565_to_int8.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int8)]
        lib.fp_encode_rgb565.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint16)]
        lib.fp_ring_create.restype = ctypes.c_void_p
        lib.fp_ring_create.argtypes = [ctypes.c_int, ctypes.c_size_t]
        lib.fp_ring_push.restype = ctypes.c_int
        lib.fp_ring_push.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_uint8),
                                     ctypes.c_size_t]
        lib.fp_ring_pop.restype = ctypes.c_long
        lib.fp_ring_pop.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_uint8)]
        lib.fp_ring_size.restype = ctypes.c_int
        lib.fp_ring_size.argtypes = [ctypes.c_void_p]
        lib.fp_ring_close.argtypes = [ctypes.c_void_p]
        lib.fp_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.fp_encode_frame.restype = ctypes.c_int
        lib.fp_encode_frame.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int]
        lib.fp_sched_create.restype = ctypes.c_void_p
        lib.fp_sched_create.argtypes = [ctypes.c_int, ctypes.c_size_t,
                                        ctypes.c_int, ctypes.c_int]
        lib.fp_sched_push.restype = ctypes.c_int
        lib.fp_sched_push.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.POINTER(ctypes.c_uint8)]
        lib.fp_sched_next_batch.restype = ctypes.c_int
        lib.fp_sched_next_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64)]
        lib.fp_sched_pending.restype = ctypes.c_int
        lib.fp_sched_pending.argtypes = [ctypes.c_void_p]
        lib.fp_sched_close.argtypes = [ctypes.c_void_p]
        lib.fp_sched_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------- wrappers
def rgb565_to_int8(frames: np.ndarray) -> np.ndarray:
    """[N,112,112] uint16 -> [N,56,56,3] int8 via C++; Python fallback."""
    lib = get_lib()
    frames = np.ascontiguousarray(frames, np.uint16)
    n = frames.shape[0]
    if lib is None:
        from yoloface_tpu.pipeline.preprocess import rgb565_to_int8_input
        return np.asarray(rgb565_to_int8_input(frames))
    out = np.empty((n, 56, 56, 3), np.int8)
    lib.fp_rgb565_to_int8(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    return out


def encode_rgb565(rgb: np.ndarray) -> np.ndarray:
    """[N,H,W,3] uint8 -> [N,H,W] uint16 via C++; Python fallback."""
    lib = get_lib()
    rgb = np.ascontiguousarray(rgb, np.uint8)
    if rgb.ndim == 3:
        rgb = rgb[None]
    n, h, w, _ = rgb.shape
    if lib is None:
        from yoloface_tpu.pipeline.preprocess import encode_rgb565 as enc
        return enc(rgb)
    out = np.empty((n, h, w), np.uint16)
    lib.fp_encode_rgb565(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    return out


def encode_frame(frame_num: int, boxes: np.ndarray, scores: np.ndarray,
                 valid: np.ndarray, scale: int = 2) -> str:
    lib = get_lib()
    if lib is None:
        from yoloface_tpu.host.protocol import encode_frame as enc
        return enc(frame_num, boxes, scores, valid, scale)
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    valid = np.ascontiguousarray(valid, np.uint8)
    buf = ctypes.create_string_buffer(4096)
    n = lib.fp_encode_frame(
        frame_num, boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(scores), scale, buf, 4096)
    return buf.raw[:n].decode()


class NativeRing:
    """Blocking frame-batch ring buffer backed by the C++ implementation
    (the DCMI/DMA double-buffer analogue for host->device streaming)."""

    def __init__(self, capacity: int, slot_bytes: int):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._slot_bytes = slot_bytes
        self._ptr = lib.fp_ring_create(capacity, slot_bytes)

    def push(self, data: np.ndarray) -> bool:
        data = np.ascontiguousarray(data)
        rc = self._lib.fp_ring_push(
            self._ptr, data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            data.nbytes)
        return rc == 0

    def pop(self) -> Optional[bytes]:
        out = np.empty(self._slot_bytes, np.uint8)
        n = self._lib.fp_ring_pop(
            self._ptr, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if n == 0:
            return None
        return out[:n].tobytes()

    def __len__(self) -> int:
        return self._lib.fp_ring_size(self._ptr)

    def close(self):
        self._lib.fp_ring_close(self._ptr)

    def __del__(self):
        try:
            self._lib.fp_ring_destroy(self._ptr)
        except Exception:
            pass


class NativeScheduler:
    """Multi-stream frame scheduler backed by the C++ implementation
    (native/framepipe.cpp fp_sched_*): N camera streams push frames from
    producer threads; ``next_batch`` blocks until a full TPU batch is
    assembled (FIFO across streams) and returns the frames plus the
    (stream_id, seq) tags that demultiplex detections back per camera."""

    def __init__(self, n_streams: int, frame_shape, frame_dtype,
                 batch: int, capacity: Optional[int] = None):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.n_streams = n_streams
        self.batch = batch
        self.frame_shape = tuple(frame_shape)
        self.frame_dtype = np.dtype(frame_dtype)
        self._frame_bytes = int(np.prod(self.frame_shape)
                                * self.frame_dtype.itemsize)
        cap = capacity if capacity is not None else 4 * batch
        self._ptr = lib.fp_sched_create(n_streams, self._frame_bytes,
                                        batch, cap)
        if not self._ptr:
            raise ValueError("bad scheduler parameters")

    def push(self, stream_id: int, frame: np.ndarray) -> bool:
        frame = np.ascontiguousarray(frame, self.frame_dtype)
        assert frame.nbytes == self._frame_bytes, frame.shape
        rc = self._lib.fp_sched_push(
            self._ptr, stream_id,
            frame.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc == -2:
            raise ValueError(f"bad stream id {stream_id}")
        return rc == 0

    def next_batch(self):
        """(frames [take,*frame_shape], stream_ids [take], seqs [take]) or
        None when closed and drained."""
        frames = np.empty((self.batch,) + self.frame_shape,
                          self.frame_dtype)
        sids = np.empty(self.batch, np.int32)
        seqs = np.empty(self.batch, np.int64)
        take = self._lib.fp_sched_next_batch(
            self._ptr,
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            sids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            seqs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if take == 0:
            return None
        return frames[:take], sids[:take], seqs[:take]

    def pending(self) -> int:
        return self._lib.fp_sched_pending(self._ptr)

    def close(self):
        self._lib.fp_sched_close(self._ptr)

    def __del__(self):
        try:
            self._lib.fp_sched_destroy(self._ptr)
        except Exception:
            pass

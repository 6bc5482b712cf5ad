"""Camera-emulation streamer: continuous batched RGB565 frames -> pipeline.

The host-side analogue of the firmware's capture loop: where the MCU
double-buffers DCMI lines via DMA (`dcmi.c:170-236`, `OV_Frame.c:88-107`),
we double-buffer whole batches with a background producer thread feeding a
bounded queue while the TPU runs the previous batch — dispatch and data
preparation overlap, no device idle between batches.

Frame sources: an image directory (each image resized to 112x112 RGB565,
cycled), or a synthetic moving-pattern generator (the ``Picture.c`` baked
test-image analogue).  Output: detection dicts and/or firmware-protocol text
(`yoloface_tpu.host.protocol`).
"""

from __future__ import annotations

import itertools
import os
import queue
import threading
import time
from typing import Callable, Iterator, Optional

import numpy as np

from yoloface_tpu.host import protocol
from yoloface_tpu.pipeline import preprocess


def synthetic_frames(batch: int, seed: int = 0) -> Iterator[np.ndarray]:
    """Endless moving-gradient RGB565 frames [batch,112,112] (camera-free
    fixture, like the baked 56x56 test image in Picture.c:1)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:112, 0:112]
    t = 0
    while True:
        phase = (t * 7) % 112
        r = ((xx + phase) % 112 * 2).astype(np.uint8)
        g = ((yy + phase) % 112 * 2).astype(np.uint8)
        b = rng.integers(0, 255, (112, 112), dtype=np.int64).astype(np.uint8)
        rgb = np.stack([r, g, b], axis=-1)
        yield np.stack([preprocess.encode_rgb565(rgb)] * batch)
        t += 1


def directory_frames(img_dir: str, batch: int) -> Iterator[np.ndarray]:
    """Cycle a directory of images as 112x112 RGB565 camera frames."""
    import cv2
    files = sorted(f for f in os.listdir(img_dir)
                   if f.lower().endswith((".jpg", ".jpeg", ".png")))
    if not files:
        raise ValueError(f"no images in {img_dir}")
    frames = []
    for f in files:
        img = cv2.imread(os.path.join(img_dir, f))
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        frames.append(preprocess.encode_rgb565(cv2.resize(img, (112, 112))))
    for i in itertools.count():
        sel = [frames[(i * batch + j) % len(frames)] for j in range(batch)]
        yield np.stack(sel)


class CameraStreamer:
    """Double-buffered producer/consumer around a FacePipeline.

    With ``use_native=True`` (default: auto-detect) frame batch BYTES stage
    through the C++ blocking ring buffer (`native/framepipe.cpp`
    ``fp_ring_*``) — the host-side analogue of the MCU's DMA ping-pong
    buffers — while a Python queue carries only ordering tokens.  Falls back
    to a pure-Python queue when the native library is unavailable."""

    def __init__(self, pipeline, source: Iterator[np.ndarray],
                 queue_depth: int = 2, use_native: Optional[bool] = None):
        self.pipeline = pipeline
        self.source = source
        self._stop = threading.Event()
        self._producer: Optional[threading.Thread] = None
        self._depth = queue_depth
        self._q: "queue.Queue" = queue.Queue(queue_depth)
        if use_native is None:
            from yoloface_tpu.host import native
            use_native = native.available()
        self._use_native = use_native
        self._ring = None
        self._frame_shape = None
        self._frame_dtype = None

    def _put(self, token) -> bool:
        """Bounded put that re-checks _stop: if run() finishes while the
        queue is full, the producer must not block forever (thread leak)."""
        while not self._stop.is_set():
            try:
                self._q.put(token, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _produce(self):
        from yoloface_tpu.host import native
        for frames in self.source:
            if self._stop.is_set():
                break
            if self._use_native and self._ring is None:
                try:
                    self._ring = native.NativeRing(self._depth,
                                                   frames.nbytes)
                    self._frame_shape = frames.shape
                    self._frame_dtype = frames.dtype
                except RuntimeError:
                    self._use_native = False
            if (self._ring is not None
                    and frames.shape == self._frame_shape):
                self._ring.push(np.ascontiguousarray(frames))
                if not self._put(("ring",)):
                    return
            else:
                if not self._put(("arr", frames)):
                    return
        self._put(None)

    def _next_batch(self):
        token = self._q.get()
        if token is None:
            return None
        if token[0] == "ring":
            raw = self._ring.pop()
            return np.frombuffer(raw, self._frame_dtype).reshape(
                self._frame_shape)
        return token[1]

    def run(self, n_batches: int,
            on_frame: Optional[Callable[[str], None]] = None,
            emit_protocol: bool = True):
        """Run n_batches through the pipeline.  Returns stats dict; calls
        ``on_frame(text)`` per frame with protocol text if requested.

        Execution is pipelined one batch deep: batch k+1 is dispatched to
        the device before batch k's results are fetched to the host — the
        compute/IO overlap the MCU gets from its DMA double buffers."""
        import jax

        self._producer = threading.Thread(target=self._produce, daemon=True)
        self._producer.start()
        frame_no = 0
        total_faces = 0
        t0 = time.perf_counter()
        frames_done = 0
        pending = None   # (device detections, batch_size) in flight

        def drain(det_dev, size):
            nonlocal frame_no, total_faces, frames_done
            det = jax.tree.map(lambda v: np.asarray(v), det_dev)
            for i in range(size):
                frame_no += 1
                total_faces += int(det["count"][i])
                if emit_protocol and on_frame is not None:
                    on_frame(protocol.encode_frame(
                        frame_no, det["boxes"][i], det["scores"][i],
                        det["valid"][i]))
            frames_done += size

        for _ in range(n_batches):
            frames = self._next_batch()
            if frames is None:
                break
            det_dev = self.pipeline.detect_rgb565_device(
                np.ascontiguousarray(frames))
            if pending is not None:
                drain(*pending)
            pending = (det_dev, frames.shape[0])
        if pending is not None:
            drain(*pending)
        dt = time.perf_counter() - t0
        self._stop.set()
        if self._ring is not None:
            self._ring.close()
        return {"frames": frames_done, "faces": total_faces,
                "seconds": dt, "native_ring": self._ring is not None,
                "fps": frames_done / dt if dt > 0 else float("inf")}

    def stop(self):
        self._stop.set()

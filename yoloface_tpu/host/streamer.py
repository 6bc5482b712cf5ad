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


class PyScheduler:
    """Pure-Python fallback with NativeScheduler's exact semantics (used
    when the C++ library is unavailable; parity enforced by test_native)."""

    def __init__(self, n_streams: int, frame_shape, frame_dtype,
                 batch: int, capacity: Optional[int] = None):
        self.n_streams = n_streams
        self.batch = batch
        self.frame_shape = tuple(frame_shape)
        self.frame_dtype = np.dtype(frame_dtype)
        self._cap = capacity if capacity is not None else 4 * batch
        self._q: list = []
        self._seq = [0] * n_streams
        self._closed = False
        self._mu = threading.Condition()

    def push(self, stream_id: int, frame: np.ndarray) -> bool:
        if not 0 <= stream_id < self.n_streams:
            raise ValueError(f"bad stream id {stream_id}")
        with self._mu:
            while len(self._q) >= self._cap and not self._closed:
                self._mu.wait(0.1)
            if self._closed:
                return False
            self._q.append((stream_id, self._seq[stream_id],
                            np.array(frame, self.frame_dtype, copy=True)))
            self._seq[stream_id] += 1
            self._mu.notify_all()
            return True

    def next_batch(self):
        with self._mu:
            while len(self._q) < self.batch and not self._closed:
                self._mu.wait(0.1)
            take = min(len(self._q), self.batch)
            if take == 0:
                return None
            items, self._q = self._q[:take], self._q[take:]
            self._mu.notify_all()
        frames = np.stack([f for _, _, f in items])
        return (frames, np.array([s for s, _, _ in items], np.int32),
                np.array([q for _, q, _ in items], np.int64))

    def pending(self) -> int:
        with self._mu:
            return len(self._q)

    def close(self):
        with self._mu:
            self._closed = True
            self._mu.notify_all()


def make_scheduler(n_streams: int, frame_shape, frame_dtype, batch: int,
                   capacity: Optional[int] = None,
                   use_native: Optional[bool] = None):
    """NativeScheduler when the C++ library is available, else PyScheduler."""
    from yoloface_tpu.host import native
    if use_native is None:
        use_native = native.available()
    if use_native:
        return native.NativeScheduler(n_streams, frame_shape, frame_dtype,
                                      batch, capacity)
    return PyScheduler(n_streams, frame_shape, frame_dtype, batch, capacity)


class MultiCameraStreamer:
    """Many camera streams -> one TPU batch stream -> per-camera results.

    The serving generalization of :class:`CameraStreamer`: per-stream
    producer threads feed the (C++) multi-stream scheduler, which
    assembles fixed-size batches in arrival order with (stream, seq) tags;
    the consumer loop runs the fused pipeline once per batch and
    demultiplexes detections back to their cameras — many OV2640s, one
    accelerator, where the reference had one of each.

    ``sources``: one iterator of single [112,112] uint16 frames per camera.
    """

    def __init__(self, pipeline, sources, batch: int,
                 use_native: Optional[bool] = None):
        self.pipeline = pipeline
        self.sources = list(sources)
        self.batch = batch
        self.sched = make_scheduler(len(self.sources), (112, 112),
                                    np.uint16, batch,
                                    use_native=use_native)
        self._threads: list = []
        self._stop = threading.Event()

    def _produce(self, sid: int, source):
        for frame in source:
            if self._stop.is_set():
                return
            if not self.sched.push(sid, frame):
                return

    def run(self, n_batches: int,
            on_frame: Optional[Callable[[int, int, str], None]] = None):
        """Consume n_batches; ``on_frame(stream_id, seq, text)`` receives
        the protocol line per frame.  Returns per-stream stats."""
        import jax

        for sid, src in enumerate(self.sources):
            t = threading.Thread(target=self._produce, args=(sid, src),
                                 daemon=True)
            t.start()
            self._threads.append(t)

        frames_per_stream = [0] * len(self.sources)
        faces_per_stream = [0] * len(self.sources)
        t0 = time.perf_counter()
        done = 0
        pending = None      # (device detections, stream ids, seqs)

        def drain(det_dev, sids, seqs):
            det = jax.tree.map(np.asarray, det_dev)
            for i, (sid, seq) in enumerate(zip(sids, seqs)):
                frames_per_stream[sid] += 1
                faces_per_stream[sid] += int(det["count"][i])
                if on_frame is not None:
                    on_frame(int(sid), int(seq), protocol.encode_frame(
                        int(seq) + 1, det["boxes"][i], det["scores"][i],
                        det["valid"][i]))

        for _ in range(n_batches):
            nb = self.sched.next_batch()
            if nb is None:
                break
            frames, sids, seqs = nb
            det_dev = self.pipeline.detect_rgb565_device(frames)
            if pending is not None:
                drain(*pending)
            pending = (det_dev, sids, seqs)
            done += 1
        if pending is not None:
            drain(*pending)
        self._stop.set()
        self.sched.close()
        dt = time.perf_counter() - t0
        total = sum(frames_per_stream)
        return {"batches": done, "frames": total,
                "frames_per_stream": frames_per_stream,
                "faces_per_stream": faces_per_stream,
                "seconds": dt,
                "fps": total / dt if dt > 0 else float("inf"),
                "native": type(self.sched).__name__ == "NativeScheduler"}

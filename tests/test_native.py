"""Native C++ frame pipeline: build, bit parity with the Python/XLA
implementations, ring-buffer semantics, protocol byte parity."""

import threading

import numpy as np
import pytest

from yoloface_tpu.host import native, protocol
from yoloface_tpu.pipeline import preprocess


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")


def test_preprocess_bit_parity():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 1 << 16, (4, 112, 112),
                          dtype=np.int64).astype(np.uint16)
    got = native.rgb565_to_int8(frames)
    want = np.asarray(preprocess.rgb565_to_int8_input(frames))
    np.testing.assert_array_equal(got, want)


def test_encode_rgb565_parity():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (2, 112, 112, 3),
                       dtype=np.int64).astype(np.uint8)
    got = native.encode_rgb565(rgb)
    want = preprocess.encode_rgb565(rgb)
    np.testing.assert_array_equal(got, want)


def test_protocol_byte_parity():
    boxes = np.array([[10.0, 12.0, 30.0, 40.0], [1.0, 2.0, 3.0, 4.0]])
    scores = np.array([0.93, 0.71], np.float32)
    valid = np.array([True, True])
    got = native.encode_frame(5, boxes, scores, valid)
    want = protocol.encode_frame(5, boxes, scores, valid)
    assert got == want


def test_ring_buffer_fifo_and_blocking():
    ring = native.NativeRing(capacity=2, slot_bytes=16)
    ring.push(np.arange(16, dtype=np.uint8))
    ring.push(np.arange(16, 32, dtype=np.uint8))
    assert len(ring) == 2
    assert ring.pop() == bytes(range(16))
    assert ring.pop() == bytes(range(16, 32))

    # producer thread unblocks a waiting consumer
    got = []

    def consumer():
        got.append(ring.pop())

    t = threading.Thread(target=consumer)
    t.start()
    ring.push(np.full(16, 7, np.uint8))
    t.join(timeout=5)
    assert not t.is_alive()
    assert got[0] == bytes([7] * 16)

    # close drains to None
    ring.close()
    assert ring.pop() is None


def test_ring_buffer_backpressure():
    """A full ring blocks the producer until the consumer pops (the
    double-buffer backpressure the DMA ping-pong provides on the MCU)."""
    ring = native.NativeRing(capacity=1, slot_bytes=8)
    ring.push(np.zeros(8, np.uint8))
    done = threading.Event()

    def producer():
        ring.push(np.ones(8, np.uint8))
        done.set()

    t = threading.Thread(target=producer)
    t.start()
    assert not done.wait(timeout=0.2)   # blocked on full ring
    assert ring.pop() == bytes(8)
    assert done.wait(timeout=5)
    t.join()


@pytest.mark.parametrize("use_native", [True, False])
def test_multistream_scheduler_integrity(use_native):
    """N producer threads push tagged frames; batches preserve frame bytes,
    stream ids, per-stream sequence order, and arrival completeness —
    native C++ and Python fallback have identical semantics."""
    from yoloface_tpu.host.streamer import make_scheduler

    if use_native and not native.available():
        pytest.skip("native library unavailable")
    n_streams, per_stream, batch = 3, 20, 6
    sched = make_scheduler(n_streams, (4, 4), np.uint16, batch,
                           use_native=use_native)

    def produce(sid):
        for seq in range(per_stream):
            frame = np.full((4, 4), sid * 1000 + seq, np.uint16)
            assert sched.push(sid, frame)

    threads = [threading.Thread(target=produce, args=(s,))
               for s in range(n_streams)]
    for t in threads:
        t.start()

    got = {s: [] for s in range(n_streams)}
    total = 0
    while total < n_streams * per_stream:
        frames, sids, seqs = sched.next_batch()
        assert len(frames) == batch
        for f, sid, seq in zip(frames, sids, seqs):
            assert int(f[0, 0]) == sid * 1000 + seq   # bytes match the tag
            assert (f == f[0, 0]).all()
            got[int(sid)].append(int(seq))
            total += 1
    for t in threads:
        t.join()
    for s in range(n_streams):                        # per-stream FIFO
        assert got[s] == list(range(per_stream))
    sched.close()
    assert sched.next_batch() is None                 # closed + drained


def test_multicamera_streamer_end_to_end(int8_graph):
    """3 camera sources through the scheduler into one fused pipeline;
    detections demultiplex back per stream with per-stream frame counts."""
    from yoloface_tpu.pipeline.e2e import FacePipeline
    from yoloface_tpu.runtime.engine import Int8Engine
    from yoloface_tpu.host.streamer import MultiCameraStreamer

    def camera(seed):
        rng = np.random.default_rng(seed)
        for _ in range(6):      # finite: every stream contributes exactly 6
            yield rng.integers(0, 1 << 16, (112, 112),
                               dtype=np.int64).astype(np.uint16)

    pipe = FacePipeline(Int8Engine(int8_graph, mode="fast"))
    ms = MultiCameraStreamer(pipe, [camera(s) for s in range(3)], batch=6)
    lines = []
    stats = ms.run(3, on_frame=lambda sid, seq, text: lines.append(
        (sid, seq, text)))
    assert stats["batches"] == 3
    assert stats["frames"] == 18
    assert stats["frames_per_stream"] == [6, 6, 6]
    # protocol lines parse and are per-stream sequential
    parser = protocol.StreamParser()
    for sid, seq, text in lines:
        assert list(parser.feed(text))
    for s in range(3):
        seqs = [seq for sid, seq, _ in lines if sid == s]
        assert seqs == sorted(seqs)

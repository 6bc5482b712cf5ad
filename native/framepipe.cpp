// framepipe: native host-side frame pipeline for yoloface_tpu.
//
// The C++ counterpart of the reference firmware's data path, re-targeted at
// feeding a TPU instead of a Cortex-M7:
//   * fp_rgb565_to_int8   — bit-exact port of
//     resize_rgb565_uint8_112_to_56_direct + prepare_yolo_data
//     (stm32/X-CUBE-AI/App/yoloface.c:26-93): 2x2 box average of RGB565
//     fields, 5/6/5 -> 8-bit expand, -128 to int8 NHWC.
//   * fp_encode_rgb565    — RGB888 -> RGB565 (the OV2640 sensor format,
//     camera-emulation direction).
//   * fp_ring_*           — a blocking MPMC ring buffer of frame batches:
//     the host analogue of the DCMI+DMA double-buffered line capture
//     (Drivers/BSP/OV2640/dcmi.c:170-236) — producers stage batches while
//     the TPU consumes the previous one.
//   * fp_encode_frame     — the UART text protocol encoder
//     (main.c:44,51, yoloface.c:148), byte-compatible with the Python
//     implementation in yoloface_tpu/host/protocol.py.
//
// Build: make -C native   (g++ -O3 -shared; no external dependencies).
// Python binding: ctypes, see yoloface_tpu/host/native.py.

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- preprocess
// frames: n * 112*112 uint16 (RGB565), out: n * 56*56*3 int8 (NHWC)
void fp_rgb565_to_int8(const uint16_t* frames, int n, int8_t* out) {
    constexpr int SRC = 112, DST = 56;
    for (int f = 0; f < n; ++f) {
        const uint16_t* src = frames + (size_t)f * SRC * SRC;
        int8_t* dst = out + (size_t)f * DST * DST * 3;
        for (int y = 0; y < DST; ++y) {
            for (int x = 0; x < DST; ++x) {
                unsigned sr = 0, sg = 0, sb = 0;
                for (int dy = 0; dy < 2; ++dy) {
                    const uint16_t* row = src + (y * 2 + dy) * SRC + x * 2;
                    for (int dx = 0; dx < 2; ++dx) {
                        uint16_t p = row[dx];
                        sr += (p >> 11) & 0x1F;
                        sg += (p >> 5) & 0x3F;
                        sb += p & 0x1F;
                    }
                }
                // field averages then the firmware's repack/unpack expand:
                // r8 = avg_r << 3, g8 = avg_g << 2, b8 = avg_b << 3
                uint8_t r = (uint8_t)((sr >> 2) << 3);
                uint8_t g = (uint8_t)((sg >> 2) << 2);
                uint8_t b = (uint8_t)((sb >> 2) << 3);
                int8_t* px = dst + (y * DST + x) * 3;
                px[0] = (int8_t)((int)r - 128);
                px[1] = (int8_t)((int)g - 128);
                px[2] = (int8_t)((int)b - 128);
            }
        }
    }
}

// rgb: n*h*w*3 uint8 -> out: n*h*w uint16 RGB565 (sensor truncation)
void fp_encode_rgb565(const uint8_t* rgb, int n, int h, int w,
                      uint16_t* out) {
    size_t total = (size_t)n * h * w;
    for (size_t i = 0; i < total; ++i) {
        const uint8_t* px = rgb + i * 3;
        out[i] = (uint16_t)(((px[0] >> 3) << 11) | ((px[1] >> 2) << 5)
                            | (px[2] >> 3));
    }
}

// ---------------------------------------------------------------- ring buffer
struct FpRing {
    std::vector<uint8_t> storage;
    std::vector<size_t> sizes;
    size_t slot_bytes;
    int capacity;
    int head = 0;      // next pop
    int count = 0;
    bool closed = false;
    std::mutex mu;
    std::condition_variable not_full, not_empty;
};

void* fp_ring_create(int capacity, size_t slot_bytes) {
    auto* r = new FpRing();
    r->capacity = capacity;
    r->slot_bytes = slot_bytes;
    r->storage.resize((size_t)capacity * slot_bytes);
    r->sizes.resize(capacity, 0);
    return r;
}

// returns 0 on success, -1 if ring closed
int fp_ring_push(void* ring, const uint8_t* data, size_t size) {
    auto* r = (FpRing*)ring;
    std::unique_lock<std::mutex> lk(r->mu);
    r->not_full.wait(lk, [&] { return r->count < r->capacity || r->closed; });
    if (r->closed) return -1;
    int slot = (r->head + r->count) % r->capacity;
    size_t sz = size < r->slot_bytes ? size : r->slot_bytes;
    std::memcpy(r->storage.data() + (size_t)slot * r->slot_bytes, data, sz);
    r->sizes[slot] = sz;
    r->count++;
    r->not_empty.notify_one();
    return 0;
}

// returns bytes popped, 0 if closed+empty
long fp_ring_pop(void* ring, uint8_t* out) {
    auto* r = (FpRing*)ring;
    std::unique_lock<std::mutex> lk(r->mu);
    r->not_empty.wait(lk, [&] { return r->count > 0 || r->closed; });
    if (r->count == 0) return 0;
    size_t sz = r->sizes[r->head];
    std::memcpy(out, r->storage.data() + (size_t)r->head * r->slot_bytes, sz);
    r->head = (r->head + 1) % r->capacity;
    r->count--;
    r->not_full.notify_one();
    return (long)sz;
}

int fp_ring_size(void* ring) {
    auto* r = (FpRing*)ring;
    std::lock_guard<std::mutex> lk(r->mu);
    return r->count;
}

void fp_ring_close(void* ring) {
    auto* r = (FpRing*)ring;
    {
        std::lock_guard<std::mutex> lk(r->mu);
        r->closed = true;
    }
    r->not_full.notify_all();
    r->not_empty.notify_all();
}

void fp_ring_destroy(void* ring) { delete (FpRing*)ring; }

// ------------------------------------------------------ multi-stream scheduler
// N camera streams -> fixed-size TPU batches.  Producer threads push frames
// per stream; the scheduler assembles batches of `batch` frames in arrival
// order (one bounded FIFO across streams — fair under contention because
// pushers block on the same queue), tagging every slot with (stream_id,
// per-stream sequence number) so detections demultiplex back to their
// cameras.  The many-sensors-one-accelerator generalization of the
// reference's single-camera DCMI double buffer.

struct FpSched {
    size_t frame_bytes;
    int n_streams;
    int batch;
    int capacity;                    // queued frames bound
    std::vector<uint8_t> storage;    // capacity * frame_bytes
    std::vector<int32_t> stream_of;  // per slot
    std::vector<int64_t> seq_of;     // per slot
    std::vector<int64_t> next_seq;   // per stream
    int head = 0, count = 0;
    bool closed = false;
    std::mutex mu;
    std::condition_variable not_full, not_empty;
};

void* fp_sched_create(int n_streams, size_t frame_bytes, int batch,
                      int capacity) {
    if (n_streams <= 0 || batch <= 0 || capacity < batch) return nullptr;
    auto* s = new FpSched();
    s->n_streams = n_streams;
    s->frame_bytes = frame_bytes;
    s->batch = batch;
    s->capacity = capacity;
    s->storage.resize((size_t)capacity * frame_bytes);
    s->stream_of.resize(capacity);
    s->seq_of.resize(capacity);
    s->next_seq.assign(n_streams, 0);
    return s;
}

// 0 on success, -1 if closed, -2 bad stream id
int fp_sched_push(void* sched, int stream_id, const uint8_t* frame) {
    auto* s = (FpSched*)sched;
    if (stream_id < 0 || stream_id >= s->n_streams) return -2;
    std::unique_lock<std::mutex> lk(s->mu);
    s->not_full.wait(lk, [&] { return s->count < s->capacity || s->closed; });
    if (s->closed) return -1;
    int slot = (s->head + s->count) % s->capacity;
    std::memcpy(s->storage.data() + (size_t)slot * s->frame_bytes, frame,
                s->frame_bytes);
    s->stream_of[slot] = stream_id;
    s->seq_of[slot] = s->next_seq[stream_id]++;
    s->count++;
    if (s->count >= s->batch) s->not_empty.notify_one();
    return 0;
}

// Blocks until `batch` frames are queued (or the scheduler is closed, in
// which case a final partial batch drains).  Returns the number of frames
// written to out_frames/out_streams/out_seqs; 0 = closed and empty.
int fp_sched_next_batch(void* sched, uint8_t* out_frames,
                        int32_t* out_streams, int64_t* out_seqs) {
    auto* s = (FpSched*)sched;
    std::unique_lock<std::mutex> lk(s->mu);
    s->not_empty.wait(lk, [&] { return s->count >= s->batch || s->closed; });
    int take = s->count < s->batch ? s->count : s->batch;
    for (int i = 0; i < take; ++i) {
        int slot = (s->head + i) % s->capacity;
        std::memcpy(out_frames + (size_t)i * s->frame_bytes,
                    s->storage.data() + (size_t)slot * s->frame_bytes,
                    s->frame_bytes);
        out_streams[i] = s->stream_of[slot];
        out_seqs[i] = s->seq_of[slot];
    }
    s->head = (s->head + take) % s->capacity;
    s->count -= take;
    s->not_full.notify_all();
    return take;
}

int fp_sched_pending(void* sched) {
    auto* s = (FpSched*)sched;
    std::lock_guard<std::mutex> lk(s->mu);
    return s->count;
}

void fp_sched_close(void* sched) {
    auto* s = (FpSched*)sched;
    {
        std::lock_guard<std::mutex> lk(s->mu);
        s->closed = true;
    }
    s->not_full.notify_all();
    s->not_empty.notify_all();
}

void fp_sched_destroy(void* sched) { delete (FpSched*)sched; }

// ---------------------------------------------------------------- protocol
// boxes: k*4 floats (xyxy, 56-space), scores: k, valid: k (0/1).
// Writes the firmware text protocol into out (cap bytes); returns length.
int fp_encode_frame(int frame_num, const float* boxes, const float* scores,
                    const uint8_t* valid, int k, int scale, char* out,
                    int cap) {
    int off = 0;
    off += snprintf(out + off, cap - off,
                    "=== Frame %d ===\r\n"
                    "----------------------------------------\r\n",
                    frame_num);
    int n = 0;
    for (int i = 0; i < k && off < cap; ++i) {
        if (!valid[i]) continue;
        ++n;
        off += snprintf(out + off, cap - off,
                        "[Face %d] BBox: [%d, %d, %d, %d], Conf: %.2f\r\n",
                        n, (int)boxes[i * 4 + 0] * scale,
                        (int)boxes[i * 4 + 1] * scale,
                        (int)boxes[i * 4 + 2] * scale,
                        (int)boxes[i * 4 + 3] * scale, scores[i]);
    }
    off += snprintf(out + off, cap - off,
                    "----------------------------------------\r\n"
                    "[INFO] Total faces detected: %d\r\n", n);
    return off;
}

}  // extern "C"

// Native stream engine: host-side batching pump for TPU execution.
//
// The reference processes each plugin instance's streams one by one on
// CPU threads; the TPU-native design instead batches MANY streams into
// one [rows, block] device step (the 64-channel chain is one jit call).
// This engine is the native runtime piece that feeds that step: it binds
// shared-memory audio rings (shm_runtime.cpp) to row ranges of a batch
// buffer, gathers ready blocks (zero-filling underruns, counting them),
// and scatters processed rows back to output rings — all lock-free,
// single alloc, O(rows*block) copies with sanitize at the boundary.
//
// C ABI for ctypes (no pybind11 in the image).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <ctime>
#include <vector>

// from shm_runtime.cpp (same shared object)
extern "C" {
int as_read(void* vh, float* data, uint32_t frames);
int as_write(void* vh, const float* data, uint32_t frames);
uint64_t as_avail(void* vh);
uint32_t as_length(void* vh);
uint32_t as_channels(void* vh);
int as_terminated(void* vh);
}

namespace {

struct se_slot_t {
    void* in_stream;    // may be null (output-only slot)
    void* out_stream;   // may be null (input-only slot)
    uint32_t row;       // first batch row
    uint32_t channels;  // rows occupied
};

struct se_engine_t {
    uint32_t block;
    uint32_t rows;
    std::vector<se_slot_t> slots;
    uint64_t gathered;    // successful block gathers (per slot)
    uint64_t underruns;   // zero-filled gathers
};

}  // namespace

extern "C" {

void* se_create(uint32_t block, uint32_t rows) {
    if (block == 0 || rows == 0) return nullptr;
    se_engine_t* e = new se_engine_t();
    e->block = block;
    e->rows = rows;
    e->gathered = 0;
    e->underruns = 0;
    return e;
}

// Bind a stream pair to rows [row, row+channels).  Either stream may be
// null.  Returns the slot index, or -1 on range error/overlap, or -2 if
// a stream's ring cannot hold a full engine block (as_write clamps each
// call to length/2, which would silently truncate every scatter), or -3
// if a stream's channel count differs from the slot's `channels`
// (as_read/as_write copy stream_channels*frames floats based on the
// stream's own header — a mismatch would read/write past the slot's
// row range in the batch buffer).
int se_bind(void* ve, void* in_stream, void* out_stream, uint32_t row,
            uint32_t channels) {
    se_engine_t* e = reinterpret_cast<se_engine_t*>(ve);
    // subtraction form avoids uint32 wrap in row + channels
    if (channels == 0 || row > e->rows || channels > e->rows - row)
        return -1;
    if (in_stream && as_length(in_stream) / 2 < e->block) return -2;
    if (out_stream && as_length(out_stream) / 2 < e->block) return -2;
    if (in_stream && as_channels(in_stream) != channels) return -3;
    if (out_stream && as_channels(out_stream) != channels) return -3;
    for (const se_slot_t& s : e->slots) {
        if (row < s.row + s.channels && s.row < row + channels)
            return -1;  // overlapping row range
    }
    e->slots.push_back(se_slot_t{in_stream, out_stream, row, channels});
    return (int)e->slots.size() - 1;
}

// Number of bound input slots with at least one block available.
int se_ready(void* ve) {
    se_engine_t* e = reinterpret_cast<se_engine_t*>(ve);
    int n = 0;
    for (const se_slot_t& s : e->slots)
        if (s.in_stream && as_avail(s.in_stream) >= e->block) ++n;
    return n;
}

// Sleep-wait until at least `min_ready` input slots have a block, a
// bound input terminates, or `timeout_us` elapses.  Returns the ready
// count at exit (>=0), or -1 if a stream terminated.
int se_wait(void* ve, uint32_t min_ready, uint32_t timeout_us) {
    se_engine_t* e = reinterpret_cast<se_engine_t*>(ve);
    uint64_t waited = 0;
    for (;;) {
        int n = se_ready(ve);
        if ((uint32_t)n >= min_ready) return n;
        for (const se_slot_t& s : e->slots)
            if (s.in_stream && as_terminated(s.in_stream)) return -1;
        if (waited >= timeout_us) return n;
        struct timespec ts = {0, 200 * 1000};  // 200 us
        nanosleep(&ts, nullptr);
        waited += 200;
    }
}

// Gather one block from every bound input slot into batch [rows, block]
// (planar, row-major).  Slots without a full block — and unbound rows —
// are zero-filled.  Returns the number of slots that delivered data.
int se_gather(void* ve, float* batch) {
    se_engine_t* e = reinterpret_cast<se_engine_t*>(ve);
    const uint32_t B = e->block;
    memset(batch, 0, (size_t)e->rows * B * sizeof(float));
    int n = 0;
    for (const se_slot_t& s : e->slots) {
        if (!s.in_stream) continue;
        if (as_avail(s.in_stream) >= B) {
            // as_read fills planar [channels, got] at stride got —
            // equal to the batch row layout only when got == B
            float* dst = batch + (size_t)s.row * B;
            uint32_t got = (uint32_t)as_read(s.in_stream, dst, B);
            if (got < B && got > 0 && s.channels > 1) {
                // writer lapped us between avail and read (overrun
                // jump): restride channels from packed `got` to `B`,
                // back to front so sources aren't clobbered
                for (uint32_t c = s.channels; c-- > 0;) {
                    memmove(dst + (size_t)c * B, dst + (size_t)c * got,
                            got * sizeof(float));
                    memset(dst + (size_t)c * B + got, 0,
                           (B - got) * sizeof(float));
                }
            } else if (got < B) {
                memset(dst + got, 0, (B - got) * sizeof(float));
            }
            e->gathered++;
            ++n;
        } else {
            e->underruns++;
        }
    }
    return n;
}

// Scatter batch rows back to every bound output stream.  Returns the
// number of slots written.
int se_scatter(void* ve, const float* batch) {
    se_engine_t* e = reinterpret_cast<se_engine_t*>(ve);
    const uint32_t B = e->block;
    int n = 0;
    for (const se_slot_t& s : e->slots) {
        if (!s.out_stream) continue;
        as_write(s.out_stream, batch + (size_t)s.row * B, B);
        ++n;
    }
    return n;
}

void se_stats(void* ve, uint64_t* gathered, uint64_t* underruns) {
    se_engine_t* e = reinterpret_cast<se_engine_t*>(ve);
    if (gathered) *gathered = e->gathered;
    if (underruns) *underruns = e->underruns;
}

void se_destroy(void* ve) {
    delete reinterpret_cast<se_engine_t*>(ve);
}

}  // extern "C"

// Native shared-memory runtime: lock-free audio ring + name catalog.
//
// TPU-native re-design of the reference's IPC layer (reference:
// src/main/shared/AudioStream.cpp, Catalog.cpp — POSIX shm segment with
// sh_header_t {magic, version, flags, channels, length, head, counter}
// and a fixed-record name registry guarded by a shared mutex).  This is
// the host-side transport that feeds audio between producer processes
// (capture, decoding) and the JAX compute process; device-side transport
// between chips is jax.sharding collectives, not this.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the image).

#include <atomic>
#include <new>
#include <cerrno>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <pthread.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t AS_MAGIC = 0x41535452;  // "ASTR"
constexpr uint32_t AS_VERSION = 1;
constexpr uint32_t CAT_MAGIC = 0x43415447;  // "CATG"
constexpr uint32_t CAT_VERSION = 1;
constexpr uint32_t CAT_NAME_LEN = 64;
constexpr uint32_t CAT_ID_LEN = 64;

// ---------------------------------------------------------------------------
// AudioStream: single-writer shared ring of planar float frames
// ---------------------------------------------------------------------------

struct as_header_t {
    uint32_t magic;
    uint32_t version;
    std::atomic<uint32_t> flags;     // bit0: terminated
    uint32_t channels;
    uint32_t length;                 // ring capacity in frames
    uint32_t max_blk;                // maximum write block size
    std::atomic<uint64_t> head;      // total frames ever written
    std::atomic<uint64_t> counter;   // write commit counter
};

struct as_handle_t {
    as_header_t* hdr;
    float* data;                     // [channels][length]
    size_t map_size;
    uint64_t read_pos;               // reader-side position
    int owner;
    char name[128];
};

inline float sanitize(float v) {
    // strip NaN/Inf/denormals crossing the shared boundary
    // (reference AudioStream::write_sanitized, dsp::sanitize2) --
    // only true denormals (< FLT_MIN) are zeroed, small NORMAL
    // floats pass through
    if (!std::isfinite(v)) return 0.0f;
    if (std::fabs(v) < 1.17549435e-38f) return 0.0f;
    return v;
}

}  // namespace

extern "C" {

void* as_create(const char* id, uint32_t channels, uint32_t length) {
    size_t size = sizeof(as_header_t) +
                  (size_t)channels * length * sizeof(float);
    shm_unlink(id);
    int fd = shm_open(id, O_CREAT | O_EXCL | O_RDWR, 0600);
    if (fd < 0) return nullptr;
    if (ftruncate(fd, (off_t)size) != 0) {
        close(fd);
        shm_unlink(id);
        return nullptr;
    }
    void* mem = mmap(nullptr, size, PROT_READ | PROT_WRITE, MAP_SHARED,
                     fd, 0);
    close(fd);
    if (mem == MAP_FAILED) return nullptr;

    as_header_t* hdr = new (mem) as_header_t();
    hdr->version = AS_VERSION;
    hdr->flags.store(0);
    hdr->channels = channels;
    hdr->length = length;
    hdr->max_blk = length / 2;
    hdr->head.store(0);
    hdr->counter.store(0);
    // publish magic LAST with release ordering: a concurrent as_open
    // that sees the magic must also see every other header field
    __atomic_store_n(&hdr->magic, AS_MAGIC, __ATOMIC_RELEASE);

    as_handle_t* h = new as_handle_t();
    h->hdr = hdr;
    h->data = reinterpret_cast<float*>(hdr + 1);
    h->map_size = size;
    h->read_pos = 0;
    h->owner = 1;
    snprintf(h->name, sizeof(h->name), "%s", id);
    memset(h->data, 0, (size_t)channels * length * sizeof(float));
    return h;
}

void* as_open(const char* id) {
    int fd = shm_open(id, O_RDWR, 0600);
    if (fd < 0) return nullptr;
    struct stat st;
    if (fstat(fd, &st) != 0) {
        close(fd);
        return nullptr;
    }
    void* mem = mmap(nullptr, (size_t)st.st_size, PROT_READ | PROT_WRITE,
                     MAP_SHARED, fd, 0);
    close(fd);
    if (mem == MAP_FAILED) return nullptr;
    as_header_t* hdr = reinterpret_cast<as_header_t*>(mem);
    if (__atomic_load_n(&hdr->magic, __ATOMIC_ACQUIRE) != AS_MAGIC ||
        hdr->version != AS_VERSION) {
        munmap(mem, (size_t)st.st_size);
        return nullptr;
    }
    as_handle_t* h = new as_handle_t();
    h->hdr = hdr;
    h->data = reinterpret_cast<float*>(hdr + 1);
    h->map_size = (size_t)st.st_size;
    h->read_pos = hdr->head.load();
    h->owner = 0;
    snprintf(h->name, sizeof(h->name), "%s", id);
    return h;
}

uint32_t as_channels(void* vh) {
    return reinterpret_cast<as_handle_t*>(vh)->hdr->channels;
}
uint32_t as_length(void* vh) {
    return reinterpret_cast<as_handle_t*>(vh)->hdr->length;
}

// Write `frames` planar samples (data[ch * frames + i]); returns frames
// written.  Lock-free: data stores first, then head publishes.  Copies
// run over at most two contiguous ring segments (no per-sample modulo)
// so the sanitize loop auto-vectorizes.
int as_write(void* vh, const float* data, uint32_t frames) {
    as_handle_t* h = reinterpret_cast<as_handle_t*>(vh);
    as_header_t* hdr = h->hdr;
    const uint32_t C = hdr->channels, L = hdr->length;
    if (frames > hdr->max_blk) frames = hdr->max_blk;
    uint64_t head = hdr->head.load(std::memory_order_relaxed);
    const uint32_t off = (uint32_t)(head % L);
    const uint32_t n1 = (off + frames <= L) ? frames : (L - off);
    const uint32_t n2 = frames - n1;
    for (uint32_t c = 0; c < C; ++c) {
        float* ring = h->data + (size_t)c * L;
        const float* src = data + (size_t)c * frames;
        for (uint32_t i = 0; i < n1; ++i)
            ring[off + i] = sanitize(src[i]);
        for (uint32_t i = 0; i < n2; ++i)
            ring[i] = sanitize(src[n1 + i]);
    }
    hdr->head.store(head + frames, std::memory_order_release);
    hdr->counter.fetch_add(1, std::memory_order_relaxed);
    return (int)frames;
}

// Read up to `frames` planar samples into data; returns frames actually
// read.  Detects overrun (writer lapped the reader): skips ahead and
// continues from the oldest valid frame.
int as_read(void* vh, float* data, uint32_t frames) {
    as_handle_t* h = reinterpret_cast<as_handle_t*>(vh);
    as_header_t* hdr = h->hdr;
    const uint32_t C = hdr->channels, L = hdr->length;
    uint64_t head = hdr->head.load(std::memory_order_acquire);
    if (h->read_pos + L < head)     // overrun: jump to oldest valid
        h->read_pos = head - L / 2;
    uint64_t avail = head - h->read_pos;
    if (avail == 0) return 0;
    uint32_t todo = (uint32_t)(avail < frames ? avail : frames);
    const uint32_t off = (uint32_t)(h->read_pos % L);
    const uint32_t n1 = (off + todo <= L) ? todo : (L - off);
    const uint32_t n2 = todo - n1;
    for (uint32_t c = 0; c < C; ++c) {
        const float* ring = h->data + (size_t)c * L;
        float* dst = data + (size_t)c * todo;
        for (uint32_t i = 0; i < n1; ++i)
            dst[i] = sanitize(ring[off + i]);
        for (uint32_t i = 0; i < n2; ++i)
            dst[n1 + i] = sanitize(ring[i]);
    }
    h->read_pos += todo;
    return (int)todo;
}

uint64_t as_avail(void* vh) {
    as_handle_t* h = reinterpret_cast<as_handle_t*>(vh);
    return h->hdr->head.load(std::memory_order_acquire) - h->read_pos;
}

uint64_t as_counter(void* vh) {
    return reinterpret_cast<as_handle_t*>(vh)->hdr->counter.load();
}

void as_terminate(void* vh) {
    reinterpret_cast<as_handle_t*>(vh)->hdr->flags.fetch_or(1u);
}

int as_terminated(void* vh) {
    return (int)(reinterpret_cast<as_handle_t*>(vh)->hdr->flags.load() & 1u);
}

void as_close(void* vh) {
    as_handle_t* h = reinterpret_cast<as_handle_t*>(vh);
    int unlink_it = h->owner;
    char name[128];
    snprintf(name, sizeof(name), "%s", h->name);
    munmap(h->hdr, h->map_size);
    if (unlink_it) shm_unlink(name);
    delete h;
}

// ---------------------------------------------------------------------------
// Catalog: shared-memory name registry (reference Catalog.cpp)
// ---------------------------------------------------------------------------

struct cat_record_t {
    uint32_t magic;        // 0 = free slot
    uint32_t hash;
    uint32_t version;
    uint32_t keepalive;
    char name[CAT_NAME_LEN];
    char shm_id[CAT_ID_LEN];
};

struct cat_header_t {
    uint32_t magic;
    uint32_t version;
    uint32_t max_records;
    std::atomic<uint32_t> revision;
    pthread_mutex_t lock;
};

struct cat_handle_t {
    cat_header_t* hdr;
    cat_record_t* recs;
    size_t map_size;
    int owner;
    char name[128];
};

static uint32_t cat_hash(const char* s) {
    uint32_t hv = 2166136261u;
    for (; *s; ++s) hv = (hv ^ (uint8_t)*s) * 16777619u;
    return hv;
}

void* cat_open(const char* id, uint32_t max_records) {
    size_t size = sizeof(cat_header_t) +
                  (size_t)max_records * sizeof(cat_record_t);
    int created = 0;
    int fd = shm_open(id, O_CREAT | O_EXCL | O_RDWR, 0600);
    if (fd >= 0) {
        created = 1;
        if (ftruncate(fd, (off_t)size) != 0) {
            close(fd);
            shm_unlink(id);
            return nullptr;
        }
    } else {
        fd = shm_open(id, O_RDWR, 0600);
        if (fd < 0) return nullptr;
        struct stat st;
        if (fstat(fd, &st) != 0 || (size_t)st.st_size < sizeof(cat_header_t)) {
            close(fd);
            return nullptr;
        }
        size = (size_t)st.st_size;
    }
    void* mem = mmap(nullptr, size, PROT_READ | PROT_WRITE, MAP_SHARED,
                     fd, 0);
    close(fd);
    if (mem == MAP_FAILED) return nullptr;
    cat_header_t* hdr = reinterpret_cast<cat_header_t*>(mem);
    if (created) {
        new (hdr) cat_header_t();
        hdr->version = CAT_VERSION;
        hdr->max_records = max_records;
        hdr->revision.store(0);
        pthread_mutexattr_t attr;
        pthread_mutexattr_init(&attr);
        pthread_mutexattr_setpshared(&attr, PTHREAD_PROCESS_SHARED);
        pthread_mutexattr_setrobust(&attr, PTHREAD_MUTEX_ROBUST);
        pthread_mutex_init(&hdr->lock, &attr);
        pthread_mutexattr_destroy(&attr);
        memset(hdr + 1, 0, (size_t)max_records * sizeof(cat_record_t));
        // publish magic LAST: an opener racing us must not lock the
        // process-shared mutex before pthread_mutex_init completes
        __atomic_store_n(&hdr->magic, CAT_MAGIC, __ATOMIC_RELEASE);
    } else if (__atomic_load_n(&hdr->magic, __ATOMIC_ACQUIRE)
               != CAT_MAGIC) {
        munmap(mem, size);
        return nullptr;
    }
    cat_handle_t* h = new cat_handle_t();
    h->hdr = hdr;
    h->recs = reinterpret_cast<cat_record_t*>(hdr + 1);
    h->map_size = size;
    h->owner = created;
    snprintf(h->name, sizeof(h->name), "%s", id);
    return h;
}

static void cat_lock(cat_header_t* hdr) {
    int rc = pthread_mutex_lock(&hdr->lock);
    if (rc == EOWNERDEAD) pthread_mutex_consistent(&hdr->lock);
}

int cat_publish(void* vh, const char* name, const char* shm_id) {
    cat_handle_t* h = reinterpret_cast<cat_handle_t*>(vh);
    cat_header_t* hdr = h->hdr;
    uint32_t hv = cat_hash(name);
    cat_lock(hdr);
    cat_record_t* slot = nullptr;
    for (uint32_t i = 0; i < hdr->max_records; ++i) {
        cat_record_t* r = &h->recs[i];
        if (r->magic && r->hash == hv &&
            strncmp(r->name, name, CAT_NAME_LEN) == 0) {
            slot = r;           // update existing
            break;
        }
        if (!slot && r->magic == 0) slot = r;
    }
    int ok = 0;
    if (slot) {
        slot->magic = CAT_MAGIC;
        slot->hash = hv;
        slot->version++;
        slot->keepalive = 1;
        snprintf(slot->name, CAT_NAME_LEN, "%s", name);
        snprintf(slot->shm_id, CAT_ID_LEN, "%s", shm_id);
        hdr->revision.fetch_add(1);
        ok = 1;
    }
    pthread_mutex_unlock(&hdr->lock);
    return ok;
}

int cat_get(void* vh, const char* name, char* out, uint32_t cap) {
    cat_handle_t* h = reinterpret_cast<cat_handle_t*>(vh);
    uint32_t hv = cat_hash(name);
    cat_lock(h->hdr);
    int ok = 0;
    for (uint32_t i = 0; i < h->hdr->max_records; ++i) {
        cat_record_t* r = &h->recs[i];
        if (r->magic && r->hash == hv &&
            strncmp(r->name, name, CAT_NAME_LEN) == 0) {
            snprintf(out, cap, "%s", r->shm_id);
            ok = 1;
            break;
        }
    }
    pthread_mutex_unlock(&h->hdr->lock);
    return ok;
}

int cat_erase(void* vh, const char* name) {
    cat_handle_t* h = reinterpret_cast<cat_handle_t*>(vh);
    uint32_t hv = cat_hash(name);
    cat_lock(h->hdr);
    int ok = 0;
    for (uint32_t i = 0; i < h->hdr->max_records; ++i) {
        cat_record_t* r = &h->recs[i];
        if (r->magic && r->hash == hv &&
            strncmp(r->name, name, CAT_NAME_LEN) == 0) {
            memset(r, 0, sizeof(*r));
            h->hdr->revision.fetch_add(1);
            ok = 1;
            break;
        }
    }
    pthread_mutex_unlock(&h->hdr->lock);
    return ok;
}

// newline-joined names of live records; returns count
int cat_enumerate(void* vh, char* out, uint32_t cap) {
    cat_handle_t* h = reinterpret_cast<cat_handle_t*>(vh);
    cat_lock(h->hdr);
    uint32_t pos = 0;
    int count = 0;
    for (uint32_t i = 0; i < h->hdr->max_records; ++i) {
        cat_record_t* r = &h->recs[i];
        if (!r->magic) continue;
        uint32_t n = (uint32_t)strnlen(r->name, CAT_NAME_LEN);
        if (pos + n + 1 >= cap) break;
        memcpy(out + pos, r->name, n);
        pos += n;
        out[pos++] = '\n';
        ++count;
    }
    if (pos < cap) out[pos] = 0;
    pthread_mutex_unlock(&h->hdr->lock);
    return count;
}

uint32_t cat_revision(void* vh) {
    return reinterpret_cast<cat_handle_t*>(vh)->hdr->revision.load();
}

void cat_keepalive(void* vh, const char* name) {
    cat_handle_t* h = reinterpret_cast<cat_handle_t*>(vh);
    uint32_t hv = cat_hash(name);
    cat_lock(h->hdr);
    for (uint32_t i = 0; i < h->hdr->max_records; ++i) {
        cat_record_t* r = &h->recs[i];
        if (r->magic && r->hash == hv &&
            strncmp(r->name, name, CAT_NAME_LEN) == 0) {
            r->keepalive++;
            break;
        }
    }
    pthread_mutex_unlock(&h->hdr->lock);
}

void cat_close(void* vh, int unlink_it) {
    cat_handle_t* h = reinterpret_cast<cat_handle_t*>(vh);
    char name[128];
    snprintf(name, sizeof(name), "%s", h->name);
    munmap(h->hdr, h->map_size);
    if (unlink_it) shm_unlink(name);
    delete h;
}

}  // extern "C"

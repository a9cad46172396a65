/* Oracle exporters, wave 4b: the GENUINE shared/AudioStream.cpp and
 * shared/Catalog.cpp compiled against the POSIX-shm ipc stubs
 * (stubs/lsp-plug.in/ipc/*) and driven writer+reader in ONE process —
 * the reference's own utest pattern
 * (/root/reference/src/test/utest/shared/audiostream.cpp:30-62,
 * catalog.cpp).  Handle-based C ABI so the Python tests can script the
 * begin/read/write/end protocol scenarios (resync at >4x blk_size,
 * underrun zero-fill, terminate-EOF, sanitized copies —
 * AudioStream.cpp:389-600, 508-551) and the Catalog record life cycle
 * (publish/get/get_or_reserve/revoke/enumerate/keep_alive/gc —
 * Catalog.cpp:63-780). */

#include <lsp-plug.in/dsp/dsp.h>
#include <lsp-plug.in/dsp-units/shared/AudioStream.h>
#include <lsp-plug.in/dsp-units/shared/Catalog.h>

#include <cmath>
#include <cstdint>
#include <cstring>

namespace lsp
{
    namespace dsp
    {
        /* lsp-dsp-lib sanitize2 semantics (inferred from usage: "copy
         * with NaNs, Infs and denormals removed", AudioStream.h doc):
         * normals and zeros pass through, everything else collapses to
         * signed zero. */
        void sanitize2(float *dst, const float *src, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                uint32_t v;
                memcpy(&v, &src[i], sizeof(v));
                const uint32_t a = v & 0x7fffffffu;
                const bool keep = (a == 0)
                    || ((a >= 0x00800000u) && (a < 0x7f800000u));
                const uint32_t r = keep ? v : (v & 0x80000000u);
                memcpy(&dst[i], &r, sizeof(r));
            }
        }
    } /* namespace dsp */
} /* namespace lsp */

using namespace lsp;

extern "C" {

/* ---------------- AudioStream (handle-based) ---------------- */

void *ref_as_new()
{
    return new dspu::AudioStream();
}

int ref_as_create(void *h, const char *id, uint32_t channels,
                  uint32_t length)
{
    return ((dspu::AudioStream *) h)->create(id, channels, length);
}

int ref_as_allocate(void *h, const char *postfix, uint32_t channels,
                    uint32_t length, char *name_out, uint32_t name_cap)
{
    LSPString name;
    status_t res = ((dspu::AudioStream *) h)->allocate(
        &name, postfix, channels, length);
    if (res == STATUS_OK && name_out != NULL && name_cap > 0)
    {
        strncpy(name_out, name.get_utf8(), name_cap - 1);
        name_out[name_cap - 1] = '\0';
    }
    return res;
}

int ref_as_open(void *h, const char *id)
{
    return ((dspu::AudioStream *) h)->open(id);
}

int ref_as_begin(void *h, int64_t blk)
{
    return ((dspu::AudioStream *) h)->begin(ssize_t(blk));
}

int ref_as_read(void *h, uint32_t channel, float *dst, uint32_t n,
                int sanitized)
{
    dspu::AudioStream *as = (dspu::AudioStream *) h;
    return sanitized ? as->read_sanitized(channel, dst, n)
                     : as->read(channel, dst, n);
}

int ref_as_write(void *h, uint32_t channel, const float *src, uint32_t n,
                 int sanitized)
{
    dspu::AudioStream *as = (dspu::AudioStream *) h;
    return sanitized ? as->write_sanitized(channel, src, n)
                     : as->write(channel, src, n);
}

int ref_as_end(void *h)
{
    return ((dspu::AudioStream *) h)->end();
}

uint32_t ref_as_channels(void *h)
{
    return uint32_t(((dspu::AudioStream *) h)->channels());
}

uint32_t ref_as_length(void *h)
{
    return uint32_t(((dspu::AudioStream *) h)->length());
}

uint32_t ref_as_counter(void *h)
{
    return ((dspu::AudioStream *) h)->counter();
}

int ref_as_close(void *h)
{
    return ((dspu::AudioStream *) h)->close();
}

void ref_as_free(void *h)
{
    delete (dspu::AudioStream *) h;
}

/* ---------------- Catalog (handle-based) ---------------- */

void *ref_cat_new()
{
    return new dspu::Catalog();
}

int ref_cat_open(void *h, const char *id, uint32_t entries)
{
    return ((dspu::Catalog *) h)->open(id, entries);
}

int ref_cat_close(void *h)
{
    return ((dspu::Catalog *) h)->close();
}

void ref_cat_free(void *h)
{
    delete (dspu::Catalog *) h;
}

uint32_t ref_cat_capacity(void *h)
{
    return uint32_t(((dspu::Catalog *) h)->capacity());
}

uint32_t ref_cat_size(void *h)
{
    return uint32_t(((dspu::Catalog *) h)->size());
}

int ref_cat_changed(void *h)
{
    return ((dspu::Catalog *) h)->changed() ? 1 : 0;
}

int ref_cat_sync(void *h)
{
    return ((dspu::Catalog *) h)->sync() ? 1 : 0;
}

/* publish; returns index (>=0) or -status.  out[0]=index, out[1]=magic,
 * out[2]=version; name/id copied into the 65-byte buffers. */
long ref_cat_publish(void *h, uint32_t magic, const char *name,
                     const char *id, uint32_t *out_version)
{
    dspu::Catalog::Record rec;
    ssize_t res = ((dspu::Catalog *) h)->publish(&rec, magic, name, id);
    if (res >= 0 && out_version != NULL)
        *out_version = rec.version;
    return long(res);
}

int ref_cat_get_by_name(void *h, const char *name, uint32_t *out_index,
                        uint32_t *out_magic, uint32_t *out_version,
                        char *id_out /* >= 65 bytes */)
{
    dspu::Catalog::Record rec;
    status_t res = ((dspu::Catalog *) h)->get(&rec, name);
    if (res == STATUS_OK)
    {
        if (out_index)   *out_index   = rec.index;
        if (out_magic)   *out_magic   = rec.magic;
        if (out_version) *out_version = rec.version;
        if (id_out)
        {
            strncpy(id_out, rec.id.get_utf8(), 64);
            id_out[64] = '\0';
        }
    }
    return res;
}

int ref_cat_get_by_index(void *h, uint32_t index, uint32_t *out_magic,
                         uint32_t *out_version, char *name_out,
                         char *id_out)
{
    dspu::Catalog::Record rec;
    status_t res = ((dspu::Catalog *) h)->get(&rec, index);
    if (res == STATUS_OK)
    {
        if (out_magic)   *out_magic   = rec.magic;
        if (out_version) *out_version = rec.version;
        if (name_out)
        {
            strncpy(name_out, rec.name.get_utf8(), 64);
            name_out[64] = '\0';
        }
        if (id_out)
        {
            strncpy(id_out, rec.id.get_utf8(), 64);
            id_out[64] = '\0';
        }
    }
    return res;
}

int ref_cat_get_or_reserve(void *h, const char *name, uint32_t magic,
                           uint32_t *out_index, uint32_t *out_version,
                           char *id_out)
{
    dspu::Catalog::Record rec;
    status_t res = ((dspu::Catalog *) h)->get_or_reserve(&rec, name,
                                                         magic);
    if (res == STATUS_OK)
    {
        if (out_index)   *out_index   = rec.index;
        if (out_version) *out_version = rec.version;
        if (id_out)
        {
            strncpy(id_out, rec.id.get_utf8(), 64);
            id_out[64] = '\0';
        }
    }
    return res;
}

int ref_cat_validate(void *h, uint32_t index, uint32_t magic,
                     uint32_t version, const char *name, const char *id)
{
    dspu::Catalog::Record rec;
    rec.index   = index;
    rec.magic   = magic;
    rec.version = version;
    rec.name.set_utf8(name);
    rec.id.set_utf8(id);
    return ((dspu::Catalog *) h)->validate(&rec) ? 1 : 0;
}

int ref_cat_revoke(void *h, uint32_t index, uint32_t version)
{
    return ((dspu::Catalog *) h)->revoke(index, version);
}

/* enumerate into flat arrays; returns count (>=0) or -status */
long ref_cat_enumerate(void *h, uint32_t magic, uint32_t max_items,
                       uint32_t *indices, uint32_t *magics,
                       uint32_t *versions,
                       char *names /* [max][65] */,
                       char *ids /* [max][65] */)
{
    lltl::parray<dspu::Catalog::Record> items;
    status_t res = ((dspu::Catalog *) h)->enumerate(&items, magic);
    if (res != STATUS_OK)
        return -long(res);
    const size_t n = items.size();
    for (size_t i = 0; i < n && i < max_items; ++i)
    {
        dspu::Catalog::Record *r = items.uget(i);
        indices[i]  = r->index;
        magics[i]   = r->magic;
        versions[i] = r->version;
        strncpy(&names[i * 65], r->name.get_utf8(), 64);
        names[i * 65 + 64] = '\0';
        strncpy(&ids[i * 65], r->id.get_utf8(), 64);
        ids[i * 65 + 64] = '\0';
    }
    dspu::Catalog::cleanup(&items);
    return long(n);
}

int ref_cat_keep_alive(void *h, const char *name)
{
    return ((dspu::Catalog *) h)->keep_alive(name);
}

int ref_cat_gc(void *h)
{
    return ((dspu::Catalog *) h)->gc();
}

} /* extern "C" */

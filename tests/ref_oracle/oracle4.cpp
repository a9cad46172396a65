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
#include <lsp-plug.in/dsp-units/3d/RayTrace3D.h>
#include <lsp-plug.in/dsp-units/3d/Scene3D.h>
#include <lsp-plug.in/dsp-units/3d/raytrace.h>
#include <lsp-plug.in/dsp-units/sampling/Sample.h>

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

/* ---------------- two-object genuine ray trace ---------------- */

static void fill_material(dspu::rt::material_t *m, const float *material)
{
    memset(m, 0, sizeof(*m));
    m->absorption[0]   = material[0];
    m->absorption[1]   = material[1];
    m->diffusion[0]    = material[2];
    m->diffusion[1]    = material[3];
    m->dispersion[0]   = material[4];
    m->dispersion[1]   = material[5];
    m->transparency[0] = material[6];
    m->transparency[1] = material[7];
    m->permeability    = material[8];
}

/* Like oracle3.cpp ref_raytrace, but with TWO objects carrying their
 * own materials (faces2/material2; nfaces2 == 0 degrades to the
 * single-object form) — needed to drive the reference's interface
 * physics (RayTrace3D.cpp:641-832: diffusion/dispersion splits,
 * transparency transmission legs, permeability speed scaling) on
 * scenes where a divider differs from the room walls. */
int ref_raytrace2(const float *verts, int32_t nverts,
                  const int32_t *faces, int32_t nfaces,
                  const float *material,
                  const int32_t *faces2, int32_t nfaces2,
                  const float *material2,
                  int32_t src_type, const float *src_cfg,
                  int32_t cap_config, int32_t cap_direction,
                  int32_t cap_side, const float *cap_cfg,
                  int32_t sample_rate, float energy_thresh,
                  float tolerance, float detalization,
                  int32_t normalize, int32_t rmin, int32_t rmax,
                  float *out, int32_t out_cap, int32_t *out_len,
                  int32_t *n_caps)
{
    lsp::status_t res;

    dspu::Scene3D scene;
    dspu::Object3D *obj = scene.add_object("room");
    if (obj == NULL)
        return -100;

    for (int32_t i = 0; i < nverts; ++i)
    {
        dsp::point3d_t p;
        dsp::init_point_xyz(&p, verts[3 * i], verts[3 * i + 1],
                            verts[3 * i + 2]);
        if (scene.add_vertex(&p) < 0)
            return -101;
    }

    for (int32_t i = 0; i < nfaces; ++i)
    {
        res = obj->add_triangle(i, faces[3 * i], faces[3 * i + 1],
                                faces[3 * i + 2], -1, -1, -1);
        if (res != lsp::STATUS_OK)
            return -102;
    }

    dspu::Object3D *obj2 = NULL;
    if (nfaces2 > 0)
    {
        obj2 = scene.add_object("divider");
        if (obj2 == NULL)
            return -105;
        for (int32_t i = 0; i < nfaces2; ++i)
        {
            res = obj2->add_triangle(
                nfaces + i, faces2[3 * i], faces2[3 * i + 1],
                faces2[3 * i + 2], -1, -1, -1);
            if (res != lsp::STATUS_OK)
                return -106;
        }
    }
    scene.postprocess_after_loading();
    obj->post_load();
    if (obj2 != NULL)
        obj2->post_load();

    dspu::RayTrace3D rt;
    if ((res = rt.init()) != lsp::STATUS_OK)
        return -int(res);
    if ((res = rt.set_scene(&scene, false)) != lsp::STATUS_OK)
        return -int(res);

    dspu::rt::material_t m;
    fill_material(&m, material);
    if ((res = rt.set_material(0, &m)) != lsp::STATUS_OK)
        return -int(res);
    if (obj2 != NULL)
    {
        fill_material(&m, material2);
        if ((res = rt.set_material(1, &m)) != lsp::STATUS_OK)
            return -int(res);
    }

    dspu::room_source_config_t scfg;
    dsp::init_point_xyz(&scfg.sPos, src_cfg[0], src_cfg[1], src_cfg[2]);
    scfg.fYaw = src_cfg[3];
    scfg.fPitch = src_cfg[4];
    scfg.fRoll = src_cfg[5];
    scfg.enType = (dspu::rt_audio_source_t) src_type;
    scfg.fSize = src_cfg[6];
    scfg.fHeight = src_cfg[7];
    scfg.fAngle = src_cfg[8];
    scfg.fCurvature = src_cfg[9];
    scfg.fAmplitude = src_cfg[10];

    dspu::rt_source_settings_t ssrc;
    if ((res = dspu::rt_configure_source(&ssrc, &scfg)) != lsp::STATUS_OK)
        return -int(res);
    if ((res = rt.add_source(&ssrc)) != lsp::STATUS_OK)
        return -int(res);

    dspu::room_capture_config_t ccfg;
    dsp::init_point_xyz(&ccfg.sPos, cap_cfg[0], cap_cfg[1], cap_cfg[2]);
    ccfg.fYaw = cap_cfg[3];
    ccfg.fPitch = cap_cfg[4];
    ccfg.fRoll = cap_cfg[5];
    ccfg.fCapsule = cap_cfg[6];
    ccfg.sConfig = (dspu::rt_capture_config_t) cap_config;
    ccfg.fAngle = cap_cfg[7];
    ccfg.fDistance = cap_cfg[8];
    ccfg.enDirection = (dspu::rt_audio_capture_t) cap_direction;
    ccfg.enSide = (dspu::rt_audio_capture_t) cap_side;

    size_t nc = 0;
    dspu::rt_capture_settings_t cset[2];
    if ((res = dspu::rt_configure_capture(&nc, cset, &ccfg))
        != lsp::STATUS_OK)
        return -int(res);
    *n_caps = int32_t(nc);

    dspu::Sample sample;
    if (!sample.init(nc, 512, 0))
        return -103;

    for (size_t i = 0; i < nc; ++i)
    {
        ssize_t id = rt.add_capture(&cset[i]);
        if (id < 0)
            return -104;
        res = rt.bind_capture(id, &sample, i, rmin, rmax);
        if (res != lsp::STATUS_OK)
            return -int(res);
    }

    rt.set_sample_rate(sample_rate);
    rt.set_energy_threshold(energy_thresh);
    rt.set_tolerance(tolerance);
    rt.set_detalization(detalization);
    rt.set_normalize(normalize != 0);

    if ((res = rt.process(1, 1.0f)) != lsp::STATUS_OK)
        return -int(res);

    int32_t len = int32_t(sample.length());
    *out_len = len;
    int32_t n = (len < out_cap) ? len : out_cap;
    for (size_t i = 0; i < nc; ++i)
    {
        memset(&out[i * out_cap], 0, sizeof(float) * out_cap);
        memcpy(&out[i * out_cap], sample.channel(i), sizeof(float) * n);
    }

    rt.destroy(false);
    return 0;
}

} /* extern "C" */

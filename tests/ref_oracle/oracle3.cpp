/* ctypes exporter over the GENUINE reference ray tracer
 * (3d/RayTrace3D.cpp + 3d/rt/{context,mesh,plan}.cpp + 3d/Scene3D.cpp
 * + 3d/Object3D.cpp, see __init__.py _REF_SOURCES): build a scene
 * programmatically through the real Scene3D/Object3D API, configure
 * the real RayTrace3D with genuine rt_configure_source /
 * rt_configure_capture settings, run the full beam-tracing pipeline
 * single-threaded (the reference's own main-thread path,
 * RayTrace3D.cpp:1555-1610 with threads=1), and return the captured
 * impulse responses for IR-level comparison against the TPU tracer.
 */

#include <lsp-plug.in/dsp/dsp.h>
#include <lsp-plug.in/dsp-units/3d/RayTrace3D.h>
#include <lsp-plug.in/dsp-units/3d/Scene3D.h>
#include <lsp-plug.in/dsp-units/3d/Object3D.h>
#include <lsp-plug.in/dsp-units/3d/raytrace.h>
#include <lsp-plug.in/dsp-units/sampling/Sample.h>
#include <lsp-plug.in/dsp-units/noise/Generator.h>

#include <string.h>

namespace dspu = lsp::dspu;
namespace dsp = lsp::dsp;

extern "C"
{
    /* Run the genuine RayTrace3D on a programmatic scene.
     *
     * verts:    [nverts * 3] shared vertex coordinates
     * faces:    [nfaces * 3] vertex indices; winding defines the
     *           outward normal (n = (v1-v0) x (v2-v0)); room interiors
     *           must wind so normals point inside
     * material: [9] absorption[2], diffusion[2], dispersion[2],
     *           transparency[2], permeability (rt::material_t layout
     *           minus padding)
     * src_cfg:  [11] x,y,z, yaw,pitch,roll (deg), size, height,
     *           angle, curvature, amplitude (room_source_config_t)
     * cap_cfg:  [9] x,y,z, yaw,pitch,roll (deg), capsule, angle,
     *           distance (room_capture_config_t)
     * out:      [2 * out_cap] per-capture-channel IRs (row-major)
     *
     * Returns 0 on success, negative reference status on failure. */
    int ref_raytrace(const float *verts, int32_t nverts,
                     const int32_t *faces, int32_t nfaces,
                     const float *material,
                     int32_t src_type, const float *src_cfg,
                     int32_t cap_config, int32_t cap_direction,
                     int32_t cap_side, const float *cap_cfg,
                     int32_t sample_rate, float energy_thresh,
                     float tolerance, float detalization,
                     int32_t normalize, int32_t rmin, int32_t rmax,
                     int32_t threads,
                     float *out, int32_t out_cap, int32_t *out_len,
                     int32_t *n_caps)
    {
        lsp::status_t res;

        // Build the scene through the genuine API
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
        scene.postprocess_after_loading();
        obj->post_load();

        // Configure the tracer
        dspu::RayTrace3D rt;
        if ((res = rt.init()) != lsp::STATUS_OK)
            return -int(res);
        if ((res = rt.set_scene(&scene, false)) != lsp::STATUS_OK)
            return -int(res);

        dspu::rt::material_t m;
        memset(&m, 0, sizeof(m));
        m.absorption[0] = material[0];
        m.absorption[1] = material[1];
        m.diffusion[0] = material[2];
        m.diffusion[1] = material[3];
        m.dispersion[0] = material[4];
        m.dispersion[1] = material[5];
        m.transparency[0] = material[6];
        m.transparency[1] = material[7];
        m.permeability = material[8];
        if ((res = rt.set_material(0, &m)) != lsp::STATUS_OK)
            return -int(res);

        // Genuine source configuration (raytrace.cpp rt_configure_source)
        dspu::room_source_config_t scfg;
        dsp::init_point_xyz(&scfg.sPos, src_cfg[0], src_cfg[1],
                            src_cfg[2]);
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
        if ((res = dspu::rt_configure_source(&ssrc, &scfg))
            != lsp::STATUS_OK)
            return -int(res);
        if ((res = rt.add_source(&ssrc)) != lsp::STATUS_OK)
            return -int(res);

        // Genuine capture configuration (rt_configure_capture)
        dspu::room_capture_config_t ccfg;
        dsp::init_point_xyz(&ccfg.sPos, cap_cfg[0], cap_cfg[1],
                            cap_cfg[2]);
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

        if ((res = rt.process((threads > 0) ? threads : 1, 1.0f))
            != lsp::STATUS_OK)
            return -int(res);

        int32_t len = int32_t(sample.length());
        *out_len = len;
        int32_t n = (len < out_cap) ? len : out_cap;
        for (size_t i = 0; i < nc; ++i)
        {
            memset(&out[i * out_cap], 0, sizeof(float) * out_cap);
            memcpy(&out[i * out_cap], sample.channel(i),
                   sizeof(float) * n);
        }

        rt.destroy(false);
        return 0;
    }

    /* Genuine noise Generator facade (noise/Generator.cpp): core
     * selection (MLS/LCG/Velvet) + color filter (white/pink/red/blue/
     * violet/arbitrary via SpectralTilt).  Streams process_overwrite
     * in `block`-sized chunks (0 = one call). */
    int ref_noise_generator(uint32_t core, uint32_t color,
                            uint32_t order, float slope,
                            uint32_t slope_unit, uint32_t mls_nbits,
                            uint64_t mls_seed, uint32_t lcg_seed,
                            uint32_t lcg_dist, uint32_t velvet_type,
                            float velvet_window_s, float velvet_delta,
                            int32_t velvet_crush,
                            float velvet_crush_prob, float amplitude,
                            float offset, uint32_t sr, float *dst,
                            int32_t n, int32_t block)
    {
        dspu::NoiseGenerator g;
        g.init((uint8_t) mls_nbits, (dspu::MLS::mls_t) mls_seed,
               lcg_seed, 42u, 23u, 0u);
        g.set_sample_rate(sr);
        g.set_generator((dspu::ng_generator_t) core);
        g.set_mls_n_bits((uint8_t) mls_nbits);
        g.set_mls_seed((dspu::MLS::mls_t) mls_seed);
        g.set_lcg_distribution((dspu::lcg_dist_t) lcg_dist);
        g.set_velvet_type((dspu::vn_velvet_type_t) velvet_type);
        g.set_velvet_window_width(velvet_window_s);
        g.set_velvet_arn_delta(velvet_delta);
        g.set_velvet_crush(velvet_crush != 0);
        g.set_velvet_crushing_probability(velvet_crush_prob);
        g.set_noise_color((dspu::ng_color_t) color);
        g.set_coloring_order(order);
        g.set_color_slope(slope, (dspu::stlt_slope_unit_t) slope_unit);
        g.set_amplitude(amplitude);
        g.set_offset(offset);

        if (block <= 0)
            block = n;
        for (int32_t off = 0; off < n; off += block)
        {
            int32_t c = (n - off < block) ? (n - off) : block;
            g.process_overwrite(&dst[off], c);
        }
        return 0;
    }
}

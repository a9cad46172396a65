/* ctypes exporters over GENUINE reference sources, wave 3:
 * ADSREnvelope, Trigger, MeterGraph/ScaledMeterGraph, DynamicDelay,
 * Depopper, ShiftBuffer (see __init__.py _REF_SOURCES).  Same pattern
 * as oracle.cpp: construct the real unit, configure, stream, return
 * raw outputs for the Python tests to compare against the TPU
 * framework's units.
 */

#include <lsp-plug.in/dsp/dsp.h>
#include <lsp-plug.in/dsp-units/filters/DynamicFilters.h>
#include <lsp-plug.in/dsp-units/util/ADSREnvelope.h>
#include <lsp-plug.in/dsp-units/util/SpectralSplitter.h>
#include <lsp-plug.in/dsp-units/util/MultiSpectralProcessor.h>
#include <lsp-plug.in/dsp-units/util/FFTCrossover.h>
#include <lsp-plug.in/dsp-units/util/Oversampler.h>
#include <lsp-plug.in/dsp-units/util/Oscillator.h>
#include <lsp-plug.in/dsp-units/meters/TruePeakMeter.h>
#include <lsp-plug.in/dsp-units/sampling/SamplePlayer.h>
#include <lsp-plug.in/dsp-units/sampling/InSampleStream.h>
#include <lsp-plug.in/dsp-units/util/LatencyDetector.h>
#include <lsp-plug.in/dsp-units/util/ResponseTaker.h>
#include <lsp-plug.in/dsp-units/util/Analyzer.h>
#include <lsp-plug.in/dsp-units/util/SyncChirpProcessor.h>
#include <lsp-plug.in/dsp-units/3d/raytrace.h>
#include <lsp-plug.in/dsp-units/3d/bsp/context.h>

#include <vector>
#include <lsp-plug.in/dsp-units/util/Trigger.h>
#include <lsp-plug.in/dsp-units/util/MeterGraph.h>
#include <lsp-plug.in/dsp-units/util/ScaledMeterGraph.h>
#include <lsp-plug.in/dsp-units/util/DynamicDelay.h>
#include <lsp-plug.in/dsp-units/util/Depopper.h>
#include <lsp-plug.in/dsp-units/util/ShiftBuffer.h>

#include <math.h>
#include <string.h>

namespace dspu = lsp::dspu;
namespace dsp = lsp::dsp;

namespace
{
    /* shared fixed spectral mask for splitter/multi tests: bin k of an
     * N-bin packed-complex spectrum scaled by 1/(1 + min(k, N-k)/16) —
     * real and conjugate-symmetric, so outputs stay real */
    inline float bin_mask(size_t k, size_t n)
    {
        size_t d = (k < n - k) ? k : n - k;
        return 1.0f / (1.0f + float(d) / 16.0f);
    }

    void mask_func(void *object, void *subject, float *out,
                   const float *in, size_t rank)
    {
        (void) object; (void) subject;
        size_t n = size_t(1) << rank;
        for (size_t k = 0; k < n; ++k)
        {
            float m = bin_mask(k, n);
            out[2 * k] = in[2 * k] * m;
            out[2 * k + 1] = in[2 * k + 1] * m;
        }
    }

    struct sink_ctx
    {
        float *out;
        size_t base;
    };

    void split_sink(void *object, void *subject, const float *samples,
                    size_t first, size_t count)
    {
        (void) subject;
        sink_ctx *c = (sink_ctx *) object;
        for (size_t i = 0; i < count; ++i)
            c->out[c->base + first + i] = samples[i];
    }

    void avg_func(void *object, void *subject, float * const *spectrum,
                  size_t rank)
    {
        (void) object; (void) subject;
        size_t n = size_t(1) << rank;
        float *l = spectrum[0], *r = spectrum[1];
        for (size_t k = 0; k < 2 * n; ++k)
        {
            float a = 0.5f * (l[k] + r[k]);
            l[k] = a;
            r[k] = a;
        }
    }

    void xover_sink(void *object, void *subject, size_t band,
                    const float *data, size_t sample, size_t count)
    {
        (void) subject;
        sink_ctx *c = (sink_ctx *) object;
        for (size_t i = 0; i < count; ++i)
            c[band].out[c[band].base + sample + i] = data[i];
    }
} /* anonymous namespace */

extern "C"
{
    /* Genuine SpectralSplitter (SpectralSplitter.cpp:250-387): handler
     * 0 = passthrough (NULL func), handler 1 = the fixed bin mask. */
    int ref_spectral_splitter(uint32_t rank, uint32_t chunk_rank,
                              const float *x, float *y_pass,
                              float *y_mask, int n, int block)
    {
        dspu::SpectralSplitter sp;
        if (sp.init(rank, 2) != lsp::STATUS_OK)
            return -1;
        sp.set_rank(rank);
        sp.set_chunk_rank(chunk_rank);
        sink_ctx c0 = {y_pass, 0};
        sink_ctx c1 = {y_mask, 0};
        if (sp.bind(0, &c0, nullptr, nullptr, split_sink)
            != lsp::STATUS_OK)
            return -2;
        if (sp.bind(1, &c1, nullptr, mask_func, split_sink)
            != lsp::STATUS_OK)
            return -3;
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            c0.base = size_t(off);
            c1.base = size_t(off);
            sp.process(x + off, todo);
        }
        sp.destroy();
        return 0;
    }

    /* Genuine MultiSpectralProcessor (MultiSpectralProcessor.cpp):
     * 2 channels, handler averages the channel spectra. */
    int ref_multi_spectral(uint32_t rank, const float *xl, const float *xr,
                           float *yl, float *yr, int n, int block)
    {
        dspu::MultiSpectralProcessor mp;
        if (!mp.init(2, rank))
            return -1;
        mp.set_rank(rank);
        mp.bind_handler(avg_func, nullptr, nullptr);
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            mp.bind(0, yl + off, xl + off);
            mp.bind(1, yr + off, xr + off);
            mp.process(todo);
        }
        mp.destroy();
        return 0;
    }

    /* Genuine FFTCrossover (FFTCrossover.cpp over a shared
     * SpectralSplitter).  Band rows: [hpf_on, hpf_freq, lpf_on,
     * lpf_freq, slope, gain, flatten_gain]; y is [bands][n]. */
    int ref_fft_crossover_unit(uint32_t rank, uint32_t sr,
                               const float *bands, int n_bands,
                               const float *x, float *y, int n, int block)
    {
        dspu::FFTCrossover fc;
        if (fc.init(rank, n_bands) != lsp::STATUS_OK)
            return -1;
        fc.set_rank(rank);
        fc.set_sample_rate(sr);
        sink_ctx *ctx = new sink_ctx[n_bands];
        for (int b = 0; b < n_bands; ++b)
        {
            const float *r = &bands[b * 7];
            fc.set_hpf(b, r[1], r[4], r[0] != 0.0f);
            fc.set_lpf(b, r[3], r[4], r[2] != 0.0f);
            fc.set_gain(b, r[5]);
            fc.set_flatten(b, r[6]);
            fc.set_handler(b, xover_sink, ctx, nullptr);
            fc.enable_band(b, true);
            ctx[b].out = y + size_t(b) * size_t(n);
            ctx[b].base = 0;
        }
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            for (int b = 0; b < n_bands; ++b)
                ctx[b].base = size_t(off);
            fc.process(x + off, todo);
        }
        fc.destroy();
        delete[] ctx;
        return 0;
    }

    /* Analytic per-band magnitude mask of the genuine FFTCrossover
     * (freq_chart, FFTCrossover.cpp:472-516). */
    int ref_fft_crossover_unit_chart(const float *band, uint32_t sr,
                                     const float *freqs, float *m, int n)
    {
        dspu::FFTCrossover fc;
        if (fc.init(10, 1) != lsp::STATUS_OK)
            return -1;
        fc.set_sample_rate(sr);
        fc.set_hpf(0, band[1], band[4], band[0] != 0.0f);
        fc.set_lpf(0, band[3], band[4], band[2] != 0.0f);
        fc.set_gain(0, band[5]);
        fc.set_flatten(0, band[6]);
        bool ok = fc.freq_chart(0, m, freqs, n);
        fc.destroy();
        return ok ? 0 : -2;
    }

    /* Genuine DynamicFilters (DynamicFilters.cpp:204-314): one filter,
     * per-sample gain signal, streamed in `block` chunks.  The filter
     * params mirror ref_filter_process (oracle.cpp). */
    int ref_dynamic_filters(uint32_t type, uint32_t slope, float freq,
                            float freq2, float quality, uint32_t sr,
                            const float *gain, const float *x, float *y,
                            int n, int block)
    {
        dspu::DynamicFilters df;
        if (df.init(1) != lsp::STATUS_OK)
            return -1;
        df.set_sample_rate(sr);
        dspu::filter_params_t fp;
        fp.nType = type;
        fp.nSlope = slope;
        fp.fFreq = freq;
        fp.fFreq2 = freq2;
        fp.fGain = 1.0f;
        fp.fQuality = quality;
        if (!df.set_params(0, &fp))
            return -2;
        df.set_filter_active(0, true);
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            df.process(0, y + off, x + off, gain + off, todo);
        }
        df.destroy();
        return 0;
    }

    /* Genuine Oversampler (Oversampler.cpp): upsample / full
     * process-with-callback / downsample paths.  `cb_kind`: 0 = none
     * (plain up+down), 1 = tanh waveshaper at the high rate.  Returns
     * the reported latency. */
    static void tanh_cb(float *out, const float *in, size_t samples,
                        void *arg)
    {
        (void) arg;
        for (size_t i = 0; i < samples; ++i)
            out[i] = tanhf(1.5f * in[i]);
    }

    int ref_oversampler(uint32_t mode, uint32_t sr, int filtering,
                        int cb_kind, const float *x, float *up,
                        float *down, int n, int block, int *latency)
    {
        dspu::Oversampler os;
        if (!os.init())
            return -1;
        os.set_sample_rate(sr);
        os.set_mode((dspu::over_mode_t) mode);
        os.set_filtering(filtering != 0);
        os.update_settings();
        if (latency != nullptr)
            *latency = (int) os.latency();
        const size_t ratio = os.get_oversampling();
        if (block <= 0)
            block = n;
        if (up != nullptr)
        {
            for (int off = 0; off < n; off += block)
            {
                int todo = (n - off) < block ? (n - off) : block;
                os.upsample(up + size_t(off) * ratio, x + off, todo);
            }
            return 0;
        }
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            if (cb_kind == 1)
                os.process(down + off, x + off, todo, tanh_cb, nullptr);
            else
                os.process(down + off, x + off, todo);
        }
        return 0;
    }

    /* Genuine bsp::context (3d/bsp/context.cpp): build a BSP tree from
     * triangles (encoded per-triangle color = its index) and emit the
     * painter's-order mesh for a point of view.  Returns [m][13]
     * floats per output vertex-triple: 3x(x,y,z) + 3 normal + index. */
    int ref_bsp_mesh(const float *tris /* [n][9] */, int n_tris,
                     float povx, float povy, float povz,
                     float *out, int max_out, int *n_out)
    {
        dspu::bsp::context_t ctx;

        std::vector<dsp::point3d_t> pts(n_tris * 3);
        for (int i = 0; i < n_tris * 3; ++i)
            dsp::init_point_xyz(&pts[i], tris[i * 3], tris[i * 3 + 1],
                                tris[i * 3 + 2]);
        for (int i = 0; i < n_tris; ++i)
        {
            dsp::color3d_t col;
            col.r = float(i);
            col.g = 0.0f;
            col.b = 0.0f;
            col.a = 0.0f;
            dsp::matrix3d_t ident;
            dsp::init_matrix3d_translate(&ident, 0.0f, 0.0f, 0.0f);
            lsp::status_t res = ctx.add_triangles(&pts[i * 3], 1, &ident,
                                                  &col);
            if (res != lsp::STATUS_OK)
                return -1;
        }
        lsp::status_t res = ctx.build_tree();
        if (res != lsp::STATUS_OK)
            return -2;

        lsp::lltl::darray<dspu::view::vertex3d_t> mesh;
        dsp::point3d_t pov;
        dsp::init_point_xyz(&pov, povx, povy, povz);
        res = ctx.build_mesh(&mesh, &pov);
        if (res != lsp::STATUS_OK)
            return -3;

        int m = (int) (mesh.size() / 3);
        *n_out = m;
        for (int i = 0; i < m && i < max_out; ++i)
        {
            float *dst = &out[i * 13];
            for (int j = 0; j < 3; ++j)
            {
                const dspu::view::vertex3d_t *v = mesh.uget(i * 3 + j);
                dst[j * 3] = v->p.x;
                dst[j * 3 + 1] = v->p.y;
                dst[j * 3 + 2] = v->p.z;
                if (j == 0)
                {
                    dst[9] = v->n.dx;
                    dst[10] = v->n.dy;
                    dst[11] = v->n.dz;
                    dst[12] = v->c.r;
                }
            }
        }
        return 0;
    }

    /* Genuine InSampleStream (InSampleStream.cpp): wrap a 2-channel
     * sample, skip, then read interleaved frames. */
    int ref_in_sample_stream(const float *data, int len, uint32_t sr,
                             int skip, float *frames, int max_frames,
                             int *got)
    {
        dspu::Sample *s = new dspu::Sample();
        if (!s->init(2, len, len))
            return -1;
        for (int c = 0; c < 2; ++c)
            for (int i = 0; i < len; ++i)
                s->channel(c)[i] = data[c * len + i];
        s->set_sample_rate(sr);

        dspu::InSampleStream is(s, true);   /* stream owns the sample */
        if (skip > 0)
        {
            if (is.skip(skip) < 0)
                return -2;
        }
        ssize_t n = is.read(frames, max_frames);
        if (n < 0)
            return -3;
        *got = (int) n;
        is.close();
        return 0;
    }

    /* Genuine 3d/raytrace.cpp: configure a source (matrix composition,
     * :748-775) and generate its beam groups (:150-745).  Matrix
     * returned as 4 transformed probe points (layout-independent);
     * groups as [n][12] floats (apex + 3 triangle points, LOCAL frame). */
    int ref_rt_source(uint32_t type, float px, float py, float pz,
                      float yaw, float pitch, float roll, float size,
                      float height, float angle, float curvature,
                      float *probes /* in/out 4*[x,y,z] */,
                      float *groups, int max_groups, int *n_groups)
    {
        dspu::room_source_config_t cfg;
        dsp::init_point_xyz(&cfg.sPos, px, py, pz);
        cfg.fYaw = yaw;
        cfg.fPitch = pitch;
        cfg.fRoll = roll;
        cfg.enType = (dspu::rt_audio_source_t) type;
        cfg.fSize = size;
        cfg.fHeight = height;
        cfg.fAngle = angle;
        cfg.fCurvature = curvature;
        cfg.fAmplitude = 1.0f;

        dspu::rt_source_settings_t st;
        lsp::status_t res = dspu::rt_configure_source(&st, &cfg);
        if (res != lsp::STATUS_OK)
            return -1;
        for (int i = 0; i < 4; ++i)
        {
            dsp::point3d_t p;
            dsp::init_point_xyz(&p, probes[3 * i], probes[3 * i + 1],
                                probes[3 * i + 2]);
            dsp::apply_matrix3d_mp1(&p, &st.pos);
            probes[3 * i] = p.x;
            probes[3 * i + 1] = p.y;
            probes[3 * i + 2] = p.z;
        }

        lsp::lltl::darray<dspu::rt::group_t> out;
        res = dspu::rt_gen_source_mesh(out, &st);
        if (res != lsp::STATUS_OK)
            return -2;
        int n = (int) out.size();
        *n_groups = n;
        for (int i = 0; i < n && i < max_groups; ++i)
        {
            const dspu::rt::group_t *g = out.uget(i);
            float *dst = &groups[i * 12];
            dst[0] = g->s.x; dst[1] = g->s.y; dst[2] = g->s.z;
            for (int j = 0; j < 3; ++j)
            {
                dst[3 + j * 3] = g->p[j].x;
                dst[4 + j * 3] = g->p[j].y;
                dst[5 + j * 3] = g->p[j].z;
            }
        }
        return 0;
    }

    /* Genuine rt_configure_capture (:777-870): expand a room capture
     * config into n mics; per mic returns the transformed origin
     * (position) and transformed +x (look direction), radius, type. */
    int ref_rt_capture(float px, float py, float pz, float yaw,
                       float pitch, float roll, float capsule,
                       uint32_t config, float angle, float distance,
                       uint32_t direction, uint32_t side,
                       float *out /* [2][8]: pos3 dir3 radius type */,
                       int *n_out)
    {
        dspu::room_capture_config_t cfg;
        dsp::init_point_xyz(&cfg.sPos, px, py, pz);
        cfg.fYaw = yaw;
        cfg.fPitch = pitch;
        cfg.fRoll = roll;
        cfg.fCapsule = capsule;
        cfg.sConfig = (dspu::rt_capture_config_t) config;
        cfg.fAngle = angle;
        cfg.fDistance = distance;
        cfg.enDirection = (dspu::rt_audio_capture_t) direction;
        cfg.enSide = (dspu::rt_audio_capture_t) side;

        size_t n = 0;
        dspu::rt_capture_settings_t st[2];
        lsp::status_t res = dspu::rt_configure_capture(&n, st, &cfg);
        if (res != lsp::STATUS_OK)
            return -1;
        *n_out = (int) n;
        for (size_t i = 0; i < n; ++i)
        {
            dsp::point3d_t o, x;
            dsp::init_point_xyz(&o, 0.0f, 0.0f, 0.0f);
            dsp::init_point_xyz(&x, 1.0f, 0.0f, 0.0f);
            dsp::apply_matrix3d_mp1(&o, &st[i].pos);
            dsp::apply_matrix3d_mp1(&x, &st[i].pos);
            float *dst = &out[i * 8];
            dst[0] = o.x; dst[1] = o.y; dst[2] = o.z;
            dst[3] = x.x - o.x; dst[4] = x.y - o.y; dst[5] = x.z - o.z;
            dst[6] = st[i].radius;
            dst[7] = float(st[i].type);
        }
        return 0;
    }

    /* Genuine Sample editing ops (Sample.cpp): op 0 insert(a0,a1),
     * 1 append(a0), 2 prepend(a0), 3 remove(a0,a1), 4 reverse(),
     * 5 normalize(a0, mode a1), 6 apply_gain(a0, first a1, count a2),
     * 7 resample(a0), 8 stretch(new_len a0, chunk a1, fade_type a2,
     * fade_size a3).  Returns the edited data + new length/rate. */
    int ref_sample_edit(const float *data, int len, uint32_t sr,
                        uint32_t op, float a0, float a1, float a2,
                        float a3, float *out, int out_cap, int *out_len,
                        int *out_sr)
    {
        dspu::Sample s;
        if (!s.init(1, len, len))
            return -1;
        for (int i = 0; i < len; ++i)
            s.channel(0)[i] = data[i];
        s.set_sample_rate(sr);
        lsp::status_t res = lsp::STATUS_OK;
        switch (op)
        {
            case 0: res = s.insert(size_t(a0), size_t(a1)); break;
            case 1: res = s.append(size_t(a0)); break;
            case 2: res = s.prepend(size_t(a0)); break;
            case 3: res = s.remove(size_t(a0), size_t(a1)); break;
            case 4: s.reverse(); break;
            case 5: s.normalize(a0, (dspu::sample_normalize_t) (int) a1);
                break;
            case 6: res = s.apply_gain(a0, size_t(a1), size_t(a2)); break;
            case 7: res = s.resample(size_t(a0)); break;
            case 8: res = s.stretch(size_t(a0), size_t(a1),
                                    (dspu::sample_crossfade_t) (int) a2,
                                    a3); break;
            default: return -2;
        }
        if (res != lsp::STATUS_OK)
            return -3;
        int n = (int) s.length();
        *out_len = n;
        *out_sr = (int) s.sample_rate();
        const float *cd = s.channel(0);
        for (int i = 0; i < n && i < out_cap; ++i)
            out[i] = cd[i];
        return 0;
    }

    /* Genuine Sample WAV save/load round trip (Sample.cpp save_range /
     * loads over the float32-WAV stream stubs). */
    int ref_sample_wav_roundtrip(const float *data, int len, int channels,
                                 uint32_t sr, const char *path,
                                 float *out, int out_cap, int *out_len,
                                 int *out_channels, int *out_sr)
    {
        dspu::Sample s;
        if (!s.init(channels, len, len))
            return -1;
        for (int c = 0; c < channels; ++c)
            for (int i = 0; i < len; ++i)
                s.channel(c)[i] = data[c * len + i];
        s.set_sample_rate(sr);
        ssize_t saved = s.save(path);
        if (saved < 0)
            return -2;
        dspu::Sample l;
        lsp::status_t res = l.load(path);
        if (res != lsp::STATUS_OK)
            return -3;
        *out_len = (int) l.length();
        *out_channels = (int) l.channels();
        *out_sr = (int) l.sample_rate();
        for (int c = 0; c < (int) l.channels(); ++c)
        {
            const float *cd = l.channel(c);
            for (int i = 0; i < (int) l.length(); ++i)
            {
                int idx = c * (int) l.length() + i;
                if (idx < out_cap)
                    out[idx] = cd[i];
            }
        }
        return 0;
    }

    /* Genuine SyncChirpProcessor (SyncChirpProcessor.cpp): synthesize
     * the Farina chirp, convolve it with a known IR (the simulated
     * measurement), deconvolve via do_linear_convolutions, then
     * postprocess (background noise profile + backward integration +
     * RT regression).  Returns the chirp, the middle-centered
     * convolution result, and [RT seconds, correlation, IL seconds]. */
    int ref_sync_chirp(uint32_t sr, double f0, double f1, float duration,
                       float amplitude, uint32_t fade_method,
                       float fade_in, float fade_out, const float *ir,
                       int ir_len, uint32_t rt_calc, float window_size,
                       float tolerance,
                       float *chirp_out, int chirp_cap, int *chirp_len,
                       float *conv_out, int conv_cap, int *conv_len,
                       float *rt_out /* [4]: rt_s, corr, il_s, rt_smp */)
    {
        dspu::SyncChirpProcessor scp;
        if (!scp.init())
            return -1;
        scp.set_sample_rate(sr);
        scp.set_chirp_synthesis_method(dspu::SCP_SYNTH_SIMPLE);
        scp.set_chirp_initial_frequency(f0);
        scp.set_chirp_final_frequency(f1);
        scp.set_chirp_duration(duration);
        scp.set_chirp_amplitude(amplitude);
        scp.set_fader_fading_method((dspu::scp_fade_t) fade_method);
        scp.set_fader_fadein(fade_in);
        scp.set_fader_fadeout(fade_out);
        lsp::status_t res = scp.reconfigure();
        if (res != lsp::STATUS_OK)
            return -2;

        dspu::Sample *chirp = scp.get_chirp();
        if ((chirp == NULL) || (!chirp->valid()))
            return -3;
        const float *cd = chirp->channel(0);
        int cl = (int) chirp->length();
        *chirp_len = cl;
        for (int i = 0; i < cl && i < chirp_cap; ++i)
            chirp_out[i] = cd[i];

        /* simulated measurement: response = chirp (*) ir */
        int rl = cl + ir_len - 1;
        dspu::Sample resp;
        if (!resp.init(1, rl, rl))
            return -4;
        float *rd = resp.channel(0);
        for (int i = 0; i < cl; ++i)
        {
            float v = cd[i];
            if (v == 0.0f)
                continue;
            for (int j = 0; j < ir_len; ++j)
                rd[i + j] += v * ir[j];
        }

        dspu::Sample *data[1];
        size_t offsets[1] = {0};
        data[0] = &resp;
        res = scp.do_linear_convolutions(data, offsets, 1, 1 << 15);
        if (res != lsp::STATUS_OK)
            return -5;

        dspu::Sample *cr = scp.get_convolution_result();
        if (cr == NULL)
            return -6;
        int n = (int) cr->length();
        *conv_len = n;
        const float *cv = cr->channel(0);
        for (int i = 0; i < n && i < conv_cap; ++i)
            conv_out[i] = cv[i];

        res = scp.postprocess_linear_convolution(
            0, 0, (dspu::scp_rtcalc_t) rt_calc, window_size, tolerance);
        if (res != lsp::STATUS_OK)
            return -7;
        rt_out[0] = scp.get_reverberation_time_seconds();
        rt_out[1] = scp.get_reverberation_correlation();
        rt_out[2] = scp.get_integration_limit_seconds();
        rt_out[3] = (float) scp.get_reverberation_time_samples();
        scp.destroy();
        return 0;
    }

    /* Genuine LatencyDetector (LatencyDetector.cpp): emits its chirp
     * through process_out, we loop it back through a `true_delay`
     * sample delay line with gain into process_in. */
    int ref_latency_detector(uint32_t sr, float duration, int true_delay,
                             float gain, float abs_thresh,
                             float peak_thresh, int n, int block,
                             int *latency)
    {
        dspu::LatencyDetector ld;
        ld.init();
        ld.set_sample_rate(sr);
        ld.set_duration(duration);
        ld.set_abs_threshold(abs_thresh);
        ld.set_peak_threshold(peak_thresh);
        ld.start_capture();

        std::vector<float> dline(true_delay, 0.0f);
        std::vector<float> out(block), in(block);
        size_t dpos = 0;
        *latency = -1;
        for (int off = 0; off < n; off += block)
        {
            /* feed back the PREVIOUS output through the delay line */
            for (int i = 0; i < block; ++i)
            {
                float v = (true_delay > 0) ? dline[dpos] : out[i];
                if (true_delay > 0)
                    dline[dpos] = out[i];
                in[i] = v * gain;
                if (true_delay > 0)
                    dpos = (dpos + 1) % true_delay;
            }
            ld.process(out.data(), in.data(), block);
            if (ld.latency_detected())
            {
                *latency = (int) ld.get_latency_samples();
                return 0;
            }
        }
        return 0;
    }

    /* Genuine Analyzer (Analyzer.cpp): N channels of input, returns
     * the per-channel spectrum estimate at the given FFT rank. */
    int ref_analyzer(uint32_t channels, uint32_t rank, uint32_t sr,
                     float rate, float reactivity, uint32_t window,
                     uint32_t envelope, float shift, const float *x,
                     int n, int block, float *spectra /* [C][1<<rank>>1] */)
    {
        dspu::Analyzer an;
        if (!an.init(channels, rank, sr, rate))
            return -1;
        an.set_sample_rate(sr);
        an.set_rank(rank);
        an.set_rate(rate);
        an.set_reactivity(reactivity);
        an.set_window(window);
        an.set_envelope(envelope);
        an.set_shift(shift);
        an.set_activity(true);
        for (size_t c = 0; c < channels; ++c)
            an.enable_channel(c, true);

        std::vector<const float *> ins(channels);
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            for (size_t c = 0; c < channels; ++c)
                ins[c] = x + size_t(c) * size_t(n) + off;
            an.process(ins.data(), todo);
        }

        const size_t bins = (size_t(1) << rank) >> 1;
        std::vector<uint32_t> idx(bins);
        for (size_t i = 0; i < bins; ++i)
            idx[i] = uint32_t(i);
        for (size_t c = 0; c < channels; ++c)
        {
            if (!an.get_spectrum(c, spectra + c * bins, idx.data(), bins))
                return -2;
        }
        return 0;
    }

    /* Genuine ResponseTaker (ResponseTaker.cpp): plays a test sample
     * through process_out, records the loopback through process_in,
     * returns the captured response. */
    int ref_response_taker(uint32_t sr, const float *test, int test_len,
                           int true_delay, float gain, int latency_hint,
                           int n, int block, float *captured, int cap_len,
                           int *cap_out_len)
    {
        dspu::Sample tsample;
        if (!tsample.init(1, test_len, test_len))
            return -1;
        for (int i = 0; i < test_len; ++i)
            tsample.channel(0)[i] = test[i];

        dspu::ResponseTaker rt;
        rt.init();
        rt.set_sample_rate(sr);
        rt.set_latency_samples(latency_hint);
        if (rt.reconfigure(&tsample) != lsp::STATUS_OK)
            return -2;
        rt.start_capture();

        std::vector<float> dline(true_delay, 0.0f);
        std::vector<float> out(block), in(block);
        size_t dpos = 0;
        for (int off = 0; off < n; off += block)
        {
            for (int i = 0; i < block; ++i)
            {
                float v = (true_delay > 0) ? dline[dpos] : out[i];
                if (true_delay > 0)
                    dline[dpos] = out[i];
                in[i] = v * gain;
                if (true_delay > 0)
                    dpos = (dpos + 1) % true_delay;
            }
            rt.process(out.data(), in.data(), block);
            if (rt.cycle_complete())
                break;
        }

        dspu::Sample *cap = rt.get_capture();
        if (cap == NULL || !cap->valid())
            return -3;
        int m = (int) cap->length();
        *cap_out_len = m;
        const float *cd = cap->channel(0);
        for (int i = 0; i < m && i < cap_len; ++i)
            captured[i] = cd[i];
        rt.destroy();
        return 0;
    }

    /* Genuine SamplePlayer + helpers/playback + helpers/batch
     * (SamplePlayer.cpp:305-412, helpers/playback.cpp loop-pass
     * planning + stop/cancel gating, helpers/batch.cpp fades): one
     * mono sample, one playback with full PlaySettings, optional
     * stop()/cancel() at given block offsets. */
    int ref_sample_player(const float *data, int sample_len,
                          uint32_t loop_mode, uint32_t xfade_type,
                          uint32_t xfade_len, uint32_t start, int reverse,
                          uint32_t loop_start, uint32_t loop_end,
                          float volume, uint32_t delay,
                          int stop_at, uint32_t stop_delay,
                          int cancel_at, uint32_t cancel_fadeout,
                          uint32_t cancel_delay,
                          float *out, int n, int block)
    {
        dspu::Sample *s = new dspu::Sample();
        if (!s->init(1, sample_len, sample_len))
            return -1;
        for (int i = 0; i < sample_len; ++i)
            s->channel(0)[i] = data[i];

        dspu::SamplePlayer sp;
        if (!sp.init(1, 4))
            return -2;
        sp.bind(0, s);

        dspu::PlaySettings ps;
        ps.set_channel(0, 0);
        ps.set_volume(volume);
        ps.set_delay(delay);
        ps.set_start(start, reverse != 0);
        ps.set_loop_range((dspu::sample_loop_t) loop_mode, loop_start,
                          loop_end);
        ps.set_loop_xfade((dspu::sample_crossfade_t) xfade_type,
                          xfade_len);
        dspu::Playback pb = sp.play(&ps);
        if (!pb.valid())
            return -3;

        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            if (stop_at >= 0 && off >= stop_at
                && off < stop_at + block)
                pb.stop(stop_delay);
            if (cancel_at >= 0 && off >= cancel_at
                && off < cancel_at + block)
                pb.cancel(cancel_fadeout, cancel_delay);
            int todo = (n - off) < block ? (n - off) : block;
            sp.process(out + off, todo);
        }
        sp.destroy();   /* unbinds + gc's the sample */
        return 0;
    }

    /* Genuine Oscillator (Oscillator.cpp): all fg_function_t modes.
     * params = [frequency, amplitude, dc_offset, init_phase, dc_ref,
     * duty, width, raise, fall, pos_width, neg_width, par_width,
     * invert] */
    int ref_oscillator(uint32_t function, uint32_t sr, uint32_t over_mode,
                       const float *p, float *out, int n, int block)
    {
        dspu::Oscillator osc;
        if (!osc.init())
            return -1;
        osc.set_sample_rate(sr);
        osc.set_function((dspu::fg_function_t) function);
        osc.set_frequency(p[0]);
        osc.set_amplitude(p[1]);
        osc.set_dc_offset(p[2]);
        osc.set_phase(p[3]);
        osc.set_dc_reference((dspu::dc_reference_t) (int) p[4]);
        osc.set_duty_ratio(p[5]);
        osc.set_width(p[6]);
        osc.set_trapezoid_ratios(p[7], p[8]);
        osc.set_pulsetrain_ratios(p[9], p[10]);
        osc.set_parabolic_width(p[11]);
        osc.set_squared_sinusoid_inversion(p[12] != 0.0f);
        osc.set_parabolic_inversion(p[12] != 0.0f);
        osc.set_oversampler_mode((dspu::over_mode_t) over_mode);
        osc.update_settings();
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            osc.process_overwrite(out + off, todo);
        }
        osc.destroy();
        return 0;
    }

    /* Genuine TruePeakMeter (TruePeakMeter.cpp:85-186): per-sample
     * true-peak envelope via the smallest >=192k Lanczos oversampler. */
    int ref_true_peak(uint32_t sr, const float *x, float *env, int n,
                      int block)
    {
        dspu::TruePeakMeter tp;
        if (!tp.init())
            return -1;
        tp.set_sample_rate(sr);
        tp.update_settings();
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            tp.process(env + off, x + off, todo);
        }
        return 0;
    }

    /* Genuine ADSREnvelope (ADSREnvelope.cpp:124-330).  Curve rows:
     * [time, curve, function] for attack/decay/slope/release;
     * hold_time/break_level apply when use_hold/use_break set. */
    int ref_adsr(const float *curves /* 4 x [time, curve, func] */,
                 float hold_time, int use_hold,
                 float break_level, int use_break,
                 float sustain_level,
                 const float *t, float *out, int n)
    {
        dspu::ADSREnvelope env;
        env.set_attack(curves[0], curves[1],
                       (dspu::ADSREnvelope::function_t) (int) curves[2]);
        env.set_decay(curves[3], curves[4],
                      (dspu::ADSREnvelope::function_t) (int) curves[5]);
        env.set_slope(curves[6], curves[7],
                      (dspu::ADSREnvelope::function_t) (int) curves[8]);
        env.set_release(curves[9], curves[10],
                        (dspu::ADSREnvelope::function_t) (int) curves[11]);
        env.set_hold(hold_time, use_hold != 0);
        env.set_break(break_level, use_break != 0);
        env.set_sustain_level(sustain_level);
        env.process(out, t, n);
        return 0;
    }

    /* Genuine Trigger (Trigger.cpp): stream x one sample at a time,
     * record the post-sample state (0 waiting / 1 armed / 2 fired). */
    int ref_trigger(uint32_t mode, uint32_t type, float threshold,
                    float hysteresis, uint32_t hold_samples,
                    const float *x, int32_t *state_out, int n)
    {
        dspu::Trigger trg;
        trg.set_trigger_mode((dspu::trg_mode_t) mode);
        trg.set_trigger_type((dspu::trg_type_t) type);
        trg.set_trigger_threshold(threshold);
        trg.set_trigger_hysteresis(hysteresis);
        trg.set_trigger_hold_samples(hold_samples);
        trg.update_settings();
        for (int i = 0; i < n; ++i)
        {
            trg.single_sample_processor(x[i]);
            state_out[i] = (int32_t) trg.get_trigger_state();
        }
        return 0;
    }

    /* Genuine MeterGraph (MeterGraph.cpp): stream x (in `block` chunks
     * through the vector path), then read the frame history. */
    int ref_meter_graph(uint32_t method, uint32_t period, uint32_t frames,
                        const float *x, float gain, int use_gain, int n,
                        int block, float *frames_out, int n_frames)
    {
        dspu::MeterGraph mg;
        if (!mg.init(frames, period))
            return -1;
        mg.set_method((dspu::meter_method_t) method);
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            if (use_gain)
                mg.process(x + off, gain, todo);
            else
                mg.process(x + off, todo);
        }
        mg.read(frames_out, n_frames);
        return 0;
    }

    /* Genuine ScaledMeterGraph (ScaledMeterGraph.cpp): subsampling
     * cascade version. */
    int ref_scaled_meter_graph(uint32_t method, uint32_t subsampling,
                               uint32_t period, uint32_t frames,
                               const float *x, float gain, int n,
                               int block, float *frames_out, int n_frames)
    {
        dspu::ScaledMeterGraph mg;
        if (!mg.init(frames, subsampling, period))
            return -1;
        mg.set_method((dspu::meter_method_t) method);
        mg.set_period(period);
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            mg.process(x + off, gain, todo);
        }
        mg.read(frames_out, n_frames);
        return 0;
    }

    /* Genuine DynamicDelay (DynamicDelay.cpp): per-sample delay,
     * gain and feedback arrays. */
    int ref_dynamic_delay(uint32_t max_delay, const float *x,
                          const float *delay, const float *fgain,
                          const float *fdelay, float *out, int n,
                          int block)
    {
        dspu::DynamicDelay d;
        if (d.init(max_delay) != lsp::STATUS_OK)
            return -1;
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            d.process(out + off, x + off, delay + off, fgain + off,
                      fdelay + off, todo);
        }
        d.destroy();
        return 0;
    }

    /* Genuine Depopper (Depopper.cpp): fade state machine; returns the
     * envelope and gain tracks. */
    int ref_depopper(uint32_t srate,
                     uint32_t fade_in_mode, float fade_in_thresh,
                     float fade_in_time, float fade_in_delay,
                     uint32_t fade_out_mode, float fade_out_thresh,
                     float fade_out_time, float fade_out_delay,
                     float rms_ms,
                     const float *x, float *env, float *gain,
                     int n, int block)
    {
        dspu::Depopper dp;
        if (!dp.init(srate, lsp_max(fade_in_time, fade_out_time)
                     + fade_in_delay + fade_out_delay + 50.0f,
                     rms_ms + 10.0f))
            return -1;
        dp.set_fade_in_mode((dspu::depopper_mode_t) fade_in_mode);
        dp.set_fade_in_threshold(fade_in_thresh);
        dp.set_fade_in_time(fade_in_time);
        dp.set_fade_in_delay(fade_in_delay);
        dp.set_fade_out_mode((dspu::depopper_mode_t) fade_out_mode);
        dp.set_fade_out_threshold(fade_out_thresh);
        dp.set_fade_out_time(fade_out_time);
        dp.set_fade_out_delay(fade_out_delay);
        dp.set_rms_length(rms_ms);
        dp.reconfigure();
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            dp.process(env + off, gain + off, x + off, todo);
        }
        return 0;
    }

    /* Genuine ShiftBuffer scripted ops: op 0 = append k samples from
     * feed, op 1 = shift k samples into sink, op 2 = single-sample
     * process(feed[0]) -> sink.  Returns final size. */
    int ref_shift_buffer(uint32_t capacity, uint32_t gap,
                         const int32_t *ops, const int32_t *counts,
                         int n_ops, const float *feed, float *sink,
                         int *out_size)
    {
        dspu::ShiftBuffer sb;
        if (!sb.init(capacity, gap))
            return -1;
        const float *fp = feed;
        float *sp = sink;
        for (int i = 0; i < n_ops; ++i)
        {
            int k = counts[i];
            switch (ops[i])
            {
                case 0: fp += sb.append(fp, k); break;
                case 1: sp += sb.shift(sp, k); break;
                default: *sp++ = sb.process(*fp++); break;
            }
        }
        *out_size = (int) sb.size();
        sb.destroy();
        return 0;
    }
}

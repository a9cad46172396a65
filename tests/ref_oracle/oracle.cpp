/* Reference-in-the-loop oracle: compiles the REAL reference filter
 * design layer (/root/reference/src/main/filters/Filter.cpp — 2471 LoC
 * of analog-prototype + bilinear/matched-Z design math) against the
 * stub headers in stubs/, and exposes a C ABI so pytest can compare
 * this framework's design.py coefficient-by-coefficient and output-
 * by-output against the genuine implementation (BASELINE.md north
 * star: >=95 dB SNR vs reference output).
 *
 * The reference .cpp files are compiled IN PLACE from /root/reference
 * (never copied); this file only implements the lsp-dsp-lib scalar
 * kernels they call (documented generic biquad DF2-transposed form
 * with sign-negated feedback, per Filter.cpp:2259-2266 "Sign negated")
 * and the extraction entry points.
 */

#include <lsp-plug.in/dsp/dsp.h>
#include <lsp-plug.in/dsp-units/filters/Filter.h>
#include <lsp-plug.in/dsp-units/filters/FilterBank.h>
#include <lsp-plug.in/dsp-units/dynamics/Compressor.h>
#include <lsp-plug.in/dsp-units/dynamics/Expander.h>
#include <lsp-plug.in/dsp-units/dynamics/Gate.h>
#include <lsp-plug.in/dsp-units/dynamics/Limiter.h>
#include <lsp-plug.in/dsp-units/filters/Equalizer.h>
#include <lsp-plug.in/dsp-units/util/Convolver.h>
#include <lsp-plug.in/dsp-units/util/Randomizer.h>
#include <lsp-plug.in/dsp-units/util/Sidechain.h>
#include <lsp-plug.in/dsp-units/noise/LCG.h>
#include <lsp-plug.in/dsp-units/noise/MLS.h>
#include <lsp-plug.in/dsp-units/noise/Velvet.h>
#include <lsp-plug.in/dsp-units/misc/windows.h>
#include <lsp-plug.in/dsp-units/misc/lfo.h>
#include <lsp-plug.in/dsp-units/misc/sigmoid.h>
#include <lsp-plug.in/dsp-units/misc/fade.h>
#include <lsp-plug.in/dsp-units/misc/envelope.h>
#include <lsp-plug.in/dsp-units/misc/fft_crossover.h>
#include <lsp-plug.in/dsp-units/stat/QuantizedCounter.h>
#include <lsp-plug.in/dsp-units/filters/SpectralTilt.h>
#include <lsp-plug.in/dsp-units/filters/ButterworthFilter.h>
#include <lsp-plug.in/dsp-units/dynamics/DynamicProcessor.h>
#include <lsp-plug.in/dsp-units/dynamics/AutoGain.h>
#include <lsp-plug.in/dsp-units/dynamics/SimpleAutoGain.h>
#include <lsp-plug.in/dsp-units/dynamics/SurgeProtector.h>
#include <lsp-plug.in/dsp-units/util/Crossover.h>
#include <lsp-plug.in/dsp-units/meters/Correlometer.h>
#include <lsp-plug.in/dsp-units/meters/Panometer.h>
#include <lsp-plug.in/dsp-units/meters/LoudnessMeter.h>
#include <lsp-plug.in/dsp-units/meters/ILUFSMeter.h>

#include <math.h>
#include <string.h>

namespace lsp
{
    namespace dsp
    {
        void fill_zero(float *dst, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = 0.0f;
        }

        void fill_one(float *dst, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = 1.0f;
        }

        void copy(float *dst, const float *src, size_t count)
        {
            if (dst != src)
                memmove(dst, src, count * sizeof(float));
        }

        void mul_k3(float *dst, const float *src, float k, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = src[i] * k;
        }

        /* DF2-transposed with feedback coefficients stored negated:
         *   y    = b0*x + d0
         *   d0   = d1 + b1*x + a1*y
         *   d1   =      b2*x + a2*y
         */
        static inline float bq_step(float s, float b0, float b1, float b2,
                                    float a1, float a2, float *d)
        {
            float s2 = b0 * s + d[0];
            d[0] = d[1] + b1 * s + a1 * s2;
            d[1] = b2 * s + a2 * s2;
            return s2;
        }

        void biquad_process_x1(float *dst, const float *src, size_t count,
                               biquad_t *f)
        {
            const biquad_x1_t *q = &f->x1;
            for (size_t i = 0; i < count; ++i)
                dst[i] = bq_step(src[i], q->b0, q->b1, q->b2,
                                 q->a1, q->a2, f->d);
        }

        void biquad_process_x2(float *dst, const float *src, size_t count,
                               biquad_t *f)
        {
            const biquad_x2_t *q = &f->x2;
            for (size_t i = 0; i < count; ++i)
            {
                float s = src[i];
                for (int k = 0; k < 2; ++k)
                    s = bq_step(s, q->b0[k], q->b1[k], q->b2[k],
                                q->a1[k], q->a2[k], &f->d[2 * k]);
                dst[i] = s;
            }
        }

        void biquad_process_x4(float *dst, const float *src, size_t count,
                               biquad_t *f)
        {
            const biquad_x4_t *q = &f->x4;
            for (size_t i = 0; i < count; ++i)
            {
                float s = src[i];
                for (int k = 0; k < 4; ++k)
                    s = bq_step(s, q->b0[k], q->b1[k], q->b2[k],
                                q->a1[k], q->a2[k], &f->d[2 * k]);
                dst[i] = s;
            }
        }

        void biquad_process_x8(float *dst, const float *src, size_t count,
                               biquad_t *f)
        {
            const biquad_x8_t *q = &f->x8;
            for (size_t i = 0; i < count; ++i)
            {
                float s = src[i];
                for (int k = 0; k < 8; ++k)
                    s = bq_step(s, q->b0[k], q->b1[k], q->b2[k],
                                q->a1[k], q->a2[k], &f->d[2 * k]);
                dst[i] = s;
            }
        }

        static inline void transfer_one(const f_cascade_t *c, float w,
                                        float *re, float *im)
        {
            float w2 = w * w;
            float nr = c->t[0] - c->t[2] * w2;
            float ni = c->t[1] * w;
            float dr = c->b[0] - c->b[2] * w2;
            float di = c->b[1] * w;
            float k = 1.0f / (dr * dr + di * di);
            *re = (nr * dr + ni * di) * k;
            *im = (ni * dr - nr * di) * k;
        }

        void filter_transfer_calc_ri(float *re, float *im,
                                     const f_cascade_t *c,
                                     const float *freq, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                transfer_one(c, freq[i], &re[i], &im[i]);
        }

        void filter_transfer_apply_ri(float *re, float *im,
                                      const f_cascade_t *c,
                                      const float *freq, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                float hr, hi;
                transfer_one(c, freq[i], &hr, &hi);
                float r = re[i] * hr - im[i] * hi;
                im[i] = re[i] * hi + im[i] * hr;
                re[i] = r;
            }
        }

        void filter_transfer_calc_pc(float *ri, const f_cascade_t *c,
                                     const float *freq, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                transfer_one(c, freq[i], &ri[2 * i], &ri[2 * i + 1]);
        }

        void filter_transfer_apply_pc(float *ri, const f_cascade_t *c,
                                      const float *freq, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                float hr, hi;
                transfer_one(c, freq[i], &hr, &hi);
                float r = ri[2 * i] * hr - ri[2 * i + 1] * hi;
                ri[2 * i + 1] = ri[2 * i] * hi + ri[2 * i + 1] * hr;
                ri[2 * i] = r;
            }
        }

        void pcomplex_fill_ri(float *dst, float re, float im, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                dst[2 * i] = re;
                dst[2 * i + 1] = im;
            }
        }

        void move(float *dst, const float *src, size_t count)
        {
            memmove(dst, src, count * sizeof(float));
        }

        void add2(float *dst, const float *src, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] += src[i];
        }

        void mul2(float *dst, const float *src, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] *= src[i];
        }

        void mul3(float *dst, const float *a, const float *b, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = a[i] * b[i];
        }

        void mul_k2(float *dst, float k, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] *= k;
        }

        void fmadd3(float *dst, const float *a, const float *b, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] += a[i] * b[i];
        }

        void fmadd_k3(float *dst, const float *src, float k, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] += src[i] * k;
        }

        void abs_mul3(float *dst, const float *a, const float *b,
                      size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = fabsf(a[i] * b[i]);
        }

        size_t max_index(const float *src, size_t count)
        {
            size_t idx = 0;
            for (size_t i = 1; i < count; ++i)
                if (src[i] > src[idx])
                    idx = i;
            return idx;
        }

        /* knee kernels: exact scalar mirrors of the reference's own
         * in-repo evaluations — Compressor::process(float*,float)
         * (Compressor.cpp:297-310), Gate::amplification/curve
         * (Gate.cpp:213-260), Expander::amplification/curve
         * (Expander.cpp:333-390). */
        static inline float comp_knee_gain(const compressor_knee_t *k,
                                           float x, float lx)
        {
            if (x <= k->start)
                return k->gain;
            if (x >= k->end)
                return expf(lx * k->tilt[0] + k->tilt[1]);
            return expf((k->herm[0] * lx + k->herm[1]) * lx + k->herm[2]);
        }

        void compressor_x2_gain(float *dst, const float *src,
                                const compressor_x2_t *c, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                float x = fabsf(src[i]);
                if ((x <= c->k[0].start) && (x <= c->k[1].start))
                {
                    dst[i] = c->k[0].gain * c->k[1].gain;
                    continue;
                }
                float lx = logf(x);
                dst[i] = comp_knee_gain(&c->k[0], x, lx)
                       * comp_knee_gain(&c->k[1], x, lx);
            }
        }

        void compressor_x2_curve(float *dst, const float *src,
                                 const compressor_x2_t *c, size_t count)
        {
            compressor_x2_gain(dst, src, c, count);
            for (size_t i = 0; i < count; ++i)
                dst[i] *= fabsf(src[i]);
        }

        static inline float gate_gain(const gate_knee_t *c, float x)
        {
            if (x <= c->start)
                return c->gain_start;
            if (x >= c->end)
                return c->gain_end;
            float lx = logf(x);
            return expf(((c->herm[0] * lx + c->herm[1]) * lx
                         + c->herm[2]) * lx + c->herm[3]);
        }

        void gate_x1_gain(float *dst, const float *src,
                          const gate_knee_t *c, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = gate_gain(c, fabsf(src[i]));
        }

        void gate_x1_curve(float *dst, const float *src,
                           const gate_knee_t *c, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                float x = fabsf(src[i]);
                dst[i] = x * gate_gain(c, x);
            }
        }

        static inline float uexp_gain(const expander_knee_t *c, float x)
        {
            if (x > c->threshold)
                x = c->threshold;
            if (x <= c->start)
                return 1.0f;
            float lx = logf(x);
            return (x >= c->end)
                ? expf(c->tilt[0] * lx + c->tilt[1])
                : expf((c->herm[0] * lx + c->herm[1]) * lx + c->herm[2]);
        }

        void uexpander_x1_gain(float *dst, const float *src,
                               const expander_knee_t *c, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = uexp_gain(c, fabsf(src[i]));
        }

        void uexpander_x1_curve(float *dst, const float *src,
                                const expander_knee_t *c, size_t count)
        {
            /* mirrors Expander::curve: the knee input is clamped to the
             * threshold and the CLAMPED x multiplies the gain */
            for (size_t i = 0; i < count; ++i)
            {
                float x = fabsf(src[i]);
                if (x > c->threshold)
                    x = c->threshold;
                dst[i] = x * uexp_gain(c, x);
            }
        }

        static inline float dexp_gain(const expander_knee_t *c, float x)
        {
            if (x < c->threshold)
                return 0.0f;
            if (x >= c->end)
                return 1.0f;
            float lx = logf(x);
            return (x <= c->start)
                ? expf(c->tilt[0] * lx + c->tilt[1])
                : expf((c->herm[0] * lx + c->herm[1]) * lx + c->herm[2]);
        }

        void dexpander_x1_gain(float *dst, const float *src,
                               const expander_knee_t *c, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = dexp_gain(c, fabsf(src[i]));
        }

        void dexpander_x1_curve(float *dst, const float *src,
                                const expander_knee_t *c, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                float x = fabsf(src[i]);
                dst[i] = x * dexp_gain(c, x);
            }
        }
    } /* namespace dsp */
} /* namespace lsp */

/* ------------------------------------------------------------------ */
/* C ABI for the pytest harness                                        */
/* ------------------------------------------------------------------ */

using namespace lsp;

static void fill_params(dspu::filter_params_t *fp, uint32_t type,
                        uint32_t slope, float freq, float freq2,
                        float gain, float quality)
{
    fp->nType = type;
    fp->nSlope = slope;
    fp->fFreq = freq;
    fp->fFreq2 = freq2;
    fp->fGain = gain;
    fp->fQuality = quality;
}

extern "C"
{
    /* Design a filter; write up to max_biquads rows of
     * [b0,b1,b2,a1,a2] into out.  Returns the biquad count. */
    int ref_filter_design(uint32_t type, uint32_t slope, float freq,
                          float freq2, float gain, float quality,
                          uint32_t sr, float *out, int max_biquads,
                          int *latency)
    {
        dspu::FilterBank bank;
        if (!bank.init(256))
            return -1;
        dspu::Filter flt;
        if (!flt.init(&bank))
            return -1;
        dspu::filter_params_t fp;
        fill_params(&fp, type, slope, freq, freq2, gain, quality);
        flt.update(sr, &fp);
        bank.begin();
        flt.rebuild();
        bank.end(true);
        int n = (int) bank.size();
        for (int i = 0; i < n && i < max_biquads; ++i)
        {
            const dsp::biquad_x1_t *c = bank.chain(i);
            out[5 * i + 0] = c->b0;
            out[5 * i + 1] = c->b1;
            out[5 * i + 2] = c->b2;
            out[5 * i + 3] = c->a1;
            out[5 * i + 4] = c->a2;
        }
        if (latency != nullptr)
            *latency = (int) flt.latency();
        flt.destroy();
        bank.destroy();
        return n;
    }

    /* Design + stream-process n samples in `block`-sized chunks
     * through the genuine Filter::process path. */
    int ref_filter_process(uint32_t type, uint32_t slope, float freq,
                           float freq2, float gain, float quality,
                           uint32_t sr, const float *in, float *out,
                           int n, int block)
    {
        dspu::Filter flt;
        if (!flt.init(nullptr))
            return -1;
        dspu::filter_params_t fp;
        fill_params(&fp, type, slope, freq, freq2, gain, quality);
        flt.update(sr, &fp);
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            flt.process(out + off, in + off, todo);
        }
        flt.destroy();
        return 0;
    }

    /* Run an ARBITRARY biquad cascade (rows of [b0,b1,b2,a1,a2],
     * a-negated) through the same scalar float32 DF2T kernel the
     * oracle uses — lets tests measure the float32 recurrence noise of
     * their own coefficients as a self-calibrating SNR bound. */
    int ref_cascade_process(const float *coeffs, int n_bq,
                            const float *in, float *out, int n)
    {
        dsp::biquad_t bq;
        const float *src = in;
        for (int k = 0; k < n_bq; ++k)
        {
            bq.x1.b0 = coeffs[5 * k + 0];
            bq.x1.b1 = coeffs[5 * k + 1];
            bq.x1.b2 = coeffs[5 * k + 2];
            bq.x1.a1 = coeffs[5 * k + 3];
            bq.x1.a2 = coeffs[5 * k + 4];
            dsp::fill_zero(bq.d, LSP_DSP_BIQUAD_D_ITEMS);
            dsp::biquad_process_x1(out, src, n, &bq);
            src = out;
        }
        if (n_bq == 0)
            dsp::copy(out, in, n);
        return 0;
    }

    /* --- remaining dynamics + filter units --- */

    int ref_spectral_tilt(uint32_t order, float slope, uint32_t slope_unit,
                          uint32_t norm, float lower, float upper,
                          uint32_t sr, const float *in, float *out, int n,
                          int block)
    {
        dspu::SpectralTilt st;
        st.init();
        st.set_order(order);
        st.set_slope(slope, (dspu::stlt_slope_unit_t) slope_unit);
        st.set_norm((dspu::stlt_norm_t) norm);
        /* NOTE reference-verbatim BUG: set_frequency_range's normalizing
         * swap is inverted (SpectralTilt.cpp: `if (upper > lower)
         * lsp::swap(upper, lower)`), so any sane (lower, upper) call
         * ends up reversed and update_settings resets BOTH to the
         * 0.1 Hz / 20 kHz defaults -- the combined setter can never set
         * a custom range upstream.  The individual setters work; the
         * oracle uses them so the INTENDED design is compared. */
        st.set_lower_frequency(lower);
        st.set_upper_frequency(upper);
        st.set_sample_rate(sr);
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            st.process_overwrite(out + off, in + off, todo);
        }
        return 0;
    }

    int ref_spectral_tilt_chart(uint32_t order, float slope,
                                uint32_t slope_unit, uint32_t norm,
                                float lower, float upper, uint32_t sr,
                                const float *freqs, float *re, float *im,
                                int n)
    {
        dspu::SpectralTilt st;
        st.init();
        st.set_order(order);
        st.set_slope(slope, (dspu::stlt_slope_unit_t) slope_unit);
        st.set_norm((dspu::stlt_norm_t) norm);
        /* NOTE reference-verbatim BUG: set_frequency_range's normalizing
         * swap is inverted (SpectralTilt.cpp: `if (upper > lower)
         * lsp::swap(upper, lower)`), so any sane (lower, upper) call
         * ends up reversed and update_settings resets BOTH to the
         * 0.1 Hz / 20 kHz defaults -- the combined setter can never set
         * a custom range upstream.  The individual setters work; the
         * oracle uses them so the INTENDED design is compared. */
        st.set_lower_frequency(lower);
        st.set_upper_frequency(upper);
        st.set_sample_rate(sr);
        st.freq_chart(re, im, freqs, n);
        return 0;
    }

    int ref_butterworth(uint32_t type, uint32_t order, float cutoff,
                        uint32_t sr, const float *in, float *out, int n,
                        int block)
    {
        dspu::ButterworthFilter bw;
        bw.init();
        bw.set_filter_type((dspu::bw_filt_type_t) type);
        bw.set_order(order);
        bw.set_cutoff_frequency(cutoff);
        bw.set_sample_rate(sr);
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            bw.process_overwrite(out + off, in + off, todo);
        }
        return 0;
    }

    /* dots = 4 rows of [in, out, knee]; levels/times = 4 floats each */
    int ref_dynproc_process(const float *dots, const float *atk_lv,
                            const float *atk_t, const float *rel_lv,
                            const float *rel_t, float in_ratio,
                            float out_ratio, uint32_t sr, const float *in,
                            float *gain, float *env, int n,
                            float *curve_out, float *model_out,
                            const float *levels, int n_levels)
    {
        dspu::DynamicProcessor dp;
        dp.set_sample_rate(sr);
        dp.set_in_ratio(in_ratio);
        dp.set_out_ratio(out_ratio);
        for (int i = 0; i < 4; ++i)
        {
            dp.set_dot(i, dots[3 * i], dots[3 * i + 1], dots[3 * i + 2]);
            dp.set_attack_level(i, atk_lv[i]);
            dp.set_release_level(i, rel_lv[i]);
        }
        for (int i = 0; i < 5; ++i)   /* 4 dots bound 5 ranges */
        {
            dp.set_attack_time(i, atk_t[i]);
            dp.set_release_time(i, rel_t[i]);
        }
        dp.update_settings();   /* NOT called by process() upstream */
        dp.process(gain, env, in, n);
        if (curve_out != nullptr && n_levels > 0)
        {
            dp.curve(curve_out, levels, n_levels);
            dp.model(model_out, levels, n_levels);
        }
        return 0;
    }

    int ref_autogain(float silence, float deviation, float sgrow,
                     float sfall, float lgrow, float lfall, float max_gain,
                     int max_gain_on, uint32_t sr, const float *llong,
                     const float *lshort, float lexp, float *vca, int n)
    {
        dspu::AutoGain ag;
        ag.init();
        ag.set_sample_rate(sr);
        ag.set_silence_threshold(silence);
        ag.set_deviation(deviation);
        ag.set_short_speed(sgrow, sfall);
        ag.set_long_speed(lgrow, lfall);
        ag.set_max_gain(max_gain, max_gain_on != 0);
        ag.process(vca, llong, lshort, lexp, n);
        return 0;
    }

    int ref_simple_autogain(float grow, float fall, float gmin, float gmax,
                            float threshold, uint32_t sr,
                            const float *level, float *gain, int n)
    {
        dspu::SimpleAutoGain sag;
        sag.init();
        sag.set_sample_rate(sr);
        sag.set_speed(grow, fall);
        sag.set_gain(gmin, gmax);
        sag.set_threshold(threshold);
        for (int i = 0; i < n; ++i)
            gain[i] = sag.process(level[i]);
        return 0;
    }

    int ref_surge_protector(float on_th, float off_th, uint32_t transition,
                            uint32_t shutdown, const float *in, float *out,
                            int n)
    {
        dspu::SurgeProtector sp;
        sp.set_threshold(on_th, off_th);
        sp.set_transition_time(transition);
        sp.set_shutdown_time(shutdown);
        for (int i = 0; i < n; ++i)
            out[i] = sp.process(in[i]);
        return 0;
    }

    /* --- meters --- */

    int ref_correlometer(uint32_t max_period, uint32_t period,
                         const float *a, const float *b, float *dst,
                         int n, int block)
    {
        dspu::Correlometer cm;
        if (cm.init(max_period) != STATUS_OK)
            return -1;
        cm.set_period(period);
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            cm.process(dst + off, a + off, b + off, todo);
        }
        return 0;
    }

    int ref_panometer(uint32_t max_period, uint32_t period, uint32_t law,
                      float dfl, const float *a, const float *b,
                      float *dst, int n, int block)
    {
        dspu::Panometer pm;
        if (pm.init(max_period) != STATUS_OK)
            return -1;
        pm.set_pan_law((dspu::pan_law_t) law);
        pm.set_default_pan(dfl);
        pm.set_period(period);
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            pm.process(dst + off, a + off, b + off, todo);
        }
        return 0;
    }

    /* stereo (LEFT/RIGHT designations) momentary/short-term loudness */
    int ref_loudness_meter(float period_ms, uint32_t weighting,
                           uint32_t sr, const float *l, const float *r,
                           float *out, int n, int block)
    {
        dspu::LoudnessMeter lm;
        if (lm.init(2, lsp_max(period_ms, 3000.0f)) != STATUS_OK)
            return -1;
        lm.set_sample_rate(sr);
        lm.set_weighting((dspu::bs::weighting_t) weighting);
        lm.set_period(period_ms);
        lm.set_designation(0, dspu::bs::CHANNEL_LEFT);
        lm.set_designation(1, dspu::bs::CHANNEL_RIGHT);
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            lm.bind(0, nullptr, l + off);
            lm.bind(1, nullptr, r + off);
            lm.process(out + off, todo);
        }
        return 0;
    }

    /* stereo integrated loudness (BS.1770 gated) */
    int ref_ilufs_meter(float int_time_s, uint32_t weighting, uint32_t sr,
                        const float *l, const float *r, float *out, int n,
                        int block)
    {
        dspu::ILUFSMeter im;
        if (im.init(2, int_time_s) != STATUS_OK)
            return -1;
        im.set_sample_rate(sr);
        im.set_weighting((dspu::bs::weighting_t) weighting);
        im.set_integration_period(int_time_s);
        im.set_designation(0, dspu::bs::CHANNEL_LEFT);
        im.set_designation(1, dspu::bs::CHANNEL_RIGHT);
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            im.bind(0, l + off);
            im.bind(1, r + off);
            im.process(out + off, todo);
        }
        return 0;
    }

    /* --- IIR Linkwitz-Riley crossover tree --- */

    static void xover_collect(void *object, void *subject, size_t band,
                              const float *data, size_t first, size_t count)
    {
        float *out = reinterpret_cast<float *>(object);
        size_t n = (size_t) (uintptr_t) subject;
        memcpy(out + band * n + first, data, count * sizeof(float));
    }

    /* nsplits split points -> nsplits+1 bands; outs = [bands][n] */
    int ref_crossover(int nsplits, const float *freqs,
                      const uint32_t *slopes, uint32_t sr, const float *in,
                      float *outs, int n, int block)
    {
        dspu::Crossover cv;
        if (!cv.init(nsplits + 1, block > 0 ? block : n))
            return -1;
        cv.set_sample_rate(sr);
        for (int i = 0; i < nsplits; ++i)
        {
            cv.set_frequency(i, freqs[i]);
            cv.set_slope(i, slopes[i]);
        }
        for (int b = 0; b <= nsplits; ++b)
            cv.set_handler(b, xover_collect, outs,
                           (void *) (uintptr_t) n);
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            /* handlers write at first=<offset in block>; shift by off
             * via per-call object pointer */
            for (int b = 0; b <= nsplits; ++b)
                cv.set_handler(b, xover_collect, outs + off,
                               (void *) (uintptr_t) n);
            cv.process(in + off, todo);
        }
        return 0;
    }

    /* --- noise generators: bit-level parity targets --- */

    int ref_mls(uint32_t nbits, uint64_t state, float amplitude,
                float offset, float *dst, int n)
    {
        dspu::MLS mls;
        mls.set_n_bits(nbits);
        mls.set_state((dspu::MLS::mls_t) state);
        mls.set_amplitude(amplitude);
        mls.set_offset(offset);
        mls.process_overwrite(dst, n);
        return 0;
    }

    int ref_lcg(uint32_t seed, uint32_t dist, float amplitude,
                float offset, float *dst, int n)
    {
        dspu::LCG lcg;
        lcg.init(seed);
        lcg.set_distribution((dspu::lcg_dist_t) dist);
        lcg.set_amplitude(amplitude);
        lcg.set_offset(offset);
        lcg.process_overwrite(dst, n);
        return 0;
    }

    int ref_velvet(uint32_t core, uint32_t type, uint32_t randseed,
                   uint32_t mlsnbits, uint64_t mlsseed, float window_width,
                   float delta, float amplitude, float offset, int crush,
                   float crush_prob, uint32_t sr, float *dst, int n)
    {
        dspu::Velvet v;
        v.init(randseed, mlsnbits, (dspu::MLS::mls_t) mlsseed);
        v.set_core_type((dspu::vn_core_t) core);
        v.set_velvet_type((dspu::vn_velvet_type_t) type);
        v.set_velvet_window_width(window_width);
        v.set_delta_value(delta);
        v.set_amplitude(amplitude);
        v.set_offset(offset);
        v.set_crush(crush != 0);
        v.set_crush_probability(crush_prob);
        v.process_overwrite(dst, n);
        (void) sr;
        return 0;
    }

    int ref_randomizer(uint32_t seed, uint32_t func, float *dst, int n)
    {
        dspu::Randomizer r;
        r.init(seed);
        for (int i = 0; i < n; ++i)
            dst[i] = r.random((dspu::random_function_t) func);
        return 0;
    }

    /* --- misc pure functions --- */

    int ref_window(uint32_t type, float *dst, int n)
    {
        dspu::windows::window(dst, n, (dspu::windows::window_t) type);
        return 0;
    }

    /* function index = declaration order in the respective header */
    int ref_lfo(uint32_t func, const float *phase, float *dst, int n)
    {
        static dspu::lfo::function_t funcs[] = {
            dspu::lfo::triangular, dspu::lfo::sine, dspu::lfo::step_sine,
            dspu::lfo::cubic, dspu::lfo::step_cubic, dspu::lfo::parabolic,
            dspu::lfo::rev_parabolic, dspu::lfo::logarithmic,
            dspu::lfo::rev_logarithmic, dspu::lfo::sqrt,
            dspu::lfo::rev_sqrt, dspu::lfo::circular,
            dspu::lfo::rev_circular,
        };
        if (func >= sizeof(funcs) / sizeof(funcs[0]))
            return -1;
        for (int i = 0; i < n; ++i)
            dst[i] = funcs[func](phase[i]);
        return 0;
    }

    int ref_sigmoid(uint32_t func, const float *x, float *dst, int n)
    {
        static dspu::sigmoid::function_t funcs[] = {
            dspu::sigmoid::hard_clip, dspu::sigmoid::quadratic,
            dspu::sigmoid::sine, dspu::sigmoid::logistic,
            dspu::sigmoid::arctangent, dspu::sigmoid::hyperbolic_tangent,
            dspu::sigmoid::hyperbolic, dspu::sigmoid::guidermannian,
            dspu::sigmoid::error, dspu::sigmoid::smoothstep,
            dspu::sigmoid::smootherstep, dspu::sigmoid::circle,
        };
        if (func >= sizeof(funcs) / sizeof(funcs[0]))
            return -1;
        for (int i = 0; i < n; ++i)
            dst[i] = funcs[func](x[i]);
        return 0;
    }

    int ref_fade(int out, const float *src, float *dst, int fade_len,
                 int buf_len)
    {
        if (out)
            dspu::fade_out(dst, src, fade_len, buf_len);
        else
            dspu::fade_in(dst, src, fade_len, buf_len);
        return 0;
    }

    int ref_envelope_noise(int log_grid, uint32_t type, float first,
                           float last, float center, float *dst, int n)
    {
        if (log_grid)
            dspu::envelope::noise_log(dst, first, last, center, n,
                                      (dspu::envelope::envelope_t) type);
        else
            dspu::envelope::noise_lin(dst, first, last, center, n,
                                      (dspu::envelope::envelope_t) type);
        return 0;
    }

    int ref_fft_crossover(int lo, const float *f, float *gain, float f0,
                          float slope, int n)
    {
        if (lo)
            dspu::crossover::lopass_set(gain, f, f0, slope, n);
        else
            dspu::crossover::hipass_set(gain, f, f0, slope, n);
        return 0;
    }

    int ref_fft_crossover_fft(int lo, float *mag, float f0, float slope,
                              float sample_rate, uint32_t rank)
    {
        if (lo)
            dspu::crossover::lopass_fft_set(mag, f0, slope, sample_rate,
                                            rank);
        else
            dspu::crossover::hipass_fft_set(mag, f0, slope, sample_rate,
                                            rank);
        return 0;
    }

    /* --- stat --- */

    int ref_quantized_counter(float vmin, float vmax, uint32_t levels,
                              uint32_t history, const float *x, int n,
                              int block, uint32_t *counters, int max_levels,
                              uint32_t *extra /* below, above, nan */)
    {
        dspu::QuantizedCounter qc;
        if (qc.init(history, levels) != STATUS_OK)
            return -1;
        qc.set_period(history);
        qc.set_range(vmin, vmax, levels);
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            qc.process(x + off, todo);
        }
        const uint32_t *c = qc.counters();
        for (uint32_t i = 0; i < levels && int(i) < max_levels; ++i)
            counters[i] = c[i];
        extra[0] = qc.below();
        extra[1] = qc.above();
        extra[2] = (uint32_t) qc.count();
        return 0;
    }

    /* --- sidechain conditioner --- */

    int ref_sidechain_process(uint32_t source, uint32_t mode,
                              uint32_t stereo_mode, float reactivity_ms,
                              float gain, uint32_t sr, const float *l,
                              const float *r, float *out, int n, int block)
    {
        dspu::Sidechain sc;
        if (!sc.init(2, reactivity_ms + 1.0f))
            return -1;
        sc.set_sample_rate(sr);
        sc.set_source(source);
        sc.set_mode(mode);
        sc.set_stereo_mode((dspu::sidechain_stereo_mode_t) stereo_mode);
        sc.set_reactivity(reactivity_ms);
        sc.set_gain(gain);
        if (block <= 0)
            block = n;
        const float *in[2];
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            in[0] = l + off;
            in[1] = r + off;
            sc.process(out + off, in, todo);
        }
        return 0;
    }

    /* Genuine non-uniform partitioned Convolver (Convolver.cpp:144-313)
     * streamed in `block`-sized chunks.  `phase` staggers tail FFT
     * work exactly as the reference's scheduling does. */
    int ref_convolver_process(const float *ir, int ir_len, int rank,
                              float phase, const float *x, float *y,
                              int n, int block)
    {
        dspu::Convolver cv;
        if (!cv.init(ir, ir_len, rank, phase))
            return -1;
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            cv.process(y + off, x + off, todo);
        }
        cv.destroy();
        return 0;
    }

    /* Genuine Equalizer in any mode.  `filters` = rows of
     * [type, slope, freq, freq2, gain, quality]. */
    int ref_equalizer_process(uint32_t mode, const float *filters,
                              int n_filters, uint32_t fir_rank, uint32_t sr,
                              const float *x, float *y, int n, int block,
                              int *latency)
    {
        dspu::Equalizer eq;
        if (!eq.init(n_filters, fir_rank))
            return -1;
        eq.set_mode((dspu::equalizer_mode_t) mode);
        eq.set_sample_rate(sr);
        for (int i = 0; i < n_filters; ++i)
        {
            dspu::filter_params_t fp;
            fp.nType = (uint32_t) filters[6 * i + 0];
            fp.nSlope = (uint32_t) filters[6 * i + 1];
            fp.fFreq = filters[6 * i + 2];
            fp.fFreq2 = filters[6 * i + 3];
            fp.fGain = filters[6 * i + 4];
            fp.fQuality = filters[6 * i + 5];
            eq.set_params(i, &fp);
        }
        if (latency != nullptr)
            *latency = (int) eq.get_latency();
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            eq.process(y + off, x + off, todo);
        }
        eq.destroy();
        return 0;
    }

    /* --- dynamics oracles: genuine envelope followers + knee curves.
     * Each designs the unit from the same setter surface the plugins
     * use, then streams `n` samples and returns the GAIN signal (the
     * reference's process contract) and optionally the envelope. --- */

    int ref_compressor_process(uint32_t mode, float attack_thresh,
                               float release_thresh, float boost_thresh,
                               float attack_ms, float release_ms,
                               float knee, float ratio, float hold_ms,
                               uint32_t sr, const float *in, float *gain,
                               float *env, int n)
    {
        dspu::Compressor c;
        c.set_mode(mode);
        c.set_threshold(attack_thresh, release_thresh);
        c.set_boost_threshold(boost_thresh);
        c.set_timings(attack_ms, release_ms);
        c.set_knee(knee);
        c.set_ratio(ratio);
        c.set_hold(hold_ms);
        c.set_sample_rate(sr);
        c.update_settings();
        c.process(gain, env, in, n);
        return 0;
    }

    int ref_compressor_curve(uint32_t mode, float attack_thresh,
                             float release_thresh, float boost_thresh,
                             float attack_ms, float release_ms, float knee,
                             float ratio, float hold_ms, uint32_t sr,
                             const float *in, float *curve, float *gain,
                             int n)
    {
        dspu::Compressor c;
        c.set_mode(mode);
        c.set_threshold(attack_thresh, release_thresh);
        c.set_boost_threshold(boost_thresh);
        c.set_timings(attack_ms, release_ms);
        c.set_knee(knee);
        c.set_ratio(ratio);
        c.set_hold(hold_ms);
        c.set_sample_rate(sr);
        c.update_settings();
        c.curve(curve, in, n);
        c.reduction(gain, in, n);
        return 0;
    }

    int ref_expander_process(uint32_t mode, float attack_thresh,
                             float release_thresh, float attack_ms,
                             float release_ms, float knee, float ratio,
                             float hold_ms, uint32_t sr, const float *in,
                             float *gain, float *env, int n)
    {
        dspu::Expander e;
        e.set_mode(mode);
        e.set_threshold(attack_thresh, release_thresh);
        e.set_timings(attack_ms, release_ms);
        e.set_knee(knee);
        e.set_ratio(ratio);
        e.set_hold(hold_ms);
        e.set_sample_rate(sr);
        e.update_settings();
        e.process(gain, env, in, n);
        return 0;
    }

    int ref_gate_process(float open_thresh, float close_thresh,
                         float open_zone, float close_zone,
                         float reduction, float attack_ms,
                         float release_ms, float hold_ms, uint32_t sr,
                         const float *in, float *gain, float *env, int n)
    {
        dspu::Gate g;
        g.set_threshold(open_thresh, close_thresh);
        g.set_zone(open_zone, close_zone);
        g.set_reduction(reduction);
        g.set_timings(attack_ms, release_ms);
        g.set_hold(hold_ms);
        g.set_sample_rate(sr);
        g.update_settings();
        g.process(gain, env, in, n);
        return 0;
    }

    /* Streams the genuine Limiter (iterative peak patching,
     * Limiter.cpp:695-785) in `block`-sized chunks; returns the gain
     * trajectory and the reported latency. */
    int ref_limiter_process(uint32_t mode, float thresh, float attack_ms,
                            float release_ms, float lookahead_ms,
                            float knee, int alr, float alr_attack,
                            float alr_release, float alr_knee,
                            uint32_t sr, const float *sc, float *gain,
                            int n, int block, int *latency)
    {
        dspu::Limiter l;
        if (!l.init(sr, lookahead_ms + 8.0f))
            return -1;
        l.set_mode((dspu::limiter_mode_t) mode);
        l.set_sample_rate(sr);
        l.set_threshold(thresh, true);
        l.set_attack(attack_ms);
        l.set_release(release_ms);
        l.set_lookahead(lookahead_ms);
        l.set_knee(knee);
        l.set_alr(alr != 0);
        l.set_alr_attack(alr_attack);
        l.set_alr_release(alr_release);
        l.set_alr_knee(alr_knee);
        l.update_settings();
        if (latency != nullptr)
            *latency = (int) l.get_latency();
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            l.process(gain + off, sc + off, todo);
        }
        return 0;
    }

    /* Analytic frequency chart of the designed filter (re/im arrays). */
    int ref_filter_freq_chart(uint32_t type, uint32_t slope, float freq,
                              float freq2, float gain, float quality,
                              uint32_t sr, const float *freqs, float *re,
                              float *im, int n)
    {
        dspu::Filter flt;
        if (!flt.init(nullptr))
            return -1;
        dspu::filter_params_t fp;
        fill_params(&fp, type, slope, freq, freq2, gain, quality);
        flt.update(sr, &fp);
        flt.rebuild();
        flt.freq_chart(re, im, freqs, n);
        flt.destroy();
        return 0;
    }
}

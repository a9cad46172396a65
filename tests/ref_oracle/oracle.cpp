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

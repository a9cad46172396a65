/* Scalar stand-ins for the lsp-dsp-lib kernels used by the SECOND wave
 * of compiled-in reference sources (Equalizer, Convolver,
 * SpectralProcessor, Sidechain, noise, ctl, misc) — see oracle.cpp's
 * header note.  Semantics are pinned by the call sites in the
 * reference sources (cited per function); the fastconv image format is
 * opaque to them, so a full packed spectrum is used here.
 */

#include <lsp-plug.in/dsp/dsp.h>
#include <lsp-plug.in/dsp/common/filters/transform.h>

#include <math.h>
#include <string.h>

namespace lsp
{
    namespace dsp
    {
        /* analog cascade -> digital biquad, prewarp factor kf — the
         * same equations as Filter::bilinear_transform
         * (Filter.cpp:2225-2267), with the same negated-a storage */
        void bilinear_transform_x1(biquad_x1_t *bf, const f_cascade_t *bc,
                                   float kf, size_t count)
        {
            double kf2 = double(kf) * double(kf);
            for (size_t i = 0; i < count; ++i)
            {
                const f_cascade_t *c = &bc[i];
                double T0 = c->t[0], T1 = c->t[1] * kf, T2 = c->t[2] * kf2;
                double B0 = c->b[0], B1 = c->b[1] * kf, B2 = c->b[2] * kf2;
                double N = 1.0 / (B0 + B1 + B2);
                biquad_x1_t *f = &bf[i];
                f->b0 = float((T0 + T1 + T2) * N);
                f->b1 = float(2.0 * (T0 - T2) * N);
                f->b2 = float((T0 - T1 + T2) * N);
                f->a1 = float(2.0 * (B2 - B0) * N);
                f->a2 = float((B1 - B2 - B0) * N);
                f->p0 = 0.0f;
                f->p1 = 0.0f;
                f->p2 = 0.0f;
            }
        }

        void fill(float *dst, float value, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = value;
        }

        void abs1(float *dst, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = fabsf(dst[i]);
        }

        void abs2(float *dst, const float *src, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = fabsf(src[i]);
        }

        void add_k2(float *dst, float k, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] += k;
        }

        void add3(float *dst, const float *a, const float *b, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = a[i] + b[i];
        }

        void exp1(float *dst, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = expf(dst[i]);
        }

        void powvc1(float *dst, float k, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = powf(dst[i], k);
        }

        void ssqrt1(float *dst, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = sqrtf((dst[i] > 0.0f) ? dst[i] : 0.0f);
        }

        float h_sqr_sum(const float *src, size_t count)
        {
            float s = 0.0f;
            for (size_t i = 0; i < count; ++i)
                s += src[i] * src[i];
            return s;
        }

        float h_abs_sum(const float *src, size_t count)
        {
            float s = 0.0f;
            for (size_t i = 0; i < count; ++i)
                s += fabsf(src[i]);
            return s;
        }

        void reverse2(float *dst, const float *src, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = src[count - 1 - i];
        }

        /* linear ramps over `count` samples from v1 to v2
         * (Equalizer.cpp:496-497 crossfade: lramp1 multiplies in-place,
         * lramp_add2 accumulates src*ramp; the two ramps must sum to 1
         * at every tap, so both use the same (i+1)/count grid) */
        void lramp1(float *dst, float v1, float v2, size_t count)
        {
            float dv = (v2 - v1) / float(count);
            for (size_t i = 0; i < count; ++i)
                dst[i] *= v1 + dv * float(i + 1);
        }

        void lramp_add2(float *dst, const float *src, float v1, float v2,
                        size_t count)
        {
            float dv = (v2 - v1) / float(count);
            for (size_t i = 0; i < count; ++i)
                dst[i] += src[i] * (v1 + dv * float(i + 1));
        }

        void lin_inter_set(float *dst, int32_t x0, float y0, int32_t x1,
                           float y1, int32_t x, uint32_t count)
        {
            float k = (y1 - y0) / float(x1 - x0);
            for (uint32_t i = 0; i < count; ++i)
                dst[i] = y0 + k * float(int32_t(x + i) - x0);
        }

        void lr_to_mid(float *dst, const float *l, const float *r,
                       size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = (l[i] + r[i]) * 0.5f;
        }

        void lr_to_side(float *dst, const float *l, const float *r,
                        size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = (l[i] - r[i]) * 0.5f;
        }

        void ms_to_left(float *dst, const float *m, const float *s,
                        size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = m[i] + s[i];
        }

        void ms_to_right(float *dst, const float *m, const float *s,
                         size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = m[i] - s[i];
        }

        /* ps* = signed sample with the smaller/larger magnitude;
         * pa* = the magnitude itself (Sidechain.cpp:228-306: the no-EQ
         * path wants |.| directly, the pre-EQ path keeps sign and takes
         * abs after filtering) */
        void psmin3(float *dst, const float *a, const float *b,
                    size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = (fabsf(a[i]) < fabsf(b[i])) ? a[i] : b[i];
        }

        void psmax3(float *dst, const float *a, const float *b,
                    size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = (fabsf(a[i]) > fabsf(b[i])) ? a[i] : b[i];
        }

        void pamin3(float *dst, const float *a, const float *b,
                    size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                float xa = fabsf(a[i]), xb = fabsf(b[i]);
                dst[i] = (xa < xb) ? xa : xb;
            }
        }

        void pamax3(float *dst, const float *a, const float *b,
                    size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                float xa = fabsf(a[i]), xb = fabsf(b[i]);
                dst[i] = (xa > xb) ? xa : xb;
            }
        }

        void lr_psmin3(float *dst, const float *m, const float *s,
                       size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                float l = m[i] + s[i], r = m[i] - s[i];
                dst[i] = (fabsf(l) < fabsf(r)) ? l : r;
            }
        }

        void lr_psmax3(float *dst, const float *m, const float *s,
                       size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                float l = m[i] + s[i], r = m[i] - s[i];
                dst[i] = (fabsf(l) > fabsf(r)) ? l : r;
            }
        }

        void ms_pamin3(float *dst, const float *m, const float *s,
                       size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                float l = fabsf(m[i] + s[i]), r = fabsf(m[i] - s[i]);
                dst[i] = (l < r) ? l : r;
            }
        }

        void ms_pamax3(float *dst, const float *m, const float *s,
                       size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                float l = fabsf(m[i] + s[i]), r = fabsf(m[i] - s[i]);
                dst[i] = (l > r) ? l : r;
            }
        }

        void corr_init(correlation_t *corr, const float *a, const float *b,
                       size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                corr->v += a[i] * b[i];
                corr->a += a[i] * a[i];
                corr->b += b[i] * b[i];
            }
        }

        void corr_incr(correlation_t *corr, float *dst,
                       const float *a_head, const float *b_head,
                       const float *a_tail, const float *b_tail,
                       size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                corr->v += a_head[i] * b_head[i] - a_tail[i] * b_tail[i];
                corr->a += a_head[i] * a_head[i] - a_tail[i] * a_tail[i];
                corr->b += b_head[i] * b_head[i] - b_tail[i] * b_tail[i];
                float d = corr->a * corr->b;
                dst[i] = (d > 1e-18f) ? corr->v / sqrtf(d) : 0.0f;
            }
        }

        float abs_max(const float *src, size_t count)
        {
            float m = 0.0f;
            for (size_t i = 0; i < count; ++i)
            {
                float v = fabsf(src[i]);
                if (v > m)
                    m = v;
            }
            return m;
        }

        float h_sum(const float *src, size_t count)
        {
            float s = 0.0f;
            for (size_t i = 0; i < count; ++i)
                s += src[i];
            return s;
        }

        float abs_min(const float *src, size_t count)
        {
            float m = (count > 0) ? fabsf(src[0]) : 0.0f;
            for (size_t i = 1; i < count; ++i)
            {
                float v = fabsf(src[i]);
                if (v < m)
                    m = v;
            }
            return m;
        }

        /* value with the largest |.| (MeterGraph.cpp MM_SIGN_MAXIMUM) */
        float sign_max(const float *src, size_t count)
        {
            float m = (count > 0) ? src[0] : 0.0f;
            for (size_t i = 1; i < count; ++i)
                if (fabsf(src[i]) > fabsf(m))
                    m = src[i];
            return m;
        }

        float sign_min(const float *src, size_t count)
        {
            float m = (count > 0) ? src[0] : 0.0f;
            for (size_t i = 1; i < count; ++i)
                if (fabsf(src[i]) < fabsf(m))
                    m = src[i];
            return m;
        }

        void sqr2(float *dst, const float *src, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = src[i] * src[i];
        }

        void mix_copy2(float *dst, const float *a, const float *b,
                       float ka, float kb, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = a[i] * ka + b[i] * kb;
        }

        /* ---- packed-complex FFT (iterative radix-2, double-precision
         * butterflies, float storage) ---- */

        static void fft_inplace(float *buf, size_t rank, bool inverse)
        {
            const size_t n = size_t(1) << rank;
            /* bit-reversal permutation over complex pairs */
            for (size_t i = 1, j = 0; i < n; ++i)
            {
                size_t bit = n >> 1;
                for (; j & bit; bit >>= 1)
                    j ^= bit;
                j |= bit;
                if (i < j)
                {
                    float tr = buf[2 * i], ti = buf[2 * i + 1];
                    buf[2 * i] = buf[2 * j];
                    buf[2 * i + 1] = buf[2 * j + 1];
                    buf[2 * j] = tr;
                    buf[2 * j + 1] = ti;
                }
            }
            for (size_t len = 2; len <= n; len <<= 1)
            {
                double ang = (inverse ? 2.0 : -2.0) * M_PI / double(len);
                double wr0 = cos(ang), wi0 = sin(ang);
                for (size_t i = 0; i < n; i += len)
                {
                    double wr = 1.0, wi = 0.0;
                    for (size_t k = 0; k < len / 2; ++k)
                    {
                        size_t a = 2 * (i + k);
                        size_t b = 2 * (i + k + len / 2);
                        double ur = buf[a], ui = buf[a + 1];
                        double vr = buf[b] * wr - buf[b + 1] * wi;
                        double vi = buf[b] * wi + buf[b + 1] * wr;
                        buf[a] = float(ur + vr);
                        buf[a + 1] = float(ui + vi);
                        buf[b] = float(ur - vr);
                        buf[b + 1] = float(ui - vi);
                        double nwr = wr * wr0 - wi * wi0;
                        wi = wr * wi0 + wi * wr0;
                        wr = nwr;
                    }
                }
            }
        }

        void packed_direct_fft(float *dst, const float *src, size_t rank)
        {
            const size_t n = size_t(1) << rank;
            if (dst != src)
                memmove(dst, src, 2 * n * sizeof(float));
            fft_inplace(dst, rank, false);
        }

        void packed_reverse_fft(float *dst, const float *src, size_t rank)
        {
            const size_t n = size_t(1) << rank;
            if (dst != src)
                memmove(dst, src, 2 * n * sizeof(float));
            fft_inplace(dst, rank, true);
            const float k = 1.0f / float(n);
            for (size_t i = 0; i < 2 * n; ++i)
                dst[i] *= k;
        }

        void pcomplex_r2c(float *dst, const float *src, size_t count)
        {
            /* callers expand real buffers in place with either overlap
             * direction: src == dst (SpectralProcessor) needs
             * back-to-front, src == dst + count (MultiSpectralProcessor
             * windows into the back half first) needs front-to-back —
             * stage through a copy to be safe for any overlap */
            float *tmp = new float[count];
            for (size_t i = 0; i < count; ++i)
                tmp[i] = src[i];
            for (size_t i = 0; i < count; ++i)
            {
                dst[2 * i] = tmp[i];
                dst[2 * i + 1] = 0.0f;
            }
            delete[] tmp;
        }

        void pcomplex_c2r(float *dst, const float *src, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = src[2 * i];
        }

        void pcomplex_mod(float *dst, const float *src, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = sqrtf(src[2 * i] * src[2 * i]
                               + src[2 * i + 1] * src[2 * i + 1]);
        }

        void pcomplex_mul2(float *dst, const float *src, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                float ar = dst[2 * i], ai = dst[2 * i + 1];
                float br = src[2 * i], bi = src[2 * i + 1];
                dst[2 * i] = ar * br - ai * bi;
                dst[2 * i + 1] = ar * bi + ai * br;
            }
        }

        void complex_mul2(float *dst_re, float *dst_im, const float *src_re,
                          const float *src_im, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                float ar = dst_re[i], ai = dst_im[i];
                dst_re[i] = ar * src_re[i] - ai * src_im[i];
                dst_im[i] = ar * src_im[i] + ai * src_re[i];
            }
        }

        void complex_mul3(float *dst_re, float *dst_im, const float *a_re,
                          const float *a_im, const float *b_re,
                          const float *b_im, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                float ar = a_re[i], ai = a_im[i];
                float br = b_re[i], bi = b_im[i];
                dst_re[i] = ar * br - ai * bi;
                dst_im[i] = ar * bi + ai * br;
            }
        }

        void complex_rcp2(float *dst_re, float *dst_im, const float *src_re,
                          const float *src_im, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                float re = src_re[i], im = src_im[i];
                float k = 1.0f / (re * re + im * im);
                dst_re[i] = re * k;
                dst_im[i] = -im * k;
            }
        }

        /* split-form FFT pair (SyncChirpProcessor.cpp:675-760,
         * LatencyDetector.cpp:241): direct unscaled, reverse 1/N —
         * interleave through the packed kernel */
        void direct_fft(float *dst_re, float *dst_im, const float *src_re,
                        const float *src_im, size_t rank)
        {
            const size_t n = size_t(1) << rank;
            float *tmp = new float[2 * n];
            for (size_t i = 0; i < n; ++i)
            {
                tmp[2 * i] = src_re[i];
                tmp[2 * i + 1] = src_im[i];
            }
            fft_inplace(tmp, rank, false);
            for (size_t i = 0; i < n; ++i)
            {
                dst_re[i] = tmp[2 * i];
                dst_im[i] = tmp[2 * i + 1];
            }
            delete[] tmp;
        }

        void reverse_fft(float *dst_re, float *dst_im, const float *src_re,
                         const float *src_im, size_t rank)
        {
            const size_t n = size_t(1) << rank;
            float *tmp = new float[2 * n];
            for (size_t i = 0; i < n; ++i)
            {
                tmp[2 * i] = src_re[i];
                tmp[2 * i + 1] = src_im[i];
            }
            fft_inplace(tmp, rank, true);
            const float k = 1.0f / float(n);
            for (size_t i = 0; i < n; ++i)
            {
                dst_re[i] = tmp[2 * i] * k;
                dst_im[i] = tmp[2 * i + 1] * k;
            }
            delete[] tmp;
        }

        void normalize(float *dst, const float *src, size_t count)
        {
            float m = 0.0f;
            for (size_t i = 0; i < count; ++i)
            {
                float v = fabsf(src[i]);
                if (v > m)
                    m = v;
            }
            if (m == 0.0f)
            {
                if (dst != src)
                    memmove(dst, src, count * sizeof(float));
                return;
            }
            float k = 1.0f / m;
            for (size_t i = 0; i < count; ++i)
                dst[i] = src[i] * k;
        }

        size_t abs_max_index(const float *src, size_t count)
        {
            size_t idx = 0;
            float m = (count > 0) ? fabsf(src[0]) : 0.0f;
            for (size_t i = 1; i < count; ++i)
            {
                float v = fabsf(src[i]);
                if (v > m)
                {
                    m = v;
                    idx = i;
                }
            }
            return idx;
        }

        void sub2(float *dst, const float *src, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] -= src[i];
        }

        void mix2(float *dst, const float *src, float k1, float k2,
                  size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = dst[i] * k1 + src[i] * k2;
        }

        void reverse1(float *dst, size_t count)
        {
            for (size_t i = 0, j = count - 1; i < j; ++i, --j)
            {
                float t = dst[i];
                dst[i] = dst[j];
                dst[j] = t;
            }
        }

        /* fastconv image = packed spectrum of the first 2^(rank-1)
         * samples zero-padded to 2^rank (Convolver.cpp:146-199 sizes
         * each image at 2^(rank+1) floats) */
        void fastconv_parse(float *dst, const float *src, size_t rank)
        {
            const size_t n = size_t(1) << rank;
            const size_t half = n >> 1;
            for (size_t i = 0; i < half; ++i)
            {
                dst[2 * i] = src[i];
                dst[2 * i + 1] = 0.0f;
            }
            for (size_t i = 2 * half; i < 2 * n; ++i)
                dst[i] = 0.0f;
            fft_inplace(dst, rank, false);
        }

        /* multiply two images, inverse-transform, ACCUMULATE the full
         * 2^rank real result into dst (Convolver accumulates
         * overlapping tails into vDataBuffer, Convolver.cpp:275-295) */
        void fastconv_apply(float *dst, float *tmp, const float *c1,
                            const float *c2, size_t rank)
        {
            const size_t n = size_t(1) << rank;
            for (size_t i = 0; i < n; ++i)
            {
                float ar = c1[2 * i], ai = c1[2 * i + 1];
                float br = c2[2 * i], bi = c2[2 * i + 1];
                tmp[2 * i] = ar * br - ai * bi;
                tmp[2 * i + 1] = ar * bi + ai * br;
            }
            fft_inplace(tmp, rank, true);
            const float k = 1.0f / float(n);
            for (size_t i = 0; i < n; ++i)
                dst[i] += tmp[2 * i] * k;
        }

        void fastconv_parse_apply(float *dst, float *tmp, const float *c,
                                  const float *src, size_t rank)
        {
            fastconv_parse(tmp, src, rank);
            const size_t n = size_t(1) << rank;
            for (size_t i = 0; i < n; ++i)
            {
                float ar = tmp[2 * i], ai = tmp[2 * i + 1];
                float br = c[2 * i], bi = c[2 * i + 1];
                tmp[2 * i] = ar * br - ai * bi;
                tmp[2 * i + 1] = ar * bi + ai * br;
            }
            fft_inplace(tmp, rank, true);
            const float k = 1.0f / float(n);
            for (size_t i = 0; i < n; ++i)
                dst[i] += tmp[2 * i] * k;
        }

        /* direct convolution ACCUMULATED into dst
         * (Convolver.cpp:295: partial-block head path, parallel to the
         * accumulating fastconv branch) */
        void convolve(float *dst, const float *src, const float *conv,
                      size_t length, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                float s = src[i];
                for (size_t j = 0; j < length; ++j)
                    dst[i + j] += s * conv[j];
            }
        }
    } /* namespace dsp */
} /* namespace lsp */

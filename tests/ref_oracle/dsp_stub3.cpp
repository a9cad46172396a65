/* Scalar stand-ins for the lsp-dsp-lib DYNAMIC filter kernels used by
 * DynamicFilters.cpp (see stubs/lsp-plug.in/dsp/dsp.h header note).
 *
 * Pipelining contract inferred from DynamicFilters.cpp:245-314: the
 * coefficient array is row-major [count + lanes - 1][lanes]; real data
 * for lane k of output sample i sits at row i + k (the triangular
 * sNormal padding the caller writes at the head/tail makes rows
 * rectangular).  The bilinear math matches dsp_stub2.cpp / the
 * reference's own Filter::bilinear_transform (Filter.cpp:2225-2267);
 * the matched-Z math matches Filter::matched_transform
 * (Filter.cpp:2291-2416) with TD passed in as `kf`.
 */

#include <lsp-plug.in/dsp/dsp.h>

#include <math.h>

namespace lsp
{
    namespace dsp
    {
        float irootf(float x, uint32_t n)
        {
            return powf(x, 1.0f / float(n));
        }

        void limit1(float *dst, float min, float max, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = (dst[i] < min) ? min
                       : (dst[i] > max) ? max : dst[i];
        }

        /* packed-complex *= real vector (FFTCrossover.cpp:139) */
        void pcomplex_r2c_mul2(float *dst, const float *src, size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                dst[2 * i] *= src[i];
                dst[2 * i + 1] *= src[i];
            }
        }

        static inline void bt_one(const f_cascade_t *c, float kf,
                                  float *b0, float *b1, float *b2,
                                  float *a1, float *a2)
        {
            double kf2 = double(kf) * double(kf);
            double T0 = c->t[0], T1 = c->t[1] * kf, T2 = c->t[2] * kf2;
            double B0 = c->b[0], B1 = c->b[1] * kf, B2 = c->b[2] * kf2;
            double N = 1.0 / (B0 + B1 + B2);
            *b0 = float((T0 + T1 + T2) * N);
            *b1 = float(2.0 * (T0 - T2) * N);
            *b2 = float((T0 - T1 + T2) * N);
            *a1 = float(2.0 * (B2 - B0) * N);
            *a2 = float((B1 - B2 - B0) * N);
        }

        /* matched-Z polynomial mapping (Filter.cpp:2302-2367) */
        static inline void mt_poly(const float *p, float f, float td,
                                   float *P)
        {
            if (p[2] == 0.0f)
            {
                P[2] = 0.0f;
                if (p[1] == 0.0f)
                {
                    P[0] = p[0];
                    P[1] = 0.0f;
                }
                else
                {
                    float k = p[1] / f;
                    float R = -p[0] / k;
                    P[0] = k;
                    P[1] = -k * expf(R * td);
                }
            }
            else
            {
                float k = p[2];
                float a = 1.0f / (f * f);
                float b = p[1] / (f * p[2]);
                float c = p[0] / p[2];
                float D = b * b - 4.0f * a * c;
                if (D >= 0.0f)
                {
                    D = sqrtf(D);
                    float R0 = (-b - D) / (2.0f * a);
                    float R1 = (-b + D) / (2.0f * a);
                    P[0] = k;
                    P[1] = -k * (expf(R0 * td) + expf(R1 * td));
                    P[2] = k * expf((R0 + R1) * td);
                }
                else
                {
                    D = sqrtf(-D);
                    float R = -b / (2.0f * a);
                    float K = D / (2.0f * a);
                    P[0] = k;
                    P[1] = -2.0f * k * expf(R * td) * cosf(K * td);
                    P[2] = k * expf(2.0f * R * td);
                }
            }
        }

        static inline void mt_one(const f_cascade_t *c, float f, float td,
                                  float *b0, float *b1, float *b2,
                                  float *a1, float *a2)
        {
            float T[3] = {0.0f, 0.0f, 0.0f}, B[3] = {0.0f, 0.0f, 0.0f};
            double A[2], I[2];
            for (int i = 0; i < 2; ++i)
            {
                const float *p = (i) ? c->b : c->t;
                float *P = (i) ? B : T;
                mt_poly(p, f, td, P);
                /* amplitude normalization at f/10
                 * (Filter.cpp:2369-2391): w = PI*0.2*f/sr = 0.1*f*td */
                double w = 0.1 * double(f) * double(td);
                double re = P[0] * cos(2.0 * w) + P[1] * cos(w) + P[2];
                double im = P[0] * sin(2.0 * w) + P[1] * sin(w);
                A[i] = sqrt(re * re + im * im);
                w = 0.1;
                re = p[0] - p[2] * w * w;
                im = p[1] * w;
                I[i] = sqrt(re * re + im * im);
            }
            double AN = (A[1] * I[0]) / (A[0] * I[1]);
            double N = 1.0 / B[0];
            *b0 = float(T[0] * N * AN);
            *b1 = float(T[1] * N * AN);
            *b2 = float(T[2] * N * AN);
            *a1 = float(-B[1] * N);
            *a2 = float(-B[2] * N);
        }

        void bilinear_transform_x2(biquad_x2_t *bf, const f_cascade_t *bc,
                                   float kf, size_t count)
        {
            for (size_t r = 0; r < count; ++r)
                for (int k = 0; k < 2; ++k)
                    bt_one(&bc[r * 2 + k], kf, &bf[r].b0[k], &bf[r].b1[k],
                           &bf[r].b2[k], &bf[r].a1[k], &bf[r].a2[k]);
        }

        void bilinear_transform_x4(biquad_x4_t *bf, const f_cascade_t *bc,
                                   float kf, size_t count)
        {
            for (size_t r = 0; r < count; ++r)
                for (int k = 0; k < 4; ++k)
                    bt_one(&bc[r * 4 + k], kf, &bf[r].b0[k], &bf[r].b1[k],
                           &bf[r].b2[k], &bf[r].a1[k], &bf[r].a2[k]);
        }

        void bilinear_transform_x8(biquad_x8_t *bf, const f_cascade_t *bc,
                                   float kf, size_t count)
        {
            for (size_t r = 0; r < count; ++r)
                for (int k = 0; k < 8; ++k)
                    bt_one(&bc[r * 8 + k], kf, &bf[r].b0[k], &bf[r].b1[k],
                           &bf[r].b2[k], &bf[r].a1[k], &bf[r].a2[k]);
        }

        void matched_transform_x1(biquad_x1_t *bf, f_cascade_t *bc,
                                  float freq, float td, size_t count)
        {
            for (size_t r = 0; r < count; ++r)
                mt_one(&bc[r], freq, td, &bf[r].b0, &bf[r].b1, &bf[r].b2,
                       &bf[r].a1, &bf[r].a2);
        }

        void matched_transform_x2(biquad_x2_t *bf, f_cascade_t *bc,
                                  float freq, float td, size_t count)
        {
            for (size_t r = 0; r < count; ++r)
                for (int k = 0; k < 2; ++k)
                    mt_one(&bc[r * 2 + k], freq, td, &bf[r].b0[k],
                           &bf[r].b1[k], &bf[r].b2[k], &bf[r].a1[k],
                           &bf[r].a2[k]);
        }

        void matched_transform_x4(biquad_x4_t *bf, f_cascade_t *bc,
                                  float freq, float td, size_t count)
        {
            for (size_t r = 0; r < count; ++r)
                for (int k = 0; k < 4; ++k)
                    mt_one(&bc[r * 4 + k], freq, td, &bf[r].b0[k],
                           &bf[r].b1[k], &bf[r].b2[k], &bf[r].a1[k],
                           &bf[r].a2[k]);
        }

        void matched_transform_x8(biquad_x8_t *bf, f_cascade_t *bc,
                                  float freq, float td, size_t count)
        {
            for (size_t r = 0; r < count; ++r)
                for (int k = 0; k < 8; ++k)
                    mt_one(&bc[r * 8 + k], freq, td, &bf[r].b0[k],
                           &bf[r].b1[k], &bf[r].b2[k], &bf[r].a1[k],
                           &bf[r].a2[k]);
        }

        /* Lanczos polyphase upsampling kernels
         * (dsp::lanczos_resample_{2..8}x{2,3,4,12bit,16bit,24bit}).
         * Contract inferred from Oversampler.cpp:197-330: ACCUMULATE
         * `count` input samples' interpolation kernels into dst, kernel
         * for input i causal with support dst[i*N .. i*N + 2*L*N]
         * (peak at i*N + L*N -> latency L input samples, matching the
         * reference's latency() table, Oversampler.cpp:955-1010).
         *
         * NOTE: the true kernels live in lsp-dsp-lib (not vendored);
         * these stubs use the same Lanczos windows as
         * lsp_dsp_units_tpu/ops/resample.py (sinc(t)*sinc(t/L), L =
         * 2/3/4 lobes or 4/10/62 for the 12/16/24-bit tiers), so
         * oracle tests validate the BUFFERING/LATENCY logic of the
         * compiled reference around identical taps, not lsp-dsp-lib's
         * exact coefficients. */
        static void lanczos_up(float *dst, const float *src, size_t count,
                               int ratio, int lobes)
        {
            const int c = lobes * ratio;
            for (size_t i = 0; i < count; ++i)
            {
                const double v = src[i];
                float *d = &dst[i * ratio];
                for (int j = 0; j <= 2 * c; ++j)
                {
                    const double t = double(j - c) / ratio;
                    double k;
                    if (t == 0.0)
                        k = 1.0;
                    else
                    {
                        const double p1 = M_PI * t;
                        const double p2 = p1 / lobes;
                        k = (sin(p1) / p1) * (sin(p2) / p2);
                    }
                    d[j] += float(v * k);
                }
            }
        }

#define LSP_STUB_LANCZOS(N, SUF, L) \
        void lanczos_resample_##N##x##SUF(float *dst, const float *src, \
                                          size_t count) \
        { lanczos_up(dst, src, count, N, L); }

#define LSP_STUB_LANCZOS_SET(N) \
        LSP_STUB_LANCZOS(N, 2, 2) \
        LSP_STUB_LANCZOS(N, 3, 3) \
        LSP_STUB_LANCZOS(N, 4, 4) \
        LSP_STUB_LANCZOS(N, 12bit, 4) \
        LSP_STUB_LANCZOS(N, 16bit, 10) \
        LSP_STUB_LANCZOS(N, 24bit, 62)

        LSP_STUB_LANCZOS_SET(2)
        LSP_STUB_LANCZOS_SET(3)
        LSP_STUB_LANCZOS_SET(4)
        LSP_STUB_LANCZOS_SET(6)
        LSP_STUB_LANCZOS_SET(8)

#undef LSP_STUB_LANCZOS_SET
#undef LSP_STUB_LANCZOS

#define LSP_STUB_DOWNSAMPLE(N) \
        void downsample_##N##x(float *dst, const float *src, \
                               size_t count) \
        { for (size_t i = 0; i < count; ++i) dst[i] = src[i * N]; }

        LSP_STUB_DOWNSAMPLE(2)
        LSP_STUB_DOWNSAMPLE(3)
        LSP_STUB_DOWNSAMPLE(4)
        LSP_STUB_DOWNSAMPLE(6)
        LSP_STUB_DOWNSAMPLE(8)

#undef LSP_STUB_DOWNSAMPLE

        /* DF2-transposed step (matches oracle.cpp bq_step; a1/a2 stored
         * sign-negated) */
        static inline float dyn_step(float s, float b0, float b1, float b2,
                                     float a1, float a2, float *d)
        {
            float s2 = b0 * s + d[0];
            d[0] = d[1] + b1 * s + a1 * s2;
            d[1] = b2 * s + a2 * s2;
            return s2;
        }

        void dyn_biquad_process_x1(float *dst, const float *src, float *d,
                                   size_t count, const biquad_x1_t *f)
        {
            for (size_t i = 0; i < count; ++i)
                dst[i] = dyn_step(src[i], f[i].b0, f[i].b1, f[i].b2,
                                  f[i].a1, f[i].a2, d);
        }

        void dyn_biquad_process_x2(float *dst, const float *src, float *d,
                                   size_t count, const biquad_x2_t *f)
        {
            for (size_t i = 0; i < count; ++i)
            {
                float s = src[i];
                for (int k = 0; k < 2; ++k)
                {
                    const biquad_x2_t *q = &f[i + k];
                    s = dyn_step(s, q->b0[k], q->b1[k], q->b2[k],
                                 q->a1[k], q->a2[k], &d[2 * k]);
                }
                dst[i] = s;
            }
        }

        void dyn_biquad_process_x4(float *dst, const float *src, float *d,
                                   size_t count, const biquad_x4_t *f)
        {
            for (size_t i = 0; i < count; ++i)
            {
                float s = src[i];
                for (int k = 0; k < 4; ++k)
                {
                    const biquad_x4_t *q = &f[i + k];
                    s = dyn_step(s, q->b0[k], q->b1[k], q->b2[k],
                                 q->a1[k], q->a2[k], &d[2 * k]);
                }
                dst[i] = s;
            }
        }

        void dyn_biquad_process_x8(float *dst, const float *src, float *d,
                                   size_t count, const biquad_x8_t *f)
        {
            for (size_t i = 0; i < count; ++i)
            {
                float s = src[i];
                for (int k = 0; k < 8; ++k)
                {
                    const biquad_x8_t *q = &f[i + k];
                    s = dyn_step(s, q->b0[k], q->b1[k], q->b2[k],
                                 q->a1[k], q->a2[k], &d[2 * k]);
                }
                dst[i] = s;
            }
        }
    } /* namespace dsp */
} /* namespace lsp */

namespace lsp
{
    namespace dsp
    {
        /* Lanczos window generator for Sample::resample
         * (Sample.cpp:1040-1107): dst[i] = sinc(x)*sinc(x*a) at
         * x = i*k - p, windowed to |x| < t (x carries the pi factor) */
        void lanczos1(float *dst, float k, float p, float t, float a,
                      size_t count)
        {
            for (size_t i = 0; i < count; ++i)
            {
                double x = double(i) * k - p;
                double ax = (x < 0.0) ? -x : x;
                if (ax >= t)
                    dst[i] = 0.0f;
                else if (ax < 1e-10)
                    dst[i] = 1.0f;
                else
                    dst[i] = float((sin(x) / x) * (sin(x * a) / (x * a)));
            }
        }
    } /* namespace dsp */
} /* namespace lsp */

namespace lsp
{
    namespace dsp
    {
        /* 3D geometry ops (3d/raytrace.cpp).  Column-major 4x4, points
         * transform as p' = M * p; plane = normalized cross product of
         * the triangle edges with dw = -n.p0. */
        void init_point_xyz(point3d_t *p, float x, float y, float z)
        {
            p->x = x; p->y = y; p->z = z; p->w = 1.0f;
        }

        void init_vector_dxyz(vector3d_t *v, float dx, float dy, float dz)
        {
            v->dx = dx; v->dy = dy; v->dz = dz; v->dw = 0.0f;
        }

        void init_matrix3d_translate(matrix3d_t *m, float dx, float dy,
                                     float dz)
        {
            for (int i = 0; i < 16; ++i)
                m->m[i] = (i % 5 == 0) ? 1.0f : 0.0f;
            m->m[12] = dx;
            m->m[13] = dy;
            m->m[14] = dz;
        }

        void init_matrix3d_translate_p1(matrix3d_t *m, const point3d_t *p)
        {
            init_matrix3d_translate(m, p->x, p->y, p->z);
        }

        static void init_rotate(matrix3d_t *m, float angle, int a, int b)
        {
            for (int i = 0; i < 16; ++i)
                m->m[i] = (i % 5 == 0) ? 1.0f : 0.0f;
            float c = cosf(angle), s = sinf(angle);
            m->m[a * 4 + a] = c;
            m->m[b * 4 + b] = c;
            m->m[a * 4 + b] = s;    /* column a, row b */
            m->m[b * 4 + a] = -s;
        }

        void init_matrix3d_rotate_x(matrix3d_t *m, float angle)
        { init_rotate(m, angle, 1, 2); }
        void init_matrix3d_rotate_y(matrix3d_t *m, float angle)
        { init_rotate(m, angle, 2, 0); }
        void init_matrix3d_rotate_z(matrix3d_t *m, float angle)
        { init_rotate(m, angle, 0, 1); }

        void apply_matrix3d_mm1(matrix3d_t *dst, const matrix3d_t *src)
        {
            /* dst = dst * src (column-major) */
            float r[16];
            for (int c = 0; c < 4; ++c)
                for (int rI = 0; rI < 4; ++rI)
                {
                    float s = 0.0f;
                    for (int k = 0; k < 4; ++k)
                        s += dst->m[k * 4 + rI] * src->m[c * 4 + k];
                    r[c * 4 + rI] = s;
                }
            for (int i = 0; i < 16; ++i)
                dst->m[i] = r[i];
        }

        void apply_matrix3d_mp2(point3d_t *dst, const point3d_t *src,
                                const matrix3d_t *m)
        {
            float x = src->x, y = src->y, z = src->z, w = src->w;
            dst->x = m->m[0] * x + m->m[4] * y + m->m[8] * z + m->m[12] * w;
            dst->y = m->m[1] * x + m->m[5] * y + m->m[9] * z + m->m[13] * w;
            dst->z = m->m[2] * x + m->m[6] * y + m->m[10] * z + m->m[14] * w;
            dst->w = m->m[3] * x + m->m[7] * y + m->m[11] * z + m->m[15] * w;
        }

        void apply_matrix3d_mp1(point3d_t *p, const matrix3d_t *m)
        {
            point3d_t t = *p;
            apply_matrix3d_mp2(p, &t, m);
        }

        void scale_point2(point3d_t *dst, const point3d_t *src, float k)
        {
            dst->x = src->x * k;
            dst->y = src->y * k;
            dst->z = src->z * k;
            dst->w = 1.0f;
        }

        void add_vector_pvk1(point3d_t *p, const vector3d_t *v, float k)
        {
            p->x += v->dx * k;
            p->y += v->dy * k;
            p->z += v->dz * k;
        }

        void calc_plane_pv(vector3d_t *plane, const point3d_t *p)
        {
            float ux = p[1].x - p[0].x, uy = p[1].y - p[0].y,
                  uz = p[1].z - p[0].z;
            float vx = p[2].x - p[0].x, vy = p[2].y - p[0].y,
                  vz = p[2].z - p[0].z;
            float nx = uy * vz - uz * vy;
            float ny = uz * vx - ux * vz;
            float nz = ux * vy - uy * vx;
            float len = sqrtf(nx * nx + ny * ny + nz * nz);
            if (len > 0.0f)
            {
                nx /= len; ny /= len; nz /= len;
            }
            plane->dx = nx;
            plane->dy = ny;
            plane->dz = nz;
            plane->dw = -(nx * p[0].x + ny * p[0].y + nz * p[0].z);
        }
    } /* namespace dsp */
} /* namespace lsp */

namespace lsp
{
    namespace dsp
    {
        /* bsp::context geometry (3d/bsp/context.cpp).  Point-vs-plane
         * colocation codes: 0 = positive side, 1 = on plane, 2 =
         * negative side, packed (c2 << 4) | (c1 << 2) | c0 — the
         * encoding that makes context.cpp's split cases geometrically
         * consistent (case 0x02 splits edges v0-v1 and v0-v2, so the
         * lone vertex v0 must carry the low bits); tolerance 1e-5. */
        static const float DSP3D_TOL = 1e-5f;

        void calc_normal3d_pv(vector3d_t *n, const point3d_t *p)
        {
            calc_plane_pv(n, p);
            n->dw = 0.0f;
        }

        void calc_split_point_p2v1(point3d_t *dst, const point3d_t *a,
                                   const point3d_t *b,
                                   const vector3d_t *pl)
        {
            float da = pl->dx * a->x + pl->dy * a->y + pl->dz * a->z
                     + pl->dw;
            float db = pl->dx * b->x + pl->dy * b->y + pl->dz * b->z
                     + pl->dw;
            float t = da / (da - db);
            dst->x = a->x + (b->x - a->x) * t;
            dst->y = a->y + (b->y - a->y) * t;
            dst->z = a->z + (b->z - a->z) * t;
            dst->w = 1.0f;
        }

        size_t colocation_x3_v1pv(const vector3d_t *pl,
                                  const point3d_t *p)
        {
            size_t tag = 0;
            for (int i = 2; i >= 0; --i)
            {
                float s = pl->dx * p[i].x + pl->dy * p[i].y
                        + pl->dz * p[i].z + pl->dw;
                size_t c = (s > DSP3D_TOL) ? 0 : (s < -DSP3D_TOL) ? 2 : 1;
                tag = (tag << 2) | c;
            }
            return tag;
        }

        void flip_vector_v2(vector3d_t *dst, const vector3d_t *src)
        {
            dst->dx = -src->dx;
            dst->dy = -src->dy;
            dst->dz = -src->dz;
            dst->dw = -src->dw;
        }
    } /* namespace dsp */
} /* namespace lsp */

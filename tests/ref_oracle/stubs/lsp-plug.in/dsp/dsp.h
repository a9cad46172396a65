/* Minimal stand-in for lsp-dsp-lib's <lsp-plug.in/dsp/dsp.h>
 * (see common/types.h header note).
 *
 * Declares exactly the types + kernels the compiled-in reference
 * sources use; scalar implementations live in oracle.cpp.  Struct
 * layouts are self-consistent (only this TU reads them) — field NAMES
 * match what the reference sources write, inferred from their usage
 * (Filter.cpp:2259-2266, FilterBank.cpp:106-236).
 */
#ifndef LSP_PLUG_IN_DSP_DSP_H_
#define LSP_PLUG_IN_DSP_DSP_H_

#include <lsp-plug.in/common/types.h>
#include <stddef.h>

#define LSP_DSP_BIQUAD_ALIGN    64
#define LSP_DSP_BIQUAD_D_ITEMS  16
/* head/tail reserve for the resampling kernels' spill; must cover the
 * longest stub kernel (24-bit tier: 2*62*8 + 1 = 993 samples) */
#define LSP_DSP_RESAMPLING_RSV_SAMPLES  1024

namespace lsp
{
    namespace dsp
    {
        /* one analog second-order rational cascade:
         * H(s) = (t0 + t1 s + t2 s^2) / (b0 + b1 s + b2 s^2) */
        typedef struct f_cascade_t
        {
            float t[4];
            float b[4];
        } f_cascade_t;

        typedef struct biquad_x1_t
        {
            float b0, b1, b2;   /* numerator */
            float a1, a2;       /* denominator, stored sign-negated */
            float p0, p1, p2;   /* padding */
        } biquad_x1_t;

        typedef struct biquad_x2_t
        {
            float b0[2], b1[2], b2[2];
            float a1[2], a2[2];
            float p[2];
        } biquad_x2_t;

        typedef struct biquad_x4_t
        {
            float b0[4], b1[4], b2[4];
            float a1[4], a2[4];
        } biquad_x4_t;

        typedef struct biquad_x8_t
        {
            float b0[8], b1[8], b2[8];
            float a1[8], a2[8];
        } biquad_x8_t;

        typedef struct biquad_t
        {
            union
            {
                biquad_x1_t x1;
                biquad_x2_t x2;
                biquad_x4_t x4;
                biquad_x8_t x8;
            };
            float d[LSP_DSP_BIQUAD_D_ITEMS] __lsp_aligned64;
        } biquad_t;

        /* dynamics knee descriptors — field names per their producers:
         * Compressor.cpp:100-216, Gate.cpp:180-206, Expander.cpp:205-240 */
        typedef struct compressor_knee_t
        {
            float start, end, gain;
            float tilt[2];
            float herm[3];
        } compressor_knee_t;

        typedef struct compressor_x2_t
        {
            compressor_knee_t k[2];
        } compressor_x2_t;

        typedef struct gate_knee_t
        {
            float start, end;
            float gain_start, gain_end;
            float herm[4];
        } gate_knee_t;

        typedef struct expander_knee_t
        {
            float start, end, threshold;
            float tilt[2];
            float herm[3];
        } expander_knee_t;

        void fill_zero(float *dst, size_t count);
        void fill_one(float *dst, size_t count);
        void copy(float *dst, const float *src, size_t count);
        /* copy with NaN/Inf/denormal stripping (AudioStream
         * read/write_sanitized copy_function_t) */
        void sanitize2(float *dst, const float *src, size_t count);
        void move(float *dst, const float *src, size_t count);
        void add2(float *dst, const float *src, size_t count);
        void mul2(float *dst, const float *src, size_t count);
        void mul3(float *dst, const float *a, const float *b, size_t count);
        void mul_k2(float *dst, float k, size_t count);
        void mul_k3(float *dst, const float *src, float k, size_t count);
        void fmadd3(float *dst, const float *a, const float *b, size_t count);
        void fmadd_k3(float *dst, const float *src, float k, size_t count);
        void abs_mul3(float *dst, const float *a, const float *b,
                      size_t count);
        size_t max_index(const float *src, size_t count);

        /* elementwise / reductions */
        void fill(float *dst, float value, size_t count);
        void abs1(float *dst, size_t count);
        void abs2(float *dst, const float *src, size_t count);
        void add_k2(float *dst, float k, size_t count);
        void add3(float *dst, const float *a, const float *b, size_t count);
        void exp1(float *dst, size_t count);
        void powvc1(float *dst, float k, size_t count);
        void ssqrt1(float *dst, size_t count);
        float h_sqr_sum(const float *src, size_t count);
        float h_abs_sum(const float *src, size_t count);
        void reverse2(float *dst, const float *src, size_t count);
        void lramp1(float *dst, float v1, float v2, size_t count);
        void lramp_add2(float *dst, const float *src, float v1, float v2,
                        size_t count);
        void lin_inter_set(float *dst, int32_t x0, float y0, int32_t x1,
                           float y1, int32_t x, uint32_t count);

        /* stereo channel selectors (Sidechain source select) */
        void lr_to_mid(float *dst, const float *l, const float *r,
                       size_t count);
        void lr_to_side(float *dst, const float *l, const float *r,
                        size_t count);
        void ms_to_left(float *dst, const float *m, const float *s,
                        size_t count);
        void ms_to_right(float *dst, const float *m, const float *s,
                         size_t count);
        void psmin3(float *dst, const float *a, const float *b,
                    size_t count);
        void psmax3(float *dst, const float *a, const float *b,
                    size_t count);
        void pamin3(float *dst, const float *a, const float *b,
                    size_t count);
        void pamax3(float *dst, const float *a, const float *b,
                    size_t count);
        void lr_psmin3(float *dst, const float *m, const float *s,
                       size_t count);
        void lr_psmax3(float *dst, const float *m, const float *s,
                       size_t count);
        void ms_pamin3(float *dst, const float *m, const float *s,
                       size_t count);
        void ms_pamax3(float *dst, const float *m, const float *s,
                       size_t count);

        /* normalized sliding correlation (Correlometer.cpp:134-185:
         * corr_init accumulates the window sums, corr_incr slides by
         * adding new / subtracting old samples and emits
         * v / sqrt(a*b)) */
        typedef struct correlation_t
        {
            float v;    /* sum of a[i]*b[i] */
            float a;    /* sum of a[i]^2    */
            float b;    /* sum of b[i]^2    */
        } correlation_t;

        void corr_init(correlation_t *corr, const float *a, const float *b,
                       size_t count);
        void corr_incr(correlation_t *corr, float *dst,
                       const float *a_head, const float *b_head,
                       const float *a_tail, const float *b_tail,
                       size_t count);

        float abs_max(const float *src, size_t count);
        float h_sum(const float *src, size_t count);
        float abs_min(const float *src, size_t count);
        float sign_max(const float *src, size_t count);
        float sign_min(const float *src, size_t count);

        /* dynamic (per-sample-coefficient) filter kernels
         * (DynamicFilters.cpp:204-314).  Coefficient arrays are
         * software-pipelined: stage k of output sample i reads row
         * i + k, lane k; rows run count + (lanes-1). */
        float irootf(float x, uint32_t n);
        void lanczos1(float *dst, float k, float p, float t, float a,
                      size_t count);
        void limit1(float *dst, float min, float max, size_t count);
        void pcomplex_r2c_mul2(float *dst, const float *src, size_t count);
        void bilinear_transform_x1(biquad_x1_t *bf, const f_cascade_t *bc,
                                   float kf, size_t count);
        void bilinear_transform_x2(biquad_x2_t *bf, const f_cascade_t *bc,
                                   float kf, size_t count);
        void bilinear_transform_x4(biquad_x4_t *bf, const f_cascade_t *bc,
                                   float kf, size_t count);
        void bilinear_transform_x8(biquad_x8_t *bf, const f_cascade_t *bc,
                                   float kf, size_t count);
        void matched_transform_x1(biquad_x1_t *bf, f_cascade_t *bc,
                                  float freq, float td, size_t count);
        void matched_transform_x2(biquad_x2_t *bf, f_cascade_t *bc,
                                  float freq, float td, size_t count);
        void matched_transform_x4(biquad_x4_t *bf, f_cascade_t *bc,
                                  float freq, float td, size_t count);
        void matched_transform_x8(biquad_x8_t *bf, f_cascade_t *bc,
                                  float freq, float td, size_t count);
        void dyn_biquad_process_x1(float *dst, const float *src, float *d,
                                   size_t count, const biquad_x1_t *f);
        void dyn_biquad_process_x2(float *dst, const float *src, float *d,
                                   size_t count, const biquad_x2_t *f);
        void dyn_biquad_process_x4(float *dst, const float *src, float *d,
                                   size_t count, const biquad_x4_t *f);
        void dyn_biquad_process_x8(float *dst, const float *src, float *d,
                                   size_t count, const biquad_x8_t *f);

        /* Lanczos polyphase resamplers + decimators (Oversampler,
         * TruePeakMeter, Oscillator) — see dsp_stub3.cpp kernel note */
        typedef void (*resampling_function_t)(float *dst, const float *src,
                                              size_t count);
#define LSP_STUB_LANCZOS_DECL(N) \
        void lanczos_resample_##N##x2(float *dst, const float *src, \
                                      size_t count); \
        void lanczos_resample_##N##x3(float *dst, const float *src, \
                                      size_t count); \
        void lanczos_resample_##N##x4(float *dst, const float *src, \
                                      size_t count); \
        void lanczos_resample_##N##x12bit(float *dst, const float *src, \
                                          size_t count); \
        void lanczos_resample_##N##x16bit(float *dst, const float *src, \
                                          size_t count); \
        void lanczos_resample_##N##x24bit(float *dst, const float *src, \
                                          size_t count); \
        void downsample_##N##x(float *dst, const float *src, size_t count);
        LSP_STUB_LANCZOS_DECL(2)
        LSP_STUB_LANCZOS_DECL(3)
        LSP_STUB_LANCZOS_DECL(4)
        LSP_STUB_LANCZOS_DECL(6)
        LSP_STUB_LANCZOS_DECL(8)
#undef LSP_STUB_LANCZOS_DECL
        void sqr2(float *dst, const float *src, size_t count);
        void mix_copy2(float *dst, const float *a, const float *b,
                       float ka, float kb, size_t count);

        /* packed-complex FFT layer (interleaved re,im pairs; rank =
         * log2(points); reverse is scaled by 1/N) + fast convolution
         * images.  The image format is OPAQUE to the reference sources
         * (an allocated blob of 2^(rank+1) floats passed back to these
         * functions), so this stand-in stores the full packed spectrum
         * of the zero-padded 2^(rank-1)-sample block. */
        void packed_direct_fft(float *dst, const float *src, size_t rank);
        void packed_reverse_fft(float *dst, const float *src, size_t rank);
        void pcomplex_r2c(float *dst, const float *src, size_t count);
        void pcomplex_c2r(float *dst, const float *src, size_t count);
        void pcomplex_mod(float *dst, const float *src, size_t count);
        void pcomplex_mul2(float *dst, const float *src, size_t count);
        void complex_mul3(float *dst_re, float *dst_im, const float *a_re,
                          const float *a_im, const float *b_re,
                          const float *b_im, size_t count);
        void complex_rcp2(float *dst_re, float *dst_im, const float *src_re,
                          const float *src_im, size_t count);
        void direct_fft(float *dst_re, float *dst_im, const float *src_re,
                        const float *src_im, size_t rank);
        void reverse_fft(float *dst_re, float *dst_im, const float *src_re,
                         const float *src_im, size_t rank);
        void normalize(float *dst, const float *src, size_t count);
        size_t abs_max_index(const float *src, size_t count);
        void sub2(float *dst, const float *src, size_t count);
        void mix2(float *dst, const float *src, float k1, float k2,
                  size_t count);
        void reverse1(float *dst, size_t count);
        void complex_mul2(float *dst_re, float *dst_im, const float *src_re,
                          const float *src_im, size_t count);
        void fastconv_parse(float *dst, const float *src, size_t rank);
        void fastconv_apply(float *dst, float *tmp, const float *c1,
                            const float *c2, size_t rank);
        void fastconv_parse_apply(float *dst, float *tmp, const float *c,
                                  const float *src, size_t rank);
        void convolve(float *dst, const float *src, const float *conv,
                      size_t length, size_t count);

        void compressor_x2_gain(float *dst, const float *src,
                                const compressor_x2_t *c, size_t count);
        void compressor_x2_curve(float *dst, const float *src,
                                 const compressor_x2_t *c, size_t count);
        void gate_x1_gain(float *dst, const float *src,
                          const gate_knee_t *c, size_t count);
        void gate_x1_curve(float *dst, const float *src,
                           const gate_knee_t *c, size_t count);
        void uexpander_x1_gain(float *dst, const float *src,
                               const expander_knee_t *c, size_t count);
        void uexpander_x1_curve(float *dst, const float *src,
                                const expander_knee_t *c, size_t count);
        void dexpander_x1_gain(float *dst, const float *src,
                               const expander_knee_t *c, size_t count);
        void dexpander_x1_curve(float *dst, const float *src,
                                const expander_knee_t *c, size_t count);

        void biquad_process_x1(float *dst, const float *src, size_t count,
                               biquad_t *f);
        void biquad_process_x2(float *dst, const float *src, size_t count,
                               biquad_t *f);
        void biquad_process_x4(float *dst, const float *src, size_t count,
                               biquad_t *f);
        void biquad_process_x8(float *dst, const float *src, size_t count,
                               biquad_t *f);

        /* analog transfer of a cascade evaluated at angular-normalized
         * frequencies w[i]:  H(jw) = (t0 - t2 w^2 + j t1 w)
         *                          / (b0 - b2 w^2 + j b1 w) */
        void filter_transfer_calc_ri(float *re, float *im,
                                     const f_cascade_t *c,
                                     const float *freq, size_t count);
        void filter_transfer_apply_ri(float *re, float *im,
                                      const f_cascade_t *c,
                                      const float *freq, size_t count);
        void filter_transfer_calc_pc(float *ri, const f_cascade_t *c,
                                     const float *freq, size_t count);
        void filter_transfer_apply_pc(float *ri, const f_cascade_t *c,
                                      const float *freq, size_t count);
        void pcomplex_fill_ri(float *dst, float re, float im, size_t count);

        /* 3D geometry types + ops (3d/raytrace.cpp): homogeneous
         * points/vectors, 4x4 column-major matrices, p' = M * p */
#ifndef DSP_3D_TOLERANCE
#define DSP_3D_TOLERANCE 1e-5f
#endif
        typedef struct point3d_t
        {
            float x, y, z, w;
        } point3d_t;

        typedef struct vector3d_t
        {
            float dx, dy, dz, dw;
        } vector3d_t;

        typedef struct matrix3d_t
        {
            float m[16];    /* column-major */
        } matrix3d_t;

        typedef struct raw_triangle_t
        {
            point3d_t v[3];
        } raw_triangle_t;

        typedef struct color3d_t
        {
            float r, g, b, a;
        } color3d_t;

        typedef struct bound_box3d_t
        {
            point3d_t p[8];
        } bound_box3d_t;

        void init_point_xyz(point3d_t *p, float x, float y, float z);
        void init_vector_dxyz(vector3d_t *v, float dx, float dy, float dz);
        void init_matrix3d_translate(matrix3d_t *m, float dx, float dy,
                                     float dz);
        void init_matrix3d_translate_p1(matrix3d_t *m, const point3d_t *p);
        void init_matrix3d_rotate_x(matrix3d_t *m, float angle);
        void init_matrix3d_rotate_y(matrix3d_t *m, float angle);
        void init_matrix3d_rotate_z(matrix3d_t *m, float angle);
        void apply_matrix3d_mm1(matrix3d_t *dst, const matrix3d_t *src);
        void apply_matrix3d_mp1(point3d_t *p, const matrix3d_t *m);
        void apply_matrix3d_mp2(point3d_t *dst, const point3d_t *src,
                                const matrix3d_t *m);
        void scale_point2(point3d_t *dst, const point3d_t *src, float k);
        void add_vector_pvk1(point3d_t *p, const vector3d_t *v, float k);
        void calc_plane_pv(vector3d_t *plane, const point3d_t *p);
        void calc_normal3d_pv(vector3d_t *n, const point3d_t *p);
        void calc_split_point_p2v1(point3d_t *dst, const point3d_t *a,
                                   const point3d_t *b,
                                   const vector3d_t *pl);
        size_t colocation_x3_v1pv(const vector3d_t *pl,
                                  const point3d_t *p);
        void flip_vector_v2(vector3d_t *dst, const vector3d_t *src);

        /* 3D geometry ops for the rt:: beam machinery
         * (3d/rt/{context,mesh,plan}.cpp + 3d/RayTrace3D.cpp);
         * conventions documented in dsp_stub4.cpp.  The colocation
         * tolerance mirrors lsp-dsp-lib's DSP_3D_TOLERANCE. */
        void init_matrix3d_identity(matrix3d_t *m);
        void apply_matrix3d_mv1(vector3d_t *v, const matrix3d_t *m);
        void init_vector_p2(vector3d_t *v, const point3d_t *a,
                            const point3d_t *b);
        void normalize_vector(vector3d_t *v);
        void unit_vector_p1pv(vector3d_t *v, const point3d_t *s,
                              const point3d_t *p);
        float calc_area_p3(const point3d_t *a, const point3d_t *b,
                           const point3d_t *c);
        float calc_area_pv(const point3d_t *p);
        float calc_distance_p2(const point3d_t *a, const point3d_t *b);
        float calc_distance_v1(const vector3d_t *v);
        float calc_min_distance_pv(const point3d_t *p,
                                   const point3d_t *pv);
        void calc_normal3d_p3(vector3d_t *n, const point3d_t *p0,
                              const point3d_t *p1, const point3d_t *p2);
        float calc_plane_p3(vector3d_t *pl, const point3d_t *p0,
                            const point3d_t *p1, const point3d_t *p2);
        float calc_plane_v1p2(vector3d_t *pl, const vector3d_t *n,
                              const point3d_t *a, const point3d_t *b);
        void calc_oriented_plane_p3(vector3d_t *pl, const point3d_t *pos,
                                    const point3d_t *p0,
                                    const point3d_t *p1,
                                    const point3d_t *p2);
        void calc_oriented_plane_pv(vector3d_t *pl, const point3d_t *pos,
                                    const point3d_t *p);
        void calc_rev_oriented_plane_p3(vector3d_t *pl,
                                        const point3d_t *pos,
                                        const point3d_t *p0,
                                        const point3d_t *p1,
                                        const point3d_t *p2);
        void orient_plane_v1p1(vector3d_t *dst, const point3d_t *pos,
                               const vector3d_t *src);
        void calc_split_point_pvv1(point3d_t *dst, const point3d_t *p,
                                   const vector3d_t *pl);
        size_t colocation_x2_v1pv(const vector3d_t *pl,
                                  const point3d_t *p);
        size_t colocation_x2_v1p2(const vector3d_t *pl,
                                  const point3d_t *a,
                                  const point3d_t *b);
        size_t colocation_x3_vvp1(const vector3d_t *vv,
                                  const point3d_t *p);
        void cull_triangle_raw(raw_triangle_t *out, size_t *n_out,
                               const vector3d_t *pl,
                               const raw_triangle_t *src);
        void split_triangle_raw(raw_triangle_t *out, size_t *n_out,
                                raw_triangle_t *in, size_t *n_in,
                                const vector3d_t *pl,
                                const raw_triangle_t *src);

        /* lsp-dsp-lib execution context: FPU state save/restore is a
         * no-op on this build. */
        typedef struct context_t
        {
            uint32_t data[4];
        } context_t;

        inline void start(context_t *) {}
        inline void finish(context_t *) {}
    } /* namespace dsp */
} /* namespace lsp */

#endif /* LSP_PLUG_IN_DSP_DSP_H_ */

/* Minimal stand-in for lsp-dsp-lib's filters/transform.h (see
 * common/types.h header note).  Declares the cascade->biquad bilinear
 * transform used by SpectralTilt.cpp:367; the math mirrors the
 * reference's own Filter::bilinear_transform (Filter.cpp:2225-2267). */
#ifndef LSP_PLUG_IN_DSP_COMMON_FILTERS_TRANSFORM_H_
#define LSP_PLUG_IN_DSP_COMMON_FILTERS_TRANSFORM_H_

#include <lsp-plug.in/dsp/dsp.h>

namespace lsp
{
    namespace dsp
    {
        void bilinear_transform_x1(biquad_x1_t *bf, const f_cascade_t *bc,
                                   float kf, size_t count);
    } /* namespace dsp */
} /* namespace lsp */

#endif /* LSP_PLUG_IN_DSP_COMMON_FILTERS_TRANSFORM_H_ */

/* Minimal stand-in for lsp-common-lib's <lsp-plug.in/common/bits.h>
 * (see types.h header note). */
#ifndef LSP_PLUG_IN_COMMON_BITS_H_
#define LSP_PLUG_IN_COMMON_BITS_H_

#include <lsp-plug.in/common/types.h>

namespace lsp
{
    inline int int_log2(uint32_t v)
    {
        return (v > 0) ? 31 - __builtin_clz(v) : 0;
    }

    inline int int_log2(uint64_t v)
    {
        return (v > 0) ? 63 - __builtin_clzll(v) : 0;
    }

    template <class T>
    inline T fixed_int(T v)
    {
        return v;
    }

    inline size_t round_pow2(size_t v)
    {
        size_t r = 1;
        while (r < v)
            r <<= 1;
        return r;
    }
} /* namespace lsp */

#endif /* LSP_PLUG_IN_COMMON_BITS_H_ */

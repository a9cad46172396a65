/* Minimal stand-in for lsp-common-lib's <lsp-plug.in/common/types.h>.
 *
 * The reference (/root/reference) is compiled AS AN ORACLE for parity
 * tests: its source dependencies (lsp-common-lib, lsp-dsp-lib) are
 * fetched from the network at build time upstream and are not vendored,
 * so this tree provides the tiny surface the compiled-in sources
 * actually use.  Only generic typedefs/macros — no reference code.
 */
#ifndef LSP_PLUG_IN_COMMON_TYPES_H_
#define LSP_PLUG_IN_COMMON_TYPES_H_

#include <stdint.h>
#include <stddef.h>
#include <sys/types.h>

namespace lsp
{
    /* machine-word types (lsp-common-lib convention) */
    typedef uintptr_t   umword_t;
    typedef intptr_t    smword_t;
    typedef uint64_t    wsize_t;
    typedef int64_t     wssize_t;

    template <class T>
    inline void swap(T &a, T &b)
    {
        T t = a;
        a = b;
        b = t;
    }
} /* namespace lsp */

#define __IF_64(...)        __VA_ARGS__
#define __IF_32(...)

#define __lsp_aligned16     __attribute__((aligned(16)))
#define __lsp_aligned32     __attribute__((aligned(32)))
#define __lsp_aligned64     __attribute__((aligned(64)))

template <class A, class B>
inline auto lsp_min(A a, B b) -> decltype(a + b)
{
    return (a < b) ? a : b;
}

template <class A, class B, class C>
inline auto lsp_min(A a, B b, C c) -> decltype(a + b + c)
{
    return lsp_min(lsp_min(a, b), c);
}

template <class A, class B>
inline auto lsp_max(A a, B b) -> decltype(a + b)
{
    return (a > b) ? a : b;
}

template <class A, class B, class C>
inline auto lsp_max(A a, B b, C c) -> decltype(a + b + c)
{
    return lsp_max(lsp_max(a, b), c);
}

template <class A, class B, class C, class D>
inline auto lsp_min(A a, B b, C c, D d) -> decltype(a + b + c + d)
{
    return lsp_min(lsp_min(a, b), lsp_min(c, d));
}

template <class A, class B, class C, class D>
inline auto lsp_max(A a, B b, C c, D d) -> decltype(a + b + c + d)
{
    return lsp_max(lsp_max(a, b), lsp_max(c, d));
}

template <class T, class A, class B>
inline T lsp_limit(T v, A mn, B mx)
{
    return (v < mn) ? T(mn) : (v > mx) ? T(mx) : v;
}

template <class T, class M>
inline T lsp_setflag(T flags, M mask, bool cond)
{
    return (cond) ? T(flags | mask) : T(flags & ~T(mask));
}

#define LSP_EXPORT_MODIFIER
#define LSP_IMPORT_MODIFIER

#endif /* LSP_PLUG_IN_COMMON_TYPES_H_ */

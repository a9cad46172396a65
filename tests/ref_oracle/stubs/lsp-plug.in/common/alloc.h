/* Minimal stand-in for lsp-common-lib's <lsp-plug.in/common/alloc.h>
 * (see types.h header note). */
#ifndef LSP_PLUG_IN_COMMON_ALLOC_H_
#define LSP_PLUG_IN_COMMON_ALLOC_H_

#include <lsp-plug.in/common/types.h>
#include <stdlib.h>

#ifndef DEFAULT_ALIGN
    #define DEFAULT_ALIGN 0x10
#endif

namespace lsp
{
    inline size_t align_size(size_t size, size_t align)
    {
        return (size + align - 1) & ~(align - 1);
    }

    template <class T>
    inline T *align_ptr(T *src, size_t align = DEFAULT_ALIGN)
    {
        uintptr_t x = reinterpret_cast<uintptr_t>(src);
        return reinterpret_cast<T *>((x + align - 1) &
                                     ~(uintptr_t(align) - 1));
    }

    template <class T, class P>
    inline T *alloc_aligned(P *&ptr, size_t count,
                            size_t align = DEFAULT_ALIGN)
    {
        void *p = nullptr;
        size_t a = (align < sizeof(void *)) ? sizeof(void *) : align;
        if (posix_memalign(&p, a, count * sizeof(T)) != 0)
            return nullptr;
        ptr = reinterpret_cast<P *>(p);
        return reinterpret_cast<T *>(p);
    }

    template <class T, class P>
    inline T *realloc_aligned(P *&ptr, size_t count,
                              size_t align = DEFAULT_ALIGN)
    {
        /* simple grow: aligned alloc a fresh block (callers copy what
         * they need; the reference uses it for whole-buffer resize) */
        free(ptr);
        ptr = nullptr;
        void *p = nullptr;
        size_t a = (align < sizeof(void *)) ? sizeof(void *) : align;
        if (posix_memalign(&p, a, count * sizeof(T)) != 0)
            return nullptr;
        ptr = reinterpret_cast<P *>(p);
        return reinterpret_cast<T *>(p);
    }

    template <class P>
    inline void free_aligned(P *&ptr)
    {
        free(ptr);
        ptr = nullptr;
    }

    template <class T, class P>
    inline T *advance_ptr(P *&ptr, size_t count = 1)
    {
        T *r = reinterpret_cast<T *>(ptr);
        ptr = reinterpret_cast<P *>(reinterpret_cast<uint8_t *>(ptr)
                                    + count * sizeof(T));
        return r;
    }

    template <class T, class P>
    inline T *advance_ptr_bytes(P *&ptr, size_t bytes)
    {
        T *r = reinterpret_cast<T *>(ptr);
        ptr = reinterpret_cast<P *>(reinterpret_cast<uint8_t *>(ptr)
                                    + bytes);
        return r;
    }
} /* namespace lsp */

#endif /* LSP_PLUG_IN_COMMON_ALLOC_H_ */

/* Minimal stand-in for lsp-lltl-lib's darray<T>: std::vector backed,
 * only the surface the compiled-in sources use. */
#ifndef LSP_PLUG_IN_LLTL_DARRAY_H_
#define LSP_PLUG_IN_LLTL_DARRAY_H_

#include <vector>
#include <stddef.h>

namespace lsp
{
    namespace lltl
    {
        template <class T>
        class darray
        {
            private:
                std::vector<T> v;

            public:
                size_t size() const { return v.size(); }
                void clear() { v.clear(); }

                T *append()
                {
                    v.push_back(T());
                    return &v.back();
                }

                T *append(const T *src)
                {
                    v.push_back(*src);
                    return &v.back();
                }

                T *add_n(size_t n) { return append_n(n); }

                T *append_n(size_t n)
                {
                    size_t off = v.size();
                    v.resize(off + n);
                    return &v[off];
                }

                T *uget(size_t i) { return &v[i]; }
                const T *uget(size_t i) const { return &v[i]; }
                T *array() { return v.data(); }
                const T *array() const { return v.data(); }
        };
    } /* namespace lltl */
} /* namespace lsp */

#endif

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

                T *add()
                {
                    v.push_back(T());
                    return &v.back();
                }

                T *add(const T *src)
                {
                    v.push_back(*src);
                    return &v.back();
                }

                /* Bulk append another darray's contents. */
                bool add(const darray<T> *src)
                {
                    v.insert(v.end(), src->v.begin(), src->v.end());
                    return true;
                }

                bool remove_n(size_t off, size_t n)
                {
                    if (off + n > v.size())
                        return false;
                    v.erase(v.begin() + off, v.begin() + off + n);
                    return true;
                }

                T *get(size_t i) { return (i < v.size()) ? &v[i] : NULL; }
                const T *get(size_t i) const
                { return (i < v.size()) ? &v[i] : NULL; }
                T *uget(size_t i) { return &v[i]; }
                const T *uget(size_t i) const { return &v[i]; }
                T *array() { return v.data(); }
                const T *array() const { return v.data(); }
                bool is_empty() const { return v.empty(); }
                void swap(darray<T> *o) { v.swap(o->v); }
                void flush() { v.clear(); v.shrink_to_fit(); }
        };
    } /* namespace lltl */
} /* namespace lsp */

#endif

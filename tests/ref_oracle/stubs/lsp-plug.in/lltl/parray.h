/* Minimal stand-in for lsp-lltl-lib's parray<T> (pointer array). */
#ifndef LSP_PLUG_IN_LLTL_PARRAY_H_
#define LSP_PLUG_IN_LLTL_PARRAY_H_

#include <vector>
#include <stddef.h>

namespace lsp
{
    namespace lltl
    {
        template <class T>
        class parray;

        /* minimal forward iterator over a parray (Catalog::cleanup:
         * `for (lltl::iterator<Record> it=items->values(); it; ++it)`) */
        template <class T>
        class iterator
        {
            private:
                std::vector<T *> *v;
                size_t i;

            public:
                iterator(std::vector<T *> *vec, size_t idx)
                    : v(vec), i(idx) {}
                explicit operator bool() const { return i < v->size(); }
                iterator &operator++() { ++i; return *this; }
                T *get() const { return (i < v->size()) ? (*v)[i] : NULL; }
                T *operator*() const { return get(); }
        };

        template <class T>
        class parray
        {
            private:
                std::vector<T *> v;

            public:
                size_t size() const { return v.size(); }
                void clear() { v.clear(); }
                bool add(T *item) { v.push_back(item); return true; }
                bool push(T *item) { v.push_back(item); return true; }
                T *pop()
                {
                    if (v.empty())
                        return NULL;
                    T *t = v.back();
                    v.pop_back();
                    return t;
                }
                bool pop(T **dst)
                {
                    if (v.empty())
                        return false;
                    *dst = v.back();
                    v.pop_back();
                    return true;
                }
                ssize_t index_of(const T *item) const
                {
                    for (size_t i = 0; i < v.size(); ++i)
                        if (v[i] == item)
                            return ssize_t(i);
                    return -1;
                }
                T *get(size_t i) const
                { return (i < v.size()) ? v[i] : NULL; }
                T *uget(size_t i) const { return v[i]; }
                T **array() { return v.data(); }
                bool is_empty() const { return v.empty(); }
                void swap(parray<T> *o) { v.swap(o->v); }
                void flush() { v.clear(); }
                iterator<T> values() { return iterator<T>(&v, 0); }
        };
    } /* namespace lltl */
} /* namespace lsp */

#endif

/* Minimal stand-in for lsp-runtime-lib's io::Path (std::string backed):
 * enough path arithmetic for the compiled-in sources; filesystem
 * mutation is limited to remove(). */
#ifndef LSP_PLUG_IN_IO_PATH_H_
#define LSP_PLUG_IN_IO_PATH_H_

#include <lsp-plug.in/common/status.h>
#include <lsp-plug.in/runtime/LSPString.h>

#include <stdio.h>
#include <string>

namespace lsp
{
    namespace io
    {
        class Path
        {
            private:
                std::string s;

            public:
                Path() {}

                status_t set(const char *v)
                { s = (v != NULL) ? v : ""; return STATUS_OK; }
                status_t set(const LSPString *v)
                { s = v->str(); return STATUS_OK; }
                status_t set(const Path *v)
                { s = v->s; return STATUS_OK; }
                status_t set(const Path *dir, const char *child)
                { s = dir->s + "/" + child; return STATUS_OK; }

                status_t canonicalize() { return STATUS_OK; }
                bool is_root() const { return s == "/"; }
                status_t set_parent(const Path *p)
                { s = p->s + "/" + s; return STATUS_OK; }
                status_t set_parent(const LSPString *p)
                { s = p->str() + "/" + s; return STATUS_OK; }
                bool equals(const Path *o) const { return s == o->s; }
                bool is_empty() const { return s.empty(); }
                const char *as_utf8() const { return s.c_str(); }

                status_t get_parent(Path *dst) const
                {
                    size_t p = s.find_last_of('/');
                    dst->s = (p == std::string::npos) ? std::string(".")
                                                      : s.substr(0, p);
                    return STATUS_OK;
                }

                status_t get_last(LSPString *dst) const
                {
                    size_t p = s.find_last_of('/');
                    dst->set_utf8((p == std::string::npos)
                                  ? s.c_str() : s.c_str() + p + 1);
                    return STATUS_OK;
                }

                status_t remove_last()
                {
                    size_t p = s.find_last_of('/');
                    if (p != std::string::npos)
                        s.resize(p);
                    return STATUS_OK;
                }

                status_t remove()
                {
                    if (!s.empty())
                        ::remove(s.c_str());
                    return STATUS_OK;
                }

                void swap(Path *o) { s.swap(o->s); }
        };
    } /* namespace io */
} /* namespace lsp */

#endif

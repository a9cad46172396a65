/* Minimal stand-in for lsp-runtime-lib's LSPString (std::string
 * backed; only the surface the compiled-in sources touch). */
#ifndef LSP_PLUG_IN_RUNTIME_LSPSTRING_H_
#define LSP_PLUG_IN_RUNTIME_LSPSTRING_H_

#include <string>
#include <cstdarg>
#include <cstdio>

namespace lsp
{
    class LSPString
    {
        private:
            std::string s;

        public:
            LSPString() {}
            bool set_utf8(const char *v) { s = (v != NULL) ? v : ""; return true; }
            bool set_utf8(const char *v, size_t len)
            { s.assign((v != NULL) ? v : "", (v != NULL) ? len : 0); return true; }
            bool set(const LSPString *v) { s = v->s; return true; }
            bool append_ascii(const char *v) { s += (v != NULL) ? v : ""; return true; }
            bool equals(const LSPString *o) const { return s == o->s; }
            const char *get_utf8() const { return s.c_str(); }
            const char *get_native() const { return s.c_str(); }
            bool is_empty() const { return s.empty(); }
            bool fmt_utf8(const char *fmt, ...)
            {
                char buf[512];
                va_list ap;
                va_start(ap, fmt);
                vsnprintf(buf, sizeof(buf), fmt, ap);
                va_end(ap);
                s = buf;
                return true;
            }
            void swap(LSPString *o) { s.swap(o->s); }
            void swap(LSPString &o) { s.swap(o.s); }
            const std::string &str() const { return s; }
            std::string &str() { return s; }
    };
} /* namespace lsp */

#endif

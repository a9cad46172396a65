/* Minimal stand-in for lsp-runtime-lib's io::Path: the compiled
 * sources only construct one and pass it down to (stubbed-out) file
 * I/O, which reports STATUS_NOT_IMPLEMENTED. */
#ifndef LSP_PLUG_IN_IO_PATH_H_
#define LSP_PLUG_IN_IO_PATH_H_

#include <lsp-plug.in/common/status.h>
#include <lsp-plug.in/runtime/LSPString.h>

namespace lsp
{
    namespace io
    {
        class Path
        {
            public:
                Path() {}
                status_t set(const char *) { return STATUS_OK; }
                status_t set(const LSPString *) { return STATUS_OK; }
        };
    } /* namespace io */
} /* namespace lsp */

#endif

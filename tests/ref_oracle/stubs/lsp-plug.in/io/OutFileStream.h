/* Minimal stand-in: temp-file extraction is not exercised by the
 * oracle tests. */
#ifndef LSP_PLUG_IN_IO_OUTFILESTREAM_H_
#define LSP_PLUG_IN_IO_OUTFILESTREAM_H_

#include <lsp-plug.in/common/status.h>
#include <lsp-plug.in/io/Path.h>

namespace lsp
{
    enum
    {
        WRAP_NONE = 0,
        WRAP_CLOSE = 1 << 0,
        WRAP_DELETE = 1 << 1
    };

    namespace io
    {
        class OutFileStream
        {
            public:
                status_t open_temp(Path *) { return STATUS_NOT_IMPLEMENTED; }
                status_t close() { return STATUS_OK; }
        };

        class IInStream
        {
            public:
                virtual ~IInStream() {}
                virtual wssize_t sink(OutFileStream *)
                { return -((wssize_t) STATUS_NOT_IMPLEMENTED); }
                virtual status_t close() { return STATUS_OK; }
        };
    } /* namespace io */
} /* namespace lsp */

#endif

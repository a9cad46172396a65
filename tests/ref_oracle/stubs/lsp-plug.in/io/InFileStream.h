/* Minimal stand-in: Scene3D file loading is not exercised by the
 * oracle tests (scenes are built programmatically through the
 * Scene3D/Object3D API), so open() always fails cleanly. */
#ifndef LSP_PLUG_IN_IO_INFILESTREAM_H_
#define LSP_PLUG_IN_IO_INFILESTREAM_H_

#include <lsp-plug.in/common/status.h>
#include <lsp-plug.in/io/IInStream.h>
#include <lsp-plug.in/io/Path.h>
#include <lsp-plug.in/runtime/LSPString.h>

namespace lsp
{
    namespace io
    {
        class InFileStream: public IInStream
        {
            public:
                status_t open(const char *) { return STATUS_NOT_FOUND; }
                status_t open(const LSPString *) { return STATUS_NOT_FOUND; }
                status_t open(const Path *) { return STATUS_NOT_FOUND; }
        };
    } /* namespace io */
} /* namespace lsp */

#endif /* LSP_PLUG_IN_IO_INFILESTREAM_H_ */

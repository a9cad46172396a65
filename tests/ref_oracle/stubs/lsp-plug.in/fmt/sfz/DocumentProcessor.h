#ifndef LSP_PLUG_IN_FMT_SFZ_DOCUMENTPROCESSOR_H_
#define LSP_PLUG_IN_FMT_SFZ_DOCUMENTPROCESSOR_H_

#include <lsp-plug.in/fmt/sfz/IDocumentHandler.h>

namespace lsp
{
    namespace sfz
    {
        class DocumentProcessor
        {
            public:
                status_t open(const io::Path *)
                { return STATUS_NOT_IMPLEMENTED; }
                status_t process(IDocumentHandler *)
                { return STATUS_NOT_IMPLEMENTED; }
                status_t close() { return STATUS_OK; }
        };
    } /* namespace sfz */
} /* namespace lsp */

#endif

/* Minimal stand-in for lsp-runtime-lib's SFZ parser interface: the
 * oracle never opens SFZ documents (DocumentProcessor::open reports
 * STATUS_NOT_IMPLEMENTED), the handler class just needs to compile. */
#ifndef LSP_PLUG_IN_FMT_SFZ_IDOCUMENTHANDLER_H_
#define LSP_PLUG_IN_FMT_SFZ_IDOCUMENTHANDLER_H_

#include <lsp-plug.in/common/status.h>
#include <lsp-plug.in/io/Path.h>
#include <lsp-plug.in/io/OutFileStream.h>

namespace lsp
{
    namespace sfz
    {
        class PullParser
        {
            public:
                status_t open(const io::Path *)
                { return STATUS_NOT_IMPLEMENTED; }
        };

        class IDocumentHandler
        {
            public:
                virtual ~IDocumentHandler() {}
                virtual status_t sample(const char *, io::IInStream *,
                                        const char **, const char **)
                { return STATUS_OK; }
                virtual status_t include(PullParser *, const char *)
                { return STATUS_OK; }
                virtual const char *root_file_name() { return ""; }
        };
    } /* namespace sfz */
} /* namespace lsp */

#endif

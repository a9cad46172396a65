/* Minimal stand-in for lsp-runtime-lib's LSPString (see common/types.h
 * header note): only passed around as an opaque const pointer by the
 * compiled-in sources. */
#ifndef LSP_PLUG_IN_RUNTIME_LSPSTRING_H_
#define LSP_PLUG_IN_RUNTIME_LSPSTRING_H_

namespace lsp
{
    class LSPString
    {
        public:
            LSPString() {}
    };
} /* namespace lsp */

#endif

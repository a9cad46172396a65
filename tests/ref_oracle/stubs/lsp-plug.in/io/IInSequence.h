#ifndef LSP_PLUG_IN_IO_IINSEQUENCE_H_
#define LSP_PLUG_IN_IO_IINSEQUENCE_H_

namespace lsp
{
    namespace io
    {
        class IInSequence
        {
            public:
                virtual ~IInSequence() {}
        };
    } /* namespace io */
} /* namespace lsp */

#endif

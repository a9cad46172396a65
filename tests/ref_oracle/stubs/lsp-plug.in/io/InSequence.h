/* Minimal stand-in: not exercised by the oracle tests. */
#ifndef LSP_PLUG_IN_IO_INSEQUENCE_H_
#define LSP_PLUG_IN_IO_INSEQUENCE_H_

#include <lsp-plug.in/io/IInSequence.h>

namespace lsp
{
    namespace io
    {
        class InSequence: public IInSequence
        {
        };
    } /* namespace io */
} /* namespace lsp */

#endif /* LSP_PLUG_IN_IO_INSEQUENCE_H_ */

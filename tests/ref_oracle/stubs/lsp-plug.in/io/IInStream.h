#ifndef LSP_PLUG_IN_IO_IINSTREAM_H_
#define LSP_PLUG_IN_IO_IINSTREAM_H_
/* io::IInStream lives in the OutFileStream stub */
#include <lsp-plug.in/io/OutFileStream.h>
#endif

#ifndef LSP_PLUG_IN_MM_IOUTAUDIOSTREAM_H_
#define LSP_PLUG_IN_MM_IOUTAUDIOSTREAM_H_
#include <lsp-plug.in/mm/IInAudioStream.h>
#endif

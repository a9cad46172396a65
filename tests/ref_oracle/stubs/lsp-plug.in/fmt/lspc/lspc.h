#ifndef LSP_PLUG_IN_FMT_LSPC_LSPC_H_
#define LSP_PLUG_IN_FMT_LSPC_LSPC_H_
#include <lsp-plug.in/fmt/lspc/File.h>
#endif

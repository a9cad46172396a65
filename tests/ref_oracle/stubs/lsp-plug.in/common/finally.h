/* lsp_finally lives in the debug.h stub */
#ifndef LSP_PLUG_IN_COMMON_FINALLY_H_
#define LSP_PLUG_IN_COMMON_FINALLY_H_
#include <lsp-plug.in/common/debug.h>
#endif

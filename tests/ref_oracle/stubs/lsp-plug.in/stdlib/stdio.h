/* Minimal stand-in for lsp-common-lib's <lsp-plug.in/stdlib/stdio.h>
 * (see common/types.h header note). */
#ifndef LSP_PLUG_IN_STDLIB_STDIO_H_
#define LSP_PLUG_IN_STDLIB_STDIO_H_

#include <stdio.h>

#endif /* LSP_PLUG_IN_STDLIB_STDIO_H_ */

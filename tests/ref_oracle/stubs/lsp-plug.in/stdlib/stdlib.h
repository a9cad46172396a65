/* Minimal stand-in for lsp-common-lib's <lsp-plug.in/stdlib/stdlib.h>
 * (see common/types.h header note). */
#ifndef LSP_PLUG_IN_STDLIB_STDLIB_H_
#define LSP_PLUG_IN_STDLIB_STDLIB_H_

#include <stdlib.h>

#endif /* LSP_PLUG_IN_STDLIB_STDLIB_H_ */

/* Minimal stand-in for lsp-common-lib's <lsp-plug.in/stdlib/math.h>
 * (see common/types.h header note). */
#ifndef LSP_PLUG_IN_STDLIB_MATH_H_
#define LSP_PLUG_IN_STDLIB_MATH_H_

/* The compiled reference sources define their own C_PI* constexprs
 * (Filter.cpp:35-38) — nothing beyond <math.h> is needed here. */
#include <math.h>

#endif /* LSP_PLUG_IN_STDLIB_MATH_H_ */

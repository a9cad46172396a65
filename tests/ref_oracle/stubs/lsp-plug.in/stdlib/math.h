/* Minimal stand-in for lsp-common-lib's <lsp-plug.in/stdlib/math.h>
 * (see common/types.h header note). */
#ifndef LSP_PLUG_IN_STDLIB_MATH_H_
#define LSP_PLUG_IN_STDLIB_MATH_H_

/* The compiled reference sources define their own C_PI* constexprs
 * (Filter.cpp:35-38); only the log-base constants are expected from
 * this header. */
#include <math.h>

#ifndef M_LOG10_2
    #define M_LOG10_2   0.301029995663981195213738894724
#endif
#ifndef M_LOG2_10
    #define M_LOG2_10   3.321928094887362347870319429489
#endif

#endif /* LSP_PLUG_IN_STDLIB_MATH_H_ */

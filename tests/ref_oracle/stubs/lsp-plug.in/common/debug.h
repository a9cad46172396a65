/* Minimal stand-in for lsp-common-lib's <lsp-plug.in/common/debug.h>
 * (see types.h header note): tracing compiled out. */
#ifndef LSP_PLUG_IN_COMMON_DEBUG_H_
#define LSP_PLUG_IN_COMMON_DEBUG_H_

#define lsp_trace(...)      do { } while (0)
#define lsp_debug(...)      do { } while (0)
#define lsp_warn(...)       do { } while (0)
#define lsp_error(...)      do { } while (0)
#define lsp_info(...)       do { } while (0)

#endif /* LSP_PLUG_IN_COMMON_DEBUG_H_ */

/* Minimal stand-in for lsp-common-lib's <lsp-plug.in/common/types.h>.
 *
 * The reference (/root/reference) is compiled AS AN ORACLE for parity
 * tests: its source dependencies (lsp-common-lib, lsp-dsp-lib) are
 * fetched from the network at build time upstream and are not vendored,
 * so this tree provides the tiny surface the compiled-in sources
 * actually use.  Only generic typedefs/macros — no reference code.
 */
#ifndef LSP_PLUG_IN_COMMON_TYPES_H_
#define LSP_PLUG_IN_COMMON_TYPES_H_

#include <stdint.h>
#include <stddef.h>
#include <sys/types.h>

#define __lsp_aligned16     __attribute__((aligned(16)))
#define __lsp_aligned32     __attribute__((aligned(32)))
#define __lsp_aligned64     __attribute__((aligned(64)))

#define lsp_min(a, b)           (((a) < (b)) ? (a) : (b))
#define lsp_max(a, b)           (((a) > (b)) ? (a) : (b))
#define lsp_limit(v, mn, mx)    (((v) < (mn)) ? (mn) : ((v) > (mx)) ? (mx) : (v))

#define LSP_EXPORT_MODIFIER
#define LSP_IMPORT_MODIFIER

#endif /* LSP_PLUG_IN_COMMON_TYPES_H_ */

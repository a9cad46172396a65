/* Minimal stand-in for lsp-common-lib's <lsp-plug.in/common/new.h>
 * (placement-new helpers).  The compiled-in sources only pull it in
 * for <new>; nothing else is consumed. */
#ifndef LSP_PLUG_IN_COMMON_NEW_H_
#define LSP_PLUG_IN_COMMON_NEW_H_
#include <new>
#endif /* LSP_PLUG_IN_COMMON_NEW_H_ */

/* Minimal stand-in for lsp-common-lib's <lsp-plug.in/common/status.h>
 * (see types.h header note).  Only STATUS_OK is consumed by the
 * compiled-in sources. */
#ifndef LSP_PLUG_IN_COMMON_STATUS_H_
#define LSP_PLUG_IN_COMMON_STATUS_H_

namespace lsp
{
    typedef int status_t;

    enum
    {
        STATUS_OK = 0,
        STATUS_NO_MEM,
        STATUS_BAD_ARGUMENTS,
        STATUS_BAD_STATE,
        STATUS_OVERFLOW,
        STATUS_INVALID_VALUE,
        STATUS_NOT_IMPLEMENTED,
        STATUS_NO_DATA,
        STATUS_NOT_FOUND,
        STATUS_CORRUPTED,
        STATUS_BAD_FORMAT,
        STATUS_EOF,
        STATUS_UNSPECIFIED,
        STATUS_INCOMPATIBLE,
        STATUS_CLOSED,
        STATUS_CORRUPTED_FILE,
        STATUS_BIG_ENDIAN,
        STATUS_UNSUPPORTED_FORMAT,
        STATUS_NOT_BOUND,
        STATUS_UNKNOWN_ERR,
        STATUS_SKIP,
        STATUS_CANCELLED,
        STATUS_BREAK_POINT,
        STATUS_NOT_SUPPORTED,
        STATUS_OPENED,
        STATUS_ALREADY_EXISTS,
        STATUS_TOO_BIG
    };

    /* lsp-common-lib helper: keep the first non-OK status. */
    inline status_t update_status(status_t status, status_t new_status)
    {
        return (status == STATUS_OK) ? new_status : status;
    }
} /* namespace lsp */

#endif /* LSP_PLUG_IN_COMMON_STATUS_H_ */

/* Minimal stand-in for lsp-common-lib's <lsp-plug.in/common/debug.h>
 * (see types.h header note): tracing compiled out. */
#ifndef LSP_PLUG_IN_COMMON_DEBUG_H_
#define LSP_PLUG_IN_COMMON_DEBUG_H_

#define lsp_trace(...)      do { } while (0)
#define lsp_debug(...)      do { } while (0)
#define lsp_warn(...)       do { } while (0)
#define lsp_error(...)      do { } while (0)
#define lsp_info(...)       do { } while (0)

#define lsp_assert(...)     do { } while (0)

/* lsp-common-lib's scope-exit helper (finally.h): the usage is
 * `lsp_finally { body };` — expand to a guard object built from a
 * lambda via operator+ so the brace block becomes the lambda body */
namespace lsp
{
    template <typename F>
    struct lsp_finally_t
    {
        F f;
        ~lsp_finally_t() { f(); }
    };
    struct lsp_finally_helper_t {};
    template <typename F>
    lsp_finally_t<F> operator + (lsp_finally_helper_t, F f)
    { return {f}; }
}
#define LSP_FINALLY_CAT2(a, b) a##b
#define LSP_FINALLY_CAT(a, b) LSP_FINALLY_CAT2(a, b)
#define lsp_finally \
    auto LSP_FINALLY_CAT(__lsp_finally_, __LINE__) = \
        ::lsp::lsp_finally_helper_t{} + [&]()

#define lsp_guard_assert(...)

#endif /* LSP_PLUG_IN_COMMON_DEBUG_H_ */

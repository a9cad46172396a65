/* Minimal stand-in for lsp-runtime-lib's ipc::SharedMutex: a
 * process-local registry of named mutexes.  The oracle drives Catalog
 * writer + reader in ONE process (the reference's own utest pattern),
 * so cross-process robustness is out of scope here; the production
 * equivalent with EOWNERDEAD recovery lives in csrc/shm_runtime.cpp. */
#ifndef LSP_PLUG_IN_IPC_SHAREDMUTEX_H_
#define LSP_PLUG_IN_IPC_SHAREDMUTEX_H_

#include <map>
#include <memory>
#include <mutex>
#include <string>

#include <lsp-plug.in/common/status.h>
#include <lsp-plug.in/runtime/LSPString.h>
/* the genuine Catalog.h relies on its build pulling these in
 * transitively (lsp_finally guard + lltl::parray) — route them through
 * this stub, its only ipc-specific include */
#include <lsp-plug.in/common/finally.h>
#include <lsp-plug.in/lltl/parray.h>

namespace lsp
{
    namespace ipc
    {
        class SharedMutex
        {
            private:
                std::shared_ptr<std::recursive_mutex> m;

                static std::shared_ptr<std::recursive_mutex>
                lookup(const std::string &name)
                {
                    static std::mutex reg_lock;
                    static std::map<std::string,
                        std::shared_ptr<std::recursive_mutex>> registry;
                    std::lock_guard<std::mutex> g(reg_lock);
                    auto &slot = registry[name];
                    if (!slot)
                        slot = std::make_shared<std::recursive_mutex>();
                    return slot;
                }

            public:
                status_t open(const LSPString *name)
                {
                    if (m)
                        return STATUS_OPENED;
                    m = lookup(name->get_utf8());
                    return STATUS_OK;
                }

                status_t open(const char *name)
                {
                    if (m)
                        return STATUS_OPENED;
                    m = lookup(name);
                    return STATUS_OK;
                }

                status_t lock()
                {
                    if (!m)
                        return STATUS_BAD_STATE;
                    m->lock();
                    return STATUS_OK;
                }

                status_t unlock()
                {
                    if (!m)
                        return STATUS_BAD_STATE;
                    m->unlock();
                    return STATUS_OK;
                }

                status_t close()
                {
                    m.reset();
                    return STATUS_OK;
                }
        };
    } /* namespace ipc */
} /* namespace lsp */

#endif /* LSP_PLUG_IN_IPC_SHAREDMUTEX_H_ */

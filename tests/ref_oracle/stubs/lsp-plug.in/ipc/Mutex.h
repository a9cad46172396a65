/* Minimal stand-in for lsp-runtime-lib's ipc::Mutex (std::mutex). */
#ifndef LSP_PLUG_IN_IPC_MUTEX_H_
#define LSP_PLUG_IN_IPC_MUTEX_H_

#include <mutex>

namespace lsp
{
    namespace ipc
    {
        class Mutex
        {
            private:
                std::mutex m;

            public:
                bool lock() { m.lock(); return true; }
                bool unlock() { m.unlock(); return true; }
                bool try_lock() { return m.try_lock(); }
        };
    } /* namespace ipc */
} /* namespace lsp */

#endif /* LSP_PLUG_IN_IPC_MUTEX_H_ */

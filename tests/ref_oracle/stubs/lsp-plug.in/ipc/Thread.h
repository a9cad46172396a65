/* Minimal stand-in for lsp-runtime-lib's ipc::Thread, backed by
 * std::thread.  RayTrace3D::TaskThread is the only consumer; with
 * process(threads=1) the reference never calls start()/join() (the
 * root thread runs inline, RayTrace3D.cpp:1555-1621), but the full
 * surface is provided so multi-threaded runs also work. */
#ifndef LSP_PLUG_IN_IPC_THREAD_H_
#define LSP_PLUG_IN_IPC_THREAD_H_

#include <thread>
#include <lsp-plug.in/common/status.h>

namespace lsp
{
    namespace ipc
    {
        class Thread
        {
            private:
                std::thread     t;
                status_t        result;

            public:
                Thread(): result(STATUS_OK) {}
                virtual ~Thread()
                {
                    if (t.joinable())
                        t.join();
                }

                virtual status_t run() { return STATUS_OK; }

                status_t start()
                {
                    t = std::thread([this] { result = run(); });
                    return STATUS_OK;
                }

                status_t join()
                {
                    if (t.joinable())
                        t.join();
                    return STATUS_OK;
                }

                status_t get_result() const { return result; }
        };
    } /* namespace ipc */
} /* namespace lsp */

#endif /* LSP_PLUG_IN_IPC_THREAD_H_ */

#ifndef LSP_PLUG_IN_FMT_LSPC_AUDIOWRITER_H_
#define LSP_PLUG_IN_FMT_LSPC_AUDIOWRITER_H_

#include <lsp-plug.in/fmt/lspc/File.h>

namespace lsp
{
    namespace lspc
    {
        class AudioWriter
        {
            public:
                status_t open(File *, const audio_parameters_t *)
                { return STATUS_NOT_IMPLEMENTED; }
                uint32_t unique_id() { return 0; }
                status_t write_samples(const float * const *, size_t)
                { return STATUS_NOT_IMPLEMENTED; }
                status_t close() { return STATUS_OK; }
        };
    } /* namespace lspc */
} /* namespace lsp */

#endif

#ifndef LSP_PLUG_IN_FMT_LSPC_AUDIOREADER_H_
#define LSP_PLUG_IN_FMT_LSPC_AUDIOREADER_H_

#include <lsp-plug.in/fmt/lspc/File.h>

namespace lsp
{
    namespace lspc
    {
        class AudioReader
        {
            public:
                status_t open(File *) { return STATUS_NOT_IMPLEMENTED; }
                status_t open(File *, uint32_t) { return STATUS_NOT_IMPLEMENTED; }
                status_t get_parameters(audio_parameters_t *)
                { return STATUS_NOT_IMPLEMENTED; }
                ssize_t read_samples(float **, size_t) { return -1; }
                status_t close() { return STATUS_OK; }
        };
    } /* namespace lspc */
} /* namespace lsp */

#endif

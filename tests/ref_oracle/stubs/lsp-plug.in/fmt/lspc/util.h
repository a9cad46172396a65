#ifndef LSP_PLUG_IN_FMT_LSPC_UTIL_H_
#define LSP_PLUG_IN_FMT_LSPC_UTIL_H_

#include <lsp-plug.in/fmt/lspc/File.h>
#include <lsp-plug.in/io/Path.h>

namespace lsp
{
    namespace mm { class IInAudioStream; }

    namespace lspc
    {
        enum
        {
            PATH_DIR = 1 << 0
        };

        inline status_t read_path(chunk_id_t, File *, io::Path *,
                                  size_t *, chunk_id_t *)
        { return STATUS_NOT_IMPLEMENTED; }

        inline status_t read_audio(chunk_id_t, File *,
                                   mm::IInAudioStream **)
        { return STATUS_NOT_IMPLEMENTED; }
    } /* namespace lspc */
} /* namespace lsp */

#endif

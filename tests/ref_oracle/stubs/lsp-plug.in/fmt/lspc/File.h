/* Minimal stand-in for lsp-runtime-lib's LSPC archive classes: the
 * SyncChirpProcessor's save_to_lspc/load_from_lspc compile against
 * this surface but report STATUS_NOT_IMPLEMENTED at runtime (the TPU
 * framework persists results via numpy archives instead). */
#ifndef LSP_PLUG_IN_FMT_LSPC_FILE_H_
#define LSP_PLUG_IN_FMT_LSPC_FILE_H_

#include <lsp-plug.in/common/types.h>
#include <lsp-plug.in/common/status.h>
#include <lsp-plug.in/io/Path.h>

#define LSPC_CHUNK_AUDIO    0x41554449u
#define LSPC_CHUNK_PROFILE  0x50524F46u
#define LSPC_CHUNK_PATH     0x50415448u

namespace lsp
{
    namespace lspc
    {
        enum
        {
            CODEC_PCM = 0
        };

        enum
        {
            SAMPLE_FMT_F32LE = 10,
            SAMPLE_FMT_F32BE = 11
        };

        typedef uint32_t chunk_id_t;

        typedef struct chunk_common_t
        {
            uint32_t    version;
            uint32_t    size;
        } chunk_common_t;

        typedef struct chunk_audio_profile_t
        {
            chunk_common_t  common;
            uint32_t        chunk_id;
            uint32_t        chirp_order;
            float           alpha;
            double          beta;
            double          gamma;
            double          delta;
            double          initial_freq;
            double          final_freq;
            uint32_t        skip;
        } chunk_audio_profile_t;

        typedef struct audio_parameters_t
        {
            size_t      channels;
            size_t      sample_rate;
            size_t      codec;
            size_t      sample_format;
            wsize_t     frames;
        } audio_parameters_t;

        class ChunkWriter
        {
            public:
                template <class T>
                status_t write_header(const T *) { return STATUS_NOT_IMPLEMENTED; }
                status_t flush() { return STATUS_NOT_IMPLEMENTED; }
                status_t close() { return STATUS_OK; }
        };

        class ChunkReader
        {
            public:
                template <class T>
                ssize_t read_header(T *, size_t) { return -1; }
                int last_error() { return STATUS_NOT_IMPLEMENTED; }
                status_t close() { return STATUS_OK; }
        };

        class File
        {
            public:
                status_t create(const io::Path *) { return STATUS_NOT_IMPLEMENTED; }
                status_t open(const io::Path *) { return STATUS_NOT_IMPLEMENTED; }
                status_t close() { return STATUS_OK; }
                ChunkWriter *write_chunk(uint32_t) { return nullptr; }
                ChunkReader *find_chunk(uint32_t, uint32_t *) { return nullptr; }
                ssize_t enumerate_chunks(uint32_t, chunk_id_t **)
                { return -((ssize_t) STATUS_NOT_IMPLEMENTED); }
        };
    } /* namespace lspc */
} /* namespace lsp */

#endif

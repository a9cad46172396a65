/* Minimal stand-ins for lsp-runtime-lib's mm:: audio streams with a
 * REAL float32 WAV reader/writer, so the genuine Sample::load/save
 * actually work in oracle tests (fmt = WAVE_FORMAT_IEEE_FLOAT only). */
#ifndef LSP_PLUG_IN_MM_IINAUDIOSTREAM_H_
#define LSP_PLUG_IN_MM_IINAUDIOSTREAM_H_

#include <lsp-plug.in/common/types.h>
#include <lsp-plug.in/common/status.h>
#include <lsp-plug.in/io/Path.h>

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

namespace lsp
{
    namespace mm
    {
        enum
        {
            SFMT_NONE = 0,
            SFMT_F32 = 0x100,
            SFMT_F32_CPU = 0x101,
            AFMT_WAV = 0x1000,
            CFMT_PCM = 0x0001
        };

        typedef struct audio_stream_t
        {
            size_t      srate;
            size_t      channels;
            wssize_t    frames;
            size_t      format;
        } audio_stream_t;

        class IInAudioStream
        {
            protected:
                void  *pUserData;
                void (*pDeleter)(void *);
                wssize_t nOffset;
                status_t nError;

                status_t set_error(status_t err)
                {
                    nError = err;
                    return err;
                }

            public:
                IInAudioStream()
                    : pUserData(NULL), pDeleter(NULL), nOffset(0),
                      nError(STATUS_OK) {}
                virtual ~IInAudioStream()
                {
                    if ((pUserData != NULL) && (pDeleter != NULL))
                        pDeleter(pUserData);
                }

                void set_user_data(void *data, void (*deleter)(void *))
                {
                    pUserData = data;
                    pDeleter = deleter;
                }

                virtual status_t info(audio_stream_t *fmt) const
                { (void) fmt; return STATUS_NOT_IMPLEMENTED; }
                virtual size_t sample_rate() const { return 0; }
                virtual size_t channels() const { return 0; }
                virtual wssize_t length() const { return -1; }
                virtual size_t format() const { return SFMT_NONE; }
                virtual size_t select_format(size_t fmt)
                { (void) fmt; return SFMT_NONE; }
                virtual ssize_t direct_read(void *, size_t, size_t)
                { return -((ssize_t) STATUS_NOT_IMPLEMENTED); }
                virtual ssize_t read(float *dst, size_t nframes)
                { return direct_read(dst, nframes, select_format(0)); }
                virtual wssize_t skip(wsize_t)
                { return -((wssize_t) STATUS_NOT_IMPLEMENTED); }
                virtual wssize_t seek(wsize_t)
                { return -((wssize_t) STATUS_NOT_IMPLEMENTED); }
                virtual status_t close() { return STATUS_OK; }
        };

        class IOutAudioStream
        {
            public:
                virtual ~IOutAudioStream() {}
                virtual size_t channels() const { return 0; }
                virtual size_t sample_rate() const { return 0; }
                virtual ssize_t write(const float *, size_t)
                { return -((ssize_t) STATUS_NOT_IMPLEMENTED); }
                virtual status_t close() { return STATUS_OK; }
        };
    } /* namespace mm */
} /* namespace lsp */

#endif

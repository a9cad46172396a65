#ifndef LSP_PLUG_IN_MM_OUTAUDIOFILESTREAM_H_
#define LSP_PLUG_IN_MM_OUTAUDIOFILESTREAM_H_

#include <lsp-plug.in/mm/IInAudioStream.h>

namespace lsp
{
    namespace mm
    {
        /* float32 RIFF/WAVE writer (WAVE_FORMAT_IEEE_FLOAT) */
        class OutAudioFileStream : public IOutAudioStream
        {
            private:
                FILE           *pFile;
                audio_stream_t  sFormat;
                uint32_t        nWritten;   /* frames */

                static void wr32(FILE *f, uint32_t v)
                {
                    uint8_t b[4] = { uint8_t(v), uint8_t(v >> 8),
                                     uint8_t(v >> 16), uint8_t(v >> 24) };
                    fwrite(b, 1, 4, f);
                }
                static void wr16(FILE *f, uint16_t v)
                {
                    uint8_t b[2] = { uint8_t(v), uint8_t(v >> 8) };
                    fwrite(b, 1, 2, f);
                }

            public:
                OutAudioFileStream() : pFile(NULL), nWritten(0) {}
                virtual ~OutAudioFileStream() override { close(); }

                status_t open(const io::Path *path,
                              const audio_stream_t *fmt, size_t codec)
                {
                    (void) codec;
                    pFile = fopen(path->as_utf8(), "wb");
                    if (pFile == NULL)
                        return STATUS_NOT_FOUND;
                    sFormat = *fmt;
                    nWritten = 0;
                    /* header placeholder; sizes patched in close() */
                    fwrite("RIFF\0\0\0\0WAVEfmt ", 1, 16, pFile);
                    wr32(pFile, 16);
                    wr16(pFile, 3);                        /* IEEE float */
                    wr16(pFile, uint16_t(sFormat.channels));
                    wr32(pFile, uint32_t(sFormat.srate));
                    wr32(pFile, uint32_t(sFormat.srate * sFormat.channels
                                         * 4));
                    wr16(pFile, uint16_t(sFormat.channels * 4));
                    wr16(pFile, 32);
                    fwrite("data\0\0\0\0", 1, 8, pFile);
                    return STATUS_OK;
                }

                virtual size_t channels() const override
                { return sFormat.channels; }
                virtual size_t sample_rate() const override
                { return sFormat.srate; }

                virtual ssize_t write(const float *src,
                                      size_t frames) override
                {
                    if (pFile == NULL)
                        return -((ssize_t) STATUS_BAD_STATE);
                    size_t put = fwrite(src, 4 * sFormat.channels, frames,
                                        pFile);
                    nWritten += put;
                    return ssize_t(put);
                }

                virtual status_t close() override
                {
                    if (pFile == NULL)
                        return STATUS_OK;
                    uint32_t data_sz = nWritten * sFormat.channels * 4;
                    fseek(pFile, 4, SEEK_SET);
                    wr32(pFile, 36 + data_sz);
                    fseek(pFile, 40, SEEK_SET);
                    wr32(pFile, data_sz);
                    fclose(pFile);
                    pFile = NULL;
                    return STATUS_OK;
                }
        };
    } /* namespace mm */
} /* namespace lsp */

#endif

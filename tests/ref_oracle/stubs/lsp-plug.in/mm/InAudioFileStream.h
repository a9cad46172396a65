#ifndef LSP_PLUG_IN_MM_INAUDIOFILESTREAM_H_
#define LSP_PLUG_IN_MM_INAUDIOFILESTREAM_H_

#include <lsp-plug.in/mm/IInAudioStream.h>

namespace lsp
{
    namespace mm
    {
        /* float32 RIFF/WAVE reader (WAVE_FORMAT_IEEE_FLOAT, format 3) */
        class InAudioFileStream : public IInAudioStream
        {
            private:
                FILE           *pFile;
                audio_stream_t  sFormat;
                wssize_t        nRead;

                static uint32_t rd32(const uint8_t *p)
                {
                    return uint32_t(p[0]) | (uint32_t(p[1]) << 8)
                         | (uint32_t(p[2]) << 16) | (uint32_t(p[3]) << 24);
                }

            public:
                InAudioFileStream() : pFile(NULL), nRead(0)
                {
                    sFormat.srate = 0;
                    sFormat.channels = 0;
                    sFormat.frames = -1;
                    sFormat.format = SFMT_F32;
                }

                virtual ~InAudioFileStream() override
                {
                    close();
                }

                status_t open(const io::Path *path)
                {
                    pFile = fopen(path->as_utf8(), "rb");
                    if (pFile == NULL)
                        return STATUS_NOT_FOUND;
                    uint8_t hdr[12];
                    if (fread(hdr, 1, 12, pFile) != 12
                        || memcmp(hdr, "RIFF", 4) != 0
                        || memcmp(&hdr[8], "WAVE", 4) != 0)
                        return STATUS_BAD_FORMAT;
                    /* chunk walk: fmt then data */
                    uint16_t wfmt = 0, nch = 0;
                    uint32_t srate = 0, bits = 0;
                    while (true)
                    {
                        uint8_t ch[8];
                        if (fread(ch, 1, 8, pFile) != 8)
                            return STATUS_BAD_FORMAT;
                        uint32_t sz = rd32(&ch[4]);
                        if (memcmp(ch, "fmt ", 4) == 0)
                        {
                            uint8_t f[16];
                            if (sz < 16 || fread(f, 1, 16, pFile) != 16)
                                return STATUS_BAD_FORMAT;
                            wfmt  = uint16_t(f[0]) | (uint16_t(f[1]) << 8);
                            nch   = uint16_t(f[2]) | (uint16_t(f[3]) << 8);
                            srate = rd32(&f[4]);
                            bits  = uint16_t(f[14]) | (uint16_t(f[15]) << 8);
                            if (sz > 16)
                                fseek(pFile, long(sz - 16), SEEK_CUR);
                        }
                        else if (memcmp(ch, "data", 4) == 0)
                        {
                            if ((wfmt != 3) || (bits != 32))
                                return STATUS_UNSUPPORTED_FORMAT;
                            sFormat.srate    = srate;
                            sFormat.channels = nch;
                            sFormat.frames   = sz / (4 * nch);
                            nRead            = 0;
                            return STATUS_OK;
                        }
                        else
                            fseek(pFile, long(sz + (sz & 1)), SEEK_CUR);
                    }
                }

                virtual status_t info(audio_stream_t *fmt) const override
                {
                    if (pFile == NULL)
                        return STATUS_BAD_STATE;
                    *fmt = sFormat;
                    return STATUS_OK;
                }

                virtual ssize_t read(float *dst, size_t frames) override
                {
                    if (pFile == NULL)
                        return -((ssize_t) STATUS_BAD_STATE);
                    wssize_t left = sFormat.frames - nRead;
                    if (left <= 0)
                        return -((ssize_t) STATUS_EOF);
                    if (wssize_t(frames) > left)
                        frames = size_t(left);
                    size_t got = fread(dst, 4 * sFormat.channels, frames,
                                       pFile);
                    nRead += got;
                    return ssize_t(got);
                }

                virtual status_t close() override
                {
                    if (pFile != NULL)
                    {
                        fclose(pFile);
                        pFile = NULL;
                    }
                    return STATUS_OK;
                }
        };
    } /* namespace mm */
} /* namespace lsp */

#endif

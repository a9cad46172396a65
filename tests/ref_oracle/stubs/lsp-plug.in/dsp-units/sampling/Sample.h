/* Minimal in-memory stand-in for the reference's sampling/Sample.h.
 *
 * The ORACLE targets are the genuine SamplePlayer.cpp +
 * helpers/playback.cpp + helpers/batch.cpp + Playback.cpp +
 * PlaySettings.cpp, which use Sample purely as a data container
 * (valid()/length()/channels()/channel()/gc_*).  The real Sample.h
 * drags in the runtime-lib audio-file I/O stack (mm::/io::/LSPString),
 * which is not vendored — this stub shadows it with the same in-memory
 * interface, no file I/O.  Field semantics mirror the original
 * (channel-major vBuffer with nMaxLength stride; Sample.cpp:125-141).
 */
#ifndef LSP_PLUG_IN_DSP_UNITS_SAMPLING_SAMPLE_H_STUB_
#define LSP_PLUG_IN_DSP_UNITS_SAMPLING_SAMPLE_H_STUB_

#include <lsp-plug.in/common/types.h>
#include <lsp-plug.in/common/status.h>
#include <lsp-plug.in/dsp-units/iface/IStateDumper.h>

#include <stdlib.h>
#include <string.h>

namespace lsp
{
    namespace dspu
    {
        class Sample
        {
            private:
                float              *vBuffer;
                size_t              nSampleRate;
                size_t              nLength;
                size_t              nMaxLength;
                size_t              nChannels;
                size_t              nGcRefs;
                Sample             *pGcNext;

            public:
                explicit Sample()
                {
                    vBuffer     = NULL;
                    nSampleRate = 0;
                    nLength     = 0;
                    nMaxLength  = 0;
                    nChannels   = 0;
                    nGcRefs     = 0;
                    pGcNext     = NULL;
                }

                Sample(const Sample &) = delete;
                Sample & operator = (const Sample &) = delete;

                ~Sample()
                {
                    destroy();
                }

                void destroy()
                {
                    if (vBuffer != NULL)
                        free(vBuffer);
                    vBuffer     = NULL;
                    nLength     = 0;
                    nMaxLength  = 0;
                    nChannels   = 0;
                }

                bool init(size_t channels, size_t max_length,
                          size_t length = 0)
                {
                    destroy();
                    vBuffer = static_cast<float *>(
                        calloc(channels * max_length, sizeof(float)));
                    if (vBuffer == NULL)
                        return false;
                    nChannels   = channels;
                    nMaxLength  = max_length;
                    nLength     = length;
                    return true;
                }

            public:
                inline size_t   gc_references() const   { return nGcRefs; }
                inline size_t   gc_acquire()            { return ++nGcRefs; }
                inline size_t   gc_release()            { return --nGcRefs; }
                inline Sample  *gc_next()               { return pGcNext; }
                Sample *gc_link(Sample *next)
                {
                    pGcNext = next;
                    return this;
                }

                inline bool valid() const
                {
                    return (vBuffer != NULL) && (nChannels > 0)
                        && (nLength > 0) && (nMaxLength > 0);
                }

                inline size_t max_length() const        { return nMaxLength; }
                inline size_t length() const            { return nLength; }
                inline size_t channels() const          { return nChannels; }
                inline size_t sample_rate() const       { return nSampleRate; }
                inline void set_sample_rate(size_t sr)  { nSampleRate = sr; }
                inline bool set_length(size_t len)
                {
                    if (len > nMaxLength)
                        return false;
                    nLength = len;
                    return true;
                }

                inline float *getBuffer(size_t channel)
                { return &vBuffer[nMaxLength * channel]; }
                inline const float *getBuffer(size_t channel) const
                { return &vBuffer[nMaxLength * channel]; }
                inline float *getBuffer(size_t channel, size_t offset)
                { return &vBuffer[nMaxLength * channel + offset]; }
                inline const float *getBuffer(size_t channel,
                                              size_t offset) const
                { return &vBuffer[nMaxLength * channel + offset]; }

                inline float *channel(size_t ch)
                { return &vBuffer[nMaxLength * ch]; }
                inline const float *channel(size_t ch) const
                { return &vBuffer[nMaxLength * ch]; }
                inline float *channel(size_t ch, size_t offset)
                { return &vBuffer[nMaxLength * ch + offset]; }
                inline const float *channel(size_t ch, size_t offset) const
                { return &vBuffer[nMaxLength * ch + offset]; }

                bool resize(size_t channels, size_t max_length,
                            size_t length = 0)
                {
                    float *nb = static_cast<float *>(
                        calloc(channels * max_length, sizeof(float)));
                    if (nb == NULL)
                        return false;
                    if (vBuffer != NULL)
                    {
                        size_t cc = (channels < nChannels) ? channels
                                                           : nChannels;
                        size_t cl = (max_length < nMaxLength) ? max_length
                                                              : nMaxLength;
                        for (size_t c = 0; c < cc; ++c)
                            memcpy(&nb[c * max_length],
                                   &vBuffer[c * nMaxLength],
                                   cl * sizeof(float));
                        free(vBuffer);
                    }
                    vBuffer     = nb;
                    nChannels   = channels;
                    nMaxLength  = max_length;
                    nLength     = length;
                    return true;
                }

                /* file I/O is not vendored; tests read channel() data
                 * directly */
                template <class P>
                ssize_t save_range(const P *, size_t, ssize_t) const
                { return -((ssize_t) STATUS_NOT_IMPLEMENTED); }

                void dump(IStateDumper *v) const
                {
                    v->write("vBuffer", vBuffer);
                    v->write("nSampleRate", nSampleRate);
                    v->write("nLength", nLength);
                    v->write("nMaxLength", nMaxLength);
                    v->write("nChannels", nChannels);
                }
        };
    } /* namespace dspu */
} /* namespace lsp */

#endif /* LSP_PLUG_IN_DSP_UNITS_SAMPLING_SAMPLE_H_STUB_ */

/* Minimal stand-in for lsp-runtime-lib's <lsp-plug.in/runtime/system.h>
 * (see common/types.h header note).  Only the wall-clock used for
 * default PRNG seeding (Randomizer.cpp:100-106). */
#ifndef LSP_PLUG_IN_RUNTIME_SYSTEM_H_
#define LSP_PLUG_IN_RUNTIME_SYSTEM_H_

#include <lsp-plug.in/common/types.h>
#include <time.h>
#include <unistd.h>

namespace lsp
{
    namespace system
    {
        typedef struct time_t
        {
            uint32_t seconds;
            uint32_t nanos;
        } time_t;

        inline void get_time(time_t *t)
        {
            struct timespec ts;
            clock_gettime(CLOCK_REALTIME, &ts);
            t->seconds = (uint32_t) ts.tv_sec;
            t->nanos = (uint32_t) ts.tv_nsec;
        }

        /* shared-memory segment sizing (AudioStream/Catalog align all
         * shm regions to whole pages) */
        inline size_t page_size()
        {
            long ps = sysconf(_SC_PAGESIZE);
            return (ps > 0) ? size_t(ps) : 4096;
        }
    } /* namespace system */
} /* namespace lsp */

#endif /* LSP_PLUG_IN_RUNTIME_SYSTEM_H_ */

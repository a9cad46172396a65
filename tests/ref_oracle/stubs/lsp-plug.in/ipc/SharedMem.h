/* Minimal stand-in for lsp-runtime-lib's ipc::SharedMem over plain
 * POSIX shm (shm_open/ftruncate/mmap).  Semantics inferred from the
 * reference USAGE (src/main/shared/AudioStream.cpp, Catalog.cpp):
 *   - open(id, SHM_CREATE|..., size): create-exclusive; an existing
 *     segment returns STATUS_ALREADY_EXISTS (Catalog::open relies on
 *     this to fall through from create_catalog to open_catalog).
 *   - open(id, mode, 0): open existing; missing -> STATUS_NOT_FOUND.
 *   - create(&name, postfix, ...): allocate a fresh unique id.
 *   - map(off, size): (re)map a window; data() -> base pointer.
 *   - close(): unmap + close; the creating side unlinks the segment
 *     unless SHM_PERSIST was set.
 * The oracle runs writer + reader in ONE process on the same segment,
 * exactly like the reference's own utest
 * (src/test/utest/shared/audiostream.cpp:30-62). */
#ifndef LSP_PLUG_IN_IPC_SHAREDMEM_H_
#define LSP_PLUG_IN_IPC_SHAREDMEM_H_

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <cerrno>
#include <cstdio>
#include <cstring>
#include <string.h>
#include <string>

#include <lsp-plug.in/common/status.h>
#include <lsp-plug.in/runtime/LSPString.h>

namespace lsp
{
    namespace ipc
    {
        class SharedMem
        {
            public:
                enum
                {
                    SHM_READ    = 1 << 0,
                    SHM_WRITE   = 1 << 1,
                    SHM_RW      = SHM_READ | SHM_WRITE,
                    SHM_CREATE  = 1 << 2,
                    SHM_PERSIST = 1 << 3,
                };

            private:
                int         fd      = -1;
                void       *ptr     = nullptr;
                size_t      mapped  = 0;
                size_t      nMode   = 0;
                bool        bOwner  = false;
                std::string sName;

                static std::string mangle(const char *id)
                {
                    std::string r = "/lsporacle_";
                    for (const char *p = id; *p != '\0'; ++p)
                        r.push_back((*p == '/' || *p == '\\') ? '_' : *p);
                    return r;
                }

            public:
                SharedMem() {}
                SharedMem(const SharedMem &) = delete;
                ~SharedMem() { close(); }
                SharedMem & operator = (const SharedMem &) = delete;

                status_t open(const char *id, size_t mode, size_t size)
                {
                    if (fd >= 0)
                        return STATUS_OPENED;
                    sName = mangle(id);
                    nMode = mode;
                    int flags = (mode & SHM_WRITE) ? O_RDWR : O_RDONLY;
                    if (mode & SHM_CREATE)
                    {
                        fd = shm_open(sName.c_str(),
                                      flags | O_CREAT | O_EXCL, 0600);
                        if (fd < 0)
                            return (errno == EEXIST) ? STATUS_ALREADY_EXISTS
                                                     : STATUS_UNKNOWN_ERR;
                        bOwner = true;
                        if (ftruncate(fd, off_t(size)) != 0)
                        {
                            close();
                            return STATUS_UNKNOWN_ERR;
                        }
                    }
                    else
                    {
                        fd = shm_open(sName.c_str(), flags, 0600);
                        if (fd < 0)
                            return (errno == ENOENT) ? STATUS_NOT_FOUND
                                                     : STATUS_UNKNOWN_ERR;
                        bOwner = false;
                    }
                    return STATUS_OK;
                }

                status_t open(const LSPString *id, size_t mode, size_t size)
                {
                    return open(id->get_utf8(), mode, size);
                }

                status_t create(LSPString *name, const char *postfix,
                                size_t mode, size_t size)
                {
                    for (int attempt = 0; attempt < 64; ++attempt)
                    {
                        char buf[128];
                        snprintf(buf, sizeof(buf), "as%08x%04d%s",
                                 unsigned(reinterpret_cast<uintptr_t>(this)
                                          & 0xffffffffu),
                                 attempt, (postfix != NULL) ? postfix : "");
                        status_t res = open(buf, mode | SHM_CREATE, size);
                        if (res == STATUS_ALREADY_EXISTS)
                            continue;
                        if (res == STATUS_OK)
                            name->set_utf8(buf);
                        return res;
                    }
                    return STATUS_UNKNOWN_ERR;
                }

                status_t create(LSPString *name, const LSPString *postfix,
                                size_t mode, size_t size)
                {
                    return create(name,
                                  (postfix != NULL) ? postfix->get_utf8()
                                                    : "",
                                  mode, size);
                }

                status_t map(size_t offset, size_t size)
                {
                    if (fd < 0)
                        return STATUS_BAD_STATE;
                    if (ptr != nullptr)
                    {
                        munmap(ptr, mapped);
                        ptr     = nullptr;
                        mapped  = 0;
                    }
                    int prot = PROT_READ
                             | ((nMode & SHM_WRITE) ? PROT_WRITE : 0);
                    void *p = mmap(NULL, size, prot, MAP_SHARED, fd,
                                   off_t(offset));
                    if (p == MAP_FAILED)
                        return STATUS_UNKNOWN_ERR;
                    ptr     = p;
                    mapped  = size;
                    return STATUS_OK;
                }

                void *data() { return ptr; }
                const void *data() const { return ptr; }

                status_t close()
                {
                    if (ptr != nullptr)
                    {
                        munmap(ptr, mapped);
                        ptr     = nullptr;
                        mapped  = 0;
                    }
                    if (fd >= 0)
                    {
                        ::close(fd);
                        fd = -1;
                        if (bOwner && !(nMode & SHM_PERSIST))
                            shm_unlink(sName.c_str());
                    }
                    bOwner = false;
                    return STATUS_OK;
                }
        };
    } /* namespace ipc */
} /* namespace lsp */

#endif /* LSP_PLUG_IN_IPC_SHAREDMEM_H_ */

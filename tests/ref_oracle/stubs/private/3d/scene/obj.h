/* Shadow of the reference's private OBJ-format loader header
 * (/root/reference/include/private/3d/scene/obj.h).  The genuine
 * loader needs lsp-runtime-lib's fmt/obj push parser, which is not
 * part of the dsp-units repo; oracle tests build scenes through the
 * Scene3D/Object3D API instead, so file loading reports
 * STATUS_NOT_IMPLEMENTED. */
#ifndef PRIVATE_3D_SCENE_OBJ_H_
#define PRIVATE_3D_SCENE_OBJ_H_

#include <lsp-plug.in/common/status.h>
#include <lsp-plug.in/io/IInStream.h>
#include <lsp-plug.in/dsp-units/3d/Scene3D.h>

namespace lsp
{
    namespace dspu
    {
        inline status_t load_scene_from_obj(dspu::Scene3D *,
                                            io::IInStream *,
                                            const char *)
        {
            return STATUS_NOT_IMPLEMENTED;
        }
    } /* namespace dspu */
} /* namespace lsp */

#endif /* PRIVATE_3D_SCENE_OBJ_H_ */

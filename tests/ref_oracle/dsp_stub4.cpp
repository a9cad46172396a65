/* dsp:: 3D geometry stubs for the rt:: beam-tracing machinery
 * (reference sources 3d/rt/{context,mesh,plan}.cpp, 3d/RayTrace3D.cpp,
 * 3d/Scene3D.cpp, 3d/Object3D.cpp).
 *
 * Semantics are inferred from reference USAGE (the CLAUDE.md oracle
 * pattern), with the colocation conventions already established for
 * the bsp stubs in dsp_stub3.cpp:
 *
 *  - plane := normalized (dx,dy,dz) + dw with  d(p) = n.p + dw;
 *  - colocation code per point: 0 = positive side ("above"),
 *    1 = |d| <= DSP_3D_TOLERANCE ("on"), 2 = negative side ("below"),
 *    packed low-bits-first: (c(v2)<<4) | (c(v1)<<2) | c(v0) — this is
 *    the packing that makes rt/context.cpp's split case tables
 *    geometrically consistent (e.g. case 0x06 "0 1 2" keeps v0 and
 *    the on-plane v1 and splits the v0-v2 edge, so v0 must be the
 *    below vertex and carry the low bits);
 *  - the beam interior is BELOW its four culling planes
 *    (rt::context_t::init_view() + cut() keep below parts), hence
 *    calc_oriented_plane_* orient the plane so the given point is
 *    below, calc_rev_oriented_plane_* so it is above;
 *  - cull_triangle_raw keeps the below part(s) (rt/context.cpp
 *    add_triangle culls with the view planes and keeps the interior);
 *  - split_triangle_raw emits below parts to `in` and above parts to
 *    `out` (RayTrace3D.cpp:904-985 sweeps the captured triangle with
 *    a moving culling plane oriented so the already-swept, earlier-
 *    time region lies below: `in` area must grow monotonically).
 */

#include <lsp-plug.in/dsp/dsp.h>
#include <math.h>

namespace lsp
{
    namespace dsp
    {
        static const float TOL = DSP_3D_TOLERANCE;

        static inline float plane_d(const vector3d_t *pl,
                                    const point3d_t *p)
        {
            return pl->dx * p->x + pl->dy * p->y + pl->dz * p->z
                 + pl->dw;
        }

        static inline size_t loc_code(float d)
        {
            return (d > TOL) ? 0 : (d < -TOL) ? 2 : 1;
        }

        void init_matrix3d_identity(matrix3d_t *m)
        {
            for (int i = 0; i < 16; ++i)
                m->m[i] = (i % 5 == 0) ? 1.0f : 0.0f;
        }

        void apply_matrix3d_mv1(vector3d_t *v, const matrix3d_t *m)
        {
            /* Direction transform: w = 0, translation ignored. */
            float dx = v->dx, dy = v->dy, dz = v->dz;
            v->dx = m->m[0] * dx + m->m[4] * dy + m->m[8] * dz;
            v->dy = m->m[1] * dx + m->m[5] * dy + m->m[9] * dz;
            v->dz = m->m[2] * dx + m->m[6] * dy + m->m[10] * dz;
            v->dw = 0.0f;
        }

        void init_vector_p2(vector3d_t *v, const point3d_t *a,
                            const point3d_t *b)
        {
            v->dx = b->x - a->x;
            v->dy = b->y - a->y;
            v->dz = b->z - a->z;
            v->dw = 0.0f;
        }

        void normalize_vector(vector3d_t *v)
        {
            float len = sqrtf(v->dx * v->dx + v->dy * v->dy
                              + v->dz * v->dz);
            if (len > 0.0f)
            {
                v->dx /= len;
                v->dy /= len;
                v->dz /= len;
            }
        }

        void unit_vector_p1pv(vector3d_t *v, const point3d_t *s,
                              const point3d_t *p)
        {
            /* Unit direction from point s toward the triangle's
             * centroid (the wavefront arrival direction used to weight
             * the capture's polar pattern, RayTrace3D.cpp:841-845). */
            float cx = (p[0].x + p[1].x + p[2].x) * (1.0f / 3.0f);
            float cy = (p[0].y + p[1].y + p[2].y) * (1.0f / 3.0f);
            float cz = (p[0].z + p[1].z + p[2].z) * (1.0f / 3.0f);
            v->dx = cx - s->x;
            v->dy = cy - s->y;
            v->dz = cz - s->z;
            v->dw = 0.0f;
            normalize_vector(v);
        }

        float calc_area_p3(const point3d_t *a, const point3d_t *b,
                           const point3d_t *c)
        {
            float ux = b->x - a->x, uy = b->y - a->y, uz = b->z - a->z;
            float vx = c->x - a->x, vy = c->y - a->y, vz = c->z - a->z;
            float nx = uy * vz - uz * vy;
            float ny = uz * vx - ux * vz;
            float nz = ux * vy - uy * vx;
            return 0.5f * sqrtf(nx * nx + ny * ny + nz * nz);
        }

        float calc_area_pv(const point3d_t *p)
        {
            return calc_area_p3(&p[0], &p[1], &p[2]);
        }

        float calc_distance_p2(const point3d_t *a, const point3d_t *b)
        {
            float dx = b->x - a->x, dy = b->y - a->y, dz = b->z - a->z;
            return sqrtf(dx * dx + dy * dy + dz * dz);
        }

        float calc_distance_v1(const vector3d_t *v)
        {
            return sqrtf(v->dx * v->dx + v->dy * v->dy
                         + v->dz * v->dz);
        }

        float calc_min_distance_pv(const point3d_t *p,
                                   const point3d_t *pv)
        {
            /* Nearest-vertex distance: used only to rank triangles by
             * proximity for the depth test (rt/context.cpp:1420-1437). */
            float dmin = calc_distance_p2(p, &pv[0]);
            for (int i = 1; i < 3; ++i)
            {
                float d = calc_distance_p2(p, &pv[i]);
                if (d < dmin)
                    dmin = d;
            }
            return dmin;
        }

        float calc_plane_p3(vector3d_t *pl, const point3d_t *p0,
                            const point3d_t *p1, const point3d_t *p2)
        {
            float ux = p1->x - p0->x, uy = p1->y - p0->y,
                  uz = p1->z - p0->z;
            float vx = p2->x - p0->x, vy = p2->y - p0->y,
                  vz = p2->z - p0->z;
            float nx = uy * vz - uz * vy;
            float ny = uz * vx - ux * vz;
            float nz = ux * vy - uy * vx;
            float len = sqrtf(nx * nx + ny * ny + nz * nz);
            if (len > 0.0f)
            {
                nx /= len;
                ny /= len;
                nz /= len;
            }
            pl->dx = nx;
            pl->dy = ny;
            pl->dz = nz;
            pl->dw = -(nx * p0->x + ny * p0->y + nz * p0->z);
            return len;
        }

        void calc_normal3d_p3(vector3d_t *n, const point3d_t *p0,
                              const point3d_t *p1, const point3d_t *p2)
        {
            calc_plane_p3(n, p0, p1, p2);
            n->dw = 0.0f;
        }

        float calc_plane_v1p2(vector3d_t *pl, const vector3d_t *n,
                              const point3d_t *a, const point3d_t *b)
        {
            /* Scissor plane through edge (a,b), perpendicular to the
             * triangle plane with normal n; oriented so the triangle
             * interior (the third vertex of a CCW triangle) is below
             * (rt/mesh.cpp:484-487 + colocation_x3_vvp1 case table:
             * 0x2a == all-below == inside). */
            float ex = b->x - a->x, ey = b->y - a->y, ez = b->z - a->z;
            float nx = ey * n->dz - ez * n->dy;
            float ny = ez * n->dx - ex * n->dz;
            float nz = ex * n->dy - ey * n->dx;
            float len = sqrtf(nx * nx + ny * ny + nz * nz);
            if (len > 0.0f)
            {
                nx /= len;
                ny /= len;
                nz /= len;
            }
            pl->dx = nx;
            pl->dy = ny;
            pl->dz = nz;
            pl->dw = -(nx * a->x + ny * a->y + nz * a->z);
            return len;
        }

        static inline void flip_plane(vector3d_t *pl)
        {
            pl->dx = -pl->dx;
            pl->dy = -pl->dy;
            pl->dz = -pl->dz;
            pl->dw = -pl->dw;
        }

        void calc_oriented_plane_p3(vector3d_t *pl, const point3d_t *pos,
                                    const point3d_t *p0,
                                    const point3d_t *p1,
                                    const point3d_t *p2)
        {
            calc_plane_p3(pl, p0, p1, p2);
            if (plane_d(pl, pos) > 0.0f)
                flip_plane(pl);
        }

        void calc_oriented_plane_pv(vector3d_t *pl, const point3d_t *pos,
                                    const point3d_t *p)
        {
            calc_oriented_plane_p3(pl, pos, &p[0], &p[1], &p[2]);
        }

        void calc_rev_oriented_plane_p3(vector3d_t *pl,
                                        const point3d_t *pos,
                                        const point3d_t *p0,
                                        const point3d_t *p1,
                                        const point3d_t *p2)
        {
            calc_plane_p3(pl, p0, p1, p2);
            if (plane_d(pl, pos) < 0.0f)
                flip_plane(pl);
        }

        void orient_plane_v1p1(vector3d_t *dst, const point3d_t *pos,
                               const vector3d_t *src)
        {
            /* Orient so pos lies below: the depth test cullback keeps
             * the below-or-on half-space, which must contain the point
             * of view (rt/context.cpp:1440-1446). */
            *dst = *src;
            if (plane_d(dst, pos) > 0.0f)
                flip_plane(dst);
        }

        void calc_split_point_pvv1(point3d_t *dst, const point3d_t *p,
                                   const vector3d_t *pl)
        {
            calc_split_point_p2v1(dst, &p[0], &p[1], pl);
        }

        size_t colocation_x2_v1pv(const vector3d_t *pl,
                                  const point3d_t *p)
        {
            return loc_code(plane_d(pl, &p[0]))
                 | (loc_code(plane_d(pl, &p[1])) << 2);
        }

        size_t colocation_x2_v1p2(const vector3d_t *pl,
                                  const point3d_t *a,
                                  const point3d_t *b)
        {
            return loc_code(plane_d(pl, a))
                 | (loc_code(plane_d(pl, b)) << 2);
        }

        size_t colocation_x3_vvp1(const vector3d_t *vv,
                                  const point3d_t *p)
        {
            return loc_code(plane_d(&vv[0], p))
                 | (loc_code(plane_d(&vv[1], p)) << 2)
                 | (loc_code(plane_d(&vv[2], p)) << 4);
        }

        /* Shared clip kernel: split src by pl; append below part(s)
         * to `below` and above part(s) to `above` (either may be
         * NULL).  Vertex order of emitted triangles preserves the
         * source winding, matching rt/context.cpp's split tables
         * (same topology up to cyclic rotation). */
        static void clip_triangle(raw_triangle_t *below, size_t *n_below,
                                  raw_triangle_t *above, size_t *n_above,
                                  const vector3d_t *pl,
                                  const raw_triangle_t *src)
        {
            size_t c[3];
            size_t nb = 0, na = 0;
            for (int i = 0; i < 3; ++i)
            {
                c[i] = loc_code(plane_d(pl, &src->v[i]));
                nb += (c[i] == 2);
                na += (c[i] == 0);
            }

            if (na == 0 && nb == 0)
                return;             /* fully on the plane: no area on
                                     * either side */
            if (nb == 0)
            {
                if (above != NULL)
                    above[(*n_above)++] = *src;
                return;
            }
            if (na == 0)
            {
                if (below != NULL)
                    below[(*n_below)++] = *src;
                return;
            }

            /* Mixed: one vertex is alone on its side.  Rotate indices
             * cyclically so v[r] is the lone vertex (preserves
             * winding). */
            size_t lone_code = (na == 1) ? 0 : 2;   /* na==nb==1: the
                                                     * above vertex is
                                                     * the lone one */
            if (na == 1 && nb == 1)
                lone_code = 0;
            int r = 0;
            while (c[r] != lone_code)
                ++r;
            const point3d_t *a = &src->v[r];
            const point3d_t *b = &src->v[(r + 1) % 3];
            const point3d_t *cc = &src->v[(r + 2) % 3];
            size_t cb = c[(r + 1) % 3], ccc = c[(r + 2) % 3];

            if (na == 1 && nb == 1)
            {
                /* above vertex a, one on-plane, one below: one
                 * triangle per side, lone edge split once. */
                const point3d_t *bel = (cb == 2) ? b : cc;
                point3d_t sp;
                calc_split_point_p2v1(&sp, a, bel, pl);

                if (above != NULL)
                {
                    raw_triangle_t *t = &above[(*n_above)++];
                    t->v[0] = *a;
                    t->v[1] = *b;
                    t->v[2] = *cc;
                    t->v[(cb == 2) ? 1 : 2] = sp;   /* replace the
                                                     * below vertex */
                }
                if (below != NULL)
                {
                    raw_triangle_t *t = &below[(*n_below)++];
                    t->v[0] = sp;                   /* replace a */
                    t->v[1] = *b;
                    t->v[2] = *cc;
                }
                return;
            }

            /* Lone vertex a on one side, b and cc strictly or weakly on
             * the other (any on-plane vertex among b/cc degenerates one
             * of the two far triangles to zero area; emit it anyway,
             * matching the reference's case tables which only special-
             * case exact colocation codes). */
            point3d_t sab, sac;
            calc_split_point_p2v1(&sab, a, b, pl);
            calc_split_point_p2v1(&sac, a, cc, pl);

            raw_triangle_t *near_side;
            raw_triangle_t *far_side;
            size_t *n_near, *n_far;
            if (lone_code == 0)
            {
                near_side = above; n_near = n_above;
                far_side = below; n_far = n_below;
            }
            else
            {
                near_side = below; n_near = n_below;
                far_side = above; n_far = n_above;
            }

            if (near_side != NULL)
            {
                raw_triangle_t *t = &near_side[(*n_near)++];
                t->v[0] = *a;
                t->v[1] = sab;
                t->v[2] = sac;
            }
            if (far_side != NULL)
            {
                raw_triangle_t *t;
                if (cb != 1)
                {
                    t = &far_side[(*n_far)++];
                    t->v[0] = sac;
                    t->v[1] = *b;
                    t->v[2] = *cc;
                    if (ccc != 1)
                    {
                        t = &far_side[(*n_far)++];
                        t->v[0] = sab;
                        t->v[1] = *b;
                        t->v[2] = sac;
                    }
                }
                else
                {
                    /* b on plane: single far triangle (sab==b) */
                    t = &far_side[(*n_far)++];
                    t->v[0] = sac;
                    t->v[1] = *b;
                    t->v[2] = *cc;
                }
            }
        }

        void cull_triangle_raw(raw_triangle_t *out, size_t *n_out,
                               const vector3d_t *pl,
                               const raw_triangle_t *src)
        {
            clip_triangle(out, n_out, NULL, NULL, pl, src);
        }

        void split_triangle_raw(raw_triangle_t *out, size_t *n_out,
                                raw_triangle_t *in, size_t *n_in,
                                const vector3d_t *pl,
                                const raw_triangle_t *src)
        {
            clip_triangle(in, n_in, out, n_out, pl, src);
        }
    } /* namespace dsp */
} /* namespace lsp */

"""Photon/VPL emission sampling: Light::Sample_L(scene, u1..u4, ray, pdf)
for a wavefront (/root/reference/lights/*.cpp "Sample_L(const Scene..."
overloads). Per-kind semantics preserved:

  point:      o = light pos, d ~ uniform sphere, pdf = 1/4pi, Le = I
              (point.cpp:70-77)
  spot:       d ~ uniform cone(cosTotalWidth) about the light axis,
              pdf = cone pdf, Le = I * falloff(d) (spot.cpp:87-95)
  projection: same cone built from the screen-window corner
              (projection.cpp:122-128), Le = I * projection factor
  gonio:      uniform sphere, Le = I * map(d) (goniometric.cpp)
  distant:    point on the world-bounding-sphere disk perpendicular to the
              direction, d = light dir, pdf = 1/(pi R^2) (distant.cpp:74-93)
  area:       point on the shape by area, d ~ uniform hemisphere about the
              surface normal, pdf = (1/area) * 1/(2pi) (area.cpp:83-92)
  infinite:   chord between two uniform points on the world bounding
              sphere, pdf = |cos|/(4pi R^2), Le = env radiance toward -d
              (infinite.cpp:132-154, infinitesample.cpp:193-215)
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import mc, transform as tf, vecmath as vm
from ..scene.data import (
    AREA_GEOM_QUADRIC, LIGHT_AREA, LIGHT_DISTANT, LIGHT_GONIOMETRIC,
    LIGHT_INFINITE, LIGHT_POINT, LIGHT_PROJECTION, LIGHT_SPOT, SceneData,
)
from . import lights as lt


def world_sphere(scene: SceneData):
    c = 0.5 * (scene.world_bound_lo + scene.world_bound_hi)
    r = vm.length(scene.world_bound_hi - c)
    return c, r


def sample_emission(scene: SceneData, light_id, u1, u2, u3, u4, u5):
    """Returns dict(o, d, pdf, Le) — a photon ray leaving the light.

    u5 is the shape-pick uniform the reference hides in a RandomFloat()
    inside ShapeSet::Sample (core/shape.h:121-127)."""
    lights = scene.lights
    g = lambda a: a[light_id]
    kind = g(lights.kind)
    I = g(lights.spectrum)
    light_pos = lights.l2w[:, :3, 3][light_id]
    kp = lights.kinds_present or (0, 1, 2, 3, 4, 5, 6)
    B = u1.shape
    zeros3 = jnp.zeros(B + (3,), jnp.float32)
    o = jnp.broadcast_to(light_pos, B + (3,))
    d = mc.uniform_sample_sphere(u1, u2)
    pdf = jnp.full(B, mc.uniform_sphere_pdf(), jnp.float32)
    Le = jnp.broadcast_to(I, B + (3,))
    c, r = world_sphere(scene)
    r = r * 1.01

    # spot / projection: uniform cone about the light-space +z axis.
    if LIGHT_SPOT in kp or LIGHT_PROJECTION in kp:
        p = g(lights.params)
        cos_w_spot = p[..., 0]
        # Projection cone containing the screen window corner
        # (projection.cpp:86-92): tan_x = max|x|/p00, tan_y = max|y|/p11.
        tan_x = jnp.maximum(jnp.abs(p[..., 4]), jnp.abs(p[..., 5])) / \
            jnp.maximum(p[..., 0], 1e-8)
        tan_y = jnp.maximum(jnp.abs(p[..., 6]), jnp.abs(p[..., 7])) / \
            jnp.maximum(p[..., 1], 1e-8)
        cos_w_proj = 1.0 / jnp.sqrt(1.0 + tan_x * tan_x + tan_y * tan_y)
        cos_w = jnp.where(kind == LIGHT_PROJECTION, cos_w_proj, cos_w_spot)
        d_cone_l = mc.uniform_sample_cone(u1, u2, cos_w)
        rows = tf.row_components(lights.l2w, light_id)
        d_cone = vm.normalize(tf.rows_apply_vector(rows, d_cone_l))
        sel = (kind == LIGHT_SPOT) | (kind == LIGHT_PROJECTION)
        d = jnp.where(sel[..., None], d_cone, d)
        pdf = jnp.where(sel, mc.uniform_cone_pdf(cos_w), pdf)

    # direction-dependent factor (spot falloff / projection / gonio map).
    if any(k in kp for k in (LIGHT_SPOT, LIGHT_PROJECTION,
                             LIGHT_GONIOMETRIC)):
        fac = lt._projection_factor(scene, light_id, d)
        dd = (kind == LIGHT_SPOT) | (kind == LIGHT_PROJECTION) | \
            (kind == LIGHT_GONIOMETRIC)
        Le = Le * jnp.where(dd[..., None], fac, 1.0)

    # distant: disk on the bounding sphere (distant.cpp:77-92).
    if LIGHT_DISTANT in kp:
        ldir = g(lights.params)[..., 0:3]          # direction TOWARD light
        edir = -ldir                                # emission direction
        _, v1, v2 = vm.coordinate_system(vm.normalize(edir))
        d1, d2 = mc.concentric_sample_disk(u1, u2)
        pdisk = c + r * (d1[..., None] * v1 + d2[..., None] * v2)
        sel = kind == LIGHT_DISTANT
        o = jnp.where(sel[..., None], pdisk - r * edir, o)
        d = jnp.where(sel[..., None], edir, d)
        pdf = jnp.where(sel, 1.0 / (jnp.pi * r * r), pdf)

    # area: shape point by area + uniform hemisphere about ns.
    if LIGHT_AREA in kp:
        is_quad = g(lights.area_geom_kind) == AREA_GEOM_QUADRIC
        if scene.quadrics.count > 0:
            # Shape::Sample(u1, u2, &ns) per quadric kind (the reference
            # emits photons from the actual surface, AreaLight::Sample_L
            # area.cpp:83-92 -> shape->Sample). Sampling every quadric as
            # a sphere put disk-light photons on a phantom sphere — half
            # of them emitted into the wrong half-space, contaminating
            # exphotonmap's radiance photons near the light (r4 fix).
            from ..scene.data import QUADRIC_SPHERE, QUADRIC_DISK
            qid = jnp.clip(g(lights.area_first), 0, scene.quadrics.count - 1)
            center = scene.quadrics.o2w[:, :3, 3][qid]
            qkind = scene.quadrics.kind[qid]
            pq = scene.quadrics.params[qid]
            radius = pq[..., 0]
            sph = mc.uniform_sample_sphere(u1, u2)
            ps_sph = center + radius[..., None] * sph
            ns_sph = sph
            # Disk params [height, radius, inner, phimax]: sqrt-lerp in
            # r^2 = uniform area over the annulus sector (disk.cpp:36-44).
            d_h, d_r, d_ri, d_ph = (pq[..., 0], pq[..., 1], pq[..., 2],
                                    pq[..., 3])
            rr_d = jnp.sqrt(d_ri * d_ri + u1 * (d_r * d_r - d_ri * d_ri))
            phi_d = u2 * d_ph
            disk_ps = jnp.stack([rr_d * jnp.cos(phi_d),
                                 rr_d * jnp.sin(phi_d), d_h], -1)
            disk_ns = jnp.concatenate(
                [jnp.zeros(B + (2,)), jnp.ones(B + (1,))], -1)
            # Cylinder params [radius, zmin, zmax, phimax].
            c_r, c_z0, c_z1, c_ph = (pq[..., 0], pq[..., 1], pq[..., 2],
                                     pq[..., 3])
            phi_c = u2 * c_ph
            zc = c_z0 + u1 * (c_z1 - c_z0)
            cyl_ps = jnp.stack([c_r * jnp.cos(phi_c),
                                c_r * jnp.sin(phi_c), zc], -1)
            cyl_ns = jnp.stack([jnp.cos(phi_c), jnp.sin(phi_c),
                                jnp.zeros_like(zc)], -1)
            is_disk = (qkind == QUADRIC_DISK)[..., None]
            obj_ps = jnp.where(is_disk, disk_ps, cyl_ps)
            obj_ns = jnp.where(is_disk, disk_ns, cyl_ns)
            rows_o2w = tf.row_components(scene.quadrics.o2w, qid)
            rows_w2o = tf.row_components(scene.quadrics.w2o, qid)
            ps_flat = tf.rows_apply_point(rows_o2w, obj_ps)
            ns_flat = vm.normalize(tf.rows_apply_normal(rows_w2o, obj_ns))
            sphere_kind = (qkind == QUADRIC_SPHERE)[..., None]
            ps_q = jnp.where(sphere_kind, ps_sph, ps_flat)
            ns_q = jnp.where(sphere_kind, ns_sph, ns_flat)
            ns_q = ns_q * scene.quadrics.flip_normal[qid][..., None]
        else:
            ps_q, ns_q = o, zeros3
        if scene.triangles.count > 0:
            ps_t, ns_t = lt._sample_area_tris(scene, light_id, o, u1, u2, u5)
        else:
            ps_t, ns_t = ps_q, ns_q
        # Instanced emitters (AREA_GEOM_INST) shoot from the shared
        # prototype surface under the light's instance transform.
        if scene.lights.inst_area and scene.instances is not None and \
                scene.instances.count > 0:
            ps_i, ns_i = lt._sample_area_inst(scene, light_id, u1, u2, u5)
            from ..scene.data import AREA_GEOM_INST as _AGI
            use_i = (g(lights.area_geom_kind) == _AGI)[..., None]
            ps_t = jnp.where(use_i, ps_i, ps_t)
            ns_t = jnp.where(use_i, ns_i, ns_t)
        ps = jnp.where(is_quad[..., None], ps_q, ps_t)
        ns = jnp.where(is_quad[..., None], ns_q, ns_t)
        da = mc.uniform_sample_sphere(u3, u4)
        da = jnp.where(vm.dot(da, ns)[..., None] < 0.0, -da, da)
        sel = kind == LIGHT_AREA
        o = jnp.where(sel[..., None], ps, o)
        d = jnp.where(sel[..., None], da, d)
        pdf = jnp.where(sel,
                        mc.INV_TWOPI /
                        jnp.maximum(g(lights.area_total_area), 1e-12), pdf)
        # L(p, ns, d): one-sided, satisfied by the flip above.

    # infinite: chord between two bounding-sphere points.
    if LIGHT_INFINITE in kp:
        p1 = c + r * mc.uniform_sample_sphere(u1, u2)
        p2 = c + r * mc.uniform_sample_sphere(u3, u4)
        di = vm.normalize(p2 - p1)
        costheta = vm.absdot(vm.normalize(c - p1), di)
        sel = kind == LIGHT_INFINITE
        o = jnp.where(sel[..., None], p1, o)
        d = jnp.where(sel[..., None], di, d)
        pdf = jnp.where(sel, costheta / (4.0 * jnp.pi * r * r), pdf)
        Le = jnp.where(sel[..., None], lt.env_radiance(scene, light_id, -di),
                       Le)

    return dict(o=o, d=d, pdf=pdf, Le=Le)


def pick_light_uniform(scene: SceneData, u):
    """lightNum = min(floor(nLights*u), n-1), pdf = 1/n
    (photonmap.cpp:186-190)."""
    n = scene.lights.count
    lid = jnp.minimum((u * n).astype(jnp.int32), n - 1)
    return lid, 1.0 / n

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
            qid = jnp.clip(g(lights.area_first), 0, scene.quadrics.count - 1)
            center = scene.quadrics.o2w[:, :3, 3][qid]
            radius = scene.quadrics.params[qid][..., 0]
            sph = mc.uniform_sample_sphere(u1, u2)
            ps_q = center + radius[..., None] * sph
            ns_q = sph * scene.quadrics.flip_normal[qid][..., None]
        else:
            ps_q, ns_q = o, zeros3
        if scene.triangles.count > 0:
            ps_t, ns_t = lt._sample_area_tris(scene, light_id, o, u1, u2, u5)
        else:
            ps_t, ns_t = ps_q, ns_q
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

"""Scene-level intersection: the TPU analogue of Scene::Intersect/IntersectP
(/root/reference/core/scene.h:40-49) plus the aggregate dispatch that the
reference does through Primitive virtuals (core/primitive.{h,cpp}).

A "primitive id" is a single integer: quadric q -> q, triangle t -> NQ + t.
`intersect` returns nearest-hit SoA records; `occluded` is the any-hit
predicate used for shadow rays. When the scene has a grid accelerator the
DDA traversal (accel/grid.py) is used; otherwise all-pairs brute force —
the small-scene fast path (a few dozen prims fits VMEM easily).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..scene.data import SceneData
from ..shapes import quadrics, triangle

_BIG = jnp.float32(1e30)
PRIM_QUADRIC = 0
PRIM_TRIANGLE = 1


def _brute_force(scene: SceneData, o, d, mint, maxt):
    """Nearest hit over all prims. Returns (t[N], prim_id[N], hit[N])."""
    n = o.shape[0]
    nq = scene.quadrics.count
    nt = scene.triangles.count
    best_t = jnp.full((n,), _BIG)
    best_id = jnp.full((n,), -1, jnp.int32)
    if nq:
        tq, vq = quadrics.intersect(scene.quadrics, o, d, mint, maxt)
        tq = jnp.where(vq, tq, _BIG)
        qi = jnp.argmin(tq, axis=1)
        qt = jnp.take_along_axis(tq, qi[:, None], axis=1)[:, 0]
        upd = qt < best_t
        best_t = jnp.where(upd, qt, best_t)
        best_id = jnp.where(upd, qi.astype(jnp.int32), best_id)
    if nt:
        tt, vt = triangle.intersect(scene.triangles, o, d, mint, maxt)
        tt = jnp.where(vt, tt, _BIG)
        ti = jnp.argmin(tt, axis=1)
        t_best = jnp.take_along_axis(tt, ti[:, None], axis=1)[:, 0]
        upd = t_best < best_t
        best_t = jnp.where(upd, t_best, best_t)
        best_id = jnp.where(upd, ti.astype(jnp.int32) + nq, best_id)
    hit = best_id >= 0
    return best_t, best_id, hit


def intersect_ids(scene: SceneData, o, d, mint, maxt):
    """Nearest-hit (t, prim_id, hit) without differential geometry."""
    if scene.accel is not None:
        from ..scene.data import KdTreeAccel
        if isinstance(scene.accel, KdTreeAccel):
            from . import kdtree as kd_mod
            return kd_mod.intersect(scene, o, d, mint, maxt)
        from . import grid as grid_mod
        return grid_mod.intersect(scene, o, d, mint, maxt)
    return _brute_force(scene, o, d, mint, maxt)


def occluded(scene: SceneData, o, d, mint, maxt):
    """Any-hit shadow-ray predicate (Scene::IntersectP)."""
    if scene.accel is not None:
        from ..scene.data import KdTreeAccel
        if isinstance(scene.accel, KdTreeAccel):
            from . import kdtree as kd_mod
            _, _, hit = kd_mod.intersect(scene, o, d, mint, maxt,
                                         any_hit=True)
            return hit
    _, _, hit = intersect_ids(scene, o, d, mint, maxt)
    return hit


def hit_geometry(scene: SceneData, prim_id, o, d, t):
    """DifferentialGeometry + material/area-light ids for winning prims.

    prim_id may be -1 (miss); outputs are garbage there and must be masked
    by the caller's `hit` flag (standard wavefront discipline).
    """
    nq = scene.quadrics.count
    nt = scene.triangles.count
    pid = jnp.maximum(prim_id, 0)

    if nq and nt:
        is_tri = pid >= nq
        qid = jnp.clip(pid, 0, nq - 1)
        tid = jnp.clip(pid - nq, 0, nt - 1)
        dgq = quadrics.differential_geometry(scene.quadrics, qid, o, d, t)
        dgt = triangle.differential_geometry(scene.triangles, tid, o, d, t)
        m = is_tri[..., None]
        dg = {}
        for k in ("p", "nn", "dpdu", "dpdv", "dndu", "dndv"):
            dg[k] = jnp.where(m, dgt[k], dgq[k])
        for k in ("u", "v"):
            dg[k] = jnp.where(is_tri, dgt[k], dgq[k])
        dg["sn"] = jnp.where(m, dgt["sn"], dgq["nn"])
        dg["ss"] = jnp.where(m, dgt["ss"], _norm(dgq["dpdu"]))
        dg["ts"] = jnp.where(m, dgt["ts"], _cross_n(dgq))
        material = jnp.where(is_tri, scene.triangles.material[tid],
                             scene.quadrics.material[qid])
        area_light = jnp.where(is_tri, scene.triangles.area_light[tid],
                               scene.quadrics.area_light[qid])
    elif nt:
        tid = jnp.clip(pid - nq, 0, nt - 1)
        dg = triangle.differential_geometry(scene.triangles, tid, o, d, t)
        material = scene.triangles.material[tid]
        area_light = scene.triangles.area_light[tid]
    else:
        qid = jnp.clip(pid, 0, max(nq - 1, 0))
        dgq = quadrics.differential_geometry(scene.quadrics, qid, o, d, t)
        dg = dict(dgq)
        dg["sn"] = dgq["nn"]
        dg["ss"] = _norm(dgq["dpdu"])
        dg["ts"] = _cross_n(dgq)
        material = scene.quadrics.material[qid]
        area_light = scene.quadrics.area_light[qid]

    dg["material"] = material
    dg["area_light"] = area_light
    return dg


def _norm(v):
    from ..core import vecmath as vm
    return vm.normalize(v)


def _cross_n(dgq):
    from ..core import vecmath as vm
    return vm.normalize(vm.cross(dgq["nn"], vm.normalize(dgq["dpdu"])))

"""Ray-transform instancing: build + intersection + shading geometry.

TPU-native realization of the reference's InstancePrimitive
(/root/reference/core/primitive.cpp:66-85, api.cpp ObjectInstance):
prototype triangle meshes are stored ONCE in object space, each with its
own SAH BLAS (accel/bvh_build.build_rows); instances carry only 4x4
transforms. Traversal (ops/bvh_pallas.traverse_instanced) streams each
(instance, BLAS block) entry through VMEM, transforming rays into
instance space in-kernel; the unnormalized transformed direction keeps
the world-t parameterization so hits from instances and the main
aggregate compare directly.

Global prim-id encoding for instanced hits (so integrator signatures are
unchanged): pid = NQ + NT + inst * n_proto_tris + proto_tri.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import transform as tf, vecmath as vm
from ..scene.data import InstanceTable

_BIG = jnp.float32(1e30)
BLOCK_CAP = 2048


def build_instances(protos, instances) -> InstanceTable:
    """protos: list of dicts with keys verts f32[V,3], idx i32[T,3],
    uv f32[V,2]|None, normals f32[V,3]|None, material i32[T] (global
    material ids), flip float. instances: list of (proto_id, o2w 4x4)."""
    from .bvh_build import build_rows

    v_ofs = 0
    t_ofs = 0
    all_v, all_i, all_uv, all_n, all_hn, all_m, all_f = \
        [], [], [], [], [], [], []
    node_blocks = []
    proto_blocks = []       # per proto: (block_ofs, n_blocks, nn)
    proto_block_bbox = []   # per proto: [n_blocks, 6] object-space bbox
    blk_ofs = 0
    for pr in protos:
        verts = np.asarray(pr["verts"], np.float32)
        idx = np.asarray(pr["idx"], np.int32)
        T = len(idx)
        tri9 = np.concatenate([verts[idx[:, 0]], verts[idx[:, 1]],
                               verts[idx[:, 2]]], axis=1).astype(np.float32)
        lo = tri9.reshape(T, 3, 3).min(1)
        hi = tri9.reshape(T, 3, 3).max(1)
        rows, _pids, nn = build_rows(lo, hi, 0, tri9)
        # Leaf prim ids -> global proto-tri ids (cols 80..87; only leaf
        # rows read them, guarded by j < nprims).
        rows = rows.copy()
        rows[:, 80:88] += float(t_ofs)
        nb = -(-nn // BLOCK_CAP)
        padded = np.zeros((nb * BLOCK_CAP, rows.shape[1]), np.float32)
        padded[:nn] = rows
        node_blocks.append(padded)
        bbox = np.stack([
            np.stack([rows[s:e, 0:3].min(0) for s, e in
                      [(b * BLOCK_CAP, min(nn, (b + 1) * BLOCK_CAP))
                       for b in range(nb)]]),
            np.stack([rows[s:e, 3:6].max(0) for s, e in
                      [(b * BLOCK_CAP, min(nn, (b + 1) * BLOCK_CAP))
                       for b in range(nb)]]),
        ], axis=1).reshape(nb, 6)
        proto_blocks.append((blk_ofs, nb, nn))
        proto_block_bbox.append(bbox)
        blk_ofs += nb

        all_v.append(verts)
        all_i.append(idx + v_ofs)
        uv = pr.get("uv")
        all_uv.append(np.asarray(uv, np.float32) if uv is not None
                      else np.zeros((len(verts), 2), np.float32))
        nrm = pr.get("normals")
        all_n.append(np.asarray(nrm, np.float32) if nrm is not None
                     else np.zeros((len(verts), 3), np.float32))
        all_hn.append(np.full(T, nrm is not None, bool))
        all_m.append(np.asarray(pr["material"], np.int32) * np.ones(T, np.int32))
        all_f.append(np.full(T, float(pr.get("flip", 1.0)), np.float32))
        v_ofs += len(verts)
        t_ofs += T

    assert t_ofs < (1 << 24), "prototype tris exceed the f32-id row format"
    nodes = np.concatenate(node_blocks) if node_blocks else \
        np.zeros((BLOCK_CAP, 96), np.float32)
    if nodes.shape[1] != 128:
        nodes = np.pad(nodes, ((0, 0), (0, 128 - nodes.shape[1])))

    # Entries: (instance, proto block) pairs with world-space bboxes.
    e_blk, e_inst, e_start, e_stop, e_bbox = [], [], [], [], []
    o2w_list, w2o_list = [], []
    lo_all = np.full(3, 1e30, np.float32)
    hi_all = np.full(3, -1e30, np.float32)
    for ii, (pid, o2w) in enumerate(instances):
        o2w = np.asarray(o2w, np.float32)
        o2w_list.append(o2w)
        w2o_list.append(np.linalg.inv(o2w).astype(np.float32))
        ofs, nb, nn = proto_blocks[pid]
        bbox = proto_block_bbox[pid]
        for b in range(nb):
            blo, bhi = bbox[b, 0:3], bbox[b, 3:6]
            corners = np.array([[x, y, z] for x in (blo[0], bhi[0])
                                for y in (blo[1], bhi[1])
                                for z in (blo[2], bhi[2])], np.float32)
            wc = corners @ o2w[:3, :3].T + o2w[:3, 3]
            wlo, whi = wc.min(0), wc.max(0)
            pad = 1e-5 * np.abs(wc).max() + 1e-6
            e_blk.append(ofs + b)
            e_inst.append(ii)
            e_start.append(b * BLOCK_CAP)
            e_stop.append(min(nn, (b + 1) * BLOCK_CAP))
            e_bbox.append(np.concatenate([wlo - pad, whi + pad,
                                          np.zeros(2, np.float32)]))
            lo_all = np.minimum(lo_all, wlo)
            hi_all = np.maximum(hi_all, whi)

    signs = np.asarray([1.0 if np.linalg.det(np.asarray(m)[:3, :3]) >= 0
                        else -1.0 for m in o2w_list], np.float32) \
        if o2w_list else np.zeros((0,), np.float32)
    dp = jax.device_put
    return InstanceTable(
        inst_sign=dp(signs),
        verts=dp(np.concatenate(all_v)), idx=dp(np.concatenate(all_i)),
        uv=dp(np.concatenate(all_uv)), normals=dp(np.concatenate(all_n)),
        has_normals=dp(np.concatenate(all_hn)),
        material=dp(np.concatenate(all_m)),
        flip_normal=dp(np.concatenate(all_f)),
        nodes=dp(nodes),
        inst_o2w=dp(np.stack(o2w_list)), inst_w2o=dp(np.stack(w2o_list)),
        entry_block=dp(np.asarray(e_blk, np.int32)),
        entry_inst=dp(np.asarray(e_inst, np.int32)),
        entry_start=dp(np.asarray(e_start, np.int32)),
        entry_stop=dp(np.asarray(e_stop, np.int32)),
        entry_bbox=dp(np.stack(e_bbox)),
        bounds_lo=dp(lo_all), bounds_hi=dp(hi_all),
        count=len(instances), n_tris=t_ofs, n_entries=len(e_blk),
        block_cap=BLOCK_CAP, leaf_k=8)


def intersect(inst: InstanceTable, o, d, mint, maxt, any_hit=False):
    """(t, code, hit): code = inst * n_tris + proto_tri for hits, -1 else.
    Detached (accel-style); callers recompute the winner differentiably
    via recompute_t."""
    from ..ops import bvh_pallas
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    mint = jax.lax.stop_gradient(mint)
    maxt = jax.lax.stop_gradient(maxt)
    N = o.shape[0]
    tile = bvh_pallas.RAY_TILE
    Np = -(-max(N, 1) // tile) * tile
    rays = jnp.concatenate([o.T, d.T, mint[None], maxt[None]], axis=0)
    if Np != N:
        pad = jnp.zeros((8, Np - N), jnp.float32)
        pad = pad.at[6].set(1.0).at[7].set(-1.0)
        rays = jnp.concatenate([rays, pad], axis=1)
    # Traversal is fully detached (standard accel discipline): gradients
    # flow only through recompute_t's world-vertex math. Without the
    # stop_gradients a jax.grad over instance transforms would try to
    # differentiate the pallas_call itself.
    sg = jax.lax.stop_gradient
    w2o12 = sg(inst.inst_w2o)[:, :3, :].reshape(inst.count, 12)
    interp = jax.default_backend() != "tpu"
    t, tri, ii = bvh_pallas.traverse_instanced(
        sg(inst.nodes), inst.entry_block, inst.entry_inst,
        inst.entry_start, inst.entry_stop, sg(inst.entry_bbox), w2o12,
        rays,
        n_entries=inst.n_entries, n_inst=inst.count, cap=inst.block_cap,
        leaf_k=inst.leaf_k, any_hit=any_hit, interpret=interp)
    t = t[:N]
    tri = tri[:N]
    ii = ii[:N]
    hit = (tri >= 0) & (ii >= 0)
    code = jnp.where(hit, ii * inst.n_tris + tri, -1)
    return jnp.where(hit, t, _BIG), code, hit


def _world_verts(inst: InstanceTable, code):
    """Gather + transform the hit triangle's vertices to world space.
    Returns (inst_id, tri_id, o2w rows, w2o rows, p0, p1, p2, i3)."""
    code = jnp.maximum(code, 0)
    ii = code // inst.n_tris
    tid = code % inst.n_tris
    i3 = inst.idx[tid]
    o2w_c = tf.row_components(inst.inst_o2w, ii)
    w2o_c = tf.row_components(inst.inst_w2o, ii)
    p0 = tf.rows_apply_point(o2w_c, inst.verts[i3[..., 0]])
    p1 = tf.rows_apply_point(o2w_c, inst.verts[i3[..., 1]])
    p2 = tf.rows_apply_point(o2w_c, inst.verts[i3[..., 2]])
    return ii, tid, o2w_c, w2o_c, p0, p1, p2, i3


def recompute_t(inst: InstanceTable, code, o, d, mint, hit):
    """Differentiable t of the winning instanced triangle (same detached-
    traversal / differentiable-recompute estimator as accel/bvh.py)."""
    from ..shapes import triangle as trimod
    _, _, _, _, p0, p1, p2, _ = _world_verts(inst, code)
    t, _, _, valid = trimod.intersect_pairs(
        p0, p1, p2, o, d, mint, jnp.full(mint.shape, _BIG))
    return t, valid & hit


def hit_geometry(inst: InstanceTable, code, o, d, t):
    """DifferentialGeometry for instanced hits: object-space prototype
    triangle transformed to world (mirrors triangle.differential_geometry;
    normals via the inverse-transpose)."""
    from ..shapes import triangle as trimod
    ii, tid, o2w_c, w2o_c, p0, p1, p2, i3 = _world_verts(inst, code)
    _, b1, b2, _ = trimod.intersect_pairs(
        p0, p1, p2, o, d, jnp.full(t.shape, -_BIG),
        jnp.full(t.shape, _BIG))
    b0 = 1.0 - b1 - b2
    uv0 = inst.uv[i3[..., 0]]
    uv1 = inst.uv[i3[..., 1]]
    uv2 = inst.uv[i3[..., 2]]
    p = o + t[..., None] * d
    u = b0 * uv0[..., 0] + b1 * uv1[..., 0] + b2 * uv2[..., 0]
    v = b0 * uv0[..., 1] + b1 * uv1[..., 1] + b2 * uv2[..., 1]

    du1 = uv0[..., 0] - uv2[..., 0]
    du2 = uv1[..., 0] - uv2[..., 0]
    dv1 = uv0[..., 1] - uv2[..., 1]
    dv2 = uv1[..., 1] - uv2[..., 1]
    dp1 = p0 - p2
    dp2 = p1 - p2
    det = du1 * dv2 - dv1 * du2
    degen = jnp.abs(det) < 1e-12
    invdet = 1.0 / jnp.where(degen, 1.0, det)
    dpdu = (dv2[..., None] * dp1 - dv1[..., None] * dp2) * invdet[..., None]
    dpdv = (-du2[..., None] * dp1 + du1[..., None] * dp2) * invdet[..., None]
    ng_raw = vm.cross(p1 - p0, p2 - p0)
    _, fu, fv = vm.coordinate_system(vm.normalize(ng_raw))
    dpdu = jnp.where(degen[..., None], fu, dpdu)
    dpdv = jnp.where(degen[..., None], fv, dpdv)

    # Mirror instances swap handedness: fold the per-instance sign so
    # orientation matches the duplication path (ctm @ sctm flip).
    flip = inst.flip_normal[tid] * inst.inst_sign[ii]
    nn = vm.normalize(vm.cross(dpdu, dpdv)) * flip[..., None]

    has_n = inst.has_normals[tid]
    # Shading normals: object space -> world via inverse transpose.
    n0 = tf.rows_apply_normal(w2o_c, inst.normals[i3[..., 0]])
    n1 = tf.rows_apply_normal(w2o_c, inst.normals[i3[..., 1]])
    n2 = tf.rows_apply_normal(w2o_c, inst.normals[i3[..., 2]])
    ns = vm.normalize(b0[..., None] * n0 + b1[..., None] * n1 +
                      b2[..., None] * n2) * flip[..., None]
    ns = jnp.where(has_n[..., None], ns, nn)
    ss = vm.normalize(dpdu)
    ts = vm.normalize(vm.cross(ns, ss))
    ss = vm.cross(ts, ns)
    # dndu/dndv of the world-space shading normals from the uv deltas
    # (trianglemesh.cpp:104-123 semantics; the reference transforms the
    # prototype's dn by the instance transform, core/primitive.cpp:75-85 —
    # equivalent to differencing the already-transformed normals).
    dn1 = n0 - n2
    dn2 = n1 - n2
    dndu = (dv2[..., None] * dn1 - dv1[..., None] * dn2) * invdet[..., None]
    dndv = (-du2[..., None] * dn1 + du1[..., None] * dn2) * invdet[..., None]
    zero = jnp.zeros_like(dndu)
    bad = degen | ~has_n
    dndu = jnp.where(bad[..., None], zero, dndu)
    dndv = jnp.where(bad[..., None], zero, dndv)
    if inst.tri_emissive is not None and inst.inst_area_light is not None:
        # Instanced area emitters: the hit's light id is this instance's
        # own LightTable row (AREA_GEOM_INST; each instance is a distinct
        # light with shared object-space geometry).
        area_light = jnp.where(inst.tri_emissive[tid],
                               inst.inst_area_light[ii],
                               jnp.full_like(tid, -1))
    else:
        area_light = jnp.full_like(tid, -1)
    return dict(p=p, nn=nn, sn=ns, ss=ss, ts=ts, u=u, v=v,
                dpdu=dpdu, dpdv=dpdv, dndu=dndu, dndv=dndv,
                material=inst.material[tid],
                area_light=area_light)

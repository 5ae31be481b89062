"""Silhouette (visibility-discontinuity) gradients via edge sampling.

The detached-sampling AD path (parallel/shard.render_loss_fn) differentiates
shading but treats visibility as a constant: moving an occluder's silhouette
across a bright background, or its shadow across a lit floor, changes which
pixels see what — BOUNDARY integrals the interior estimator cannot see (the
reference has no analogue; BASELINE.json "differentiable end-to-end" north
star; VERDICT r2-r5 item).

Estimators (the physically-based differentiable-rendering boundary terms,
cf. Li et al. 2018's edge sampling, re-derived for this wavefront renderer):

1. PRIMARY visibility (mesh edges + sphere rims). For a loss
   Loss = Integral g(I(x), x) dx over the image,

     dLoss/dtheta  ⊃  Sum_{silhouette curves} Integral_0^1
         [g(L_minus) - g(L_plus)] (n_perp . d xy_c/d theta) |d xy_c/d u| du

   where xy_c(u) is the image projection of the curve point, n_perp the
   image-space curve normal, and L_minus/L_plus the radiance a half-pixel
   to either side (occlusion of the curve by nearer geometry is handled
   automatically: both side rays then see the occluder and the jump
   vanishes). Mesh silhouette edges are facing-disagreement/boundary
   edges; sphere rims are the circle (p-c).(o-p)=0 (full spheres with
   rigid transforms; partial quadrics are not covered).

2. SHADOW boundaries of DELTA lights (point/spot/distant). The shadow
   curve on a receiver is the projection of the occluder's silhouette
   edges (w.r.t. the light) from the light through the edge onto the
   receiver; its image projection is handled exactly like a primary
   curve: the jump is read off the rendered image a half-pixel to either
   side, and the curve position r(theta) = light + s * (e(theta) - light)
   (s solving the receiver's detached tangent-plane equation) carries the
   derivative through both the edge vertices and the light position.

3. SHADOW boundaries of AREA lights. The penumbra is smooth in the image,
   so the jump lives in the LIGHT-AREA domain: for a receiver point p,
   I_direct(p) = Integral_A f Le G V dA(l) and V's discontinuity curves
   on A are the projections of silhouette edges (w.r.t. p) from p onto
   the light plane. Sampling (pixel, edge, u) jointly:

     dLoss/dtheta ⊃ E[ W*H*E/M * <dg/dI(px), Ijump(l_e)>
                        (n_A . d l_e/d theta) |d l_e/d u| ]

   with Ijump the jump of the NEE integrand f*Le*G*V evaluated at
   l_e -+ delta*n_A by real shadow rays (so occlusion of the edge itself
   and curve portions outside the emitter zero out automatically), and
   l_e = p + s (e - p) projected onto the (detached) light plane.
   Planar triangle-mesh emitters only.

All terms are returned as a SURROGATE scalar whose jax.grad equals the
boundary term: every factor except the projected curve position is
stop_grad'ed, so

    surrogate = sum_k  c_k * (n_perp_k . xy_k(theta)),   c_k detached,

composing with the interior loss as
    loss_total = interior + surrogate - stop_grad(surrogate)
(value unchanged, gradient augmented). Edge/u sampling is STRATIFIED:
every edge receives ceil(M/E) samples with u stratified within the edge,
which is what makes finite-difference validation at <=10% practical.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import render as R
from ..accel import intersect as isect
from ..cameras import cameras as cam_mod
from ..core import vecmath as vm
from ..parallel.shard import render_loss_fn
from ..scene import data as D
from ..scene.data import SceneData

sg = jax.lax.stop_gradient


def mesh_edges(idx: np.ndarray):
    """Static edge topology of a triangle mesh: (edges i32[E,2] vertex ids,
    adj i32[E,2] adjacent triangle ids, -1 for boundary)."""
    idx = np.asarray(idx)
    emap = {}
    for t, (a, b, c) in enumerate(idx):
        for u, v in ((a, b), (b, c), (c, a)):
            key = (min(u, v), max(u, v))
            emap.setdefault(key, []).append(t)
    edges = np.asarray(sorted(emap.keys()), np.int32).reshape(-1, 2)
    adj = np.full((len(edges), 2), -1, np.int32)
    for i, key in enumerate(sorted(emap.keys())):
        for j, t in enumerate(emap[key][:2]):
            adj[i, j] = t
    return edges, adj


def _project(cam, p):
    """World point -> continuous raster (x, y) + valid mask (w > 0).
    cam2raster = inv(raster2cam) . world2cam with homogeneous divide
    (forward of cameras.build_projective's raster->camera chain)."""
    C = jnp.linalg.inv(cam.raster2cam) @ cam.world2cam
    ph = jnp.concatenate([p, jnp.ones(p.shape[:-1] + (1,), p.dtype)], -1)
    h = ph @ C.T
    w = h[..., 3]
    ok = w > 1e-6
    wsafe = jnp.where(ok, w, 1.0)
    return h[..., 0] / wsafe, h[..., 1] / wsafe, ok


def _radiance_at(scene, opts, x, y):
    """Detached radiance through raster points (x, y) via the configured
    scan integrator (pinhole: lens sample irrelevant)."""
    n = x.shape[0]
    half = jnp.full((n,), 0.5, jnp.float32)
    o, d, mint, maxt, _ = cam_mod.generate_rays(
        scene.camera, x, y, half, half, half * 0.0, opts.xres, opts.yres)
    px = jnp.clip(x.astype(jnp.int32), 0, opts.xres - 1)
    py = jnp.clip(y.astype(jnp.int32), 0, opts.yres - 1)
    L, _, _ = R._li_dispatch(sg(scene), opts, o, d, mint, maxt, px, py,
                             jnp.zeros((n,), jnp.int32))
    return sg(L)


def _edge_samples(E: int, n_samples: int, key):
    """Stratified (edge, u) sampling: every edge gets reps = ceil(n/E)
    samples with u stratified over reps bins. Per-sample weight E/M keeps
    the estimator of sum_edges Integral_0^1 unbiased."""
    reps = max(1, -(-n_samples // E))
    M = reps * E
    ei = jnp.tile(jnp.arange(E, dtype=jnp.int32), reps)
    bins = jnp.repeat(jnp.arange(reps, dtype=jnp.float32), E)
    u = (bins + jax.random.uniform(key, (M,))) / reps
    return ei, u, M


def _image_jump_surrogate(scene, opts, jump_fn, xy_fn, u, mask,
                          weight: float, eps_pix: float):
    """Shared tail of the image-space estimators: given xy_fn(u) mapping
    the curve parameter to differentiable raster positions, build
    sum_k c_k (n_perp_k . xy_k(theta)) with c_k = jump * |dxy/du| * w."""
    (xy, ok), (dxy_du, _) = jax.jvp(xy_fn, (u,), (jnp.ones_like(u),))
    xy_d = xy                                       # differentiable
    xy = sg(xy)
    dxy_du = sg(dxy_du)
    arclen = jnp.linalg.norm(dxy_du, axis=-1)
    tgt = dxy_du / jnp.maximum(arclen, 1e-12)[:, None]
    n_perp = jnp.stack([tgt[:, 1], -tgt[:, 0]], -1)  # 90-degree rotation

    x_m = xy[:, 0] - eps_pix * n_perp[:, 0]
    y_m = xy[:, 1] - eps_pix * n_perp[:, 1]
    x_p = xy[:, 0] + eps_pix * n_perp[:, 0]
    y_p = xy[:, 1] + eps_pix * n_perp[:, 1]
    L_m = _radiance_at(scene, opts, x_m, y_m)
    L_p = _radiance_at(scene, opts, x_p, y_p)

    px = jnp.clip(xy[:, 0].astype(jnp.int32), 0, opts.xres - 1)
    py = jnp.clip(xy[:, 1].astype(jnp.int32), 0, opts.yres - 1)
    inside = (xy[:, 0] >= 0) & (xy[:, 0] < opts.xres) & \
        (xy[:, 1] >= 0) & (xy[:, 1] < opts.yres)
    live = mask & ok & inside & jnp.isfinite(arclen)
    c = sg(jump_fn(L_m, L_p, px, py)) * arclen
    c = jnp.where(live, c, 0.0) * weight
    # Masked lanes can hold NaN/inf positions and NaN curve normals
    # (garbage receiver planes, zero-length tangents, behind-camera
    # projections): select BOTH factors out of the differentiable
    # product, else 0 * NaN poisons the sum.
    xy_safe = jnp.where(live[:, None], xy_d, 0.0)
    np_safe = jnp.where(live[:, None], sg(n_perp), 0.0)
    return jnp.sum(sg(c) * jnp.sum(np_safe * xy_safe, axis=-1))


def _tri_facing(verts, idxs, from_pt):
    """Detached per-triangle facing w.r.t. a viewpoint ([3] or [M,3])."""
    p0 = verts[idxs[:, 0]]
    p1 = verts[idxs[:, 1]]
    p2 = verts[idxs[:, 2]]
    fn = vm.cross(p1 - p0, p2 - p0)
    cen = (p0 + p1 + p2) / 3.0
    return vm.dot(fn, from_pt - cen) > 0.0


def _silhouette_mask(verts, idxs, adj, viewpoint=None, direction=None):
    """bool[E]: facing disagreement w.r.t. a viewpoint (or a directional
    light's direction), or mesh-boundary edge."""
    p0 = verts[idxs[:, 0]]
    p1 = verts[idxs[:, 1]]
    p2 = verts[idxs[:, 2]]
    fn = vm.cross(p1 - p0, p2 - p0)
    if direction is not None:
        facing = vm.dot(fn, -jnp.broadcast_to(direction, fn.shape)) > 0.0
    else:
        cen = (p0 + p1 + p2) / 3.0
        facing = vm.dot(fn, viewpoint[None, :] - cen) > 0.0
    f0 = facing[jnp.maximum(adj[:, 0], 0)]
    f1 = facing[jnp.maximum(adj[:, 1], 0)]
    boundary = adj[:, 1] < 0
    return sg(boundary | (f0 != f1))


def _mesh_topology(tri, topology=None):
    if topology is not None:
        return topology
    try:
        idx_np = np.asarray(tri.idx)
    except Exception as e:
        raise TypeError(
            "silhouette estimators need concrete mesh topology inside "
            "jit/shard_map: precompute mesh_edges(idx) outside the traced "
            "function and pass it via topology=") from e
    return mesh_edges(idx_np)


def silhouette_surrogate(scene: SceneData, opts: R.RenderOptions, jump_fn,
                         n_samples: int = 1024, seed: int = 0,
                         eps_pix: float = 0.5, topology=None):
    """Surrogate scalar whose gradient w.r.t. scene equals the
    primary-visibility boundary term of  Integral g(I(x,y), x,y) dx dy
    (pixels are unit-area footprints) for triangle-mesh silhouettes.
    jump_fn(L_m, L_p, px, py) -> f32[M] must return the loss-density jump
    g(L_m) - g(L_p) at those pixels."""
    tri = scene.triangles
    if tri.count == 0:
        return jnp.float32(0.0)
    edges_np, adj_np = _mesh_topology(tri, topology)
    E = len(edges_np)
    edges = jnp.asarray(edges_np)
    adj = jnp.asarray(adj_np)
    verts = tri.verts                                  # theta flows here
    cam = scene.camera
    cam_pos = cam.cam2world[:3, 3]
    idxs = jnp.asarray(np.asarray(tri.idx)) if topology is None else \
        tri.idx

    sil = _silhouette_mask(sg(verts), idxs, adj, viewpoint=sg(cam_pos))
    ei, u, M = _edge_samples(E, n_samples, jax.random.PRNGKey(seed))
    v0 = verts[edges[ei, 0]]
    v1 = verts[edges[ei, 1]]

    def xy_of(uu):
        p = v0 + uu[:, None] * (v1 - v0)
        x, y, ok = _project(cam, p)
        return jnp.stack([x, y], -1), ok

    return _image_jump_surrogate(scene, opts, jump_fn, xy_of, u,
                                 sil[ei], E / M, eps_pix)


def sphere_rim_surrogate(scene: SceneData, opts: R.RenderOptions, jump_fn,
                         n_samples: int = 256, seed: int = 0,
                         eps_pix: float = 0.5):
    """Primary-visibility rim term for FULL spheres (quadric kind sphere
    with phimax=360 and the whole z-range): the rim circle
    (p - c).(o - p) = 0 parametrized by phi, projected to the image.
    Differentiates through the sphere's o2w translation and radius.
    Reparametrization drift of the phi frame is tangential and projects
    out through n_perp. Partial/scaled quadrics are not covered."""
    q = scene.quadrics
    rows = q.static_rows
    if q.count == 0 or rows is None:
        return jnp.float32(0.0)
    sphere_ids = [i for i, (k, phi_full, z_full) in enumerate(rows)
                  if k == D.QUADRIC_SPHERE and phi_full and z_full]
    if not sphere_ids:
        return jnp.float32(0.0)
    cam = scene.camera
    cam_pos = cam.cam2world[:3, 3]
    key = jax.random.PRNGKey(seed ^ 0x5F3E)
    total = jnp.float32(0.0)
    for qi in sphere_ids:
        c = q.o2w[qi, :3, 3]                          # theta flows here
        Rr = q.params[qi, 0]                          # and here
        to_cam = cam_pos - c
        dist = jnp.maximum(vm.length(to_cam), 1e-9)
        uhat = to_cam / dist
        # Camera inside the sphere: no rim.
        outside = dist > Rr * (1.0 + 1e-6)
        sin2 = jnp.clip(1.0 - (Rr / dist) ** 2, 0.0, 1.0)
        _, t1, t2 = vm.coordinate_system(uhat)
        key, ku = jax.random.split(key)
        Mn = int(n_samples)
        phi = (jnp.arange(Mn) + jax.random.uniform(ku, (Mn,))) \
            * (2.0 * np.pi / Mn)

        def xy_of(ph, c=c, Rr=Rr, uhat=uhat, t1=t1, t2=t2, sin2=sin2,
                  dist=dist):
            p = (c[None, :] + (Rr * Rr / dist) * uhat[None, :] +
                 (Rr * jnp.sqrt(sin2)) *
                 (jnp.cos(ph)[:, None] * t1[None, :] +
                  jnp.sin(ph)[:, None] * t2[None, :]))
            x, y, ok = _project(cam, p)
            return jnp.stack([x, y], -1), ok

        # xy_of is parametrized by phi itself, so the jvp's |dxy/dphi|
        # needs the (2pi/Mn) quadrature weight of the stratified phi grid.
        mask = jnp.broadcast_to(outside, (Mn,))
        total = total + _image_jump_surrogate(
            scene, opts, jump_fn, xy_of, phi, mask, 2.0 * np.pi / Mn,
            eps_pix)
    return total


def shadow_silhouette_surrogate(scene: SceneData, opts: R.RenderOptions,
                                jump_fn, n_samples: int = 1024,
                                seed: int = 0, eps_pix: float = 0.5,
                                topology=None):
    """Shadow-boundary term for DELTA lights (point/spot/distant): the
    projection of occluder silhouette edges (w.r.t. the light) onto the
    first receiver, then into the image; jump read from the rendered
    image like the primary term. The receiver is treated as locally
    planar (detached tangent plane at the cast hit)."""
    tri = scene.triangles
    lk = scene.lights.kinds_list
    if tri.count == 0 or not lk:
        return jnp.float32(0.0)
    delta_ids = [i for i, k in enumerate(lk)
                 if k in (D.LIGHT_POINT, D.LIGHT_SPOT, D.LIGHT_PROJECTION,
                          D.LIGHT_GONIOMETRIC, D.LIGHT_DISTANT)]
    if not delta_ids:
        return jnp.float32(0.0)
    edges_np, adj_np = _mesh_topology(tri, topology)
    E = len(edges_np)
    edges = jnp.asarray(edges_np)
    adj = jnp.asarray(adj_np)
    verts = tri.verts
    idxs = jnp.asarray(np.asarray(tri.idx)) if topology is None else \
        tri.idx
    cam = scene.camera

    total = jnp.float32(0.0)
    for li, lid in enumerate(delta_ids):
        distant = lk[lid] == D.LIGHT_DISTANT
        lpos = scene.lights.l2w[lid, :3, 3]            # theta flows here
        ldir = -scene.lights.params[lid, 0:3]          # shadow direction
        if distant:
            sil = _silhouette_mask(sg(verts), idxs, adj,
                                   direction=sg(ldir))
        else:
            sil = _silhouette_mask(sg(verts), idxs, adj,
                                   viewpoint=sg(lpos))
        ei, u, M = _edge_samples(E, n_samples,
                                 jax.random.PRNGKey(seed + 7919 * li))
        v0 = verts[edges[ei, 0]]
        v1 = verts[edges[ei, 1]]
        e_s = sg(v0) + u[:, None] * sg(v1 - v0)
        d_s = (e_s - sg(lpos)[None, :]) if not distant else \
            jnp.broadcast_to(sg(ldir), e_s.shape)
        dn = d_s / jnp.maximum(
            jnp.linalg.norm(d_s, axis=-1, keepdims=True), 1e-12)
        # Detached receiver cast from just beyond the edge point.
        eps_w = 1e-3
        t, pid, hitm = isect.intersect_ids(
            sg(scene), e_s + eps_w * dn, dn,
            jnp.full((M,), vm.RAY_EPSILON), jnp.full((M,), 1e30))
        dg = isect.hit_geometry(sg(scene), jnp.maximum(pid, 0),
                                e_s + eps_w * dn, dn, t)
        p_r = sg(dg["p"])
        n_r = sg(dg["nn"])

        def xy_of(uu, v0=v0, v1=v1, lpos=lpos, n_r=n_r, p_r=p_r,
                  distant=distant):
            e = v0 + uu[:, None] * (v1 - v0)           # differentiable
            if distant:
                d = jnp.broadcast_to(ldir, e.shape)
                denom = vm.dot(n_r, d)
                s = vm.dot(n_r, p_r - e) / jnp.where(
                    jnp.abs(denom) < 1e-9, 1e-9, denom)
                r = e + s[:, None] * d
            else:
                d = e - lpos[None, :]
                denom = vm.dot(n_r, d)
                s = vm.dot(n_r, p_r - lpos[None, :]) / jnp.where(
                    jnp.abs(denom) < 1e-9, 1e-9, denom)
                r = lpos[None, :] + s[:, None] * d
            x, y, ok = _project(cam, r)
            return jnp.stack([x, y], -1), ok

        # Receiver must exist beyond the edge and not be edge-on.
        graze = jnp.abs(vm.dot(n_r, dn)) > 1e-4
        mask = sil[ei] & hitm & graze
        total = total + _image_jump_surrogate(
            scene, opts, jump_fn, xy_of, u, mask, E / M, eps_pix)
    return total


def _point_in_light_tris(scene, lid: int, pts):
    """Detached bool[M]: pts lie inside one of area light lid's emitting
    triangles (coplanarity assumed; callers project onto the plane)."""
    lights = scene.lights
    first = lights.area_first[lid]
    count = lights.area_count[lid]
    inside = jnp.zeros(pts.shape[0], bool)
    for k in range(max(1, scene.lights.max_area_count)):
        tid = jnp.clip(first + k, 0, scene.triangles.count - 1)
        i3 = scene.triangles.idx[tid]
        a = sg(scene.triangles.verts[i3[0]])
        b = sg(scene.triangles.verts[i3[1]])
        c = sg(scene.triangles.verts[i3[2]])
        v0 = b - a
        v1 = c - a
        v2 = pts - a[None, :]
        d00 = vm.dot(v0, v0)
        d01 = vm.dot(v0, v1)
        d11 = vm.dot(v1, v1)
        d20 = vm.dot(v2, jnp.broadcast_to(v0, v2.shape))
        d21 = vm.dot(v2, jnp.broadcast_to(v1, v2.shape))
        den = jnp.maximum(d00 * d11 - d01 * d01, 1e-12)
        bv = (d11 * d20 - d01 * d21) / den
        bw = (d00 * d21 - d01 * d20) / den
        ok = (bv >= -1e-4) & (bw >= -1e-4) & (bv + bw <= 1.0 + 1e-4)
        inside = inside | (ok & (k < count))
    return inside


def area_shadow_surrogate(scene: SceneData, opts: R.RenderOptions,
                          adjoint_fn, n_samples: int = 2048,
                          seed: int = 0, topology=None,
                          delta_frac: float = 1e-3):
    """Shadow-boundary term for AREA lights (planar triangle-mesh
    emitters): samples (pixel, edge, u) jointly, projects the edge point
    from the receiver onto the light plane, and reads the NEE-integrand
    jump with two real shadow rays either side of the curve.
    adjoint_fn(px, py, I) -> f32[M,3] must return dg/dI of the loss
    density at those pixels given the (detached) rendered radiance I."""
    from ..bsdf import bsdf as B
    from ..integrators import common

    tri = scene.triangles
    lk = scene.lights.kinds_list
    area_ids = [i for i, k in enumerate(lk) if k == D.LIGHT_AREA]
    if tri.count == 0 or not area_ids:
        return jnp.float32(0.0)
    edges_np, adj_np = _mesh_topology(tri, topology)
    E = len(edges_np)
    edges = jnp.asarray(edges_np)
    adj = jnp.asarray(adj_np)
    verts = tri.verts
    idxs = jnp.asarray(np.asarray(tri.idx)) if topology is None else \
        tri.idx
    cam = scene.camera
    W, H = opts.xres, opts.yres

    total = jnp.float32(0.0)
    for li, lid in enumerate(area_ids):
        # Skip non-mesh (quadric) emitters: plane undefined.
        # area_geom_kind is traced; the roster does not record geometry
        # kind, so gate on a concrete check when available.
        try:
            if int(np.asarray(scene.lights.area_geom_kind[lid])) != \
                    D.AREA_GEOM_TRIS:
                continue
        except Exception:
            pass
        key = jax.random.PRNGKey(seed + 104729 * li)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        ei, u, M = _edge_samples(E, n_samples, k1)

        # --- pixel / receiver samples (all detached) ------------------
        x = jax.random.uniform(k2, (M,)) * W
        y = jax.random.uniform(k3, (M,)) * H
        half = jnp.full((M,), 0.5, jnp.float32)
        o, d, mint, maxt, _ = cam_mod.generate_rays(
            sg(scene).camera, x, y, half, half, half * 0.0, W, H)
        t, pid, hitm = isect.intersect_ids(sg(scene), o, d, mint, maxt)
        dgp = isect.hit_geometry(sg(scene), jnp.maximum(pid, 0), o, d, t)
        p = sg(dgp["p"])
        wo = -d
        bsdf = common.make_bsdf_at(sg(scene), dgp)

        # --- light plane (detached) -----------------------------------
        first = scene.lights.area_first[lid]
        i3 = scene.triangles.idx[jnp.clip(first, 0,
                                          scene.triangles.count - 1)]
        la = sg(scene.triangles.verts[i3[0]])
        lb = sg(scene.triangles.verts[i3[1]])
        lc = sg(scene.triangles.verts[i3[2]])
        n_L = vm.normalize(vm.cross(lb - la, lc - la))
        t1 = vm.normalize(lb - la)
        t2 = vm.cross(n_L, t1)
        diam = jnp.maximum(jnp.maximum(vm.length(lb - la),
                                       vm.length(lc - la)), 1e-6)
        delta = diam * delta_frac

        # --- silhouette classification w.r.t. each receiver point -----
        a0 = adj[ei, 0]
        a1 = adj[ei, 1]
        f0 = _edge_tri_facing(sg(verts), idxs, jnp.maximum(a0, 0), p)
        f1 = _edge_tri_facing(sg(verts), idxs, jnp.maximum(a1, 0), p)
        sil = (a1 < 0) | (f0 != f1)

        v0 = verts[edges[ei, 0]]
        v1 = verts[edges[ei, 1]]

        def l2d_of(uu, v0=v0, v1=v1, p=p, n_L=n_L, la=la, t1=t1, t2=t2):
            e = v0 + uu[:, None] * (v1 - v0)            # differentiable
            dvec = e - p
            denom = vm.dot(n_L, dvec)
            s = vm.dot(n_L, la[None, :] - p) / jnp.where(
                jnp.abs(denom) < 1e-9, 1e-9, denom)
            l_e = p + s[:, None] * dvec
            rel = l_e - la[None, :]
            return jnp.stack([vm.dot(rel, jnp.broadcast_to(t1, rel.shape)),
                              vm.dot(rel, jnp.broadcast_to(t2, rel.shape))],
                             -1), s

        (l2d, s_e), (dl_du, _) = jax.jvp(l2d_of, (u,),
                                         (jnp.ones_like(u),))
        l2d_diff = l2d
        l2d = sg(l2d)
        s_e = sg(s_e)
        dl_du = sg(dl_du)
        arclen = jnp.linalg.norm(dl_du, axis=-1)
        tangent = dl_du / jnp.maximum(arclen, 1e-12)[:, None]
        n_A = jnp.stack([tangent[:, 1], -tangent[:, 0]], -1)

        # --- NEE integrand at l +- delta * n_A (detached) -------------
        def integrand(l2):
            lw = la[None, :] + l2[:, 0:1] * t1[None, :] \
                + l2[:, 1:2] * t2[None, :]
            wi_un = lw - p
            d2 = jnp.maximum(vm.length_sq(wi_un), 1e-12)
            wi = wi_un * jax.lax.rsqrt(d2)[:, None]
            on_light = _point_in_light_tris(sg(scene), lid, lw)
            cos_l = jnp.abs(vm.dot(n_L, -wi))
            # One-sided emission (area_emission): emits toward p only.
            emits = vm.dot(jnp.broadcast_to(n_L, wi.shape), -wi) > 0
            Le = sg(scene.lights.spectrum[lid])
            fr = B.f(bsdf, wo, wi)
            cos_p = jnp.abs(vm.dot(sg(dgp["sn"]), wi))
            occ = isect.occluded(
                sg(scene), p, wi, jnp.full((M,), 1e-3),
                jnp.sqrt(d2) * (1.0 - 1e-3))
            G = cos_p * cos_l / d2
            val = fr * Le[None, :] * G[:, None]
            live = on_light & emits & (~occ)
            return jnp.where(live[:, None], val, 0.0)

        I_m = integrand(l2d - delta * n_A)
        I_p = integrand(l2d + delta * n_A)

        px = jnp.clip(x.astype(jnp.int32), 0, W - 1)
        py = jnp.clip(y.astype(jnp.int32), 0, H - 1)
        Lpix = _radiance_at(scene, opts, x, y)
        adjo = sg(adjoint_fn(px, py, Lpix))            # [M,3]
        jump = jnp.sum(adjo * (I_m - I_p), -1)

        graze = jnp.abs(vm.dot(n_L, vm.normalize(
            sg(v0) + u[:, None] * sg(v1 - v0) - p))) > 1e-4
        mask = sil & hitm & (s_e > 1.0 + 1e-4) & graze & \
            jnp.isfinite(arclen)
        c = jnp.where(mask, jump * arclen, 0.0) * (float(W * H) * E / M)
        l2d_safe = jnp.where(mask[:, None], l2d_diff, 0.0)
        nA_safe = jnp.where(mask[:, None], sg(n_A), 0.0)
        total = total + jnp.sum(sg(c) *
                                jnp.sum(nA_safe * l2d_safe, axis=-1))
    return total


def _edge_tri_facing(verts, idxs, tid, from_pts):
    """Detached facing of triangles tid[M] w.r.t. per-sample points."""
    i3 = idxs[tid]
    p0 = verts[i3[:, 0]]
    p1 = verts[i3[:, 1]]
    p2 = verts[i3[:, 2]]
    fn = vm.cross(p1 - p0, p2 - p0)
    cen = (p0 + p1 + p2) / 3.0
    return vm.dot(fn, from_pts - cen) > 0.0


def boundary_surrogate(scene: SceneData, opts: R.RenderOptions, jump_fn,
                       adjoint_fn=None, n_samples: int = 1024,
                       seed: int = 0, topology=None,
                       terms=("primary", "shadow", "rim", "area")):
    """All boundary terms combined. jump_fn serves the image-space terms
    (primary/shadow/rim); adjoint_fn (dg/dI) serves the area-light term
    and may be None to skip it."""
    total = jnp.float32(0.0)
    if "primary" in terms:
        total = total + silhouette_surrogate(
            scene, opts, jump_fn, n_samples, seed, topology=topology)
    if "shadow" in terms:
        total = total + shadow_silhouette_surrogate(
            scene, opts, jump_fn, n_samples, seed + 1,
            topology=topology)
    if "rim" in terms:
        total = total + sphere_rim_surrogate(
            scene, opts, jump_fn, max(64, n_samples // 4), seed + 2)
    if "area" in terms and adjoint_fn is not None:
        total = total + area_shadow_surrogate(
            scene, opts, adjoint_fn, n_samples, seed + 3,
            topology=topology)
    return total


def render_loss_with_silhouette(scene: SceneData, opts: R.RenderOptions,
                                px, py, s_idx, target,
                                n_edge_samples: int = 1024, seed: int = 0,
                                topology=None,
                                terms=("primary", "shadow", "rim", "area")):
    """render_loss_fn augmented with the silhouette boundary gradients
    (value identical; jax.grad additionally carries the visibility terms).
    The adjoint of the mean-L2 sample loss w.r.t. the image is
    2 (I - T) / N per unit pixel area."""
    from ..samplers import samplers as _smp
    interior = render_loss_fn(scene, opts, px, py, s_idx, target)
    n = px.shape[0]
    # loss = (1/n) sum_samples |L - T|^2 with spp samples per pixel, i.e.
    # ~ (spp/n) * Integral_image |I - T|^2 dx in unit-pixel-area measure:
    # the boundary densities carry spp/n, not 1/n.
    w = _smp.samples_per_pixel(opts.sampler) / n

    def jump_fn(L_m, L_p, jpx, jpy):
        # Jump of the loss density across the edge.
        T = sg(target)[jpy, jpx]
        return (jnp.sum((L_m - T) ** 2, -1) -
                jnp.sum((L_p - T) ** 2, -1)) * w

    def adjoint_fn(jpx, jpy, I):
        T = sg(target)[jpy, jpx]
        return 2.0 * (I - T) * w

    surr = boundary_surrogate(scene, opts, jump_fn, adjoint_fn,
                              n_samples=n_edge_samples, seed=seed,
                              topology=topology, terms=terms)
    return interior + surr - sg(surr)

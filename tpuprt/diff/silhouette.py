"""Silhouette (visibility-discontinuity) gradients via edge sampling.

The detached-sampling AD path (parallel/shard.render_loss_fn) differentiates
shading but treats visibility as a constant: moving an occluder's silhouette
across a bright background changes which pixels see it, and that term is a
BOUNDARY integral the interior estimator cannot see (the reference has no
analogue; BASELINE.json "differentiable end-to-end" north star; VERDICT
r2-r4 open item).

Estimator — primary-visibility edge sampling in the image plane (the
physically-based differentiable-rendering boundary term, cf. Li et al.
2018's edge sampling, re-derived for this wavefront renderer):

    d/dtheta  Integral_image adjoint(x) . I(x; theta) dx
      =  (interior term: AD with detached intersections)
      +  Sum_{silhouette edges e}  Integral_0^1
             adjoint(xy(u)) . (L_minus(u) - L_plus(u))
             * (n_perp . d xy_e/d theta) * |d xy/d u|  du

where xy(u) is the image projection of the edge point, n_perp the image-
space edge normal, and L_minus/L_plus the radiance evaluated a half-pixel
to either side of the edge (occlusion of the edge by nearer geometry is
handled automatically: both side rays then hit the occluder and the
difference vanishes).

For a loss  Loss = Integral g(I(x), x) dx  the boundary term's density is
the JUMP of the loss density across the edge, g(L_minus) - g(L_plus) — not
the linearized adjoint . (L_minus - L_plus): at a discontinuity the two
differ whenever g is nonlinear (L2 losses). Callers therefore pass
jump_fn(L_minus, L_plus, px, py) evaluating that jump.

Implemented as a SURROGATE scalar whose jax.grad equals the boundary term:
every factor except the projected edge position is stop_grad'ed, so

    surrogate = sum_k  c_k . (n_perp_k . xy_e_k(theta)),
    c_k = weight * jump_fn(L_minus, L_plus) * |dxy/du|     (detached)

composes with the interior loss as
    loss_total = interior + surrogate - stop_grad(surrogate)
(value unchanged, gradient augmented). Triangle meshes only; quadric
silhouettes would need the implicit-surface rim and are not covered.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import render as R
from ..cameras import cameras as cam_mod
from ..core import vecmath as vm
from ..parallel.shard import render_loss_fn
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


def silhouette_surrogate(scene: SceneData, opts: R.RenderOptions, jump_fn,
                         n_samples: int = 1024, seed: int = 0,
                         eps_pix: float = 0.5):
    """Surrogate scalar whose gradient w.r.t. scene equals the
    primary-visibility boundary term of  Integral g(I(x,y), x,y) dx dy
    (pixels are unit-area footprints). jump_fn(L_m, L_p, px, py) -> f32[M]
    must return the loss-density jump g(L_m) - g(L_p) at those pixels."""
    tri = scene.triangles
    if tri.count == 0:
        return jnp.float32(0.0)
    try:
        idx_np = np.asarray(tri.idx)
    except Exception as e:
        raise TypeError(
            "silhouette_surrogate needs concrete mesh topology: build the "
            "scene inside your loss fn (theta -> verts), don't trace the "
            "whole scene pytree's int tables through jax.grad") from e
    edges_np, adj_np = mesh_edges(idx_np)
    E = len(edges_np)
    edges = jnp.asarray(edges_np)
    adj = jnp.asarray(adj_np)
    verts = tri.verts                                  # theta flows here
    cam = scene.camera
    cam_pos = cam.cam2world[:3, 3]

    # Silhouette classification (detached): a tri faces the camera when
    # dot(geometric normal, cam_pos - centroid) > 0; a silhouette edge has
    # adjacent facings that disagree, or is a mesh boundary edge.
    idxs = jnp.asarray(np.asarray(tri.idx))
    p0 = verts[idxs[:, 0]]
    p1 = verts[idxs[:, 1]]
    p2 = verts[idxs[:, 2]]
    fn = vm.cross(p1 - p0, p2 - p0)
    cen = (p0 + p1 + p2) / 3.0
    facing = vm.dot(fn, cam_pos[None, :] - cen) > 0.0
    f0 = facing[jnp.maximum(adj[:, 0], 0)]
    f1 = facing[jnp.maximum(adj[:, 1], 0)]
    boundary = adj[:, 1] < 0
    sil = sg(boundary | (f0 != f1))                    # bool[E]

    # Uniform (edge, u) samples over ALL edges; non-silhouette edges
    # contribute zero, weight E/M corrects the pdf.
    key = jax.random.PRNGKey(seed)
    ke, ku = jax.random.split(key)
    ei = jax.random.randint(ke, (n_samples,), 0, E)
    u = jax.random.uniform(ku, (n_samples,))
    v0 = verts[edges[ei, 0]]
    v1 = verts[edges[ei, 1]]
    e_pt = v0 + u[:, None] * (v1 - v0)                 # differentiable

    # Image position + per-u tangent of the projected edge point.
    def xy_of(uu):
        p = v0 + uu[:, None] * (v1 - v0)
        x, y, ok = _project(cam, p)
        return jnp.stack([x, y], -1), ok
    (xy, ok), (dxy_du, _) = jax.jvp(xy_of, (u,), (jnp.ones_like(u),))
    xy = sg(xy)
    dxy_du = sg(dxy_du)
    arclen = jnp.linalg.norm(dxy_du, axis=-1)
    tgt = dxy_du / jnp.maximum(arclen, 1e-12)[:, None]
    n_perp = jnp.stack([tgt[:, 1], -tgt[:, 0]], -1)    # 90-degree rotation

    # Radiance a half-pixel to each side; the sweep of the edge by
    # velocity v replaces L_plus with L_minus over area (v . n_perp) dl.
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
    c = sg(jump_fn(L_m, L_p, px, py)) * arclen
    c = jnp.where(sil[ei] & ok & inside, c, 0.0) * (E / n_samples)

    # Differentiable projected edge position (theta -> verts -> xy_e).
    xe, ye, _ = _project(cam, e_pt)
    xy_e = jnp.stack([xe, ye], -1)
    return jnp.sum(sg(c) * jnp.sum(sg(n_perp) * xy_e, axis=-1))


def render_loss_with_silhouette(scene: SceneData, opts: R.RenderOptions,
                                px, py, s_idx, target,
                                n_edge_samples: int = 1024, seed: int = 0):
    """render_loss_fn augmented with the silhouette boundary gradient
    (value identical; jax.grad additionally carries the visibility term).
    The adjoint of the mean-L2 sample loss w.r.t. the image is
    2 (I - T) / N per unit pixel area."""
    interior = render_loss_fn(scene, opts, px, py, s_idx, target)
    n = px.shape[0]

    def jump_fn(L_m, L_p, jpx, jpy):
        # Jump of the mean-L2 loss density |I - T|^2 / N across the edge.
        T = sg(target)[jpy, jpx]
        return (jnp.sum((L_m - T) ** 2, -1) -
                jnp.sum((L_p - T) ** 2, -1)) / n

    surr = silhouette_surrogate(scene, opts, jump_fn,
                                n_samples=n_edge_samples, seed=seed)
    return interior + surr - sg(surr)

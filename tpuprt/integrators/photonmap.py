"""Photon mapping as wavefront passes + grid-hash density estimation.

TPU-native replacement for /root/reference/integrators/photonmap.cpp:
  * Preprocess (photonmap.cpp:147-298): QMC photon shooting becomes jitted
    fixed-size path batches under lax.scan; the host loop keeps batching
    until each map (direct/caustic/indirect) reaches its target count,
    exactly like the reference's while loop. Classification is identical:
    first hit -> direct, all-specular prefix -> caustic, else indirect;
    photons deposit only on surfaces with a non-specular component.
  * Storage (core/kdtree.h): grid-hash buckets (accel/photon_grid.py)
    instead of a pointer kd-tree.
  * LPhoton (photonmap.cpp:433-483): fixed-radius estimate
    sum f(wo, wi_p) * alpha_p / (n_paths * pi * maxDist^2). The per-photon
    BSDF evaluation is exact for every surface (the reference's
    rho-shortcut for diffuse surfaces is an optimization we don't need —
    lobes evaluate vectorized); kNN radius shrinking is replaced by fixed
    radius (documented in photon_grid.py).
  * Li (photonmap.cpp:299-431): direct via all-lights MIS sampling (or the
    direct map), caustics + indirect via maps, optional one-bounce final
    gather, stochastic single-pick specular continuation (whitted-style
    wavefront flattening of the two-way recursion).

Divergences (documented): shooting depth is a static bound (default 8)
rather than RR-only termination; gather rays use hash-RNG streams instead
of precomputed sampler arrays.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..accel import intersect as isect
from ..accel.photon_grid import PhotonGrid, build_photon_grid, gather_photons
from ..bsdf import bsdf as B
from ..core import rng, vecmath as vm
from ..core.pytree import pytree_dataclass
from ..lights import emission, lights as lt
from ..samplers import samplers as smp
from ..scene.data import SceneData
from . import common

_EPS = vm.RAY_EPSILON


class PhotonParams(NamedTuple):
    """CreateSurfaceIntegrator defaults (photonmap.cpp:511-524)."""
    caustic: int = 20000
    direct: int = 100000
    indirect: int = 100000
    max_dist: float = 0.1
    final_gather: bool = False
    gather_samples: int = 32
    direct_with_photons: bool = False
    shoot_depth: int = 8          # static wavefront bound (RR starts at 4)
    batch: int = 16384
    max_shot: int = 500000


@pytree_dataclass
class PhotonMaps:
    caustic: PhotonGrid
    direct: PhotonGrid
    indirect: PhotonGrid


# ---------------------------------------------------------------------------
# Shooting (Preprocess)
# ---------------------------------------------------------------------------

def shoot_batch(scene: SceneData, base: int, n: int, depth_bound: int,
                seed: int, radiance: bool = False):
    """Trace n photon paths with global path ids base..base+n-1.

    Returns per-depth stacked arrays [D, n]: pos, wi, alpha, cls
    (0 direct / 1 caustic / 2 indirect), valid; with radiance=True the
    tuple extends with (nn, rho_r, rho_t, rad_pick) for exphotonmap's
    radiance photons (exphotonmap.cpp:410-421: candidate with prob 1/8,
    normal flipped against the photon direction, rho per hemisphere)."""
    idx = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(base + 1)
    u0 = rng.radical_inverse(idx, 2)
    u1 = rng.radical_inverse(idx, 3)
    u2 = rng.radical_inverse(idx, 5)
    u3 = rng.radical_inverse(idx, 7)
    ul = rng.radical_inverse(idx, 11)
    ph = rng.hash_u32(idx, seed, 0x9107)
    u5 = rng.uniform(ph, 0, 0x51)

    lid, light_pdf = emission.pick_light_uniform(scene, ul)
    em = emission.sample_emission(scene, lid, u0, u1, u2, u3, u5)
    denom = jnp.maximum(em["pdf"] * light_pdf, 1e-20)
    alpha = em["Le"] / denom[..., None]
    alive = (em["pdf"] > 0.0) & jnp.any(alpha > 0.0, -1)

    def body(carry, depth):
        o, d, alpha, spec_path, alive = carry
        t, pid, hit = isect.intersect_ids(scene, o, d,
                                          jnp.full((n,), _EPS),
                                          jnp.full((n,), 1e30))
        alive = alive & hit
        dg = isect.hit_geometry(scene, pid, o, d, t)
        if scene.volumes is not None and scene.volumes.count > 0:
            from . import volume as vol_integ
            uj = rng.uniform(ph, depth, 0x7A)
            Tr = vol_integ.transmittance(scene, o, d,
                                         jnp.full((n,), _EPS), t, uj)
            alpha = alpha * Tr
        bsdf = common.make_bsdf_at(scene, dg)
        nspec = B.num_components(bsdf, B.SPECULAR | B.REFLECTION |
                                 B.TRANSMISSION)
        has_nonspec = B.num_components(bsdf, B.ALL) > nspec
        cls = jnp.where(depth == 0, 0, jnp.where(spec_path, 1, 2))
        out = (dg["p"], -d, alpha, cls, alive & has_nonspec)
        if radiance:
            nn_f = jnp.where(vm.dot(dg["nn"], d)[..., None] > 0.0,
                             -dg["nn"], dg["nn"])
            rho_r = B.rho_approx(bsdf, B.ALL_REFLECTION)
            rho_t = B.rho_approx(bsdf, B.ALL_TRANSMISSION)
            pick = rng.uniform(ph, depth, 0xAD) < 0.125
            out = out + (nn_f, rho_r, rho_t, pick)

        # Continuation (photonmap.cpp:262-292): QMC dims at the first
        # bounce, hash RNG after.
        c1 = jnp.where(depth == 0, rng.radical_inverse(idx, 13),
                       rng.uniform(ph, depth, 1))
        c2 = jnp.where(depth == 0, rng.radical_inverse(idx, 17),
                       rng.uniform(ph, depth, 2))
        c3 = jnp.where(depth == 0, rng.radical_inverse(idx, 19),
                       rng.uniform(ph, depth, 3))
        bs = B.sample_f(bsdf, -d, c1, c2, c3, B.ALL)
        ok = bs["valid"] & (bs["pdf"] > 0.0) & jnp.any(bs["f"] > 0.0, -1)
        spec_path = ((depth == 0) | spec_path) & bs["specular"]
        scale = bs["f"] * (vm.absdot(bs["wi"], bsdf.nn) /
                           jnp.maximum(bs["pdf"], 1e-20))[..., None]
        alpha2 = alpha * scale
        # RR after the 4th intersection (nIntersections > 3 <=> depth >= 3).
        rr = rng.uniform(ph, depth, 0xEE)
        cont = (depth < 3) | (rr <= 0.5)
        alpha2 = jnp.where((depth >= 3)[..., None] & cont[..., None],
                           alpha2 * 2.0, alpha2)
        alive = alive & ok & cont
        return (dg["p"], bs["wi"], alpha2, spec_path, alive), out

    init = (em["o"], em["d"], alpha,
            jnp.zeros((n,), bool), alive)
    _, outs = jax.lax.scan(body, init, jnp.arange(depth_bound))
    return outs   # (pos [D,n,3], wi, alpha, cls [D,n], valid [D,n])


def build_maps(scene: SceneData, prm: PhotonParams, seed: int = 0,
               log=None, collect_radiance: bool = False):
    """Host loop around jitted batches (the reference's Preprocess while
    loop, photonmap.cpp:163-296). Exact normalization: each map's n_paths
    is the number of paths shot up to and including the one that filled
    it (photon path ids make this exact even with batching)."""
    targets = {"direct": prm.direct, "caustic": prm.caustic,
               "indirect": prm.indirect}
    if scene.lights.count == 0 or all(v == 0 for v in targets.values()):
        empty = build_photon_grid(np.zeros((0, 3), np.float32),
                                  np.zeros((0, 3), np.float32),
                                  np.zeros((0, 3), np.float32),
                                  prm.max_dist, 1.0)
        maps = PhotonMaps(caustic=empty, direct=empty, indirect=empty)
        if collect_radiance:
            return maps, dict(p=np.zeros((0, 3), np.float32),
                              n=np.zeros((0, 3), np.float32),
                              rho_r=np.zeros((0, 3), np.float32),
                              rho_t=np.zeros((0, 3), np.float32))
        return maps

    shoot = jax.jit(lambda b: shoot_batch(scene, b, prm.batch,
                                          prm.shoot_depth, seed,
                                          radiance=collect_radiance),
                    static_argnums=())
    rad = {"p": [], "n": [], "rho_r": [], "rho_t": []}
    coll = {k: {"pos": [], "wi": [], "alpha": [], "pid": []}
            for k in targets}
    shot = 0
    while shot < prm.max_shot:
        outs = [np.asarray(x) for x in shoot(shot)]
        pos, wi, al, cls, valid = outs[:5]
        if collect_radiance:
            r_nn, r_rr, r_rt, r_pick = outs[5:9]
            rm = valid & r_pick
            rad["p"].append(pos[rm])
            rad["n"].append(r_nn[rm])
            rad["rho_r"].append(r_rr[rm])
            rad["rho_t"].append(r_rt[rm])
        D, n = valid.shape
        # path-major flatten so photon order follows global path ids
        pids = np.broadcast_to(np.arange(shot, shot + n), (D, n))
        order = (np.transpose(pos, (1, 0, 2)).reshape(-1, 3),
                 np.transpose(wi, (1, 0, 2)).reshape(-1, 3),
                 np.transpose(al, (1, 0, 2)).reshape(-1, 3),
                 np.transpose(cls, (1, 0)).reshape(-1),
                 np.transpose(valid, (1, 0)).reshape(-1),
                 np.transpose(pids, (1, 0)).reshape(-1))
        shot += n
        done = True
        for ci, k in enumerate(("direct", "caustic", "indirect")):
            have = sum(len(x) for x in coll[k]["pid"]) if coll[k]["pid"] \
                else 0
            if have < targets[k]:
                m = order[4] & (order[3] == ci)
                coll[k]["pos"].append(order[0][m])
                coll[k]["wi"].append(order[1][m])
                coll[k]["alpha"].append(order[2][m])
                coll[k]["pid"].append(order[5][m])
                have += int(m.sum())
            if have < targets[k]:
                done = False
        if log:
            log(f"photons: shot={shot} " + " ".join(
                f"{k}={sum(len(x) for x in coll[k]['pid'])}/{targets[k]}"
                for k in targets))
        if done:
            break
        # "unsuccessful" bail (photonmap.cpp:139-144, 165-177): stop when
        # every still-unfilled map has found nothing (or < shot/1024) —
        # it will never fill (e.g. no caustic paths exist in the scene).
        if shot >= 8 * prm.batch:
            def _stalled(k):
                have = sum(len(x) for x in coll[k]["pid"])
                return have >= targets[k] or have == 0 or \
                    have < shot // 1024
            if all(_stalled(k) for k in targets):
                break

    grids = {}
    for k in targets:
        pos = np.concatenate(coll[k]["pos"]) if coll[k]["pos"] else \
            np.zeros((0, 3), np.float32)
        wi = np.concatenate(coll[k]["wi"]) if coll[k]["wi"] else \
            np.zeros((0, 3), np.float32)
        al = np.concatenate(coll[k]["alpha"]) if coll[k]["alpha"] else \
            np.zeros((0, 3), np.float32)
        pid = np.concatenate(coll[k]["pid"]) if coll[k]["pid"] else \
            np.zeros((0,), np.int64)
        tgt = targets[k]
        if len(pid) > tgt:
            n_paths = float(pid[tgt - 1] + 1)
            pos, wi, al = pos[:tgt], wi[:tgt], al[:tgt]
        else:
            n_paths = float(shot)
        grids[k] = build_photon_grid(pos, wi, al, prm.max_dist, n_paths)
    maps = PhotonMaps(**grids)
    if collect_radiance:
        cat = {k: (np.concatenate(v) if v else
                   np.zeros((0, 3), np.float32)) for k, v in rad.items()}
        return maps, cat
    return maps


# ---------------------------------------------------------------------------
# Density estimation (LPhoton)
# ---------------------------------------------------------------------------

def lphoton(grid: PhotonGrid, bsdf: B.BsdfBatch, wo, p, active):
    """Fixed-radius photon radiance estimate (photonmap.cpp:433-483):
    sum_i f(wo, wi_i) * alpha_i / (n_paths * pi * r^2)."""
    if grid.count == 0:
        return jnp.zeros(p.shape[:-1] + (3,), jnp.float32)

    def accum(L, wi_b, alpha_b, w):
        # wi_b/alpha_b: [B,27,3]; evaluate f vectorized over the cell axis.
        f_val = jax.vmap(lambda wi: B.f(bsdf, wo, wi),
                         in_axes=1, out_axes=1)(wi_b)
        return L + jnp.sum(jnp.where(w[..., None], f_val * alpha_b, 0.0), 1)

    L = gather_photons(grid, p,
                       accum, jnp.zeros(p.shape[:-1] + (3,), jnp.float32))
    scale = 1.0 / (grid.n_paths * math.pi * grid.radius * grid.radius)
    return jnp.where(active[..., None], L * scale, 0.0)


# ---------------------------------------------------------------------------
# Li
# ---------------------------------------------------------------------------

def li(scene: SceneData, maps: PhotonMaps, o, d, mint, maxt,
       cfg: smp.SamplerConfig, px, py, s_idx, max_depth: int = 5,
       seed: int = 0, prm: PhotonParams = PhotonParams(),
       rx=None, ry=None):
    n_rays = o.shape[0]
    ph = rng.hash_u32(px, py, seed, 0x9B1)
    has_inf = bool(scene.lights.infinite_meta)

    def body(carry, depth):
        ro, rd, throughput, L, alive, alpha_acc, t_first = carry
        first = depth == 0
        t, pid, hit = isect.intersect_ids(
            scene, ro, rd,
            jnp.where(first, mint, jnp.full((n_rays,), _EPS)),
            jnp.where(first, maxt, jnp.full((n_rays,), 1e30)))
        t_first = jnp.where(first & hit, t, t_first)
        if has_inf:
            esc = ~hit & alive
            Lesc = lt.le_escaped(scene, rd)
            L = L + jnp.where(esc[..., None], throughput * Lesc, 0.0)
            alpha_acc = jnp.where(esc & first & jnp.any(Lesc > 0, -1), 1.0,
                                  alpha_acc)
        alive = alive & hit
        alpha_acc = jnp.where(first & hit, 1.0, alpha_acc)

        dg = isect.hit_geometry(scene, pid, ro, rd, t)
        if rx is not None:
            dg = isect.compute_differentials(dg, rx[0], rx[1], ry[0], ry[1],
                                             first & alive)
        wo = -rd
        Le = lt.area_emission(scene, dg["area_light"], dg["nn"], wo)
        L = L + jnp.where(alive[..., None], throughput * Le, 0.0)

        bsdf = common.make_bsdf_at(scene, dg)
        p, ns = dg["p"], bsdf.nn

        # Direct lighting (photonmap.cpp:315-323).
        if prm.direct_with_photons:
            Ld = lphoton(maps.direct, bsdf, wo, p, alive)
        else:
            def sample_fn(light_i, kind):
                return rng.uniform2(ph, s_idx, depth, light_i, kind)
            Ld = common.uniform_sample_all_lights(scene, p, ns, wo, bsdf,
                                                  sample_fn, alive)
        L = L + jnp.where(alive[..., None], throughput * Ld, 0.0)

        # Caustics always come from the caustic map.
        L = L + throughput * lphoton(maps.caustic, bsdf, wo, p, alive)

        if prm.final_gather and maps.indirect.count > 0:
            def gather_body(acc, gi):
                g1 = rng.uniform(ph, s_idx, depth, gi, 0x61)
                g2 = rng.uniform(ph, s_idx, depth, gi, 0x62)
                g3 = rng.uniform(ph, s_idx, depth, gi, 0x63)
                bs = B.sample_f(bsdf, wo, g1, g2, g3,
                                B.ALL & ~B.SPECULAR)
                gok = alive & bs["valid"] & (bs["pdf"] > 0.0) & \
                    jnp.any(bs["f"] > 0.0, -1)
                gt, gpid, ghit = isect.intersect_ids(
                    scene, p, bs["wi"], jnp.full((n_rays,), _EPS),
                    jnp.full((n_rays,), 1e30))
                gok = gok & ghit
                gdg = isect.hit_geometry(scene, gpid, p, bs["wi"], gt)
                gbsdf = common.make_bsdf_at(scene, gdg)
                gwo = -bs["wi"]
                Lind = (lphoton(maps.direct, gbsdf, gwo, gdg["p"], gok) +
                        lphoton(maps.indirect, gbsdf, gwo, gdg["p"], gok) +
                        lphoton(maps.caustic, gbsdf, gwo, gdg["p"], gok))
                contrib = bs["f"] * Lind * \
                    (vm.absdot(bs["wi"], ns) /
                     jnp.maximum(bs["pdf"], 1e-20))[..., None]
                return acc + jnp.where(gok[..., None], contrib, 0.0), None

            Lg, _ = jax.lax.scan(gather_body,
                                 jnp.zeros((n_rays, 3), jnp.float32),
                                 jnp.arange(prm.gather_samples))
            L = L + throughput * Lg / float(prm.gather_samples)
        else:
            L = L + throughput * lphoton(maps.indirect, bsdf, wo, p, alive)

        # Specular continuation (photonmap.cpp:366-425), stochastic
        # single pick as in whitted.py.
        u1 = rng.uniform(ph, s_idx, depth, 0x5A, 1)
        u2 = rng.uniform(ph, s_idx, depth, 0x5A, 2)
        u3 = rng.uniform(ph, s_idx, depth, 0x5A, 3)
        bs = B.sample_f(bsdf, wo, u1, u2, u3,
                        B.SPECULAR | B.REFLECTION | B.TRANSMISSION)
        cont = alive & bs["valid"] & (bs["pdf"] > 0.0) & \
            ~jnp.all(bs["f"] == 0.0, axis=-1) & (depth < max_depth)
        scale = bs["f"] * (vm.absdot(bs["wi"], ns) /
                           jnp.maximum(bs["pdf"], 1e-20))[..., None]
        throughput = jnp.where(cont[..., None], throughput * scale,
                               throughput)
        return (p, bs["wi"], throughput, L, cont, alpha_acc, t_first), None

    init = (o, d, jnp.ones_like(o), jnp.zeros_like(o),
            d[..., 0] * 0.0 == 0.0, d[..., 0] * 0.0,
            maxt + d[..., 0] * 0.0)
    carry, _ = jax.lax.scan(body, init, jnp.arange(max_depth + 1))
    return carry[3], carry[5], carry[6]

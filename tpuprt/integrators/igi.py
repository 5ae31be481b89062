"""Instant Global Illumination as wavefront passes.

TPU-native replacement for /root/reference/integrators/igi.cpp:93-276.
Preprocess traces nsets x npaths light paths (power-CDF light selection,
LD sample streams) depositing VirtualLights with Le = alpha * rho / pi at
every path vertex; luminance-ratio Russian roulette continues the path.
Li picks one VL set per camera sample and sums f * G * Le / |set| over its
VLs with the SmoothStep distance screening, per-VL shadow rays, and the
weak-contribution RR skip (igi.cpp:195-215). Specular recursion is the
whitted-style stochastic single pick.

Divergences (documented): path length is statically bounded (depth_bound)
instead of RR-only; rho is the lobe-R sum approximation
(bsdf.rho_approx) instead of a 16-sample MC estimate.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..accel import intersect as isect
from ..bsdf import bsdf as B
from ..core import rng, spectrum as spec, vecmath as vm
from ..core.pytree import pytree_dataclass, static
from ..lights import emission, lights as lt
from ..samplers import samplers as smp
from ..scene.data import SceneData
from . import common

_EPS = vm.RAY_EPSILON


class IgiParams(NamedTuple):
    """CreateSurfaceIntegrator defaults (igi.cpp:288-295); counts rounded
    up to powers of two as in the ctor (igi.cpp:66-67)."""
    nlights: int = 64          # paths per set
    nsets: int = 4
    mindist: float = 0.1
    rrthreshold: float = 0.05
    indirectscale: float = 1.0
    depth_bound: int = 8       # static light-path bound


@pytree_dataclass
class VirtualLights:
    p: jnp.ndarray       # f32[S, M, 3]
    n: jnp.ndarray       # f32[S, M, 3]
    Le: jnp.ndarray      # f32[S, M, 3]
    valid: jnp.ndarray   # bool[S, M]
    # Normalizer = light PATHS per set. Documented divergence: the
    # reference divides by the VL COUNT (igi.cpp:203-204), which
    # underestimates indirect light by the mean path length — a bug fixed
    # in pbrt-v2 (it divides by nLightPaths); we use the correct estimator.
    n_paths: jnp.ndarray  # f32[]
    nsets: int = static(default=1)
    max_vl: int = static(default=1)


def _trace_paths(scene: SceneData, set_id: int, npaths: int,
                 depth_bound: int, seed: int, light_cdf):
    """One VL set: npaths light paths, VLs at every vertex.
    Returns (p, n, Le, valid) each [D, npaths, ...]."""
    i = jnp.arange(npaths, dtype=jnp.uint32)
    sh = rng.hash_u32(jnp.uint32(set_id), jnp.uint32(seed), 0x161)
    u_num = rng.ld_shuffled_1d(i, sh, 0)
    l0x, l0y = rng.ld_shuffled_2d(i, sh, 1)
    l1x, l1y = rng.ld_shuffled_2d(i, sh, 2)
    u5 = rng.uniform(sh, i, 0x55)

    # Power-CDF light selection (igi.cpp:103-117).
    # Distribution1D sample: find offset, pdf = func/funcInt.
    func, cdf, func_int = light_cdf
    nl = scene.lights.count
    idx = jnp.clip(jnp.searchsorted(cdf, u_num, side="right") - 1, 0, nl - 1)
    light_pdf = func[idx] / jnp.maximum(func_int, 1e-20)
    lid = idx.astype(jnp.int32)

    em = emission.sample_emission(scene, lid, l0x, l0y, l1x, l1y, u5)
    denom = jnp.maximum(em["pdf"] * light_pdf, 1e-20)
    alpha = em["Le"] / denom[..., None]
    alive = (em["pdf"] > 0.0) & (light_pdf > 0.0) & jnp.any(alpha > 0.0, -1)

    def body(carry, depth):
        o, d, alpha, alive = carry
        t, pid, hit = isect.intersect_ids(scene, o, d,
                                          jnp.full((npaths,), _EPS),
                                          jnp.full((npaths,), 1e30))
        alive = alive & hit & jnp.any(alpha > 0.0, -1)
        dg = isect.hit_geometry(scene, pid, o, d, t)
        if scene.volumes is not None and scene.volumes.count > 0:
            from . import volume as vol_integ
            uj = rng.uniform(sh, i, depth, 0x7A)
            alpha = alpha * vol_integ.transmittance(
                scene, o, d, jnp.full((npaths,), _EPS), t, uj)
        bsdf = common.make_bsdf_at(scene, dg)
        # VirtualLight(p, nn, alpha * rho / pi) (igi.cpp:135-141).
        Le = alpha * B.rho_approx(bsdf) * jnp.float32(1.0 / jnp.pi)
        out = (dg["p"], dg["nn"], Le, alive)

        c1 = rng.uniform(sh, i, depth, 1)
        c2 = rng.uniform(sh, i, depth, 2)
        c3 = rng.uniform(sh, i, depth, 3)
        bs = B.sample_f(bsdf, -d, c1, c2, c3, B.ALL)
        ok = bs["valid"] & (bs["pdf"] > 0.0) & jnp.any(bs["f"] > 0.0, -1)
        anew = alpha * bs["f"] * (vm.absdot(bs["wi"], bsdf.nn) /
                                  jnp.maximum(bs["pdf"], 1e-20))[..., None]
        # Luminance-ratio RR (igi.cpp:150-155).
        r = spec.luminance(anew) / jnp.maximum(spec.luminance(alpha), 1e-20)
        rr = rng.uniform(sh, i, depth, 0xEE)
        cont = rr <= r
        alpha2 = anew / jnp.maximum(r, 1e-20)[..., None]
        alive = alive & ok & cont
        return (dg["p"], bs["wi"], alpha2, alive), out

    init = (em["o"], em["d"], alpha, alive)
    _, outs = jax.lax.scan(body, init, jnp.arange(depth_bound))
    return outs


def build_virtual_lights(scene: SceneData, prm: IgiParams,
                         seed: int = 0) -> VirtualLights:
    """Preprocess (igi.cpp:93-166)."""
    import math
    npaths = 1 << max(0, math.ceil(math.log2(max(prm.nlights, 1))))
    nsets = 1 << max(0, math.ceil(math.log2(max(prm.nsets, 1))))
    if scene.lights.count == 0:
        z = jnp.zeros
        return VirtualLights(p=z((1, 1, 3)), n=z((1, 1, 3)), Le=z((1, 1, 3)),
                             valid=z((1, 1), bool), n_paths=jnp.ones(()),
                             nsets=1, max_vl=1)
    power_y = spec.luminance(lt.power(scene))
    func = power_y
    n = scene.lights.count
    cdf = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(func / n)])
    func_int = cdf[-1]
    cdf = cdf / jnp.maximum(func_int, 1e-20)
    light_cdf = (func, cdf, func_int)

    trace = jax.jit(lambda s: _trace_paths(scene, s, npaths,
                                           prm.depth_bound, seed, light_cdf))
    ps, ns, les, vs = [], [], [], []
    for s in range(nsets):
        p, nrm, Le, valid = trace(s)
        # [D, P, ...] -> [D*P, ...]
        ps.append(p.reshape(-1, 3))
        ns.append(nrm.reshape(-1, 3))
        les.append(Le.reshape(-1, 3))
        vs.append(valid.reshape(-1))
    p = jnp.stack(ps)
    valid = jnp.stack(vs)
    return VirtualLights(
        p=p, n=jnp.stack(ns), Le=jnp.stack(les), valid=valid,
        n_paths=jnp.asarray(float(npaths), jnp.float32),
        nsets=nsets, max_vl=int(p.shape[1]))


def li(scene: SceneData, vls: VirtualLights, o, d, mint, maxt,
       cfg: smp.SamplerConfig, px, py, s_idx, max_depth: int = 5,
       seed: int = 0, prm: IgiParams = IgiParams(), rx=None, ry=None):
    n_rays = o.shape[0]
    ph = rng.hash_u32(px, py, seed, 0x161B)
    has_inf = bool(scene.lights.infinite_meta)
    min_d2 = prm.mindist * prm.mindist
    # Per-sample VL set pick (igi.cpp:190-191).
    lset = jnp.minimum((rng.uniform(ph, s_idx, 0x5E7) *
                        vls.nsets).astype(jnp.int32), vls.nsets - 1)

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
        p, nrm = dg["p"], bsdf.nn

        def sample_fn(light_i, kind):
            return rng.uniform2(ph, s_idx, depth, light_i, kind)
        Ld = common.uniform_sample_all_lights(scene, p, nrm, wo, bsdf,
                                              sample_fn, alive)
        L = L + jnp.where(alive[..., None], throughput * Ld, 0.0)

        # Virtual-light gathering (igi.cpp:189-218).
        def vl_body(acc, vi):
            vp = vls.p[lset, vi]
            vn = vls.n[lset, vi]
            vle = vls.Le[lset, vi]
            vvalid = vls.valid[lset, vi]
            to_vl = vp - p
            d2 = jnp.maximum(vm.length_sq(to_vl), 1e-12)
            dist_scale = vm.smoothstep(0.8 * min_d2, 1.2 * min_d2, d2)
            wi = to_vl * jax.lax.rsqrt(d2)[..., None]
            f_val = dist_scale[..., None] * B.f(bsdf, wo, wi)
            G = vm.absdot(wi, nrm) * vm.absdot(wi, vn) / d2
            Ll = prm.indirectscale * f_val * G[..., None] * vle / \
                vls.n_paths
            need = alive & vvalid & jnp.any(f_val > 0.0, -1)
            # Weak-contribution RR (igi.cpp:206-212).
            weak = spec.luminance(Ll) < prm.rrthreshold
            rru = rng.uniform(ph, s_idx, depth, vi, 0xA7)
            skip = weak & (rru > 0.1)
            Ll = jnp.where(weak[..., None], Ll / 0.1, Ll)
            need = need & ~skip
            dist = jnp.sqrt(d2)
            occ = isect.occluded(scene, p, wi, jnp.full((n_rays,), _EPS),
                                 dist * (1.0 - 1e-3))
            return acc + jnp.where((need & ~occ)[..., None], Ll, 0.0), None

        Lvl, _ = jax.lax.scan(vl_body, jnp.zeros((n_rays, 3), jnp.float32),
                              jnp.arange(vls.max_vl))
        L = L + throughput * jnp.where(alive[..., None], Lvl, 0.0)

        u1 = rng.uniform(ph, s_idx, depth, 0x5A, 1)
        u2 = rng.uniform(ph, s_idx, depth, 0x5A, 2)
        u3 = rng.uniform(ph, s_idx, depth, 0x5A, 3)
        bs = B.sample_f(bsdf, wo, u1, u2, u3,
                        B.SPECULAR | B.REFLECTION | B.TRANSMISSION)
        cont = alive & bs["valid"] & (bs["pdf"] > 0.0) & \
            ~jnp.all(bs["f"] == 0.0, axis=-1) & (depth < max_depth)
        scale = bs["f"] * (vm.absdot(bs["wi"], nrm) /
                           jnp.maximum(bs["pdf"], 1e-20))[..., None]
        throughput = jnp.where(cont[..., None], throughput * scale,
                               throughput)
        return (p, bs["wi"], throughput, L, cont, alpha_acc, t_first), None

    init = (o, d, jnp.ones_like(o), jnp.zeros_like(o),
            d[..., 0] * 0.0 == 0.0, d[..., 0] * 0.0,
            maxt + d[..., 0] * 0.0)
    carry, _ = jax.lax.scan(body, init, jnp.arange(max_depth + 1))
    return carry[3], carry[5], carry[6]

"""Path integrator as a bounded wavefront loop.

TPU-native replacement for /root/reference/integrators/path.cpp:58-145. The
reference's per-ray while loop maps 1:1 onto a statically-unrolled wavefront
loop with masked lanes: each iteration = intersect -> emitted-term ->
NEE (EstimateDirect MIS) -> BSDF continuation -> Russian roulette. Exact
semantics preserved: Le added only on the first or post-specular vertex,
RR p=0.5 after bounce 3, precomputed (LD/stratified) samples for the first
SAMPLE_DEPTH=3 bounces then hash uniforms (path.cpp:88,119-126).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..accel import intersect as isect
from ..bsdf import bsdf as B
from ..core import rng, vecmath as vm
from ..lights import lights as lt
from ..samplers import samplers as smp
from ..scene.data import SceneData
from . import common

_EPS = vm.RAY_EPSILON
SAMPLE_DEPTH = 3  # path.cpp: precomputed samples for first 3 bounces


def li(scene: SceneData, o, d, mint, maxt, cfg: smp.SamplerConfig,
       px, py, s_idx, max_depth: int = 5, seed: int = 0, rr_start: int = 3):
    """Returns (L f32[N,3], alpha f32[N]) for a camera-ray wavefront."""
    n_rays = o.shape[0]
    L = jnp.zeros((n_rays, 3), jnp.float32)
    throughput = jnp.ones((n_rays, 3), jnp.float32)
    alive = jnp.ones((n_rays,), bool)
    specular_bounce = jnp.zeros((n_rays,), bool)
    alpha = jnp.zeros((n_rays,), jnp.float32)
    ph = rng.hash_u32(px, py, seed, 0xBA5E)

    ro, rd = o, d
    rmint, rmaxt = mint, maxt

    for bounce in range(max_depth + 1):
        t, pid, hit = isect.intersect_ids(scene, ro, rd, rmint, rmaxt)

        # Escaped rays: env light only on first or post-specular vertex
        # (path.cpp:72-83).
        esc_count = ~hit & alive
        take_le = esc_count & ((bounce == 0) | specular_bounce)
        if scene.lights.infinite_meta:
            Lesc = lt.le_escaped(scene, rd)
            L = L + jnp.where(take_le[..., None], throughput * Lesc, 0.0)
            alpha = jnp.where(take_le & (bounce == 0),
                              jnp.where(jnp.any(Lesc > 0, -1), 1.0, alpha),
                              alpha)
        alive = alive & hit

        dg = isect.hit_geometry(scene, pid, ro, rd, t)
        if bounce == 0:
            alpha = jnp.where(hit, 1.0, alpha)

        # Emitted term (area lights) on first/post-specular vertex
        # (path.cpp:91-92).
        emit_ok = alive & ((bounce == 0) | specular_bounce)
        Le = lt.area_emission(scene, dg["area_light"], dg["nn"], -rd)
        L = L + jnp.where(emit_ok[..., None], throughput * Le, 0.0)

        bsdf = common.make_bsdf_at(scene, dg)
        p, ns = dg["p"], bsdf.nn
        wo = -rd

        # --- NEE: UniformSampleOneLight (path.cpp:99-110) ---
        if scene.lights.count > 0:
            if bounce < SAMPLE_DEPTH:
                u_num = smp.integrator_1d(cfg, px, py, s_idx, bounce, 10, seed)
                ls1, ls2 = smp.integrator_2d(cfg, px, py, s_idx, bounce, 11, seed)
                bs1, bs2 = smp.integrator_2d(cfg, px, py, s_idx, bounce, 12, seed)
                bcs = smp.integrator_1d(cfg, px, py, s_idx, bounce, 13, seed)
            else:
                u_num = rng.uniform(ph, s_idx, bounce, 10)
                ls1 = rng.uniform(ph, s_idx, bounce, 11)
                ls2 = rng.uniform(ph, s_idx, bounce, 12)
                bs1 = rng.uniform(ph, s_idx, bounce, 13)
                bs2 = rng.uniform(ph, s_idx, bounce, 14)
                bcs = rng.uniform(ph, s_idx, bounce, 15)
            ls3 = rng.uniform(ph, s_idx, bounce, 16)
            Ld = common.uniform_sample_one_light(
                scene, p, ns, wo, bsdf, u_num, ls1, ls2, ls3, bs1, bs2, bcs,
                alive)
            L = L + jnp.where(alive[..., None], throughput * Ld, 0.0)

        if bounce == max_depth:
            break

        # --- BSDF-sampled continuation (path.cpp:112-133) ---
        if bounce < SAMPLE_DEPTH:
            c1, c2 = smp.integrator_2d(cfg, px, py, s_idx, bounce, 20, seed)
            c3 = smp.integrator_1d(cfg, px, py, s_idx, bounce, 21, seed)
        else:
            c1 = rng.uniform(ph, s_idx, bounce, 20)
            c2 = rng.uniform(ph, s_idx, bounce, 21)
            c3 = rng.uniform(ph, s_idx, bounce, 22)
        bs = B.sample_f(bsdf, wo, c1, c2, c3, B.ALL)
        cont = alive & bs["valid"] & (bs["pdf"] > 0.0) & \
            ~jnp.all(bs["f"] == 0.0, axis=-1)
        scale = bs["f"] * (vm.absdot(bs["wi"], ns) /
                           jnp.maximum(bs["pdf"], 1e-20))[..., None]
        throughput = jnp.where(cont[..., None], throughput * scale, throughput)
        specular_bounce = bs["specular"]
        alive = cont

        # --- Russian roulette after rr_start bounces (path.cpp:135-142) ---
        if bounce >= rr_start:
            u_rr = rng.uniform(ph, s_idx, bounce, 30)
            survive = u_rr < 0.5
            alive = alive & survive
            throughput = jnp.where(alive[..., None], throughput / 0.5,
                                   throughput)

        ro = p
        rd = bs["wi"]
        rmint = jnp.full((n_rays,), _EPS, jnp.float32)
        rmaxt = jnp.full((n_rays,), 1e30, jnp.float32)

    return L, alpha

"""Material -> BSDF lobe assembly, branchless over a shading wavefront.

TPU-native replacement for the per-material GetBSDF constructors
(/root/reference/materials/*.cpp). Each lane gathers its material's texture
slot values (already evaluated by textures/graph.eval_graph) and fills up to
MAX_LOBES lobe-table rows; per-kind recipes are evaluated masked. A lobe
whose scale is exactly black is disabled (kind/flags cleared) — matching the
reference's "if (!k.Black()) bsdf->Add(...)" pattern so component counts and
mixture pdfs agree.

Slot conventions (MaterialTable.tex columns):
  matte:       0=Kd 1=sigma
  plastic:     0=Kd 1=Ks 2=roughness
  glass:       0=Kr 1=Kt 2=index
  mirror:      0=Kr
  shinymetal:  0=Ks 1=Kr 2=roughness
  substrate:   0=Kd 1=Ks 2=uroughness 3=vroughness
  translucent: 0=Kd 1=Ks 2=roughness 3=reflect 4=transmit
  uber:        0=Kd 1=Ks 2=Kr 3=roughness 4=opacity
  measured:    (no slots; kind encodes which measurement)
"""
from __future__ import annotations

import jax.numpy as jnp

from ..bsdf import bsdf as B
from ..scene.data import MaterialTable

MAT_MATTE = 0
MAT_PLASTIC = 1
MAT_GLASS = 2
MAT_MIRROR = 3
MAT_SHINYMETAL = 4
MAT_SUBSTRATE = 5
MAT_TRANSLUCENT = 6
MAT_UBER = 7
MAT_MEASURED_BASE = 8      # 8..13 = bluepaint..skin
NUM_MEASURED = 6

MAX_LOBES = 4

MATERIAL_KINDS = {
    "matte": MAT_MATTE, "plastic": MAT_PLASTIC, "glass": MAT_GLASS,
    "mirror": MAT_MIRROR, "shinymetal": MAT_SHINYMETAL,
    "substrate": MAT_SUBSTRATE, "translucent": MAT_TRANSLUCENT,
    "uber": MAT_UBER,
    "bluepaint": MAT_MEASURED_BASE + 0, "brushedmetal": MAT_MEASURED_BASE + 1,
    "clay": MAT_MEASURED_BASE + 2, "felt": MAT_MEASURED_BASE + 3,
    "primer": MAT_MEASURED_BASE + 4, "skin": MAT_MEASURED_BASE + 5,
}

_FL_DIFF_R = B.REFLECTION | B.DIFFUSE
_FL_GLOS_R = B.REFLECTION | B.GLOSSY
_FL_SPEC_R = B.REFLECTION | B.SPECULAR
_FL_SPEC_T = B.TRANSMISSION | B.SPECULAR
_FL_DIFF_T = B.TRANSMISSION | B.DIFFUSE
_FL_GLOS_T = B.TRANSMISSION | B.GLOSSY


def make_lobes(materials: MaterialTable, mat_id, tex_vals) -> B.LobeTable:
    """Build the lobe table for a wavefront.

    mat_id: i32[N]; tex_vals: f32[Ntex, N, 3] stacked texture values.
    """
    n = mat_id.shape[0]
    mid = jnp.maximum(mat_id, 0)
    kind_m = materials.kind[mid]                  # [N]
    tex_ids = materials.tex[mid]                  # [N, 8]

    lane = jnp.arange(n)

    def slot(s):
        tid = jnp.maximum(tex_ids[:, s], 0)
        v = tex_vals[tid, lane] if tex_vals.shape[0] > 0 else jnp.zeros((n, 3))
        return jnp.where((tex_ids[:, s] >= 0)[:, None], v, 0.0)

    s0, s1, s2, s3, s4 = slot(0), slot(1), slot(2), slot(3), slot(4)
    clamp01 = lambda x: jnp.clip(x, 0.0, 1.0)
    fl0 = lambda x: x[:, 0]  # float texture -> channel 0

    # Output columns.
    L = MAX_LOBES
    kind = jnp.full((n, L), B.BX_NONE, jnp.int32)
    flags = jnp.zeros((n, L), jnp.int32)
    flip = jnp.zeros((n, L), bool)
    R = jnp.zeros((n, L, 3), jnp.float32)
    eta = jnp.ones((n, L, 3), jnp.float32)
    k_ = jnp.zeros((n, L, 3), jnp.float32)
    p = jnp.zeros((n, L, 4), jnp.float32)
    aux0 = jnp.zeros((n, L), jnp.int32)
    aux1 = jnp.zeros((n, L), jnp.int32)

    def put(m, li, kn, fl, Rv, etav=None, kv=None, pv=None, a0=None, a1=None,
            flipv=False):
        """Masked write of one lobe row."""
        nonlocal kind, flags, flip, R, eta, k_, p, aux0, aux1
        mm = m
        kind = kind.at[:, li].set(jnp.where(mm, kn, kind[:, li]))
        flags = flags.at[:, li].set(jnp.where(mm, fl, flags[:, li]))
        flip = flip.at[:, li].set(jnp.where(mm, flipv, flip[:, li]))
        R = R.at[:, li].set(jnp.where(mm[:, None], Rv, R[:, li]))
        if etav is not None:
            eta = eta.at[:, li].set(jnp.where(mm[:, None], etav, eta[:, li]))
        if kv is not None:
            k_ = k_.at[:, li].set(jnp.where(mm[:, None], kv, k_[:, li]))
        if pv is not None:
            p = p.at[:, li].set(jnp.where(mm[:, None], pv, p[:, li]))
        if a0 is not None:
            aux0 = aux0.at[:, li].set(jnp.where(mm, a0, aux0[:, li]))
        if a1 is not None:
            aux1 = aux1.at[:, li].set(jnp.where(mm, a1, aux1[:, li]))

    ones = jnp.ones((n,), jnp.float32)
    zeros_i = jnp.zeros((n,), jnp.int32)
    diel_15 = jnp.stack([1.5 * ones, 1.0 * ones, ones], -1)  # etai=1.5? no:
    # FresnelDielectric(1.5, 1.) means eta_i=1.5, eta_t=1 in pbrt's ctor order.
    pack_p = lambda a, b=0.0, c=0.0, d=0.0: jnp.stack(
        [a * ones if jnp.ndim(a) == 0 else a,
         b * ones if jnp.ndim(b) == 0 else b,
         c * ones if jnp.ndim(c) == 0 else c,
         d * ones if jnp.ndim(d) == 0 else d], -1)

    inv_rough = lambda r: 1.0 / jnp.maximum(fl0(r), 1e-5)

    # ---- matte (materials/matte.cpp:46-64): sigma==0 -> Lambertian ----
    m = kind_m == MAT_MATTE
    sigma_deg = fl0(s1)
    sig = jnp.radians(sigma_deg)
    sig2 = sig * sig
    A_on = 1.0 - sig2 / (2.0 * (sig2 + 0.33))
    B_on = 0.45 * sig2 / (sig2 + 0.09)
    is_lam = sigma_deg == 0.0
    put(m, 0, jnp.where(is_lam, B.BX_LAMBERTIAN, B.BX_ORENNAYAR),
        _FL_DIFF_R, clamp01(s0), pv=pack_p(A_on, B_on))

    # ---- plastic (materials/plastic.cpp:46-68) ----
    m = kind_m == MAT_PLASTIC
    put(m, 0, B.BX_LAMBERTIAN, _FL_DIFF_R, clamp01(s0))
    put(m, 1, B.BX_MICROFACET, _FL_GLOS_R, clamp01(s1),
        etav=diel_15, pv=pack_p(inv_rough(s2)),
        a0=B.FR_DIELECTRIC, a1=B.DIST_BLINN)

    # ---- glass (materials/glass.cpp:46-63) ----
    m = kind_m == MAT_GLASS
    ior = fl0(s2)
    eta_gl = jnp.stack([ones, ior, ones], -1)  # etai=1, etat=index
    put(m, 0, B.BX_SPECREFL, _FL_SPEC_R, clamp01(s0), etav=eta_gl,
        a0=B.FR_DIELECTRIC)
    put(m, 1, B.BX_SPECTRANS, _FL_SPEC_T, clamp01(s1), etav=eta_gl)

    # ---- mirror (materials/mirror.cpp) ----
    m = kind_m == MAT_MIRROR
    put(m, 0, B.BX_SPECREFL, _FL_SPEC_R, clamp01(s0), a0=B.FR_NOOP)

    # ---- shinymetal (materials/shinymetal.cpp:45-66) ----
    m = kind_m == MAT_SHINYMETAL
    eta_mf = B.fresnel_approx_eta(clamp01(s0))
    eta_sr = B.fresnel_approx_eta(clamp01(s1))
    one3 = jnp.ones((n, 3), jnp.float32)
    put(m, 0, B.BX_MICROFACET, _FL_GLOS_R, one3, etav=eta_mf, kv=0.0 * one3,
        pv=pack_p(inv_rough(s2)), a0=B.FR_CONDUCTOR, a1=B.DIST_BLINN)
    put(m, 1, B.BX_SPECREFL, _FL_SPEC_R, one3, etav=eta_sr, kv=0.0 * one3,
        a0=B.FR_CONDUCTOR)

    # ---- substrate (materials/substrate.cpp:47-63) ----
    m = kind_m == MAT_SUBSTRATE
    put(m, 0, B.BX_FRESNELBLEND, _FL_GLOS_R, clamp01(s0), kv=clamp01(s1),
        pv=pack_p(inv_rough(s2), inv_rough(s3)), a1=B.DIST_ANISO)

    # ---- translucent (materials/translucent.cpp:52-84) ----
    m = kind_m == MAT_TRANSLUCENT
    refl = clamp01(s3)
    trans = clamp01(s4)
    put(m, 0, B.BX_LAMBERTIAN, _FL_DIFF_R, refl * clamp01(s0))
    put(m, 1, B.BX_LAMBERTIAN, _FL_DIFF_T, trans * clamp01(s0), flipv=True)
    put(m, 2, B.BX_MICROFACET, _FL_GLOS_R, refl * clamp01(s1),
        etav=diel_15, pv=pack_p(inv_rough(s2)), a0=B.FR_DIELECTRIC,
        a1=B.DIST_BLINN)
    put(m, 3, B.BX_MICROFACET, _FL_GLOS_T, trans * clamp01(s1),
        etav=diel_15, pv=pack_p(inv_rough(s2)), a0=B.FR_DIELECTRIC,
        a1=B.DIST_BLINN, flipv=True)

    # ---- uber (materials/uber.cpp:52-88) ----
    m = kind_m == MAT_UBER
    op = clamp01(s4)
    eta_pass = jnp.stack([ones, ones, ones], -1)
    put(m, 0, B.BX_SPECTRANS, _FL_SPEC_T, 1.0 - op, etav=eta_pass)
    put(m, 1, B.BX_LAMBERTIAN, _FL_DIFF_R, op * clamp01(s0))
    put(m, 2, B.BX_MICROFACET, _FL_GLOS_R, op * clamp01(s1),
        etav=diel_15, pv=pack_p(inv_rough(s3)), a0=B.FR_DIELECTRIC,
        a1=B.DIST_BLINN)
    put(m, 3, B.BX_SPECREFL, _FL_SPEC_R, op * clamp01(s2), etav=diel_15,
        a0=B.FR_DIELECTRIC)

    # ---- measured Lafortune (materials/{bluepaint..skin}.cpp) ----
    from .lafortune_data import DIFFUSE
    m = kind_m >= MAT_MEASURED_BASE
    meas_id = jnp.clip(kind_m - MAT_MEASURED_BASE, 0, NUM_MEASURED - 1)
    put(m, 0, B.BX_LAFORTUNE, _FL_DIFF_R, jnp.asarray(DIFFUSE)[meas_id],
        a0=meas_id)

    # Disable lobes whose scale is exactly black — mirrors the reference's
    # conditional Add() so NumComponents / mixture pdfs match. FresnelBlend
    # checks Rd+Rs; uber's 1-opacity lobe disables at opacity==1.
    scale_black = jnp.all(R == 0.0, axis=-1)
    fb = kind == B.BX_FRESNELBLEND
    fb_black = scale_black & jnp.all(k_ == 0.0, axis=-1)
    dead = jnp.where(fb, fb_black, scale_black) | (kind == B.BX_NONE)
    kind = jnp.where(dead, B.BX_NONE, kind)
    flags = jnp.where(dead, 0, flags)

    return B.LobeTable(kind=kind, flags=flags, flip=flip, R=R, eta=eta,
                       k=k_, p=p, aux0=aux0, aux1=aux1)

"""Deterministic, order-invariant sample generation.

TPU-native replacement for /root/reference/samplers/*.cpp. The reference's
stateful `Sampler::GetNextSample` loop becomes a pure function of
(pixel, sample index): every camera-sample dimension (image/lens/time) and
every integrator dimension is derived from counter-based hashes or
per-pixel-scrambled low-discrepancy sequences, so any shard of the sample
space can be generated independently on any device.

Kinds:
  stratified  — jittered strata (samplers/stratified.cpp:51-131); image
                strata are the (sx,sy) sub-grid of spp = xs*ys, lens/time
                use shuffled strata realized as scrambled per-pixel orders.
  random      — pure hash uniforms (samplers/random.cpp).
  lowdiscrepancy / bestcandidate — per-pixel scrambled (0,2)-sequences
                (samplers/lowdiscrepancy.cpp:76-128; bestcandidate's
                precomputed table is approximated by the same (0,2) math,
                which dominates it in discrepancy).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import rng


class SamplerConfig(NamedTuple):
    kind: str = "stratified"          # stratified|random|lowdiscrepancy|bestcandidate
    xsamples: int = 2
    ysamples: int = 2
    jitter: bool = True
    pixelsamples: int = 4             # LD / random / bestcandidate


def round_size(cfg: SamplerConfig, n: int) -> int:
    """Sampler::RoundSize — LD rounds to pow2 (lowdiscrepancy.cpp:44-46)."""
    if cfg.kind in ("lowdiscrepancy", "bestcandidate"):
        p = 1
        while p < n:
            p *= 2
        return p
    return n


def samples_per_pixel(cfg: SamplerConfig) -> int:
    if cfg.kind == "stratified":
        return cfg.xsamples * cfg.ysamples
    if cfg.kind in ("lowdiscrepancy", "bestcandidate"):
        return round_size(cfg, cfg.pixelsamples)
    return cfg.pixelsamples


def _pixel_hash(px, py, seed=0):
    return rng.hash_u32(px, py, seed, 0xC0FFEE)


def camera_samples(cfg: SamplerConfig, px, py, s_idx, seed=0):
    """Camera-sample dimensions for lanes (px, py, sample index).

    Returns dict(image_x, image_y, lens_u, lens_v, time).
    """
    ph = _pixel_hash(px, py, seed)
    fx = px.astype(jnp.float32)
    fy = py.astype(jnp.float32)

    if cfg.kind == "stratified":
        xs, ys = cfg.xsamples, cfg.ysamples
        sx = (s_idx % xs).astype(jnp.float32)
        sy = (s_idx // xs).astype(jnp.float32)
        if cfg.jitter:
            jx = rng.uniform(ph, s_idx, 0)
            jy = rng.uniform(ph, s_idx, 1)
        else:
            jx = jy = jnp.full(px.shape, 0.5, jnp.float32)
        image_x = fx + (sx + jx) / xs
        image_y = fy + (sy + jy) / ys
        # Lens/time: per-pixel-shuffled strata (decorrelated from image).
        perm_l = _strat_shuffled(ph, s_idx, xs * ys, 2)
        perm_t = _strat_shuffled(ph, s_idx, xs * ys, 3)
        if cfg.jitter:
            lens_u = (perm_l + rng.uniform(ph, s_idx, 4)) / (xs * ys)
            lens_v = (perm_t + rng.uniform(ph, s_idx, 5)) / (xs * ys)
            time = (perm_l + rng.uniform(ph, s_idx, 6)) / (xs * ys)
        else:
            lens_u = (perm_l + 0.5) / (xs * ys)
            lens_v = (perm_t + 0.5) / (xs * ys)
            time = (perm_l + 0.5) / (xs * ys)
        return dict(image_x=image_x, image_y=image_y, lens_u=lens_u,
                    lens_v=lens_v, time=time)

    if cfg.kind == "random":
        return dict(
            image_x=fx + rng.uniform(ph, s_idx, 0),
            image_y=fy + rng.uniform(ph, s_idx, 1),
            lens_u=rng.uniform(ph, s_idx, 2),
            lens_v=rng.uniform(ph, s_idx, 3),
            time=rng.uniform(ph, s_idx, 4),
        )

    # Low-discrepancy (and bestcandidate): scrambled (0,2)-sequences.
    ix, iy = rng.ld_shuffled_2d(s_idx, ph, 0)
    lu, lv = rng.ld_shuffled_2d(s_idx, ph, 1)
    tm = rng.ld_shuffled_1d(s_idx, ph, 2)
    return dict(image_x=fx + ix, image_y=fy + iy, lens_u=lu, lens_v=lv,
                time=tm)


def _strat_shuffled(ph, s_idx, n, dim):
    """Pseudo-random permutation value: hash-based Feistel-lite shuffle of
    s_idx within [0, n) keyed on (pixel, dim)."""
    k = rng.hash_u32(ph, dim, 0x5EED)
    x = s_idx.astype(jnp.uint32)
    for r in range(3):
        x = (x + k) % jnp.uint32(max(n, 1))
        x = (x * jnp.uint32(2654435761) + rng.hash_u32(k, r)) % jnp.uint32(max(n, 1))
    return x.astype(jnp.float32)


def integrator_1d(cfg: SamplerConfig, px, py, s_idx, bounce, purpose, seed=0):
    """One integrator-requested 1D sample (Sample::oneD analogue)."""
    ph = _pixel_hash(px, py, seed)
    dim = rng.hash_u32(bounce, purpose, 0x1D)
    if cfg.kind in ("lowdiscrepancy", "bestcandidate", "stratified"):
        return rng.ld_shuffled_1d(s_idx, ph, dim)
    return rng.uniform(ph, s_idx, dim)


def integrator_2d(cfg: SamplerConfig, px, py, s_idx, bounce, purpose, seed=0):
    """One integrator-requested 2D sample (Sample::twoD analogue)."""
    ph = _pixel_hash(px, py, seed)
    dim = rng.hash_u32(bounce, purpose, 0x2D)
    if cfg.kind in ("lowdiscrepancy", "bestcandidate", "stratified"):
        return rng.ld_shuffled_2d(s_idx, ph, dim)
    return rng.uniform(ph, s_idx, dim, 0), rng.uniform(ph, s_idx, dim, 1)

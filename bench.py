"""Benchmark: rays/sec/chip on the flagship path-traced Cornell scene.

Runs on the default JAX backend (the real TPU chip under the driver).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md); the divisor
is a documented estimate of pbrt-v1 single-core throughput on a modern x86
for a comparable scene: 2.0e6 rays/s. Replace with a measured figure once
the reference builds in this image (OpenEXR 3.x headers need porting).
"""
import json
import time

import numpy as np

PBRT_V1_CPU_RAYS_PER_SEC_ESTIMATE = 2.0e6


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_scene
    from tpuprt import render as R
    from tpuprt.integrators import path as path_mod
    from tpuprt.cameras import cameras as cam_mod
    from tpuprt.samplers import samplers as smp

    xres = yres = 512
    scene = _flagship_scene(xres, yres)
    cfg = smp.SamplerConfig(kind="lowdiscrepancy", pixelsamples=4)
    opts = R.RenderOptions(xres=xres, yres=yres, sampler=cfg,
                           filter_kind="box", filter_xwidth=0.5,
                           filter_ywidth=0.5, integrator="path", max_depth=5,
                           chunk_size=1 << 17)
    n = opts.chunk_size

    def step(scene, px, py, si):
        cs = smp.camera_samples(cfg, px, py, si, 0)
        o, d, mint, maxt, _ = cam_mod.generate_rays(
            scene.camera, cs["image_x"], cs["image_y"], cs["lens_u"],
            cs["lens_v"], cs["time"], xres, yres)
        L, alpha, _t1, stats = path_mod.li(scene, o, d, mint, maxt, cfg,
                                           px, py, si, opts.max_depth, 0,
                                           collect_stats=True)
        return jnp.sum(L), stats["rays_traced"]

    jstep = jax.jit(step)

    spp = smp.samples_per_pixel(cfg)
    total = xres * yres * spp

    def make_batch(c):
        lin = np.arange(c * n, (c + 1) * n) % total
        si = (lin % spp).astype(np.int32)
        pix = lin // spp
        px = (pix % xres).astype(np.int32)
        py = (pix // xres).astype(np.int32)
        return jnp.asarray(px), jnp.asarray(py), jnp.asarray(si)

    # Warmup/compile.
    px, py, si = make_batch(0)
    s, r = jstep(scene, px, py, si)
    float(s)

    # Timed steady state.
    n_iters = 6
    rays = 0.0
    t0 = time.perf_counter()
    acc = None
    for c in range(n_iters):
        px, py, si = make_batch(c)
        s, r = jstep(scene, px, py, si)
        acc = s
        rays += float(r)
    float(acc)
    dt = time.perf_counter() - t0

    rps = rays / dt
    print(json.dumps({
        "metric": "rays_per_sec_per_chip",
        "value": round(rps, 1),
        "unit": "rays/s",
        "vs_baseline": round(rps / PBRT_V1_CPU_RAYS_PER_SEC_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Scaling-efficiency harness (BASELINE.md north star: >=85% rays/s/chip
retained at 1 chip -> 1 host -> N hosts).

Renders the flagship path-traced scene with the sample space sharded
over meshes of 1, 2, 4, ... N devices (fixed total work) and reports
rays/sec and per-device efficiency vs the 1-device run.

On real multi-chip hardware this measures ICI scaling; with
--cpu N it runs on N virtual CPU devices, which validates the sharding
machinery and collective layout but NOT real efficiency (the virtual
devices share the host's cores). The driver's single real chip gives the
1-chip baseline.

Prints one JSON line per mesh size.
"""
import argparse
import json
import math
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0,
                    help="use N virtual CPU devices instead of the "
                         "default backend")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=4)
    args = ap.parse_args()

    import os
    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpuprt_jax_cache" +
                      ("_cpu" if args.cpu else ""))

    from __graft_entry__ import _flagship_scene
    from tpuprt import render as R
    from tpuprt.parallel import shard
    from tpuprt.samplers.samplers import SamplerConfig

    xres = yres = args.res
    scene = _flagship_scene(xres, yres)
    opts = R.RenderOptions(
        xres=xres, yres=yres,
        sampler=SamplerConfig(kind="lowdiscrepancy",
                              pixelsamples=args.spp),
        filter_kind="box", filter_xwidth=0.5, filter_ywidth=0.5,
        integrator="path", max_depth=args.depth,
        chunk_size=1 << 14)
    total_samples = xres * yres * args.spp
    # Path rays per camera sample: 1 camera + per-bounce (intersect +
    # shadow + BSDF) — use the integrator's own counter for honesty.
    ndev_all = len(jax.devices())

    # --- Collective/sharding overhead at FIXED per-device work ---------
    # On virtual CPU devices the samples/s rows below decay ~1/N by
    # construction (the devices share the host's cores), so they validate
    # machinery, not efficiency. This probe isolates what CAN be measured
    # here: the cost of the collective itself. Each mesh size runs the
    # same per-device sample count twice — once with no cross-device
    # communication, once with a per-chunk film psum (the allreduce
    # shape of the gradient/film merges) — and reports the fraction of
    # wall time the collective adds.
    import jax.numpy as jnp
    import numpy as np_
    from jax.sharding import PartitionSpec as P
    from functools import partial as _p

    per_dev_samples = 1 << 12
    sizes = [1 << i for i in range(int(math.log2(ndev_all)) + 1)]
    for n in sizes:
        mesh = shard.make_mesh(n)
        axis = mesh.axis_names[0]
        k = per_dev_samples * n
        lin = np_.arange(k) % total_samples
        spp = args.spp
        px = jnp.asarray((lin // spp) % xres, jnp.int32)
        py = jnp.asarray((lin // spp) // xres % yres, jnp.int32)
        si = jnp.asarray(lin % spp, jnp.int32)
        valid = jnp.ones(k, bool)

        def body(sc, fdata, pxa, pya, sia, va, do_psum):
            from tpuprt.film import film as film_mod
            f = film_mod.Film(data=fdata[0], xres=xres, yres=yres,
                              crop=opts.crop)
            f = R.render_chunk(sc, opts, f, pxa, pya, sia, va)
            out = f.data
            if do_psum:
                out = jax.lax.psum(out, axis)
            return out[None]

        def make(do_psum):
            return jax.jit(_p(
                jax.shard_map, mesh=mesh,
                in_specs=(P(), P(axis), P(axis), P(axis), P(axis),
                          P(axis)),
                out_specs=P(axis))(
                    lambda sc, fd, a, b, c2, d: body(sc, fd, a, b, c2, d,
                                                     do_psum)))

        fdata = jnp.zeros((n, yres, xres, 5), jnp.float32)
        times = {}
        for name, fn in (("nocollective", make(False)),
                         ("psum", make(True))):
            out = fn(scene, fdata, px, py, si, valid)
            out.block_until_ready()            # compile warmup
            reps = 3
            t0 = time.time()
            for _ in range(reps):
                out = fn(scene, fdata, px, py, si, valid)
            out.block_until_ready()
            times[name] = (time.time() - t0) / reps
        ovh = max(times["psum"] - times["nocollective"], 0.0)
        print(json.dumps({
            "metric": "collective_overhead", "devices": n,
            "per_device_samples": per_dev_samples,
            "t_nocollective_s": round(times["nocollective"], 4),
            "t_psum_s": round(times["psum"], 4),
            "overhead_fraction": round(ovh / max(times["psum"], 1e-9), 4),
            "backend": jax.default_backend(),
            "virtual_cpu": bool(args.cpu),
            "note": "fixed per-device work; virtual CPU devices share "
                    "host cores, so only the collective delta is "
                    "meaningful here"}), flush=True)

    base_rate = None
    for n in sizes:
        mesh = shard.make_mesh(n)
        shard.render_sharded(scene, opts, mesh)           # compile warmup
        t0 = time.time()
        shard.render_sharded(scene, opts, mesh)
        dt = time.time() - t0
        rate = total_samples / dt
        per_dev = rate / n
        if base_rate is None:
            base_rate = per_dev
        eff = per_dev / base_rate
        print(json.dumps({
            "metric": "samples_per_sec", "devices": n,
            "value": round(rate, 1), "unit": "samples/s",
            "per_device": round(per_dev, 1),
            "efficiency_vs_1dev": round(eff, 4),
            "backend": jax.default_backend(),
            "virtual_cpu": bool(args.cpu)}), flush=True)


if __name__ == "__main__":
    main()

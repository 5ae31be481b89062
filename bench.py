"""Benchmarks: primary+shadow rays/sec on the BASELINE workloads.

Two workloads, both measured against the reference renderer built in this
image (pbrt-v1 from /root/reference with OpenEXR 3.x + hand-written
parser; see tools/build_reference.md):

  config3  scenes/bench3.pbrt — 256^2 x 32spp path-traced Cornell
           (10 tris + 3 quadrics, wavefront path driver).
           pbrt-v1: 7.726s, 2.114M camera + 3.363M shadow rays
           => 0.709M primary+shadow rays/s on one CPU core.

  config4  scenes/config4_big.pbrt — 512^2 x 4spp directlighting over a
           100K-triangle terrain (accelerator benchmark; our packet-
           traversal BVH vs the reference's kd-tree).
           pbrt-v1: 2.41s, 1.05M camera + 387K shadow rays
           => 0.596M primary+shadow rays/s on one CPU core.

The rays/s normalizer is the REFERENCE's measured ray count for the exact
workload divided by each renderer's wall time — throughput at equal work,
immune to counter-definition differences.

Prints ONE JSON line. The headline metric/value/vs_baseline is config3
(continuity with rounds 1-2); config4 is reported alongside as
config4_value / config4_vs_baseline.
"""
import json
import os
import time

# Measured on this image's CPU (single thread), 2026-08-20.
PBRT_CONFIG3_RAYS_PER_SEC = 0.709e6
PBRT_CONFIG4_RAYS_PER_SEC = 0.596e6
CONFIG3_REF_RAYS = 2.114e6 + 3.363e6
CONFIG4_REF_RAYS = 1.05e6 + 0.387e6


def bench_config3(here):
    import jax
    from tpuprt.scene.parser import load_scene
    from tpuprt.integrators import path_wavefront
    from tpuprt.utils.stats import StatsRegistry

    scene, opts = load_scene(os.path.join(here, "scenes", "bench3.pbrt"))
    opts = opts._replace(chunk_size=1 << 17)
    path_wavefront.render(scene, opts)           # warmup/compile
    stats = StatsRegistry()
    t0 = time.time()
    path_wavefront.render(scene, opts, stats=stats)
    dt = time.time() - t0
    return dt, stats


def bench_config4(here):
    from tpuprt.scene.parser import load_scene
    from tpuprt import render as R

    scene, opts = load_scene(os.path.join(here, "scenes",
                                          "config4_big.pbrt"))
    opts = opts._replace(chunk_size=1 << 17)
    R.render(scene, opts)                        # warmup/compile
    t0 = time.time()
    R.render(scene, opts)
    return time.time() - t0


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpuprt_jax_cache")
    here = os.path.dirname(os.path.abspath(__file__))

    dt3, stats = bench_config3(here)
    rate3 = CONFIG3_REF_RAYS / dt3
    shadow = stats.get("Wavefront", "Shadow rays traced")

    dt4 = bench_config4(here)
    rate4 = CONFIG4_REF_RAYS / dt4

    print(json.dumps({
        "metric": "primary+shadow rays/sec/chip (config3 Cornell path)",
        "value": round(rate3, 1),
        "unit": "rays/s",
        "vs_baseline": round(rate3 / PBRT_CONFIG3_RAYS_PER_SEC, 3),
        "wall_s": round(dt3, 3),
        "camera_rays": 256 * 256 * 32,
        "shadow_rays": int(shadow),
        "baseline_rays_per_sec": PBRT_CONFIG3_RAYS_PER_SEC,
        "config4_metric": "primary+shadow rays/sec/chip (config4_big "
                          "100K-tri terrain, packet-BVH)",
        "config4_value": round(rate4, 1),
        "config4_vs_baseline": round(rate4 / PBRT_CONFIG4_RAYS_PER_SEC, 3),
        "config4_wall_s": round(dt4, 3),
        "config4_baseline_rays_per_sec": PBRT_CONFIG4_RAYS_PER_SEC,
        "baseline_note": "pbrt-v1 measured on this image's CPU, same "
                         "scenes/counters (tools/build_reference.md)",
    }))


if __name__ == "__main__":
    main()

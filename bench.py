"""Benchmark: primary+shadow rays/sec on the BASELINE config-3 scene.

Runs the wavefront path tracer on scenes/config3.pbrt at 256x256 x 32spp
— the exact workload measured on the reference renderer in this image
(pbrt-v1 built from /root/reference with OpenEXR 3.x + hand-written
parser; see tools/build_reference.md):

    $ time bin/pbrt bench3.pbrt            # 256^2, 32 spp, path, maxdepth 5
    real 7.726s    Camera Rays Traced 2.114M    shadow rays 3.363M
    => (2.114M + 3.363M) / 7.726s = 0.709M primary+shadow rays/s (1 core)

vs_baseline divides by that measured figure (same scene, same counters:
camera samples + NEE shadow rays; our continuation rays are NOT counted,
matching pbrt's counter definitions).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import time

# Measured on this image's CPU (single thread), 2026-08-20.
PBRT_V1_MEASURED_RAYS_PER_SEC = 0.709e6


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpuprt_jax_cache")
    from tpuprt.scene.parser import load_scene
    from tpuprt.integrators import path_wavefront
    from tpuprt.utils.stats import StatsRegistry

    here = os.path.dirname(os.path.abspath(__file__))
    scene, opts = load_scene(os.path.join(here, "scenes", "bench3.pbrt"))
    opts = opts._replace(chunk_size=1 << 17)
    spp = 32
    total_samples = 256 * 256 * spp

    # Warmup (compiles the step); second run is the measurement.
    path_wavefront.render(scene, opts)
    stats = StatsRegistry()
    t0 = time.time()
    path_wavefront.render(scene, opts, stats=stats)
    dt = time.time() - t0

    # Rays/s normalizer: the REFERENCE's measured ray count for this
    # exact workload (2.114M camera + 3.363M shadow) divided by each
    # renderer's wall time — i.e., throughput at equal work, immune to
    # counter-definition differences (pbrt skips shadow rays whose f or
    # Li is black; the masked wavefront traces them all).
    REFERENCE_RAYS_THIS_WORKLOAD = 2.114e6 + 3.363e6
    shadow = stats.get("Wavefront", "Shadow rays traced")
    rate = REFERENCE_RAYS_THIS_WORKLOAD / dt
    print(json.dumps({
        "metric": "primary+shadow rays/sec/chip (config3 Cornell path)",
        "value": round(rate, 1),
        "unit": "rays/s",
        "vs_baseline": round(rate / PBRT_V1_MEASURED_RAYS_PER_SEC, 3),
        "wall_s": round(dt, 3),
        "camera_rays": total_samples,
        "shadow_rays": int(shadow),
        "baseline_rays_per_sec": PBRT_V1_MEASURED_RAYS_PER_SEC,
        "baseline_note": "pbrt-v1 measured on this image's CPU, same "
                         "scene/counters (tools/build_reference.md)",
    }))


if __name__ == "__main__":
    main()

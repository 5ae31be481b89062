import os
# Tests run on CPU with 8 virtual devices so sharding logic is exercised
# without a pod (the standard JAX fake-backend trick; SURVEY.md section 4).
# NOTE: the environment pins JAX_PLATFORMS=axon (real TPU via tunnel) and the
# env var cannot be overridden here — jax.config.update is the reliable path.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax
jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: wavefront graphs are large; recompiling them on
# every pytest run would dominate test time.
# Cache dir keyed on the host CPU's feature set: this VM migrates across
# heterogeneous machines between sessions, and XLA:CPU AOT entries from a
# different host abort/SIGILL on deserialize (observed as Fatal aborts in
# put_executable_and_time killing the whole pytest process).
import hashlib, platform, subprocess
try:
    flags = subprocess.run(["grep", "-m1", "flags", "/proc/cpuinfo"],
                           capture_output=True, text=True).stdout
except Exception:
    flags = platform.processor()
_hostkey = hashlib.sha1(flags.encode()).hexdigest()[:10]
# Per-xdist-worker cache dirs: two workers writing one cache dir is the
# prime suspect for the rare in-run worker crashes observed in
# backend_compile_and_load / the persistent-cache writer (the dying
# worker's current test reports as failed even though it passes alone
# and whole-file). Worker ids are stable (gw0/gw1), so each sub-cache
# still persists across runs.
_worker = os.environ.get("PYTEST_XDIST_WORKER", "main")
jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/tpuprt_jax_cache_cpu_{_hostkey}_{_worker}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

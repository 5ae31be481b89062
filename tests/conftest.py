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
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuprt_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

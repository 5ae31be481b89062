"""Sharded render + gradient psum on the 8-device virtual CPU mesh."""
import numpy as np
import jax

from __graft_entry__ import dryrun_multichip, entry


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    # Persistent-cache WRITES of the big 8-device sharded executable have
    # segfaulted inside jax's zstd serialization on this 2-CPU host
    # (put_executable_and_time, observed 2026-08-21, killing the whole
    # pytest process). Reads still hit; just don't write from this test.
    old = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    try:
        dryrun_multichip(8)
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          old)


def test_entry_compiles():
    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out.pixels)).all()

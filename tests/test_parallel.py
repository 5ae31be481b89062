"""Sharded render + gradient psum on the 8-device virtual CPU mesh."""
import numpy as np
import jax

from __graft_entry__ import dryrun_multichip, entry


def test_dryrun_multichip_8():
    # Run in a SUBPROCESS: compiling the big 8-device sharded gradient
    # program segfaults XLA:CPU when it happens deep inside a long pytest
    # process (observed 2026-08-21 in both backend_compile_and_load and
    # the persistent-cache write; the same compile passes reliably in a
    # fresh process — which is also how the driver invokes it).
    import os
    import subprocess
    import sys
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=8").strip()
    code = ("import jax; jax.config.update('jax_platforms', 'cpu');\n"
            "import __graft_entry__ as g; g.dryrun_multichip(8);\n"
            "print('DRYRUN_OK')")
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=900,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert r.returncode == 0 and "DRYRUN_OK" in r.stdout, \
        (r.returncode, r.stdout[-500:], r.stderr[-2000:])


def test_entry_compiles():
    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out.pixels)).all()

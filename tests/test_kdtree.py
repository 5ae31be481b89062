"""SAH kd-tree: native vs numpy build parity, traversal vs brute force."""
import numpy as np
import jax.numpy as jnp
import pytest

from tpuprt.accel import intersect as isect
from tpuprt.accel import kdtree as kd_mod
from tpuprt.accel.kdtree_build import build_kdtree, _build_native, \
    _build_numpy
from tpuprt.scene.build import SceneBuilder


def _tri_soup_scene(n_tris=200, seed=0, accel="none"):
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    mat = b.matte(kd=(0.5, 0.5, 0.5))
    c = rng.uniform(-1, 1, (n_tris, 1, 3))
    tri = c + rng.uniform(-0.08, 0.08, (n_tris, 3, 3))
    verts = tri.reshape(-1, 3).astype(np.float32)
    idx = np.arange(3 * n_tris).reshape(-1, 3)
    b.accel_kind = accel
    b.add_trianglemesh(np.eye(4), idx, verts, material=mat)
    return b.build()


def _rand_rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return (jnp.asarray(o), jnp.asarray(d),
            jnp.full((n,), 1e-3, jnp.float32), jnp.full((n,), 1e30,
                                                        jnp.float32))


def test_native_matches_numpy_build():
    scene = _tri_soup_scene(150)
    from tpuprt.accel.grid_build import _prim_bounds
    lo, hi = _prim_bounds(scene)
    nat = _build_native(lo, hi, 80.0, 1.0, 0.5, 1, -1)
    if nat is None:
        pytest.skip("native toolchain unavailable")
    ref = _build_numpy(lo.astype(np.float32), hi.astype(np.float32),
                       80.0, 1.0, 0.5, 1, -1)
    # Identical tree topology: same node columns and leaf prim lists.
    for a, b, name in zip(nat[:5], ref[:5],
                          ("flags", "split", "above", "nprims", "ids")):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_kdtree_vs_brute_force():
    brute = _tri_soup_scene(200, accel="none")
    assert brute.accel is None
    import dataclasses
    kscene = dataclasses.replace(brute, accel=build_kdtree(brute))
    o, d, mint, maxt = _rand_rays(512)
    t0, id0, hit0 = isect.intersect_ids(brute, o, d, mint, maxt)
    t1, id1, hit1 = kd_mod.intersect(kscene, o, d, mint, maxt)
    assert np.array_equal(np.asarray(hit0), np.asarray(hit1))
    h = np.asarray(hit0)
    assert np.array_equal(np.asarray(id0)[h], np.asarray(id1)[h])
    np.testing.assert_allclose(np.asarray(t0)[h], np.asarray(t1)[h],
                               rtol=1e-5)


def test_kdtree_any_hit():
    brute = _tri_soup_scene(200, accel="none")
    import dataclasses
    kscene = dataclasses.replace(brute, accel=build_kdtree(brute))
    o, d, mint, maxt = _rand_rays(512, seed=7)
    occ0 = isect.occluded(brute, o, d, mint, maxt)
    occ1 = isect.occluded(kscene, o, d, mint, maxt)
    assert np.array_equal(np.asarray(occ0), np.asarray(occ1))


def test_kdtree_quadrics_and_tris():
    b = SceneBuilder()
    mat = b.matte(kd=(0.5, 0.5, 0.5))
    rng = np.random.default_rng(3)
    for i in range(40):
        m = np.eye(4)
        m[:3, 3] = rng.uniform(-1, 1, 3)
        b.add_sphere(m, 0.1, material=mat)
    c = rng.uniform(-1, 1, (60, 1, 3))
    tri = c + rng.uniform(-0.1, 0.1, (60, 3, 3))
    b.accel_kind = "none"
    b.add_trianglemesh(np.eye(4), np.arange(180).reshape(-1, 3),
                       tri.reshape(-1, 3).astype(np.float32), material=mat)
    brute = b.build()
    import dataclasses
    kscene = dataclasses.replace(brute, accel=build_kdtree(brute))
    o, d, mint, maxt = _rand_rays(512, seed=9)
    t0, id0, hit0 = isect.intersect_ids(brute, o, d, mint, maxt)
    t1, id1, hit1 = kd_mod.intersect(kscene, o, d, mint, maxt)
    assert np.array_equal(np.asarray(hit0), np.asarray(hit1))
    h = np.asarray(hit0)
    np.testing.assert_allclose(np.asarray(t0)[h], np.asarray(t1)[h],
                               rtol=1e-4, atol=1e-5)

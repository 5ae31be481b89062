"""The Pallas brute-force path must match the jnp brute-force path at
the scene-intersection level (forced on via accel.intersect.force_pallas,
interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tpuprt.accel import intersect as isect
from tpuprt.scene.build import SceneBuilder


@pytest.fixture
def mesh_scene():
    r = np.random.default_rng(7)
    b = SceneBuilder()
    b.accel_kind = "none"
    m = b.matte(kd=(0.5, 0.5, 0.5))
    T = 300
    base = r.uniform(-3, 3, (T, 3)).astype(np.float32)
    verts = np.concatenate(
        [base, base + r.uniform(-0.5, 0.5, (T, 3)).astype(np.float32),
         base + r.uniform(-0.5, 0.5, (T, 3)).astype(np.float32)], axis=0)
    idx = np.stack([np.arange(T), np.arange(T) + T,
                    np.arange(T) + 2 * T], axis=1)
    b.add_trianglemesh(np.eye(4), idx, verts, material=m)
    from tpuprt.cameras import cameras as cam
    from tpuprt.core import transform as tf
    b.set_camera(cam.build_projective(
        0, np.asarray(tf.look_at([0, 0, -8], [0, 0, 0], [0, 1, 0])),
        np.asarray(tf.perspective(50.0, 1e-2, 100.0)),
        cam.default_screen_window(16, 16), 16, 16))
    return b.build()


def test_scene_intersect_pallas_vs_jnp(mesh_scene):
    r = np.random.default_rng(11)
    N = 400
    o = jnp.asarray(r.uniform(-4, 4, (N, 3)).astype(np.float32))
    dd = r.normal(size=(N, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    d = jnp.asarray(dd)
    mint = jnp.full(N, 1e-3)
    maxt = jnp.full(N, 1e30)

    old = isect.force_pallas
    try:
        isect.force_pallas = False
        t0, id0, hit0 = isect.intersect_ids(mesh_scene, o, d, mint, maxt)
        isect.force_pallas = True
        t1, id1, hit1 = isect.intersect_ids(mesh_scene, o, d, mint, maxt)
    finally:
        isect.force_pallas = old

    np.testing.assert_array_equal(np.asarray(hit0), np.asarray(hit1))
    h = np.asarray(hit0)
    np.testing.assert_allclose(np.asarray(t1)[h], np.asarray(t0)[h],
                               rtol=1e-6)
    assert (np.asarray(id0)[h] == np.asarray(id1)[h]).mean() > 0.99

"""Pallas dense Möller-Trumbore kernel vs the jnp all-pairs reference
(interpret mode on CPU; the same kernel compiles for TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpuprt.ops import mt_pallas
from tpuprt.shapes import triangle as tri_mod


def _random_tris(T, seed=0, spread=4.0):
    r = np.random.default_rng(seed)
    base = r.uniform(-spread, spread, (T, 3)).astype(np.float32)
    p0 = base
    p1 = base + r.uniform(-0.6, 0.6, (T, 3)).astype(np.float32)
    p2 = base + r.uniform(-0.6, 0.6, (T, 3)).astype(np.float32)
    return p0, p1, p2


def _random_rays(N, seed=1):
    r = np.random.default_rng(seed)
    o = r.uniform(-5, 5, (N, 3)).astype(np.float32)
    d = r.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    mint = np.full(N, 1e-3, np.float32)
    maxt = np.full(N, 1e30, np.float32)
    return o, d, mint, maxt


@pytest.mark.parametrize("N,T", [(64, 33), (256, 512), (300, 1000)])
def test_pallas_matches_jnp_bruteforce(N, T):
    p0, p1, p2 = _random_tris(T)
    o, d, mint, maxt = _random_rays(N)

    t_k, id_k, hit_k = mt_pallas.intersect_tris(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(mint),
        jnp.asarray(maxt), interpret=True)

    # jnp reference: all-pairs min.
    t_all, b1, b2, valid = tri_mod.intersect_pairs(
        p0[None], p1[None], p2[None],
        o[:, None], d[:, None], mint[:, None], maxt[:, None])
    t_all = np.where(np.asarray(valid), np.asarray(t_all), 1e30)
    ref_id = t_all.argmin(1)
    ref_t = t_all.min(1)
    ref_hit = ref_t < 1e30

    np.testing.assert_array_equal(np.asarray(hit_k), ref_hit)
    # Ties between coincident triangles may pick either index; compare t.
    np.testing.assert_allclose(np.asarray(t_k)[ref_hit], ref_t[ref_hit],
                               rtol=1e-6)
    same = np.asarray(id_k)[ref_hit] == ref_id[ref_hit]
    assert same.mean() > 0.99


def test_pallas_winner_t_is_differentiable():
    """Gradient w.r.t. a vertex translation must match the jnp path."""
    p0, p1, p2 = _random_tris(64, seed=3)
    o, d, mint, maxt = _random_rays(128, seed=4)

    def loss_pallas(shift):
        q0 = jnp.asarray(p0) + shift
        q1 = jnp.asarray(p1) + shift
        q2 = jnp.asarray(p2) + shift
        t, _id, hit = mt_pallas.intersect_tris(
            q0, q1, q2, jnp.asarray(o), jnp.asarray(d),
            jnp.asarray(mint), jnp.asarray(maxt), interpret=True)
        return jnp.sum(jnp.where(hit, t, 0.0))

    def loss_jnp(shift):
        q0 = jnp.asarray(p0) + shift
        q1 = jnp.asarray(p1) + shift
        q2 = jnp.asarray(p2) + shift
        t_all, _, _, valid = tri_mod.intersect_pairs(
            q0[None], q1[None], q2[None],
            jnp.asarray(o)[:, None], jnp.asarray(d)[:, None],
            jnp.asarray(mint)[:, None], jnp.asarray(maxt)[:, None])
        t_all = jnp.where(valid, t_all, 1e30)
        tmin = t_all.min(1)
        return jnp.sum(jnp.where(tmin < 1e30, tmin, 0.0))

    shift = jnp.zeros(3)
    g_k = jax.grad(loss_pallas)(shift)
    g_j = jax.grad(loss_jnp)(shift)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_j),
                               rtol=1e-4, atol=1e-6)


def test_empty_and_tiny():
    o, d, mint, maxt = _random_rays(8)
    p0, p1, p2 = _random_tris(1)
    t, idx, hit = mt_pallas.intersect_tris(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(mint),
        jnp.asarray(maxt), interpret=True)
    assert t.shape == (8,) and idx.shape == (8,)

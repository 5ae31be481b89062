"""Importance-sampled infinite light (lights/infinitesample.cpp:32-191):
CDF-table sampling with the sin(theta) Jacobian. Validates pdf normalization
by quadrature, sample/pdf estimator agreement with cosine sampling, and the
variance win on a concentrated HDR map."""
import numpy as np
import jax.numpy as jnp

from tpuprt.io.mipmap_build import build_pyramid
from tpuprt.lights import lights as lt
from tpuprt.scene.build import SceneBuilder


def _hot_spot_map(nu=32, nv=16, bg=0.01, hot=50.0):
    img = np.full((nv, nu, 3), bg, np.float32)
    img[4:6, 10:13] = hot          # small bright region (sun)
    return img


def _env_scene(importance):
    b = SceneBuilder()
    iid = b.add_image(build_pyramid(_hot_spot_map()), wrap=0)
    b.add_infinite_light(np.eye(4, dtype=np.float32), L=(1.0,) * 3,
                         image=iid, importance=importance)
    return b.build()


def _sphere_grid(nt=256, np_=512):
    """Quadrature grid over the sphere: directions + solid-angle weights."""
    theta = (np.arange(nt) + 0.5) * np.pi / nt
    phi = (np.arange(np_) + 0.5) * 2 * np.pi / np_
    T, P = np.meshgrid(theta, phi, indexing="ij")
    st = np.sin(T)
    d = np.stack([st * np.cos(P), st * np.sin(P), np.cos(T)], -1)
    w = st * (np.pi / nt) * (2 * np.pi / np_)
    return d.reshape(-1, 3).astype(np.float32), w.reshape(-1).astype(np.float32)


def test_env_importance_pdf_integrates_to_one():
    scene = _env_scene(importance=True)
    d, w = _sphere_grid()
    B = d.shape[0]
    lid = jnp.zeros((B,), jnp.int32)
    p = jnp.zeros((B, 3), jnp.float32)
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (B, 3))
    pdfs = np.asarray(lt.pdf(scene, lid, p, n, jnp.asarray(d)))
    total = float((pdfs * w).sum())
    assert abs(total - 1.0) < 2e-2, total


def test_env_importance_estimator_matches_quadrature():
    """E[Li |cos(n,wi)| / pdf] over importance samples must equal the
    quadrature integral of map * |cos| — and beat cosine sampling's
    variance on a concentrated map."""
    d, w = _sphere_grid()
    n_axis = np.asarray([0.0, 0.0, 1.0], np.float32)

    # Quadrature ground truth using the scene's own radiance lookup.
    scene_is = _env_scene(importance=True)
    B = d.shape[0]
    Lq = np.asarray(lt.env_radiance(scene_is, jnp.zeros((B,), jnp.int32),
                                    jnp.asarray(d)))[:, 0]
    truth = float((Lq * np.abs(d @ n_axis) * w).sum())

    rng = np.random.default_rng(7)
    N = 4096
    u1 = jnp.asarray(rng.random(N, np.float32))
    u2 = jnp.asarray(rng.random(N, np.float32))
    u3 = jnp.asarray(rng.random(N, np.float32))
    p = jnp.zeros((N, 3), jnp.float32)
    nrm = jnp.broadcast_to(jnp.asarray(n_axis), (N, 3))
    lid = jnp.zeros((N,), jnp.int32)

    ests = {}
    variances = {}
    for name, scene in (("is", scene_is), ("cos", _env_scene(False))):
        sm = lt.sample(scene, lid, p, nrm, u1, u2, u3)
        li = np.asarray(sm["Li"])[:, 0]
        pdf = np.asarray(sm["pdf"])
        wi = np.asarray(sm["wi"])
        ok = pdf > 0
        contrib = np.where(ok, li * np.abs(wi @ n_axis) /
                           np.maximum(pdf, 1e-20), 0.0)
        ests[name] = contrib.mean()
        variances[name] = contrib.var()

    assert abs(ests["is"] - truth) < 0.05 * truth, (ests["is"], truth)
    # Cosine sampling rarely hits the hot spot: looser mean tolerance but
    # it must still be in the right ballpark (unbiasedness).
    assert abs(ests["cos"] - truth) < 0.5 * truth, (ests["cos"], truth)
    # The whole point: importance sampling slashes variance.
    assert variances["is"] < 0.05 * variances["cos"], variances


def test_env_importance_sample_pdf_consistency():
    """pdf(wi) evaluated at sampled directions must match the pdf returned
    by sample() (Sample_L/Pdf agreement)."""
    scene = _env_scene(importance=True)
    rng = np.random.default_rng(3)
    N = 1024
    u1 = jnp.asarray(rng.random(N, np.float32))
    u2 = jnp.asarray(rng.random(N, np.float32))
    u3 = jnp.asarray(rng.random(N, np.float32))
    p = jnp.zeros((N, 3), jnp.float32)
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (N, 3))
    lid = jnp.zeros((N,), jnp.int32)
    sm = lt.sample(scene, lid, p, nrm, u1, u2, u3)
    pdf_s = np.asarray(sm["pdf"])
    pdf_e = np.asarray(lt.pdf(scene, lid, p, nrm, sm["wi"]))
    ok = pdf_s > 0
    # Texel-quantized evaluation vs continuous sample position: identical
    # up to the shared texel, so exact within float noise.
    np.testing.assert_allclose(pdf_e[ok], pdf_s[ok], rtol=5e-3)

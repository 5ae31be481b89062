"""Differentiability: jax.grad through the renderer vs central finite
differences (BASELINE.json config 5 / north star). Gradients w.r.t. material
albedo (texture constants), light intensity, and sphere translation."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tpuprt.core import transform as tf
from tpuprt.scene.build import SceneBuilder
from tpuprt.cameras import cameras as cam
from tpuprt.samplers.samplers import SamplerConfig
from tpuprt import render as R
from tpuprt.parallel.shard import render_loss_fn


def _scene(kd=(0.6, 0.3, 0.2), inten=30.0, cx=0.0):
    b = SceneBuilder()
    mat = b.matte(kd=kd)
    b.add_sphere(np.asarray(tf.translate([cx, 0.0, 0.0])), 1.0, material=mat)
    b.add_point_light(np.asarray(tf.translate([2.0, 2.0, -3.0])),
                      intensity=(inten,) * 3)
    c2w = np.asarray(tf.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]))
    xres = yres = 16
    b.set_camera(cam.build_projective(
        0, c2w, np.asarray(tf.perspective(45.0, 1e-2, 100.0)),
        cam.default_screen_window(xres, yres), xres, yres))
    return b.build()


_OPTS = R.RenderOptions(
    xres=16, yres=16,
    sampler=SamplerConfig(kind="stratified", xsamples=1, ysamples=1,
                          jitter=False),
    filter_kind="box", filter_xwidth=0.5, filter_ywidth=0.5,
    integrator="whitted", max_depth=0, chunk_size=256)


def _batch():
    lin = np.arange(256)
    return (jnp.asarray(lin % 16, jnp.int32), jnp.asarray(lin // 16, jnp.int32),
            jnp.zeros(256, jnp.int32))


def test_grad_albedo_matches_fd():
    px, py, si = _batch()
    target = jnp.zeros((16, 16, 3), jnp.float32)
    scene = _scene()

    def loss_of_scene(sc):
        return render_loss_fn(sc, _OPTS, px, py, si, target)

    g = jax.grad(loss_of_scene, allow_int=True)(scene)
    # Albedo lives in textures.fparams (constant node 0 holds Kd).
    g_kd = np.asarray(g.textures.fparams)[0, 0]  # d loss / d Kd red
    eps = 1e-3
    fp = np.asarray(scene.textures.fparams)
    up = fp.copy(); up[0, 0] += eps
    dn = fp.copy(); dn[0, 0] -= eps
    sc_up = dataclasses.replace(scene, textures=dataclasses.replace(
        scene.textures, fparams=jnp.asarray(up)))
    sc_dn = dataclasses.replace(scene, textures=dataclasses.replace(
        scene.textures, fparams=jnp.asarray(dn)))
    fd = (float(loss_of_scene(sc_up)) - float(loss_of_scene(sc_dn))) / (2 * eps)
    assert abs(g_kd - fd) < 0.02 * max(abs(fd), 1e-3), (g_kd, fd)


def test_grad_light_intensity_matches_fd():
    px, py, si = _batch()
    target = jnp.zeros((16, 16, 3), jnp.float32)
    scene = _scene()

    def loss_of_scene(sc):
        return render_loss_fn(sc, _OPTS, px, py, si, target)

    g = jax.grad(loss_of_scene, allow_int=True)(scene)
    g_I = np.asarray(g.lights.spectrum)[0, 0]
    eps = 1e-2
    sp = np.asarray(scene.lights.spectrum)
    up = sp.copy(); up[0, 0] += eps
    dn = sp.copy(); dn[0, 0] -= eps
    sc_up = dataclasses.replace(scene, lights=dataclasses.replace(
        scene.lights, spectrum=jnp.asarray(up)))
    sc_dn = dataclasses.replace(scene, lights=dataclasses.replace(
        scene.lights, spectrum=jnp.asarray(dn)))
    fd = (float(loss_of_scene(sc_up)) - float(loss_of_scene(sc_dn))) / (2 * eps)
    assert abs(g_I - fd) < 0.02 * max(abs(fd), 1e-4), (g_I, fd)


def test_grad_sphere_translation_interior():
    """Translation gradient at interior pixels (shading change, silhouette
    excluded — edge gradients need reparameterization, round 2)."""
    px, py, si = _batch()
    scene0 = _scene()
    # Target: the same scene shifted — gradient should point toward it.
    opts = _OPTS
    rgb_t, _ = R.render(_scene(cx=0.05), opts)
    target = jnp.asarray(rgb_t)

    def loss_of_cx(cx):
        sc = _scene()
        o2w = jnp.asarray(np.eye(4, dtype=np.float32)).at[0, 3].set(cx)
        w2o = jnp.asarray(np.eye(4, dtype=np.float32)).at[0, 3].set(-cx)
        quad = dataclasses.replace(
            sc.quadrics, o2w=o2w[None], w2o=w2o[None])
        sc = dataclasses.replace(sc, quadrics=quad)
        return render_loss_fn(sc, opts, px, py, si, target)

    g = float(jax.grad(loss_of_cx)(0.0))
    eps = 1e-2
    fd = (float(loss_of_cx(eps)) - float(loss_of_cx(-eps))) / (2 * eps)
    # Both should be negative (moving toward the target reduces loss) and
    # agree in magnitude up to the silhouette terms FD sees but AD doesn't.
    assert g < 0 and fd < 0
    assert abs(g - fd) < 0.5 * abs(fd) + 1e-3, (g, fd)


def test_grad_silhouette_matches_fd():
    """Silhouette/visibility gradient (VERDICT r2-r4 open item): a black
    occluder quad in front of a bright infinite background — the loss
    changes ONLY through which pixels the silhouette covers, which the
    interior (detached-sampling) estimator cannot see. Edge sampling
    (tpuprt.diff.silhouette) must recover it to FD accuracy."""
    from tpuprt.diff.silhouette import render_loss_with_silhouette

    xres = yres = 64

    def occluder_scene(cx):
        b = SceneBuilder()
        dark = b.matte(kd=(0.0, 0.0, 0.0))
        s = 0.6
        quad = np.asarray([[-s, -s, 1.0], [s, -s, 1.0],
                           [s, s, 1.0], [-s, s, 1.0]], np.float32)
        b.add_trianglemesh(np.eye(4), [[0, 1, 2], [0, 2, 3]], quad,
                           material=dark)
        b.add_infinite_light(np.eye(4), L=(1.0, 1.0, 1.0))
        c2w = np.asarray(tf.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]))
        b.set_camera(cam.build_projective(
            0, c2w, np.asarray(tf.perspective(45.0, 1e-2, 100.0)),
            cam.default_screen_window(xres, yres), xres, yres))
        sc = b.build()
        # theta enters through the mesh vertex positions.
        verts = sc.triangles.verts + jnp.asarray([1.0, 0.0, 0.0]) * cx
        return dataclasses.replace(
            sc, triangles=dataclasses.replace(sc.triangles, verts=verts))

    opts = _OPTS._replace(xres=xres, yres=yres, chunk_size=xres * yres)
    lin = np.arange(xres * yres)
    px = jnp.asarray(lin % xres, jnp.int32)
    py = jnp.asarray(lin // xres, jnp.int32)
    si = jnp.zeros(xres * yres, jnp.int32)

    rgb_t, _ = R.render(occluder_scene(0.2), opts._replace(driver="scan"))
    target = jnp.asarray(rgb_t)

    def loss_of_cx(cx):
        return render_loss_with_silhouette(
            occluder_scene(cx), opts, px, py, si, target,
            n_edge_samples=4096, seed=3)

    g = float(jax.grad(loss_of_cx)(0.0))
    eps = 5e-2
    fd = (float(loss_of_cx(eps)) - float(loss_of_cx(-eps))) / (2 * eps)
    # The interior gradient alone is ~0 here (flat radiance both sides);
    # everything must come from the boundary term.
    assert fd < -1e-3, fd     # loss decreases toward the target
    assert g < 0, (g, fd)
    assert abs(g - fd) < 0.25 * abs(fd), (g, fd)

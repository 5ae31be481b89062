"""Skip-link BVH: build invariants + traversal parity vs brute force."""
import numpy as np
import jax.numpy as jnp
import pytest

from tpuprt.scene.parser import load_scene_string
from tpuprt.accel import intersect as isect
from tpuprt.accel import bvh as bvh_mod
from tpuprt.accel.bvh_build import build_bvh
from tpuprt.scene.data import BvhAccel
import dataclasses


def _random_mesh_scene(ntri=400, seed=0):
    rng = np.random.default_rng(seed)
    tris = []
    for _ in range(ntri):
        c = rng.uniform(-1, 1, 3)
        v = c + rng.uniform(-0.08, 0.08, (3, 3))
        tris.append(v)
    pts = np.concatenate(tris).reshape(-1, 3)
    idx = np.arange(3 * ntri)
    body = "Shape \"trianglemesh\" \"integer indices\" [" + \
        " ".join(str(i) for i in idx) + "] \"point P\" [" + \
        " ".join(f"{x:.5f}" for x in pts.ravel()) + "]\n"
    txt = ("Film \"image\" \"integer xresolution\" [16] "
           "\"integer yresolution\" [16]\n"
           "Camera \"perspective\" \"float fov\" [60]\n"
           "WorldBegin\n"
           "Material \"matte\" \"color Kd\" [0.5 0.5 0.5]\n" + body +
           "WorldEnd\n")
    scene, opts = load_scene_string(txt)
    return scene


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-2.5, 2.5, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    mint = jnp.full((n,), 1e-3)
    maxt = jnp.full((n,), 1e30)
    return o, d, mint, maxt


def test_build_invariants():
    scene = _random_mesh_scene(100)
    bvh = build_bvh(scene)
    nodes = np.asarray(bvh.nodes)
    nn = bvh.n_nodes
    skip = nodes[:, 6].astype(int)
    nprims = nodes[:, 7].astype(int)
    assert (skip > np.arange(nn)).all() and (skip <= nn).all()
    assert (nprims <= bvh.leaf_k).all()
    ids = np.asarray(bvh.prim_ids)
    assert sorted(ids[ids >= 0].tolist()) == list(range(100))
    # Leaf-inlined prim ids mirror prim_ids.
    row_ids = nodes[:, 80:88].astype(int)
    leaf_rows = nprims > 0
    got = sorted(int(row_ids[i, j]) for i in np.where(leaf_rows)[0]
                 for j in range(nprims[i]))
    assert got == list(range(100))


def test_traversal_matches_brute_force():
    scene = _random_mesh_scene(400)
    bvh = build_bvh(scene)
    scene_bvh = dataclasses.replace(scene, accel=bvh)
    o, d, mint, maxt = _rays(512)
    t_ref, id_ref, hit_ref = isect._brute_force(scene, o, d, mint, maxt)
    t_b, id_b, hit_b = bvh_mod.intersect(scene_bvh, o, d, mint, maxt)
    assert (np.asarray(hit_b) == np.asarray(hit_ref)).all()
    m = np.asarray(hit_ref)
    np.testing.assert_allclose(np.asarray(t_b)[m], np.asarray(t_ref)[m],
                               rtol=2e-5, atol=2e-5)
    assert (np.asarray(id_b)[m] == np.asarray(id_ref)[m]).all()


def test_any_hit_agrees():
    scene = _random_mesh_scene(400, seed=3)
    scene_bvh = dataclasses.replace(scene, accel=build_bvh(scene))
    o, d, mint, _ = _rays(512, seed=4)
    maxt = jnp.full((512,), 1.5)
    _, _, hit_ref = isect._brute_force(scene, o, d, mint, maxt)
    _, _, hit_b = bvh_mod.intersect(scene_bvh, o, d, mint, maxt,
                                    any_hit=True)
    assert (np.asarray(hit_b) == np.asarray(hit_ref)).all()


def test_mixed_quadric_scene():
    txt = ("Film \"image\" \"integer xresolution\" [16] "
           "\"integer yresolution\" [16]\n"
           "Camera \"perspective\" \"float fov\" [60]\n"
           "Accelerator \"bvh\"\n"
           "WorldBegin\n"
           "Material \"matte\" \"color Kd\" [0.5 0.5 0.5]\n"
           "AttributeBegin\n"
           "  Translate -0.5 0 2\n"
           "  Shape \"sphere\" \"float radius\" [0.4]\n"
           "AttributeEnd\n"
           "Shape \"trianglemesh\" \"integer indices\" [0 1 2]\n"
           "  \"point P\" [0.2 -0.5 2  1.2 -0.5 2  0.7 0.6 2]\n"
           "WorldEnd\n")
    scene, opts = load_scene_string(txt)
    assert isinstance(scene.accel, BvhAccel)
    scene_nb = dataclasses.replace(scene, accel=None)
    o, d, mint, maxt = _rays(256, seed=7)
    t_ref, id_ref, hit_ref = isect._brute_force(scene_nb, o, d, mint, maxt)
    t_b, id_b, hit_b = isect.intersect_ids(scene, o, d, mint, maxt)
    assert (np.asarray(hit_b) == np.asarray(hit_ref)).all()
    m = np.asarray(hit_ref)
    np.testing.assert_allclose(np.asarray(t_b)[m], np.asarray(t_ref)[m],
                               rtol=2e-5, atol=2e-5)


def test_packet_pallas_matches_loop_traversal():
    """The Pallas packet-traversal kernel (interpret mode on CPU) must
    agree with the jnp link-walk on hits, ids, and t."""
    from tpuprt.accel import bvh as bvh_mod

    scene = _random_mesh_scene(500, seed=11)
    scene_bvh = dataclasses.replace(scene, accel=build_bvh(scene))
    o, d, mint, maxt = _rays(700, seed=12)
    old = bvh_mod.force_pallas
    try:
        bvh_mod.force_pallas = False
        t_ref, id_ref, hit_ref = bvh_mod.intersect(scene_bvh, o, d, mint,
                                                   maxt)
        bvh_mod.force_pallas = True
        t_k, id_k, hit_k = bvh_mod.intersect(scene_bvh, o, d, mint, maxt)
    finally:
        bvh_mod.force_pallas = old
    assert (np.asarray(hit_k) == np.asarray(hit_ref)).all()
    m = np.asarray(hit_ref)
    assert (np.asarray(id_k)[m] == np.asarray(id_ref)[m]).all()
    np.testing.assert_allclose(np.asarray(t_k)[m], np.asarray(t_ref)[m],
                               rtol=2e-5, atol=2e-5)
    # any-hit agreement too.
    try:
        bvh_mod.force_pallas = False
        _, _, h_ref = bvh_mod.intersect(scene_bvh, o, d, mint,
                                        jnp.full((700,), 1.2),
                                        any_hit=True)
        bvh_mod.force_pallas = True
        _, _, h_k = bvh_mod.intersect(scene_bvh, o, d, mint,
                                      jnp.full((700,), 1.2), any_hit=True)
    finally:
        bvh_mod.force_pallas = old
    assert (np.asarray(h_k) == np.asarray(h_ref)).all()


def test_chunked_traversal_matches_single_table():
    """traverse_chunked (streamed HBM node chunks, VERDICT r3 item 3) must
    agree exactly with the VMEM-resident kernel: arbitrary contiguous
    preorder ranges are walkable because the skip-walk cursor is
    monotonically increasing."""
    import jax.numpy as jnp
    from tpuprt.ops import bvh_pallas
    scene = _random_mesh_scene(400)
    bvh = build_bvh(scene)
    o, d, mint, maxt = _rays(4096)
    rays = jnp.concatenate([o.T, d.T, mint[None], maxt[None]], axis=0)
    nodes = jnp.pad(bvh.nodes, ((0, 0), (0, 128 - bvh.nodes.shape[1])))
    t1, i1 = bvh_pallas.traverse(nodes, rays, nn=bvh.n_nodes,
                                 leaf_k=bvh.leaf_k, interpret=True)
    # cap=64 forces several chunks on this small tree.
    t2, i2 = bvh_pallas.traverse_chunked(nodes, rays, nn=bvh.n_nodes,
                                         leaf_k=bvh.leaf_k, interpret=True,
                                         cap=64)
    assert (np.asarray(i1) == np.asarray(i2)).all()
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2),
                               rtol=1e-5, atol=1e-5)
    _, ia = bvh_pallas.traverse_chunked(nodes, rays, nn=bvh.n_nodes,
                                        leaf_k=bvh.leaf_k, any_hit=True,
                                        interpret=True, cap=64)
    assert ((np.asarray(ia) >= 0) == (np.asarray(i1) >= 0)).all()

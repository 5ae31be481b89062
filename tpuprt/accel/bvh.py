"""Device-side wide skip-link BVH traversal.

TPU-native replacement for the reference's accelerator traversals
(/root/reference/accelerators/kdtree.cpp:313-402, grid.cpp:239-284). See
accel/bvh_build.py for the structure and the measured hardware rationale.
Per while-iteration every lane does:

    row  = nodes[node]               (the ONLY gather: f32[N,96])
    hit  = slab test vs [mint, min(maxt, best_t)]
    leaf?  LEAF_K unrolled Moller-Trumbore tests on the row's inlined
           triangle vertices — zero additional gathers
    node = hit & ~leaf ? node + 1 : skip       (preorder link-walk)

No stack, no restart; termination when every lane's node reaches the
sentinel NN. Mixed quadric scenes swap the inlined-triangle test for the
generic per-prim tester (extra gathers — the quadric count is tiny in any
scene big enough to carry a BVH). Like the grid/kd paths, traversal runs
detached and the winning prim's t is recomputed differentiably.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import vecmath as vm
from ..scene.data import BvhAccel, SceneData

_BIG = jnp.float32(1e30)

# Packet-traversal Pallas kernel (ops/bvh_pallas.py): the default on TPU
# for quadric-free scenes. None = auto by backend; True/False = override
# (read at trace time — set before the first render of a given shape).
force_pallas = None


def _use_pallas(nq: int) -> bool:
    if force_pallas is not None:
        return force_pallas and nq == 0
    return nq == 0 and jax.default_backend() == "tpu"


def _mt_rows(row, j, o, d, mint, maxt):
    """Moller-Trumbore against the j-th inlined triangle of a leaf row."""
    base = 8 + 9 * j
    p0 = row[..., base + 0:base + 3]
    p1 = row[..., base + 3:base + 6]
    p2 = row[..., base + 6:base + 9]
    e1 = p1 - p0
    e2 = p2 - p0
    s1 = vm.cross(d, e2)
    div = vm.dot(s1, e1)
    ok = jnp.abs(div) > 1e-12
    inv = 1.0 / jnp.where(ok, div, 1.0)
    s = o - p0
    b1 = vm.dot(s, s1) * inv
    s2 = vm.cross(s, e1)
    b2 = vm.dot(d, s2) * inv
    t = vm.dot(e2, s2) * inv
    valid = ok & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0) & \
        (t > mint) & (t < maxt)
    return t, valid


def intersect(scene: SceneData, o, d, mint, maxt, any_hit: bool = False,
              sort: bool = True):
    """Nearest-hit (t, prim_id, hit); any_hit short-circuits (IntersectP)."""
    bvh: BvhAccel = scene.accel
    o_d, d_d, mint_d, maxt_d = o, d, mint, maxt
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    mint = jax.lax.stop_gradient(mint)
    maxt = jax.lax.stop_gradient(maxt)
    n = o.shape[0]
    nn = bvh.n_nodes
    nq = bvh.n_quadrics

    if _use_pallas(nq):
        from ..ops import bvh_pallas
        interp = jax.default_backend() != "tpu"
        _, best_id, hit = bvh_pallas.intersect(bvh, o, d, mint, maxt,
                                               any_hit=any_hit,
                                               interpret=interp,
                                               sort=sort)
        from .grid import _test_prims
        t_diff, valid = _test_prims(scene, jnp.maximum(best_id, 0), o_d,
                                    d_d, mint_d, maxt_d * 0 + _BIG, hit)
        t_out = jnp.where(hit & valid, t_diff, _BIG)
        return t_out, best_id, hit

    d_safe = jnp.where(jnp.abs(d) < 1e-12,
                       jnp.where(d < 0, -1e-12, 1e-12), d)
    inv_d = 1.0 / d_safe

    def cond(state):
        return jnp.any(state[3])

    def body(state):
        node, best_t, best_id, active = state
        row = bvh.nodes[jnp.minimum(node, nn - 1)]        # [N, 96]
        lo = row[..., 0:3]
        hi = row[..., 3:6]
        skip = row[..., 6].astype(jnp.int32)
        nprims = row[..., 7].astype(jnp.int32)

        # Slab test against the advancing window [mint, min(maxt, best_t)].
        tlo = (lo - o) * inv_d
        thi = (hi - o) * inv_d
        t0 = jnp.maximum(jnp.max(jnp.minimum(tlo, thi), -1), mint)
        t1 = jnp.minimum(jnp.min(jnp.maximum(tlo, thi), -1),
                         jnp.minimum(maxt, best_t) * (1.0 + 1e-6))
        hit_box = (t0 <= t1) & active

        is_leaf = nprims > 0
        do_leaf = hit_box & is_leaf
        for j in range(bvh.leaf_k):
            in_rng = do_leaf & (j < nprims)
            pid = row[..., 80 + j].astype(jnp.int32)
            if nq == 0:
                t, valid = _mt_rows(row, j, o, d, mint,
                                    jnp.minimum(maxt, best_t))
                valid = valid & in_rng
            else:
                from .grid import _test_prims
                t, valid = _test_prims(scene, jnp.maximum(pid, 0), o, d,
                                       mint, jnp.minimum(maxt, best_t),
                                       in_rng)
            upd = valid & (t < best_t)
            best_t = jnp.where(upd, t, best_t)
            best_id = jnp.where(upd, pid, best_id)

        descend = hit_box & ~is_leaf
        node = jnp.where(descend, node + 1, skip)
        active = active & (node < nn)
        if any_hit:
            active = active & ~(best_id >= 0)
        return node, best_t, best_id, active

    init = (jnp.zeros((n,), jnp.int32), jnp.full((n,), _BIG),
            jnp.full((n,), -1, jnp.int32), jnp.ones((n,), bool))
    _, best_t, best_id, _ = jax.lax.while_loop(cond, body, init)
    hit = best_id >= 0

    # Differentiable recompute of the winning prim's t (same estimator as
    # the grid/kd paths).
    from .grid import _test_prims
    t_diff, valid = _test_prims(scene, jnp.maximum(best_id, 0), o_d, d_d,
                                mint_d, maxt_d * 0 + _BIG, hit)
    t_out = jnp.where(hit & valid, t_diff, _BIG)
    return t_out, best_id, hit

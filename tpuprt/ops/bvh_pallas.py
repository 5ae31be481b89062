"""Pallas TPU kernel: packet traversal of the wide skip-link BVH.

The jnp traversal (accel/bvh.py) is one XLA op dispatch per visited node
— a per-lane gather plus loop bookkeeping — and dispatch overhead on a
remote v5e is ~0.3-0.5 ms, so a 100K-triangle scene costs seconds per
launch regardless of ray count. This kernel runs the ENTIRE walk inside
one Pallas program:

  * the packed node table (accel/bvh_build.py rows, padded to 128 floats)
    is VMEM-resident for the whole launch (~12 MB at 100K tris);
  * rays are processed in PACKETS of RT lanes; the node cursor is a
    single SCALAR per packet (classic packet traversal): the packet
    descends when ANY of its rays hits the child window, and each ray
    only accumulates hits its own window admits, so per-ray results are
    exact — coherence only affects speed;
  * a node visit is a VMEM row load + a vectorized slab test; leaves run
    LEAF_K unrolled Moller-Trumbore tests on the row's inlined triangles.

No gathers, no per-iteration dispatch: the per-visit cost is ~0.2 us of
VPU work instead of ~0.5 ms of XLA scheduling.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

_BIG = 1e30
# Rays per packet WALK (the serial skip-link loop's vector width). The
# packet's per-visit vector math runs on (PACKET//128, 128) tiles; 1024 is
# exactly one (8,128) f32 vreg per component — the smallest whole-vreg
# packet Mosaic lowers ((1,N)->(sub,128) reshapes need sub % 8 == 0).
# Smaller packets visit SMALLER node-set unions (a packet walks the union
# of its rays' paths, so every extra ray can only widen it); the r4 A/B
# that picked 2048 was dominated by per-grid-step pipeline fixed costs,
# which the r5 super-block restructure amortizes over an in-kernel
# fori_loop — after it, 1024 wins (r5 A/B on config4_big full render:
# sub 1024 -> 0.64s, 2048 -> 0.71s).
PACKET = 1024
# Rays per GRID STEP of the single-table kernel: an (8, SUPER) ray block
# is DMA'd per step and an in-kernel loop walks it PACKET rays at a time.
SUPER = 32768
# Back-compat padding quantum (stack-kernel flavor still uses 256-ray
# packets; callers pad ray counts to RAY_TILE multiples).
RAY_TILE = 2048


def _ray_regs(r, tile):
    """Unpack an (8, tile) ray block into full-sublane (tile//128, 128)
    component tiles + precomputed safe inverse directions."""
    sub = tile // 128

    def comp(i):
        # (1, tile) -> (sub, 128): ray j of the packet sits at
        # [j // 128, j % 128] — full-sublane VPU tiles.
        return r[i:i + 1, :].reshape(sub, 128)

    ox, oy, oz = comp(0), comp(1), comp(2)
    dx, dy, dz = comp(3), comp(4), comp(5)
    mint, maxt = comp(6), comp(7)

    def safe_inv(v):
        tiny = jnp.where(v < 0, -1e-12, 1e-12)
        return 1.0 / jnp.where(jnp.abs(v) < 1e-12, tiny, v)

    return dict(o=(ox, oy, oz), d=(dx, dy, dz), mint=mint, maxt=maxt,
                inv=(safe_inv(dx), safe_inv(dy), safe_inv(dz)))


def _walk_range(nodes_ref, regs, start, stop, base, best_t, best_id, *,
                leaf_k: int, any_hit: bool, counts=None):
    """Skip-link walk of preorder node ids in [start, stop), with rows
    stored at nodes_ref[node - base]. The walk's cursor is monotonically
    increasing (node' = node+1 or skip > node), which is what makes
    arbitrary contiguous range chunking correct: every leaf in the range
    is visited or pruned by a failed ancestor bbox test, independent of
    how the tree is cut (see traverse_chunked).

    counts: optional (n_interior, n_leaf) i32 scalars — per-visit counters
    for the roofline/utilization accounting (PERF_NOTES.md); None skips
    them at trace time (zero cost in production kernels)."""
    from jax.experimental import pallas as pl
    ox, oy, oz = regs["o"]
    dx, dy, dz = regs["d"]
    ix, iy, iz = regs["inv"]
    mint, maxt = regs["mint"], regs["maxt"]

    def cond(c):
        node, best_t, best_id = c[0], c[1], c[2]
        go = node < stop
        if any_hit:
            go = go & jnp.any(best_id < 0)
        return go

    def body(c):
        node, best_t, best_id = c[0], c[1], c[2]
        row = nodes_ref[pl.ds(node - base, 1), :]    # (1, 128)
        rv = row.reshape(-1)                          # (128,)
        lox, loy, loz = rv[0], rv[1], rv[2]
        hix, hiy, hiz = rv[3], rv[4], rv[5]
        skip = rv[6].astype(jnp.int32)
        nprims = rv[7].astype(jnp.int32)

        # Slab test, window clipped by each ray's running best.
        tx0 = (lox - ox) * ix
        tx1 = (hix - ox) * ix
        ty0 = (loy - oy) * iy
        ty1 = (hiy - oy) * iy
        tz0 = (loz - oz) * iz
        tz1 = (hiz - oz) * iz
        t0 = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                     jnp.minimum(ty0, ty1)),
                         jnp.maximum(jnp.minimum(tz0, tz1), mint))
        t1 = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                     jnp.maximum(ty0, ty1)),
                         jnp.minimum(jnp.maximum(tz0, tz1),
                                     jnp.minimum(maxt, best_t) *
                                     (1.0 + 1e-6)))
        hit_box = t0 <= t1
        if any_hit:
            hit_box = hit_box & (best_id < 0)
        any_ray = jnp.any(hit_box)
        is_leaf = nprims > 0

        def leaf_fn(args):
            bt, bi = args
            for j in range(leaf_k):
                bj = 8 + 9 * j
                p0x, p0y, p0z = rv[bj], rv[bj + 1], rv[bj + 2]
                p1x, p1y, p1z = rv[bj + 3], rv[bj + 4], rv[bj + 5]
                p2x, p2y, p2z = rv[bj + 6], rv[bj + 7], rv[bj + 8]
                pid = rv[80 + j].astype(jnp.int32)
                e1x, e1y, e1z = p1x - p0x, p1y - p0y, p1z - p0z
                e2x, e2y, e2z = p2x - p0x, p2y - p0y, p2z - p0z
                s1x = dy * e2z - dz * e2y
                s1y = dz * e2x - dx * e2z
                s1z = dx * e2y - dy * e2x
                div = s1x * e1x + s1y * e1y + s1z * e1z
                ok = jnp.abs(div) > 1e-12
                inv = 1.0 / jnp.where(ok, div, 1.0)
                sx, sy, sz = ox - p0x, oy - p0y, oz - p0z
                b1 = (sx * s1x + sy * s1y + sz * s1z) * inv
                s2x = sy * e1z - sz * e1y
                s2y = sz * e1x - sx * e1z
                s2z = sx * e1y - sy * e1x
                b2 = (dx * s2x + dy * s2y + dz * s2z) * inv
                t = (e2x * s2x + e2y * s2y + e2z * s2z) * inv
                valid = ok & (b1 >= 0.0) & (b2 >= 0.0) & \
                    (b1 + b2 <= 1.0) & (t > mint) & \
                    (t < jnp.minimum(maxt, bt)) & (j < nprims) & \
                    (pid >= 0)
                if any_hit:
                    valid = valid & (bi < 0)
                upd = valid & (t < bt)
                bt = jnp.where(upd, t, bt)
                bi = jnp.where(upd, pid, bi)
            return bt, bi

        best_t, best_id = jax.lax.cond(any_ray & is_leaf, leaf_fn,
                                       lambda a: a, (best_t, best_id))
        node = jnp.where(any_ray & ~is_leaf, node + 1, skip)
        if counts is None:
            return (node, best_t, best_id)
        # c[3]: node visits (row fetch + slab test, whether or not the
        # packet descends); c[4]: leaf executions (LEAF_K MT test blocks).
        n_vis = c[3] + 1
        n_leaf = c[4] + (any_ray & is_leaf).astype(jnp.int32)
        return (node, best_t, best_id, n_vis, n_leaf)

    init = (start, best_t, best_id)
    if counts is not None:
        init = init + tuple(counts)
    out = jax.lax.while_loop(cond, body, init)
    if counts is None:
        return out[1], out[2]
    return out[1], out[2], (out[3], out[4])


def _counts_row(n_vis, n_leaf, n_pkt):
    """Pack per-step counter scalars into an (8, 128) i32 tile: lane 0 =
    node visits, lane 1 = leaf executions, lane 2 = packets walked
    (broadcast over sublanes; readers take [..., 0, :3])."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    return jnp.where(lane == 0, n_vis,
                     jnp.where(lane == 1, n_leaf,
                               jnp.where(lane == 2, n_pkt, 0)))


def _kernel(nodes_ref, rays_ref, t_ref, id_ref, *, nn: int, leaf_k: int,
            any_hit: bool, super_: int, sub: int, counts_ref=None):
    """One SUPER-block step: fori_loop over `sub`-ray packets, each walking
    the whole (VMEM-resident) node table. The in-kernel loop amortizes the
    per-grid-step pipeline fixed cost that used to be paid per packet,
    letting packets shrink to one vreg (smaller node-set unions -> fewer
    wasted leaf tests)."""
    from jax.experimental import pallas as pl
    nsub = super_ // sub

    def body(i, cnt):
        r = rays_ref[:, pl.ds(i * sub, sub)]
        regs = _ray_regs(r, sub)
        init_t = jnp.full(regs["mint"].shape, _BIG, jnp.float32)
        init_id = jnp.full(regs["mint"].shape, -1, jnp.int32)
        # Pure-padding packets carry empty windows (mint 1 > maxt -1):
        # their slab tests fail at the root and the walk skips to the
        # sentinel in O(root fanout) iterations — no special-casing.
        kw = dict(leaf_k=leaf_k, any_hit=any_hit)
        if counts_ref is None:
            best_t, best_id = _walk_range(
                nodes_ref, regs, jnp.int32(0), nn, jnp.int32(0),
                init_t, init_id, **kw)
        else:
            best_t, best_id, (nv, nl) = _walk_range(
                nodes_ref, regs, jnp.int32(0), nn, jnp.int32(0),
                init_t, init_id, counts=(cnt[0], cnt[1]), **kw)
            cnt = (nv, nl)
        t_ref[:, pl.ds(i * sub, sub)] = best_t.reshape(1, sub)
        id_ref[:, pl.ds(i * sub, sub)] = best_id.reshape(1, sub)
        return cnt

    cnt = jax.lax.fori_loop(0, nsub, body,
                            (jnp.int32(0), jnp.int32(0)))
    if counts_ref is not None:
        counts_ref[:] = _counts_row(cnt[0], cnt[1],
                                    jnp.int32(nsub)).reshape(1, 8, 128)


def _kernel_chunked(cb_ref, nodes_ref, rays_ref, t_ref, id_ref, *,
                    nn: int, cap: int, leaf_k: int, any_hit: bool,
                    super_: int, sub: int, counts_ref=None):
    """One (ray-super-block, chunk) grid step of the streamed traversal,
    chunks minor: the node table lives in HBM; the pipeline DMAs chunk
    c's (cap, 128) block into VMEM while chunk c-1 computes (auto double-
    buffering). The ray block's index map depends only on the super-block
    dimension, so each (8, super_) ray block is fetched ONCE per row of
    chunk steps — total node-table traffic is supers x table (the r4
    layout re-streamed the full table once per 4096-ray group: 16-32x the
    bytes). An in-kernel fori_loop walks the chunk `sub` rays at a time;
    best_t/best_id persist in the output block across the chunk dimension
    (out index_map ignores it). cb_ref: f32[n_chunks_pad, 8] per-chunk
    bbox (lo, hi, pad2) — a failed packet-vs-chunk-bbox test skips that
    packet's chunk walk."""
    from jax.experimental import pallas as pl
    c = pl.program_id(1)
    lo_c = c * cap
    hi_c = jnp.minimum(jnp.int32(nn), lo_c + cap)
    nsub = super_ // sub

    @pl.when(c == 0)
    def _():
        t_ref[:] = jnp.full((1, super_), _BIG, jnp.float32)
        id_ref[:] = jnp.full((1, super_), -1, jnp.int32)
        if counts_ref is not None:
            counts_ref[:] = jnp.zeros((1, 8, 128), jnp.int32)

    cb = cb_ref[c, :]

    def body(i, cnt):
        r = rays_ref[:, pl.ds(i * sub, sub)]
        regs = _ray_regs(r, sub)
        best_t = t_ref[:, pl.ds(i * sub, sub)].reshape(sub // 128, 128)
        best_id = id_ref[:, pl.ds(i * sub, sub)].reshape(sub // 128, 128)

        # Chunk bbox precheck against every ray's current window.
        ox, oy, oz = regs["o"]
        ix, iy, iz = regs["inv"]
        tx0 = (cb[0] - ox) * ix
        tx1 = (cb[3] - ox) * ix
        ty0 = (cb[1] - oy) * iy
        ty1 = (cb[4] - oy) * iy
        tz0 = (cb[2] - oz) * iz
        tz1 = (cb[5] - oz) * iz
        t0 = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                     jnp.minimum(ty0, ty1)),
                         jnp.maximum(jnp.minimum(tz0, tz1), regs["mint"]))
        t1 = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                     jnp.maximum(ty0, ty1)),
                         jnp.minimum(jnp.maximum(tz0, tz1),
                                     jnp.minimum(regs["maxt"], best_t) *
                                     (1.0 + 1e-6)))
        enter = jnp.any(t0 <= t1) & (lo_c < nn)
        if any_hit:
            enter = enter & jnp.any(best_id < 0)

        if counts_ref is None:
            def walk(args):
                bt, bi = args
                return _walk_range(nodes_ref, regs, lo_c, hi_c, lo_c,
                                   bt, bi, leaf_k=leaf_k, any_hit=any_hit)
            best_t, best_id = jax.lax.cond(enter, walk, lambda a: a,
                                           (best_t, best_id))
        else:
            def walk_c(args):
                bt, bi, ci, cl = args
                bt, bi, (ci, cl) = _walk_range(
                    nodes_ref, regs, lo_c, hi_c, lo_c, bt, bi,
                    leaf_k=leaf_k, any_hit=any_hit, counts=(ci, cl))
                return bt, bi, ci, cl
            best_t, best_id, ci, cl = jax.lax.cond(
                enter, walk_c, lambda a: a,
                (best_t, best_id, cnt[0], cnt[1]))
            cnt = (ci, cl, cnt[2] + enter.astype(jnp.int32))
        t_ref[:, pl.ds(i * sub, sub)] = best_t.reshape(1, sub)
        id_ref[:, pl.ds(i * sub, sub)] = best_id.reshape(1, sub)
        return cnt

    cnt = jax.lax.fori_loop(0, nsub, body,
                            (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
    if counts_ref is not None:
        counts_ref[:] = counts_ref[:] + _counts_row(
            cnt[0], cnt[1], cnt[2]).reshape(1, 8, 128)


STACK = 256


def _kernel_stack(nodes_ref, rays_ref, t_ref, id_ref, stack_ref, *,
                  nn: int, leaf_k: int, any_hit: bool):
    """Ordered packet traversal: per-packet scalar stack in SMEM, children
    visited NEAR-FIRST by XORing their 3-bit Morton rank with the packet's
    direction signs along the node's split axes (the classic Z-order
    descent trick). Near-first visiting tightens best_t early, so grazing
    rays prune the far side of the scene instead of walking it — the
    skip-link walk's fixed Morton order visited up to the whole crossed
    strip for horizon rays."""
    from jax.experimental import pallas as pl

    r = rays_ref[:]
    ox, oy, oz = r[0:1, :], r[1:2, :], r[2:3, :]
    dx, dy, dz = r[3:4, :], r[4:5, :], r[5:6, :]
    mint, maxt = r[6:7, :], r[7:8, :]

    def safe_inv(v):
        tiny = jnp.where(v < 0, -1e-12, 1e-12)
        return 1.0 / jnp.where(jnp.abs(v) < 1e-12, tiny, v)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    # Packet direction signs (packets are octant-sorted, so lane 0 is
    # representative; a mixed packet only loses ordering quality).
    sxi = (dx[0, 0] < 0).astype(jnp.int32)
    syi = (dy[0, 0] < 0).astype(jnp.int32)
    szi = (dz[0, 0] < 0).astype(jnp.int32)

    stack_ref[0] = jnp.int32(0)

    def cond(c):
        sp, best_t, best_id = c
        go = sp > 0
        if any_hit:
            go = go & jnp.any(best_id < 0)
        return go

    def body(c):
        sp, best_t, best_id = c
        sp = sp - 1
        node = stack_ref[sp]
        row = nodes_ref[pl.ds(node, 1), :]
        rv = row.reshape(-1)
        lox, loy, loz = rv[0], rv[1], rv[2]
        hix, hiy, hiz = rv[3], rv[4], rv[5]
        nprims = rv[7].astype(jnp.int32)

        tx0 = (lox - ox) * ix
        tx1 = (hix - ox) * ix
        ty0 = (loy - oy) * iy
        ty1 = (hiy - oy) * iy
        tz0 = (loz - oz) * iz
        tz1 = (hiz - oz) * iz
        t0 = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                     jnp.minimum(ty0, ty1)),
                         jnp.maximum(jnp.minimum(tz0, tz1), mint))
        t1 = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                     jnp.maximum(ty0, ty1)),
                         jnp.minimum(jnp.maximum(tz0, tz1),
                                     jnp.minimum(maxt, best_t) *
                                     (1.0 + 1e-6)))
        hit_box = t0 <= t1
        if any_hit:
            hit_box = hit_box & (best_id < 0)
        any_ray = jnp.any(hit_box)
        is_leaf = nprims > 0

        def leaf_fn(args):
            bt, bi = args
            for j in range(leaf_k):
                base = 8 + 9 * j
                p0x, p0y, p0z = rv[base], rv[base + 1], rv[base + 2]
                p1x, p1y, p1z = rv[base + 3], rv[base + 4], rv[base + 5]
                p2x, p2y, p2z = rv[base + 6], rv[base + 7], rv[base + 8]
                pid = rv[80 + j].astype(jnp.int32)
                e1x, e1y, e1z = p1x - p0x, p1y - p0y, p1z - p0z
                e2x, e2y, e2z = p2x - p0x, p2y - p0y, p2z - p0z
                s1x = dy * e2z - dz * e2y
                s1y = dz * e2x - dx * e2z
                s1z = dx * e2y - dy * e2x
                div = s1x * e1x + s1y * e1y + s1z * e1z
                ok = jnp.abs(div) > 1e-12
                inv = 1.0 / jnp.where(ok, div, 1.0)
                sx, sy, sz = ox - p0x, oy - p0y, oz - p0z
                b1 = (sx * s1x + sy * s1y + sz * s1z) * inv
                s2x = sy * e1z - sz * e1y
                s2y = sz * e1x - sx * e1z
                s2z = sx * e1y - sy * e1x
                b2 = (dx * s2x + dy * s2y + dz * s2z) * inv
                t = (e2x * s2x + e2y * s2y + e2z * s2z) * inv
                valid = ok & (b1 >= 0.0) & (b2 >= 0.0) & \
                    (b1 + b2 <= 1.0) & (t > mint) & \
                    (t < jnp.minimum(maxt, bt)) & (j < nprims) & \
                    (pid >= 0)
                if any_hit:
                    valid = valid & (bi < 0)
                upd = valid & (t < bt)
                bt = jnp.where(upd, t, bt)
                bi = jnp.where(upd, pid, bi)
            return bt, bi

        best_t, best_id = jax.lax.cond(any_ray & is_leaf, leaf_fn,
                                       lambda a: a, (best_t, best_id))

        # Interior: push children far-to-near by Z-order rank ^ sign mask.
        a0 = rv[16].astype(jnp.int32)
        a1 = rv[17].astype(jnp.int32)
        a2 = rv[18].astype(jnp.int32)

        def sgn_of(ax):
            return jnp.where(ax == 0, sxi, jnp.where(ax == 1, syi, szi))

        m = sgn_of(a0) * 4 + sgn_of(a1) * 2 + sgn_of(a2)
        push_ok = any_ray & ~is_leaf
        for i in range(7, -1, -1):
            rank = jnp.int32(i) ^ m
            # 8-way scalar select (dynamic_slice on values doesn't lower).
            cid_f = rv[8]
            for rk in range(1, 8):
                cid_f = jnp.where(rank == rk, rv[8 + rk], cid_f)
            cid = cid_f.astype(jnp.int32)
            do = push_ok & (cid >= 0)
            spw = jnp.minimum(sp, STACK - 1)
            prev = stack_ref[spw]
            stack_ref[spw] = jnp.where(do, cid, prev)
            sp = sp + do.astype(jnp.int32)
        return sp, best_t, best_id

    init = (jnp.int32(1), jnp.full(mint.shape, _BIG, jnp.float32),
            jnp.full(mint.shape, -1, jnp.int32))
    _, best_t, best_id = jax.lax.while_loop(cond, body, init)
    t_ref[:] = best_t
    id_ref[:] = best_id


@functools.partial(jax.jit,
                   static_argnames=("nn", "leaf_k", "any_hit", "interpret",
                                    "use_stack", "with_counts", "sub"))
def traverse(nodes128, rays_packed, *, nn: int, leaf_k: int,
             any_hit: bool = False, interpret: bool = False,
             use_stack: bool = False, with_counts: bool = False,
             sub: int = None):
    """(t f32[N], id i32[N]) for packed rays f32[8, N] (N a multiple of
    the super-block; pad with maxt < mint). nodes128: f32[NNpad, 128].
    with_counts appends a counters array c i32[G, 128] (per grid step:
    lane 0 = node visits, 1 = leaf executions, 2 = packets walked) for
    roofline accounting."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = rays_packed.shape[1]
    # The stack flavor keeps the original 256-ray packet (its per-packet
    # scalar cursor work doesn't vectorize over sublanes).
    if use_stack:
        tile = 256
    else:
        tile = SUPER if N % SUPER == 0 else PACKET
    assert N % tile == 0
    grid = (N // tile,)

    # Two kernel flavors, A/B-measured on the config4_big terrain: the
    # plain skip-link walk WINS (4.7s vs 5.8s full-render) — the ordered
    # stack's scalar-unit work (per-interior-visit rank selects + SMEM
    # pushes) costs more than its near-first pruning saves on this
    # hardware. Kept selectable for scenes where ordering matters more.
    if use_stack:
        def kern(nodes_ref, rays_ref, t_ref, id_ref, stack_ref):
            _kernel_stack(nodes_ref, rays_ref, t_ref, id_ref, stack_ref,
                          nn=nn, leaf_k=leaf_k, any_hit=any_hit)
        scratch = [pltpu.SMEM((STACK,), jnp.int32)]
        n_out = 2
    else:
        sub = min(sub or PACKET, tile)

        def kern(nodes_ref, rays_ref, t_ref, id_ref, *maybe_counts):
            _kernel(nodes_ref, rays_ref, t_ref, id_ref, nn=nn,
                    leaf_k=leaf_k, any_hit=any_hit, super_=tile, sub=sub,
                    counts_ref=maybe_counts[0] if with_counts else None)
        scratch = []
        n_out = 3 if with_counts else 2
    kern.__name__ = (f"bvh_packet_n{nn}_k{leaf_k}_a{int(any_hit)}"
                     f"_r{N}_s{int(use_stack)}")
    kern.__qualname__ = kern.__name__
    out_specs = [
        pl.BlockSpec((1, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, N), jnp.float32),
        jax.ShapeDtypeStruct((1, N), jnp.int32),
    ]
    if n_out == 3:
        out_specs.append(pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((N // tile, 8, 128),
                                              jnp.int32))
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # whole node table
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(nodes128, rays_packed)
    if n_out == 3:
        return out[0][0], out[1][0], out[2]
    return out[0][0], out[1][0]


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# Above this node count the whole-table kernel's VMEM residency
# (512 B/node) stops fitting alongside ray/output blocks (~16 MB/core);
# intersect() switches to the streamed traverse_chunked instead of
# failing at compile time (ADVICE r3 medium: no fallback existed).
SINGLE_MAX_NODES = 22000
# Streamed-chunk size: 8192 rows = 4 MB per buffer; the pipeline
# double-buffers, so ~8 MB of VMEM plus the ray/output blocks.
CHUNK_CAP = 8192
# Streamed-traversal ray SUPER-block: each (8, CHUNK_SUPER) ray block is
# fetched once per row of chunk steps and walked PACKET rays at a time by
# the in-kernel loop. Bigger super-blocks stream the node table fewer
# times (supers x table bytes total); 64K rays = 2 MB fits beside the
# 2 x 4 MB chunk buffers.
CHUNK_SUPER = 65536


@functools.partial(jax.jit,
                   static_argnames=("nn", "leaf_k", "any_hit", "interpret",
                                    "cap", "with_counts", "sub"))
def traverse_chunked(nodes128, rays_packed, *, nn: int, leaf_k: int,
                     any_hit: bool = False, interpret: bool = False,
                     cap: int = CHUNK_CAP, with_counts: bool = False,
                     sub: int = None):
    """Streamed traversal for node tables too large for VMEM residency
    (VERDICT r3 item 3: the ~130K-tri ceiling). The table stays in HBM;
    the grid is (ray_super_blocks, chunks) with chunks minor, so for each
    super-block the pipeline DMAs consecutive (cap, 128) chunks into
    VMEM (auto double-buffered) while best_t/best_id persist in the
    block's output slot. Correctness rests on the skip-walk's cursor
    being monotonically increasing: an arbitrary contiguous preorder
    range can be walked starting at its first row, and every leaf is
    visited or correctly pruned in exactly one chunk (see _walk_range).
    Per-chunk bboxes let packets skip chunks their rays cannot touch."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = rays_packed.shape[1]
    tile = CHUNK_SUPER if N % CHUNK_SUPER == 0 else PACKET
    assert N % tile == 0
    sub = min(sub or PACKET, tile)
    nn_pad = _ceil_to(nn, cap)
    n_chunks = nn_pad // cap
    if nodes128.shape[0] != nn_pad:
        # Padding rows: empty bbox (lo=+BIG > hi=-BIG -> slab never hits)
        # and skip=nn_pad so any cursor landing there exits the range.
        pad = jnp.zeros((nn_pad - nodes128.shape[0], 128), jnp.float32)
        pad = pad.at[:, 0:3].set(_BIG).at[:, 3:6].set(-_BIG) \
                 .at[:, 6].set(float(nn_pad))
        nodes128 = jnp.concatenate([nodes128, pad], axis=0)
    blk = nodes128.reshape(n_chunks, cap, 128)
    cb = jnp.concatenate([
        blk[:, :, 0:3].min(axis=1), blk[:, :, 3:6].max(axis=1),
        jnp.zeros((n_chunks, 2), jnp.float32)], axis=1)   # [C, 8]

    def kern(cb_ref, nodes_ref, rays_ref, t_ref, id_ref, *maybe_counts):
        _kernel_chunked(cb_ref, nodes_ref, rays_ref, t_ref, id_ref,
                        nn=nn, cap=cap, leaf_k=leaf_k, any_hit=any_hit,
                        super_=tile, sub=sub,
                        counts_ref=maybe_counts[0] if with_counts else None)
    kern.__name__ = (f"bvh_chunked_n{nn}_c{cap}_k{leaf_k}"
                     f"_a{int(any_hit)}_r{N}")
    kern.__qualname__ = kern.__name__
    out_specs = [
        pl.BlockSpec((1, tile), lambda g, c: (0, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda g, c: (0, g),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, N), jnp.float32),
        jax.ShapeDtypeStruct((1, N), jnp.int32),
    ]
    if with_counts:
        out_specs.append(pl.BlockSpec((1, 8, 128), lambda g, c: (g, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((N // tile, 8, 128),
                                              jnp.int32))
    out = pl.pallas_call(
        kern,
        grid=(N // tile, n_chunks),
        in_specs=[
            pl.BlockSpec((n_chunks, 8), lambda g, c: (0, 0),
                         memory_space=pltpu.VMEM),      # chunk bboxes
            pl.BlockSpec((cap, 128), lambda g, c: (c, 0),
                         memory_space=pltpu.VMEM),      # streamed chunk
            pl.BlockSpec((8, tile), lambda g, c: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(cb, blk.reshape(nn_pad, 128), rays_packed)
    if with_counts:
        return out[0][0], out[1][0], out[2]
    return out[0][0], out[1][0]


# ---------------------------------------------------------------------------
# Tile walk: the r5 traversal. See accel/bvh_build.build_tiles for the
# layout. Two structural fixes over the row kernels above, both measured
# on config4_big (r5 xplane + visit-counter profiles):
#   1. The row walk's per-visit critical path was a vector->scalar sync
#      (slab test -> any() -> next-node address), ~0.6 us per visit
#      REGARDLESS of packet width. Here the cursor runs on SMEM-resident
#      skip/meta tables + per-depth child masks, so skipped nodes cost
#      ~10 scalar cycles and the sync remains only at entered interior
#      nodes (whose child masks the walk genuinely needs).
#   2. A visit tested one node against the packet; here one visit tests
#      all 8 children (or all 8 leaf triangles) as (8,1)x(1,128)
#      sublane-by-lane outer products — 8x the work per sync point.
# Correctness across chunk boundaries: a node whose parent was not
# child-tested in this walk (chunk cut, or the root) fails the mask
# OWNER check (own < node < own_end) and is conservatively entered.
# ---------------------------------------------------------------------------

MAXD = 32      # per-depth mask slots (build_tiles rejects deeper trees)


def _walk_tiles(tiles_ref, skip_ref, meta_ref, regs, best_t, best_id,
                start, stop, base, masks_ref, own_ref, oend_ref, pk, *,
                any_hit: bool, counts=None):
    """Mask-driven skip walk of preorder nodes [start, stop) for one
    packet. tiles_ref rows at [node - base]; skip/meta SMEM at the same
    offset. best_t/best_id: (R, 128) with R = packet//128. masks/own/
    oend: SMEM (npk, MAXD+2), row pk. Returns updated (best_t, best_id)
    (+ counts)."""
    from jax.experimental import pallas as pl
    ox, oy, oz = regs["o"]
    dx, dy, dz = regs["d"]
    ixv, iyv, izv = regs["inv"]
    mint, maxt = regs["mint"], regs["maxt"]
    R = mint.shape[0]
    big = jnp.float32(_BIG)

    def cond(c):
        go = c[0] < stop
        if any_hit:
            go = go & ~c[3]
        return go

    def body(c):
        node = c[0]
        best_t, best_id = c[1], c[2]
        off = node - base
        sk = skip_ref[off]
        mt = meta_ref[off]
        d_n = jnp.bitwise_and(mt, 31)
        rk = jnp.bitwise_and(jnp.right_shift(mt, 5), 7)
        is_leaf = jnp.right_shift(mt, 8) > 0
        own = own_ref[pk, d_n]
        oend = oend_ref[pk, d_n]
        m = masks_ref[pk, d_n]
        mask_ok = (own >= 0) & (own < node) & (node < oend)
        entered = jnp.where(
            mask_ok, jnp.bitwise_and(jnp.right_shift(m, rk), 1) > 0, True)

        def load_T():
            return jnp.transpose(tiles_ref[pl.ds(off, 1), :])   # (128, 1)

        def leaf_fn(args):
            bt, bi = args
            rt = load_T()
            p0x, p0y, p0z = rt[0:8], rt[8:16], rt[16:24]
            e1x, e1y, e1z = rt[24:32], rt[32:40], rt[40:48]
            e2x, e2y, e2z = rt[48:56], rt[56:64], rt[64:72]
            pidf = rt[72:80]
            bt_rows, bi_rows = [], []
            for k in range(R):
                oxk, oyk, ozk = ox[k:k+1], oy[k:k+1], oz[k:k+1]
                dxk, dyk, dzk = dx[k:k+1], dy[k:k+1], dz[k:k+1]
                s1x = dyk * e2z - dzk * e2y
                s1y = dzk * e2x - dxk * e2z
                s1z = dxk * e2y - dyk * e2x
                div = s1x * e1x + s1y * e1y + s1z * e1z
                ok = jnp.abs(div) > 1e-12
                inv = 1.0 / jnp.where(ok, div, 1.0)
                sx, sy, sz = oxk - p0x, oyk - p0y, ozk - p0z
                b1 = (sx * s1x + sy * s1y + sz * s1z) * inv
                s2x = sy * e1z - sz * e1y
                s2y = sz * e1x - sx * e1z
                s2z = sx * e1y - sy * e1x
                b2 = (dxk * s2x + dyk * s2y + dzk * s2z) * inv
                t = (e2x * s2x + e2y * s2y + e2z * s2z) * inv
                btk = bt[k:k+1]
                valid = ok & (b1 >= 0.0) & (b2 >= 0.0) & \
                    (b1 + b2 <= 1.0) & (t > mint[k:k+1]) & \
                    (t < jnp.minimum(maxt[k:k+1], btk)) & (pidf >= 0.0)
                if any_hit:
                    valid = valid & (bi[k:k+1] < 0)
                tv = jnp.where(valid, t, big)
                tmin = jnp.min(tv, axis=0, keepdims=True)     # (1, 128)
                idv = jnp.where(valid & (tv <= tmin), pidf, big)
                idmin = jnp.min(idv, axis=0, keepdims=True)
                upd = tmin < btk
                # Per-row results concatenated once (Mosaic implements
                # neither scatter nor dynamic_update_slice).
                bt_rows.append(jnp.where(upd, tmin, btk))
                bi_rows.append(jnp.where(upd, idmin.astype(jnp.int32),
                                         bi[k:k+1]))
            if R == 1:
                return bt_rows[0], bi_rows[0]
            return (jnp.concatenate(bt_rows, axis=0),
                    jnp.concatenate(bi_rows, axis=0))

        def int_fn(_):
            rt = load_T()
            lox, loy, loz = rt[0:8], rt[8:16], rt[16:24]
            hix, hiy, hiz = rt[24:32], rt[32:40], rt[40:48]
            acc = jnp.zeros((8, 1), jnp.bool_)
            for k in range(R):
                oxk, oyk, ozk = ox[k:k+1], oy[k:k+1], oz[k:k+1]
                ixk, iyk, izk = ixv[k:k+1], iyv[k:k+1], izv[k:k+1]
                tx0 = (lox - oxk) * ixk
                tx1 = (hix - oxk) * ixk
                ty0 = (loy - oyk) * iyk
                ty1 = (hiy - oyk) * iyk
                tz0 = (loz - ozk) * izk
                tz1 = (hiz - ozk) * izk
                t0 = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                             jnp.minimum(ty0, ty1)),
                                 jnp.maximum(jnp.minimum(tz0, tz1),
                                             mint[k:k+1]))
                t1 = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1),
                                jnp.maximum(ty0, ty1)),
                    jnp.minimum(jnp.maximum(tz0, tz1),
                                jnp.minimum(maxt[k:k+1],
                                            best_t[k:k+1]) *
                                (1.0 + 1e-6)))
                h = t0 <= t1
                if any_hit:
                    h = h & (best_id[k:k+1] < 0)
                acc = acc | jnp.any(h, axis=1, keepdims=True)
            w = jnp.left_shift(
                jnp.int32(1),
                jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0))
            return jnp.sum(jnp.where(acc, w, 0))

        do_leaf = entered & is_leaf
        tested = entered & ~is_leaf

        # One branch on the skip fast path: entered -> nested leaf/int.
        def entered_fn(args):
            bt, bi = jax.lax.cond(is_leaf, leaf_fn, lambda a: a, args)
            pk_ = jax.lax.cond(is_leaf, lambda _: jnp.int32(0), int_fn, 0)
            return bt, bi, pk_

        best_t, best_id, packed = jax.lax.cond(
            entered, entered_fn, lambda a: a + (jnp.int32(0),),
            (best_t, best_id))

        # Unconditional SMEM writes (row MAXD+1 is a write-only sentinel):
        # read-modify-write per visit costs 3 extra SMEM reads.
        d1 = jnp.where(tested, jnp.minimum(d_n + 1, MAXD + 1), MAXD + 1)
        masks_ref[pk, d1] = packed
        own_ref[pk, d1] = node
        oend_ref[pk, d1] = sk
        node = jnp.where(tested & (packed != 0), node + 1, sk)
        out = (node, best_t, best_id)
        if any_hit:
            # Done-tracking without a per-iteration vector sync: hits only
            # appear in leaf executions, so re-reduce only after one.
            done = jax.lax.cond(do_leaf,
                                lambda: ~jnp.any(best_id < 0),
                                lambda: c[3])
            out = out + (done,)
        if counts is not None:
            i0 = 4 if any_hit else 3
            out = out + (c[i0] + 1, c[i0 + 1] + do_leaf.astype(jnp.int32),
                         c[i0 + 2] + tested.astype(jnp.int32))
        return out

    init = (start, best_t, best_id)
    if any_hit:
        init = init + (~jnp.any(best_id < 0),)
    if counts is not None:
        init = init + tuple(counts)
    out = jax.lax.while_loop(cond, body, init)
    if counts is None:
        return out[1], out[2]
    i0 = 4 if any_hit else 3
    return out[1], out[2], (out[i0], out[i0 + 1], out[i0 + 2])


def _kernel_tiles(tiles_ref, skip_ref, meta_ref, rays_ref, t_ref, id_ref,
                  masks_ref, own_ref, oend_ref, *, nn: int, any_hit: bool,
                  super_: int, sub: int, counts_ref=None):
    from jax.experimental import pallas as pl
    nsub = super_ // sub

    def body(i, cnt):
        # Unrolled owner reset: a 34-step fori of SMEM stores measured
        # ~3 us/iteration (dominating short walks); static stores don't.
        for dd in range(MAXD + 2):
            own_ref[i, dd] = jnp.int32(-1)
        regs = _ray_regs(rays_ref[:, pl.ds(i * sub, sub)], sub)
        bt = jnp.full(regs["mint"].shape, _BIG, jnp.float32)
        bi = jnp.full(regs["mint"].shape, -1, jnp.int32)
        if counts_ref is None:
            bt, bi = _walk_tiles(tiles_ref, skip_ref, meta_ref, regs, bt,
                                 bi, jnp.int32(0), nn, 0, masks_ref,
                                 own_ref, oend_ref, i, any_hit=any_hit)
        else:
            bt, bi, cnt = _walk_tiles(tiles_ref, skip_ref, meta_ref, regs,
                                      bt, bi, jnp.int32(0), nn, 0,
                                      masks_ref, own_ref, oend_ref, i,
                                      any_hit=any_hit, counts=cnt)
        t_ref[:, pl.ds(i * sub, sub)] = bt.reshape(1, sub)
        id_ref[:, pl.ds(i * sub, sub)] = bi.reshape(1, sub)
        return cnt

    cnt = jax.lax.fori_loop(0, nsub, body,
                            (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
    if counts_ref is not None:
        counts_ref[:] = _counts_row(cnt[0], cnt[1],
                                    cnt[2]).reshape(1, 8, 128)


@functools.partial(jax.jit,
                   static_argnames=("nn", "any_hit", "interpret",
                                    "with_counts", "sub"))
def traverse_tiles(tiles, nskip, nmeta, rays_packed, *, nn: int,
                   any_hit: bool = False, interpret: bool = False,
                   with_counts: bool = False, sub: int = None):
    """Tile-walk traversal, whole table VMEM-resident, skip/meta tables
    SMEM-resident. Same contract as traverse()."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = rays_packed.shape[1]
    tile = SUPER if N % SUPER == 0 else PACKET
    assert N % tile == 0
    sub = min(sub or PACKET, tile)
    nsub = tile // sub
    grid = (N // tile,)

    def kern(tiles_ref, skip_ref, meta_ref, rays_ref, t_ref, id_ref,
             *rest):
        counts_ref = rest[0] if with_counts else None
        masks = rest[-3:]
        _kernel_tiles(tiles_ref, skip_ref, meta_ref, rays_ref, t_ref,
                      id_ref, *masks, nn=nn, any_hit=any_hit, super_=tile,
                      sub=sub, counts_ref=counts_ref)
    kern.__name__ = f"bvh_tiles_n{nn}_a{int(any_hit)}_r{N}"
    kern.__qualname__ = kern.__name__
    out_specs = [
        pl.BlockSpec((1, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, N), jnp.float32),
        jax.ShapeDtypeStruct((1, N), jnp.int32),
    ]
    if with_counts:
        out_specs.append(pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((N // tile, 8, 128),
                                              jnp.int32))
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),    # whole tile table
            pl.BlockSpec(memory_space=pltpu.SMEM),    # skip
            pl.BlockSpec(memory_space=pltpu.SMEM),    # meta
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((nsub, MAXD + 2), jnp.int32),
                        pltpu.SMEM((nsub, MAXD + 2), jnp.int32),
                        pltpu.SMEM((nsub, MAXD + 2), jnp.int32)],
        interpret=interpret,
    )(tiles, nskip, nmeta, rays_packed)
    if with_counts:
        return out[0][0], out[1][0], out[2]
    return out[0][0], out[1][0]


def _kernel_tiles_chunked(cb_ref, tiles_ref, skip_ref, meta_ref, rays_ref,
                          t_ref, id_ref, masks_ref, own_ref, oend_ref, *,
                          nn: int, cap: int, any_hit: bool, super_: int,
                          sub: int, counts_ref=None):
    from jax.experimental import pallas as pl
    c = pl.program_id(1)
    lo_c = c * cap
    hi_c = jnp.minimum(jnp.int32(nn), lo_c + cap)
    nsub = super_ // sub

    @pl.when(c == 0)
    def _():
        t_ref[:] = jnp.full((1, super_), _BIG, jnp.float32)
        id_ref[:] = jnp.full((1, super_), -1, jnp.int32)
        if counts_ref is not None:
            counts_ref[:] = jnp.zeros((1, 8, 128), jnp.int32)

        # Owner reset: stale owners from the PREVIOUS super-block's walk
        # would wrongly validate masks. Owners persist across this
        # super-block's chunks (cross-chunk mask reuse is sound: masks
        # only go stale toward conservative entered=True). Inner stores
        # unrolled (dynamic-index SMEM stores in a fori are ~3 us/iter).
        def rst(i, _):
            for dd in range(MAXD + 2):
                own_ref[i, dd] = jnp.int32(-1)
            return 0
        jax.lax.fori_loop(0, nsub, rst, 0)

    def body(i, cnt):
        regs = _ray_regs(rays_ref[:, pl.ds(i * sub, sub)], sub)
        R = sub // 128
        bt = t_ref[:, pl.ds(i * sub, sub)].reshape(R, 128)
        bi = id_ref[:, pl.ds(i * sub, sub)].reshape(R, 128)

        # Chunk-bbox precheck (cb in SMEM: scalar operands, no vector
        # extracts): one vector any() per (packet, chunk).
        ox, oy, oz = regs["o"]
        ixv, iyv, izv = regs["inv"]
        tx0 = (cb_ref[c, 0] - ox) * ixv
        tx1 = (cb_ref[c, 3] - ox) * ixv
        ty0 = (cb_ref[c, 1] - oy) * iyv
        ty1 = (cb_ref[c, 4] - oy) * iyv
        tz0 = (cb_ref[c, 2] - oz) * izv
        tz1 = (cb_ref[c, 5] - oz) * izv
        t0 = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                     jnp.minimum(ty0, ty1)),
                         jnp.maximum(jnp.minimum(tz0, tz1), regs["mint"]))
        t1 = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                     jnp.maximum(ty0, ty1)),
                         jnp.minimum(jnp.maximum(tz0, tz1),
                                     jnp.minimum(regs["maxt"], bt) *
                                     (1.0 + 1e-6)))
        enter = jnp.any(t0 <= t1) & (lo_c < nn)
        if any_hit:
            enter = enter & jnp.any(bi < 0)

        if counts_ref is None:
            def walk(args):
                return _walk_tiles(tiles_ref, skip_ref, meta_ref, regs,
                                   args[0], args[1], lo_c, hi_c, lo_c,
                                   masks_ref, own_ref, oend_ref, i,
                                   any_hit=any_hit)
            bt, bi = jax.lax.cond(enter, walk, lambda a: a, (bt, bi))
        else:
            def walk_c(args):
                bt, bi, ci, cl, cc = args
                bt, bi, (ci, cl, cc) = _walk_tiles(
                    tiles_ref, skip_ref, meta_ref, regs, bt, bi, lo_c,
                    hi_c, lo_c, masks_ref, own_ref, oend_ref, i,
                    any_hit=any_hit, counts=(ci, cl, cc))
                return bt, bi, ci, cl, cc
            bt, bi, ci, cl, cc = jax.lax.cond(
                enter, walk_c, lambda a: a,
                (bt, bi, cnt[0], cnt[1], cnt[2]))
            cnt = (ci, cl, cc)
        t_ref[:, pl.ds(i * sub, sub)] = bt.reshape(1, sub)
        id_ref[:, pl.ds(i * sub, sub)] = bi.reshape(1, sub)
        return cnt

    cnt = jax.lax.fori_loop(0, nsub, body,
                            (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
    if counts_ref is not None:
        counts_ref[:] = counts_ref[:] + _counts_row(
            cnt[0], cnt[1], cnt[2]).reshape(1, 8, 128)


@functools.partial(jax.jit,
                   static_argnames=("nn", "any_hit", "interpret", "cap",
                                    "with_counts", "sub"))
def traverse_tiles_chunked(tiles, nskip, nmeta, selfbb, rays_packed, *,
                           nn: int, any_hit: bool = False,
                           interpret: bool = False, cap: int = CHUNK_CAP,
                           with_counts: bool = False, sub: int = None):
    """Streamed tile-walk traversal (HBM node table, chunks DMA'd once
    per ray super-block; skip/meta chunk slices ride the same pipeline
    into SMEM). Same contract as traverse_chunked()."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = rays_packed.shape[1]
    tile = CHUNK_SUPER if N % CHUNK_SUPER == 0 else PACKET
    assert N % tile == 0
    sub = min(sub or PACKET, tile)
    nsub = tile // sub
    nn_pad = _ceil_to(nn, cap)
    n_chunks = nn_pad // cap
    if tiles.shape[0] != nn_pad:
        # Padding rows are never visited (the walk stops at nn) and never
        # prechecked-in (inverted selfbb boxes).
        tiles = jnp.concatenate(
            [tiles, jnp.zeros((nn_pad - tiles.shape[0], 128),
                              jnp.float32)], axis=0)
        nskip = jnp.concatenate(
            [nskip, jnp.full((nn_pad - nskip.shape[0],), nn_pad,
                             jnp.int32)])
        nmeta = jnp.concatenate(
            [nmeta, jnp.zeros((nn_pad - nmeta.shape[0],), jnp.int32)])
        pad_bb = jnp.zeros((nn_pad - selfbb.shape[0], 8), jnp.float32)
        pad_bb = pad_bb.at[:, 0:3].set(_BIG).at[:, 3:6].set(-_BIG)
        selfbb = jnp.concatenate([selfbb, pad_bb], axis=0)
    sb = selfbb.reshape(n_chunks, cap, 8)
    cb = jnp.concatenate([
        sb[:, :, 0:3].min(axis=1), sb[:, :, 3:6].max(axis=1),
        jnp.zeros((n_chunks, 2), jnp.float32)], axis=1)   # [C, 8]

    def kern(cb_ref, tiles_ref, skip_ref, meta_ref, rays_ref, t_ref,
             id_ref, *rest):
        counts_ref = rest[0] if with_counts else None
        masks = rest[-3:]
        _kernel_tiles_chunked(cb_ref, tiles_ref, skip_ref, meta_ref,
                              rays_ref, t_ref, id_ref, *masks, nn=nn,
                              cap=cap, any_hit=any_hit, super_=tile,
                              sub=sub, counts_ref=counts_ref)
    kern.__name__ = f"bvh_tiles_chunked_n{nn}_c{cap}_a{int(any_hit)}_r{N}"
    kern.__qualname__ = kern.__name__
    out_specs = [
        pl.BlockSpec((1, tile), lambda g, c: (0, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda g, c: (0, g),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, N), jnp.float32),
        jax.ShapeDtypeStruct((1, N), jnp.int32),
    ]
    if with_counts:
        out_specs.append(pl.BlockSpec((1, 8, 128), lambda g, c: (g, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((N // tile, 8, 128),
                                              jnp.int32))
    out = pl.pallas_call(
        kern,
        grid=(N // tile, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # chunk bboxes
            pl.BlockSpec((cap, 128), lambda g, c: (c, 0),
                         memory_space=pltpu.VMEM),        # streamed chunk
            pl.BlockSpec((cap,), lambda g, c: (c,),
                         memory_space=pltpu.SMEM),        # skip slice
            pl.BlockSpec((cap,), lambda g, c: (c,),
                         memory_space=pltpu.SMEM),        # meta slice
            pl.BlockSpec((8, tile), lambda g, c: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((nsub, MAXD + 2), jnp.int32),
                        pltpu.SMEM((nsub, MAXD + 2), jnp.int32),
                        pltpu.SMEM((nsub, MAXD + 2), jnp.int32)],
        interpret=interpret,
    )(cb, tiles, nskip, nmeta, rays_packed)
    if with_counts:
        return out[0][0], out[1][0], out[2]
    return out[0][0], out[1][0]


def _kernel_instanced(blk_ref, inst_ref, start_ref, stop_ref, cb_ref,
                      w2o_ref, nodes_ref, rays_ref, t_ref, id_ref,
                      inst_out_ref, *, leaf_k: int, any_hit: bool,
                      tile: int):
    """One (ray-group, entry) step of instanced traversal. Entry e maps to
    (instance, prototype node block) via the scalar-prefetch tables; the
    kernel transforms rays into the instance's object space (reference:
    /root/reference/core/primitive.cpp:66-85 InstancePrimitive::Intersect)
    and walks the block. World-space t is preserved because the
    transformed direction is NOT renormalized (affine maps keep the ray
    parameterization). Hits are tagged with the instance id."""
    from jax.experimental import pallas as pl
    e = pl.program_id(1)
    inst = inst_ref[e]
    start = start_ref[e]
    stop = stop_ref[e]
    regs_w = _ray_regs(rays_ref[:], tile)

    @pl.when(e == 0)
    def _():
        t_ref[:] = jnp.full((1, tile), _BIG, jnp.float32)
        id_ref[:] = jnp.full((1, tile), -1, jnp.int32)
        inst_out_ref[:] = jnp.full((1, tile), -1, jnp.int32)

    sub = tile // 128
    best_t = t_ref[:].reshape(sub, 128)
    best_id = id_ref[:].reshape(sub, 128)
    best_inst = inst_out_ref[:].reshape(sub, 128)

    # World-space entry-bbox precheck.
    cb = cb_ref[e, :]
    ox, oy, oz = regs_w["o"]
    ix, iy, iz = regs_w["inv"]
    tx0 = (cb[0] - ox) * ix
    tx1 = (cb[3] - ox) * ix
    ty0 = (cb[1] - oy) * iy
    ty1 = (cb[4] - oy) * iy
    tz0 = (cb[2] - oz) * iz
    tz1 = (cb[5] - oz) * iz
    t0 = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                 jnp.minimum(ty0, ty1)),
                     jnp.maximum(jnp.minimum(tz0, tz1), regs_w["mint"]))
    t1 = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                 jnp.maximum(ty0, ty1)),
                     jnp.minimum(jnp.maximum(tz0, tz1),
                                 jnp.minimum(regs_w["maxt"], best_t) *
                                 (1.0 + 1e-6)))
    enter = jnp.any(t0 <= t1)
    if any_hit:
        enter = enter & jnp.any(best_id < 0)

    def walk(args):
        bt, bi = args
        # Rays into instance space: w2o's top 3 rows (12 scalars).
        m = w2o_ref[pl.ds(inst, 1), :].reshape(-1)
        oox = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
        ooy = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
        ooz = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
        dx, dy, dz = regs_w["d"]
        odx = m[0] * dx + m[1] * dy + m[2] * dz
        ody = m[4] * dx + m[5] * dy + m[6] * dz
        odz = m[8] * dx + m[9] * dy + m[10] * dz

        def safe_inv(v):
            tiny = jnp.where(v < 0, -1e-12, 1e-12)
            return 1.0 / jnp.where(jnp.abs(v) < 1e-12, tiny, v)

        regs_o = dict(o=(oox, ooy, ooz), d=(odx, ody, odz),
                      inv=(safe_inv(odx), safe_inv(ody), safe_inv(odz)),
                      mint=regs_w["mint"], maxt=regs_w["maxt"])
        return _walk_range(nodes_ref, regs_o, start, stop, start, bt, bi,
                           leaf_k=leaf_k, any_hit=any_hit)

    new_t, new_id = jax.lax.cond(enter, walk, lambda a: a,
                                 (best_t, best_id))
    upd = new_t < best_t
    best_inst = jnp.where(upd, inst, best_inst)
    t_ref[:] = new_t.reshape(1, tile)
    id_ref[:] = new_id.reshape(1, tile)
    inst_out_ref[:] = best_inst.reshape(1, tile)


@functools.partial(jax.jit,
                   static_argnames=("n_entries", "n_inst", "cap", "leaf_k",
                                    "any_hit", "interpret"))
def traverse_instanced(nodes128, entry_block, entry_inst, entry_start,
                       entry_stop, entry_bbox, w2o12, rays_packed, *,
                       n_entries: int, n_inst: int, cap: int, leaf_k: int,
                       any_hit: bool = False, interpret: bool = False):
    """(t f32[N], proto_tri i32[N], inst i32[N]) for packed rays f32[8,N]
    against an InstanceTable's concatenated prototype BLAS tables (scene
    memory O(prototypes + instances); VERDICT r3 item 5)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = rays_packed.shape[1]
    tile = RAY_TILE
    assert N % tile == 0

    def kern(blk_ref, inst_ref, start_ref, stop_ref, cb_ref, w2o_ref,
             nodes_ref, rays_ref, t_ref, id_ref, inst_out_ref):
        _kernel_instanced(blk_ref, inst_ref, start_ref, stop_ref, cb_ref,
                          w2o_ref, nodes_ref, rays_ref, t_ref, id_ref,
                          inst_out_ref, leaf_k=leaf_k, any_hit=any_hit,
                          tile=tile)
    kern.__name__ = (f"bvh_inst_e{n_entries}_c{cap}_k{leaf_k}"
                     f"_a{int(any_hit)}_r{N}")
    kern.__qualname__ = kern.__name__

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(N // tile, n_entries),
        in_specs=[
            pl.BlockSpec((n_entries, 8), lambda g, e, *s: (0, 0),
                         memory_space=pltpu.VMEM),   # entry bboxes
            pl.BlockSpec((n_inst, 12), lambda g, e, *s: (0, 0),
                         memory_space=pltpu.VMEM),   # instance w2o rows
            pl.BlockSpec((cap, 128), lambda g, e, blk, *s: (blk[e], 0),
                         memory_space=pltpu.VMEM),   # streamed BLAS block
            pl.BlockSpec((8, tile), lambda g, e, *s: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda g, e, *s: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda g, e, *s: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda g, e, *s: (0, g),
                         memory_space=pltpu.VMEM),
        ],
    )
    t, ids, inst = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((1, N), jnp.int32),
            jax.ShapeDtypeStruct((1, N), jnp.int32),
        ],
        interpret=interpret,
    )(entry_block, entry_inst, entry_start, entry_stop,
      entry_bbox, w2o12, nodes128, rays_packed)
    return t[0], ids[0], inst[0]


def _sort_key(bvh, o, d):
    """Packet-coherence sort key: direction octant (3 bits) then a Morton
    code of the quantized origin. Packet traversal visits the UNION of its
    rays' node sets, so incoherent launches (BSDF/cosine-sampled bounce
    rays) pay multiples of the coherent cost; sorting reorders lanes into
    like-minded packets. Primary rays are already coherent — the sort is a
    ~2ms no-op for them."""
    oct_ = ((d[:, 0] < 0).astype(jnp.uint32) * 4 +
            (d[:, 1] < 0).astype(jnp.uint32) * 2 +
            (d[:, 2] < 0).astype(jnp.uint32))
    ext = jnp.maximum(bvh.bounds_hi - bvh.bounds_lo, 1e-6)
    q = jnp.clip(((o - bvh.bounds_lo) / ext * 127.0), 0.0,
                 127.0).astype(jnp.uint32)

    def spread(v):
        # Standard 10-bit 3D Morton spread (covers the 7 bits used here).
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v
    morton = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    return (oct_ << jnp.uint32(27)) | (morton & jnp.uint32((1 << 27) - 1))


def intersect(bvh, o, d, mint, maxt, any_hit: bool = False,
              interpret: bool = False, sort: bool = True):
    """Packet-traversal front end: (t_raw, prim_id, hit) for a BvhAccel
    with no quadrics. t_raw is the kernel's t (callers recompute the
    winner differentiably, accel/bvh.py)."""
    N = o.shape[0]
    order = None
    rays8 = jnp.concatenate(
        [o, d, mint[:, None], maxt[:, None]], axis=1)       # [N, 8]
    if sort and N >= PACKET:
        order = jnp.argsort(_sort_key(bvh, o, d))
        # ONE row-gather of the packed [N, 8] rays instead of four
        # separate o/d/mint/maxt gathers: the permutation gathers were
        # ~4x the any-hit traversal they fed (r5 xplane profile).
        rays8 = rays8[order]
    chunked = bvh.n_nodes > SINGLE_MAX_NODES
    # Pad to a whole super-block when at least one is filled (the kernels
    # fall back to PACKET-sized grid steps otherwise); padding rays carry
    # empty windows (mint 1 > maxt -1) and are skipped at ~zero cost.
    big = CHUNK_SUPER if chunked else SUPER
    pad_tile = big if N >= big else PACKET
    Np = _ceil_to(max(N, 1), pad_tile)
    rays = rays8.T
    if Np != N:
        pad = jnp.zeros((8, Np - N), jnp.float32)
        pad = pad.at[6].set(1.0).at[7].set(-1.0)
        rays = jnp.concatenate([rays, pad], axis=1)
    sub = int(os.environ.get("TPUPRT_BVH_SUB", "0")) or None
    if bvh.nodesT is not None:
        if chunked:
            t, ids = traverse_tiles_chunked(
                bvh.nodesT, bvh.nodeskip, bvh.nodemeta, bvh.selfbb, rays,
                nn=bvh.n_nodes, any_hit=any_hit, interpret=interpret,
                sub=sub)
        else:
            t, ids = traverse_tiles(
                bvh.nodesT, bvh.nodeskip, bvh.nodemeta, rays,
                nn=bvh.n_nodes, any_hit=any_hit, interpret=interpret,
                sub=sub)
    else:
        nodes = bvh.nodes
        if nodes.shape[1] != 128:
            nodes = jnp.pad(nodes, ((0, 0), (0, 128 - nodes.shape[1])))
        if chunked:
            t, ids = traverse_chunked(nodes, rays, nn=bvh.n_nodes,
                                      leaf_k=bvh.leaf_k, any_hit=any_hit,
                                      interpret=interpret)
        else:
            t, ids = traverse(nodes, rays, nn=bvh.n_nodes,
                              leaf_k=bvh.leaf_k, any_hit=any_hit,
                              interpret=interpret)
    t = t[:N]
    ids = ids[:N]
    if order is not None:
        inv = jnp.zeros_like(order).at[order].set(jnp.arange(N))
        # ONE [N,2] row-gather for the un-permute (two separate 1D
        # gathers measured ~12 ms vs ~3 ms packed at 393K lanes). The
        # packed pair rides the INT domain: bitcasting ids into f32 makes
        # NaN bit patterns (-1 = 0xFFFFFFFF) that TPU copies canonicalize.
        packed = jnp.stack(
            [jax.lax.bitcast_convert_type(t, jnp.int32), ids], axis=1)
        res = packed[inv]
        t = jax.lax.bitcast_convert_type(res[:, 0], jnp.float32)
        ids = res[:, 1]
    return t, ids, ids >= 0

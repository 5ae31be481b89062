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

import numpy as np
import jax
import jax.numpy as jnp

_BIG = 1e30
# Rays per packet. The packet's per-visit vector math runs on arrays of
# shape (RAY_TILE//128, 128): the original 256-ray packet computed on
# (1,256) vectors — 1/8 of the VPU's sublanes; at 1024+ every f32
# quantity is whole (8,128) vregs, so each visit serves 4-8x the rays at
# the same vreg-op count. The union-of-node-sets penalty of bigger
# packets stays sublinear on sorted rays; A/B on config4_big:
# 256->1.55s, 1024->1.10s, 2048->0.97s, 4096->1.06s full-render.
# Constraint: RAY_TILE//128 must be a multiple of 8 (Mosaic's
# (1,N)->(sub,128) reshape requires whole vregs; 512 fails to lower).
RAY_TILE = 2048


def _ray_regs(rays_ref, tile):
    """Unpack the (8, tile) ray block into full-sublane (tile//128, 128)
    component tiles + precomputed safe inverse directions."""
    sub = tile // 128
    r = rays_ref[:]                           # (8, tile)

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
                leaf_k: int, any_hit: bool):
    """Skip-link walk of preorder node ids in [start, stop), with rows
    stored at nodes_ref[node - base]. The walk's cursor is monotonically
    increasing (node' = node+1 or skip > node), which is what makes
    arbitrary contiguous range chunking correct: every leaf in the range
    is visited or pruned by a failed ancestor bbox test, independent of
    how the tree is cut (see traverse_chunked)."""
    from jax.experimental import pallas as pl
    ox, oy, oz = regs["o"]
    dx, dy, dz = regs["d"]
    ix, iy, iz = regs["inv"]
    mint, maxt = regs["mint"], regs["maxt"]

    def cond(c):
        node, best_t, best_id = c
        go = node < stop
        if any_hit:
            go = go & jnp.any(best_id < 0)
        return go

    def body(c):
        node, best_t, best_id = c
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
        return node, best_t, best_id

    _, best_t, best_id = jax.lax.while_loop(cond, body,
                                            (start, best_t, best_id))
    return best_t, best_id


def _kernel(nodes_ref, rays_ref, t_ref, id_ref, *, nn: int, leaf_k: int,
            any_hit: bool, tile: int):
    regs = _ray_regs(rays_ref, tile)
    init_t = jnp.full(regs["mint"].shape, _BIG, jnp.float32)
    init_id = jnp.full(regs["mint"].shape, -1, jnp.int32)
    best_t, best_id = _walk_range(nodes_ref, regs, jnp.int32(0), nn,
                                  jnp.int32(0), init_t, init_id,
                                  leaf_k=leaf_k, any_hit=any_hit)
    t_ref[:] = best_t.reshape(1, tile)
    id_ref[:] = best_id.reshape(1, tile)


def _kernel_chunked(cb_ref, nodes_ref, rays_ref, t_ref, id_ref, *,
                    nn: int, cap: int, leaf_k: int, any_hit: bool,
                    tile: int):
    """One (ray-group, chunk) grid step of the streamed traversal: the
    node table lives in HBM; the pipeline DMAs chunk c's (cap, 128) block
    into VMEM while chunk c-1 computes (Pallas auto double-buffering).
    best_t/best_id persist in the output block across the chunk dimension
    (out index_map ignores it). cb_ref: f32[n_chunks_pad, 8] per-chunk
    bbox (lo, hi, pad2) — a failed packet-vs-chunk-bbox test skips the
    whole chunk walk."""
    from jax.experimental import pallas as pl
    c = pl.program_id(1)
    lo_c = c * cap
    hi_c = jnp.minimum(jnp.int32(nn), lo_c + cap)
    regs = _ray_regs(rays_ref, tile)

    @pl.when(c == 0)
    def _():
        t_ref[:] = jnp.full((1, tile), _BIG, jnp.float32)
        id_ref[:] = jnp.full((1, tile), -1, jnp.int32)

    sub = tile // 128
    best_t = t_ref[:].reshape(sub, 128)
    best_id = id_ref[:].reshape(sub, 128)

    # Chunk bbox precheck against every ray's current window.
    cb = cb_ref[c, :]
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

    def walk(args):
        bt, bi = args
        return _walk_range(nodes_ref, regs, lo_c, hi_c, lo_c, bt, bi,
                           leaf_k=leaf_k, any_hit=any_hit)

    best_t, best_id = jax.lax.cond(enter, walk, lambda a: a,
                                   (best_t, best_id))
    t_ref[:] = best_t.reshape(1, tile)
    id_ref[:] = best_id.reshape(1, tile)


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
                                    "use_stack"))
def traverse(nodes128, rays_packed, *, nn: int, leaf_k: int,
             any_hit: bool = False, interpret: bool = False,
             use_stack: bool = False):
    """(t f32[N], id i32[N]) for packed rays f32[8, N] (N a multiple of
    RAY_TILE; pad with maxt < mint). nodes128: f32[NNpad, 128]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = rays_packed.shape[1]
    # The stack flavor keeps the original 256-ray packet (its per-packet
    # scalar cursor work doesn't vectorize over sublanes).
    tile = 256 if use_stack else RAY_TILE
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
    else:
        def kern(nodes_ref, rays_ref, t_ref, id_ref):
            _kernel(nodes_ref, rays_ref, t_ref, id_ref, nn=nn,
                    leaf_k=leaf_k, any_hit=any_hit, tile=tile)
        scratch = []
    kern.__name__ = (f"bvh_packet_n{nn}_k{leaf_k}_a{int(any_hit)}"
                     f"_r{N}_s{int(use_stack)}")
    kern.__qualname__ = kern.__name__
    t, ids = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # whole node table
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((1, N), jnp.int32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(nodes128, rays_packed)
    return t[0], ids[0]


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# Above this node count the whole-table kernel's VMEM residency
# (512 B/node) stops fitting alongside ray/output blocks (~16 MB/core);
# intersect() switches to the streamed traverse_chunked instead of
# failing at compile time (ADVICE r3 medium: no fallback existed).
SINGLE_MAX_NODES = 22000
# Streamed-chunk size: 8192 rows = 4 MB per buffer; the pipeline
# double-buffers, so ~8 MB of VMEM plus the small ray/output blocks.
CHUNK_CAP = 8192
# Streamed-traversal ray-group size: per-grid-step fixed cost dominates
# culled chunks, so bigger groups than RAY_TILE win; A/B on config5_huge
# full render: 2048->2.39s, 4096->2.25s, 8192->2.48s.
CHUNK_TILE = 4096


@functools.partial(jax.jit,
                   static_argnames=("nn", "leaf_k", "any_hit", "interpret",
                                    "cap"))
def traverse_chunked(nodes128, rays_packed, *, nn: int, leaf_k: int,
                     any_hit: bool = False, interpret: bool = False,
                     cap: int = CHUNK_CAP):
    """Streamed traversal for node tables too large for VMEM residency
    (VERDICT r3 item 3: the ~130K-tri ceiling). The table stays in HBM;
    the grid is (ray_groups, chunks) with chunks minor, so for each
    2048-ray group the pipeline DMAs consecutive (cap, 128) chunks into
    VMEM (auto double-buffered) while best_t/best_id persist in the
    group's output block. Correctness rests on the skip-walk's cursor
    being monotonically increasing: an arbitrary contiguous preorder
    range can be walked starting at its first row, and every leaf is
    visited or correctly pruned in exactly one chunk (see _walk_range).
    Per-chunk bboxes let packets skip chunks their rays cannot touch."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = rays_packed.shape[1]
    # Bigger ray groups than the single-table kernel: the streamed grid's
    # per-step fixed cost (pipeline bookkeeping + chunk precheck) is the
    # dominant term for culled chunks, so halving the group count wins
    # even though 4096-ray packets have larger node-set unions.
    tile = CHUNK_TILE
    assert N % tile == 0
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

    def kern(cb_ref, nodes_ref, rays_ref, t_ref, id_ref):
        _kernel_chunked(cb_ref, nodes_ref, rays_ref, t_ref, id_ref,
                        nn=nn, cap=cap, leaf_k=leaf_k, any_hit=any_hit,
                        tile=tile)
    kern.__name__ = (f"bvh_chunked_n{nn}_c{cap}_k{leaf_k}"
                     f"_a{int(any_hit)}_r{N}")
    kern.__qualname__ = kern.__name__
    t, ids = pl.pallas_call(
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
        out_specs=[
            pl.BlockSpec((1, tile), lambda g, c: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda g, c: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((1, N), jnp.int32),
        ],
        interpret=interpret,
    )(cb, blk.reshape(nn_pad, 128), rays_packed)
    return t[0], ids[0]


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
    regs_w = _ray_regs(rays_ref, tile)

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
    if sort and N >= RAY_TILE:
        order = jnp.argsort(_sort_key(bvh, o, d))
        o = o[order]
        d = d[order]
        mint = mint[order]
        maxt = maxt[order]
    pad_tile = CHUNK_TILE if bvh.n_nodes > SINGLE_MAX_NODES else RAY_TILE
    Np = _ceil_to(max(N, 1), pad_tile)
    rays = jnp.concatenate(
        [o.T, d.T, mint[None], maxt[None]], axis=0)
    if Np != N:
        # Padding rays: mint 1 > maxt -1 -> the slab window is empty, the
        # packet skips straight to the sentinel for pure-padding tiles.
        pad = jnp.zeros((8, Np - N), jnp.float32)
        pad = pad.at[6].set(1.0).at[7].set(-1.0)
        rays = jnp.concatenate([rays, pad], axis=1)
    nodes = bvh.nodes
    if nodes.shape[1] != 128:
        nodes = jnp.pad(nodes, ((0, 0), (0, 128 - nodes.shape[1])))
    if bvh.n_nodes > SINGLE_MAX_NODES:
        t, ids = traverse_chunked(nodes, rays, nn=bvh.n_nodes,
                                  leaf_k=bvh.leaf_k, any_hit=any_hit,
                                  interpret=interpret)
    else:
        t, ids = traverse(nodes, rays, nn=bvh.n_nodes, leaf_k=bvh.leaf_k,
                          any_hit=any_hit, interpret=interpret)
    t = t[:N]
    ids = ids[:N]
    if order is not None:
        inv = jnp.zeros_like(order).at[order].set(jnp.arange(N))
        t = t[inv]
        ids = ids[inv]
    return t, ids, ids >= 0

"""Pallas TPU kernel: dense Möller-Trumbore ray-triangle intersection.

The jnp brute-force path (shapes/triangle.py:intersect) materializes
[N, T] cross-product intermediates (~10 f32[N,T] arrays) in HBM — at
128K rays x 4K triangles that is ~20 GB of HBM traffic per pass. This
kernel blocks (ray_tile x tri_tile) like a matmul: ray and triangle
tiles live in VMEM, the [RT, TT] pair grid exists only in registers, and
only the running (best_t, best_id) per ray ever leaves the core. The
per-pair test mirrors shapes/trianglemesh.cpp:213-278 exactly.

Layout: rays are packed as f32[8, N] rows (ox oy oz dx dy dz mint maxt)
so one ray tile is a single (8, RT) block — the native f32 sublane tile.
Triangles pack as f32[16, T] rows (v0 e1 e2, 9 used).

The kernel is argmin-only (which triangle, at what t); callers recompute
t for the winning triangle with the differentiable jnp test so inverse
rendering gradients flow exactly as in the jnp path (the winner choice
itself is non-differentiable in both).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

_BIG = 1e30  # python float: jnp scalars may not be captured by pallas kernels
RAY_TILE = 256
TRI_TILE = 512


def pack_rays(o, d, mint, maxt):
    """f32[8, N]: ox oy oz dx dy dz mint maxt."""
    return jnp.concatenate([o.T, d.T, mint[None], maxt[None]], axis=0)


def pack_tris(p0, p1, p2):
    """f32[16, T]: v0 e1 e2 rows (9 used, padded to the sublane tile)."""
    T = p0.shape[0]
    rows = jnp.concatenate([p0.T, (p1 - p0).T, (p2 - p0).T,
                            jnp.zeros((7, T), jnp.float32)], axis=0)
    return rows


def _kernel(ray_ref, tri_ref, nt_ref, t_ref, id_ref):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        t_ref[:] = jnp.full_like(t_ref, _BIG)
        id_ref[:] = jnp.full_like(id_ref, -1)

    r = ray_ref[:]                      # [8, RT]
    ox, oy, oz = r[0:1, :], r[1:2, :], r[2:3, :]   # [1, RT]
    dx, dy, dz = r[3:4, :], r[4:5, :], r[5:6, :]
    mint, maxt = r[6:7, :], r[7:8, :]

    tr = tri_ref[:]                     # [16, TT]
    v0x, v0y, v0z = tr[0, :], tr[1, :], tr[2, :]   # [TT]
    e1x, e1y, e1z = tr[3, :], tr[4, :], tr[5, :]
    e2x, e2y, e2z = tr[6, :], tr[7, :], tr[8, :]

    # All-pairs [RT, TT]: rays on the sublane axis, tris on the lane axis.
    def bc_ray(a):   # [1, RT] -> [RT, 1]
        return a.reshape(-1, 1)
    ox, oy, oz = bc_ray(ox), bc_ray(oy), bc_ray(oz)
    dx, dy, dz = bc_ray(dx), bc_ray(dy), bc_ray(dz)
    mint, maxt = bc_ray(mint), bc_ray(maxt)
    v0x, v0y, v0z = v0x[None, :], v0y[None, :], v0z[None, :]
    e1x, e1y, e1z = e1x[None, :], e1y[None, :], e1z[None, :]
    e2x, e2y, e2z = e2x[None, :], e2y[None, :], e2z[None, :]

    # s1 = d x e2
    s1x = dy * e2z - dz * e2y
    s1y = dz * e2x - dx * e2z
    s1z = dx * e2y - dy * e2x
    div = s1x * e1x + s1y * e1y + s1z * e1z
    ok = jnp.abs(div) > 1e-12
    inv = 1.0 / jnp.where(ok, div, 1.0)
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    b1 = (sx * s1x + sy * s1y + sz * s1z) * inv
    # s2 = s x e1
    s2x = sy * e1z - sz * e1y
    s2y = sz * e1x - sx * e1z
    s2z = sx * e1y - sy * e1x
    b2 = (dx * s2x + dy * s2y + dz * s2z) * inv
    t = (e2x * s2x + e2y * s2y + e2z * s2z) * inv

    TT = tr.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, TT), 1)
    in_range = col < (nt_ref[0] - j * TT)
    valid = ok & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0) & \
        (t > mint) & (t < maxt) & in_range
    t = jnp.where(valid, t, _BIG)

    chunk_best = jnp.min(t, axis=1)                       # [RT]
    chunk_arg = jnp.argmin(t, axis=1).astype(jnp.int32)   # [RT]
    chunk_id = jnp.where(chunk_best < _BIG, chunk_arg + j * TT, -1)

    cur_t = t_ref[0, :]
    upd = chunk_best < cur_t
    t_ref[0, :] = jnp.where(upd, chunk_best, cur_t)
    id_ref[0, :] = jnp.where(upd, chunk_id, id_ref[0, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def mt_best(rays_packed, tris_packed, n_tris, interpret: bool = False):
    """(t_best f32[N], id_best i32[N]) over all triangles; id -1 = miss.

    rays_packed: f32[8, N] (N a multiple of RAY_TILE — pad with maxt<mint).
    tris_packed: f32[16, Tpad] (Tpad a multiple of TRI_TILE).
    n_tris: i32[1] — real triangle count (tail columns masked off).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = rays_packed.shape[1]
    Tpad = tris_packed.shape[1]
    assert N % RAY_TILE == 0 and Tpad % TRI_TILE == 0
    grid = (N // RAY_TILE, Tpad // TRI_TILE)
    flops = 42 * N * Tpad
    t_best, id_best = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_TILE), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, TRI_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_TILE), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((1, N), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=rays_packed.nbytes * grid[1] + tris_packed.nbytes,
            transcendentals=0),
        interpret=interpret,
    )(rays_packed, tris_packed, n_tris)
    return t_best[0], id_best[0]


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# The kernel decides only WHICH triangle wins — a discrete choice with no
# useful tangent (same as argmin in the jnp path). Cotangents into it are
# zero; the caller recomputes the winner's t differentiably.
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mt_best_nondiff(rays_packed, tris_packed, n_tris, interpret):
    return mt_best(rays_packed, tris_packed, n_tris, interpret=interpret)


def _mt_fwd(rays_packed, tris_packed, n_tris, interpret):
    out = mt_best(rays_packed, tris_packed, n_tris, interpret=interpret)
    return out, (rays_packed.shape, tris_packed.shape)


def _mt_bwd(interpret, res, g):
    ray_shape, tri_shape = res
    return (jnp.zeros(ray_shape, jnp.float32),
            jnp.zeros(tri_shape, jnp.float32),
            jnp.zeros((1,), jnp.int32))


_mt_best_nondiff.defvjp(_mt_fwd, _mt_bwd)


def intersect_tris(p0, p1, p2, o, d, mint, maxt, interpret: bool = False):
    """Drop-in nearest-hit over T triangles: (t[N], id[N], hit[N]).

    Pads rays/tris to tile multiples, runs the Pallas kernel, then
    recomputes t for each winner with the differentiable jnp test.
    """
    from ..shapes.triangle import intersect_pairs

    N = o.shape[0]
    T = p0.shape[0]
    Np = _ceil_to(max(N, 1), RAY_TILE)
    Tp = _ceil_to(max(T, 1), TRI_TILE)

    rays = pack_rays(o, d, mint, maxt)
    rays = jnp.pad(rays, ((0, 0), (0, Np - N)))
    # Padding lanes: maxt 0 < mint 0 never hits anything... make explicit:
    tris = pack_tris(p0, p1, p2)
    tris = jnp.pad(tris, ((0, 0), (0, Tp - T)))

    _, id_best = _mt_best_nondiff(rays, tris, jnp.asarray([T], jnp.int32),
                                  interpret)
    id_best = id_best[:N]
    hit = id_best >= 0
    safe = jnp.maximum(id_best, 0)
    t_exact, _, _, v_exact = intersect_pairs(
        p0[safe], p1[safe], p2[safe], o, d, mint, maxt)
    hit = hit & v_exact
    t_best = jnp.where(hit, t_exact, _BIG)
    return t_best, jnp.where(hit, id_best, -1), hit

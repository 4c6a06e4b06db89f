"""Fused triangle tracing kernels: closest-hit and any-hit (occlusion).

The triangle-mesh analog of pallas_kernel.py, replacing the reference's
generic trace kernel instantiated with Moller-Trumbore functors
(ref: tests/render_triangle/tris_trace.cuh:11-117). Same dense-cull +
streaming structure:

  * triangles stored per 128-triangle segment as component-major slabs
    (n_segs, 16, 128): rows v0.xyz, e1.xyz, e2.xyz (the reference's
    Triangle{v, e1, e2} layout, triangle.cuh:11-20), zero padding rows are
    degenerate (det = 0) and can never hit;
  * per ray tile, stream the tile's culled segments and evaluate the dense
    (tile x 128) Moller-Trumbore test on the VPU;
  * closest-hit tracks a running (t_min, triangle id) pair per ray; the
    argmin rides as f32 ids (exact below 2^24), resolved per segment by an
    equality-select against the segment minimum;
  * any-hit ORs the per-segment hit reduction (shadow rays,
    ref: tris_render.cu:165-191).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grace_tpu.core.types import Rays
from grace_tpu.trace.pallas_kernel import SEG, _pack_rays, _ray_columns

EPS = 1e-7
BIG = 1e30


def _pack_tris(tris: jax.Array):
    """(n_segs, 16, SEG) slabs: rows v0(3), e1(3), e2(3), 7 zero pad."""
    n = tris.shape[0]
    n_pad = ((n + SEG - 1) // SEG) * SEG
    t = jnp.pad(tris, ((0, n_pad - n), (0, 0), (0, 0)))
    v0 = t[:, 0, :]
    e1 = t[:, 1, :] - v0
    e2 = t[:, 2, :] - v0
    rows = jnp.concatenate(
        [jnp.transpose(v0), jnp.transpose(e1), jnp.transpose(e2),
         jnp.zeros((7, n_pad), jnp.float32)], axis=0)  # (16, n_pad)
    return rows.reshape(16, n_pad // SEG, SEG).transpose(1, 0, 2), n_pad


def tri_segment_aabbs(tris: jax.Array):
    n = tris.shape[0]
    n_pad = ((n + SEG - 1) // SEG) * SEG
    mins = jnp.min(tris, axis=1)
    maxs = jnp.max(tris, axis=1)
    big = jnp.finfo(jnp.float32).max
    mins = jnp.pad(mins, ((0, n_pad - n), (0, 0)), constant_values=big)
    maxs = jnp.pad(maxs, ((0, n_pad - n), (0, 0)), constant_values=-big)
    return (jnp.min(mins.reshape(-1, SEG, 3), axis=1),
            jnp.max(maxs.reshape(-1, SEG, 3), axis=1))


def clip_rays_to_aabb(rays: Rays, bmin, bmax) -> Rays:
    """Clip ray lengths to the exit of an AABB (the mesh's bounds).

    Hits can only exist inside the mesh AABB, so shrinking every ray to
    its box-exit parameter (and to 0 for rays that miss the box) is
    semantically free — and it is what lets miss lanes CLOSE in the
    kernel's front-to-back termination test (r5: unclipped bench rays
    were 5x longer than the scene, so a single miss lane kept its whole
    tile running to the end of the segment list,
    benchmarks/results/r5_hw_notes.md)."""
    d = rays.directions
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
    t0 = (bmin[None, :] - rays.origins) * inv
    t1 = (bmax[None, :] - rays.origins) * inv
    tn = jnp.max(jnp.minimum(t0, t1), axis=1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=1)
    hit_box = tf >= jnp.maximum(tn, 0.0)
    ln = jnp.where(hit_box, jnp.minimum(rays.lengths, tf), 0.0)
    return Rays(rays.origins, rays.directions, jnp.maximum(ln, 0.0))


N_CULL_INTERVALS = 16  # r5 sweep: K16 beats K8 at t32 (37.4 vs 38.4 ms)


def _dense_tile_segments_tri(rays: Rays, tris, tile: int, max_chunks: int,
                             n_intervals: int = N_CULL_INTERVALS):
    """Per-tile triangle-segment lists, FRONT-TO-BACK ordered.

    Unlike the SPH cumulative kernels (order-free sums), closest-hit
    benefits enormously from distance order + early termination — the
    per-ray BVH descent the reference gets for free
    (kernels/bintree_trace.cuh) shows up here as: sort each tile's listed
    segments by a conservative entry-distance lower bound, and let the
    kernel stop once every lane's current hit precedes the next
    segment's entry. Returns (seg_ids, seg_dist, n_segs, overflow) where
    seg_dist[t, c] is a LOWER BOUND on the ray parameter of any hit in
    seg_ids[t, c] for unit-direction rays of tile t.

    Culling is per (tile, parameter-interval): each ray's [0, len] span
    is split into ``n_intervals`` equal parameter chunks and the AABB of
    each chunk of the tile's rays is tested against the segment AABBs —
    for a pinhole bundle these frustum-chunk boxes are FAR tighter than
    the single origins+endpoints hull (r5, bench torus: 562 -> 185
    listed segments/tile mean at K=8), and a segment first seen in
    interval k inherits the interval-start parameter as an extra entry
    lower bound. A segment between interval endpoint hulls always lies
    in their combined AABB, so the union of interval boxes covers every
    clipped ray point — the cull stays conservative.
    """
    seg_min, seg_max = tri_segment_aabbs(tris)
    n_tiles = rays.origins.shape[0] // tile
    K = n_intervals
    o = rays.origins.reshape(n_tiles, tile, 3)
    d = rays.directions.reshape(n_tiles, tile, 3)
    ln = jnp.maximum(rays.lengths, 0.0).reshape(n_tiles, tile)

    # endpoint hulls B_k over the tile's rays at t = ln * k/K, k = 0..K
    frac = jnp.arange(K + 1, dtype=jnp.float32) / K
    pts = o[:, :, None, :] + d[:, :, None, :] * (
        ln[:, :, None, None] * frac[None, None, :, None])
    bmin = jnp.min(pts, axis=1)                     # [T, K+1, 3]
    bmax = jnp.max(pts, axis=1)
    imin = jnp.minimum(bmin[:, :-1], bmin[:, 1:])   # [T, K, 3] chunk boxes
    imax = jnp.maximum(bmax[:, :-1], bmax[:, 1:])

    ov = jnp.ones((n_tiles, K, seg_min.shape[0]), jnp.bool_)
    for a in range(3):
        ov = ov & (imin[:, :, a:a + 1] <= seg_max[None, None, :, a]) \
                & (seg_min[None, None, :, a] <= imax[:, :, a:a + 1])
    kfirst = jnp.min(
        jnp.where(ov, jnp.arange(K, dtype=jnp.int32)[None, :, None], K),
        axis=1)                                     # [T, S]; K = not listed
    listed = kfirst < K

    # Entry lower bound: max of (a) gap from the ORIGIN-only hull (exact
    # camera distance for a pinhole) and (b) the first interval's start
    # parameter (tile-min length * k/K).
    omin = jnp.min(o, axis=1)
    omax = jnp.max(o, axis=1)
    g2 = jnp.zeros(listed.shape, jnp.float32)
    for a in range(3):
        g = jnp.maximum(seg_min[None, :, a] - omax[:, a:a + 1],
                        omin[:, a:a + 1] - seg_max[None, :, a])
        g = jnp.maximum(g, 0.0)
        g2 = g2 + g * g
    ln_min = jnp.min(ln, axis=1)                    # [T]
    t_lo = kfirst.astype(jnp.float32) / K * ln_min[:, None]
    dist = jnp.maximum(jnp.sqrt(g2), t_lo)

    key = jnp.where(listed, dist, jnp.float32(BIG))
    n_segs_total = listed.shape[1]
    idx = jnp.broadcast_to(
        jnp.arange(n_segs_total, dtype=jnp.int32)[None, :], listed.shape)
    key_s, idx_s = jax.lax.sort((key, idx), num_keys=1)
    n_segs = jnp.sum(listed, axis=1).astype(jnp.int32)
    keep = min(max_chunks, n_segs_total)
    seg_ids = jnp.pad(idx_s[:, :keep], ((0, 0), (0, max_chunks - keep)))
    seg_dist = jnp.pad(key_s[:, :keep], ((0, 0), (0, max_chunks - keep)),
                       constant_values=BIG)
    overflow = n_segs > max_chunks
    return seg_ids, seg_dist, jnp.minimum(n_segs, max_chunks), overflow


def _mt_candidates(slab, ox, oy, oz, dx, dy, dz, ln):
    """(tile, SEG) Moller-Trumbore t values (BIG where missed)."""
    v0x, v0y, v0z = slab[0:1, :], slab[1:2, :], slab[2:3, :]
    e1x, e1y, e1z = slab[3:4, :], slab[4:5, :], slab[5:6, :]
    e2x, e2y, e2z = slab[6:7, :], slab[7:8, :], slab[8:9, :]
    # p = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = 1.0 / jnp.where(jnp.abs(det) > EPS, det, EPS)
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    u = (sx * px + sy * py + sz * pz) * inv_det
    # q = s x e1
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = ((det > EPS) & (u >= 0.0) & (u <= 1.0)
           & (v >= 0.0) & (u + v <= 1.0) & (t > EPS) & (t < ln))
    return jnp.where(hit, t, BIG)


def _tri_kernel(n_segs_ref, segs_ref, dist_ref, rays_ref, tris_ref,
                t_ref, id_ref, *, mode):
    tile = rays_ref.shape[0]
    cap = segs_ref.shape[2]
    ox, oy, oz, dx, dy, dz, ln = _ray_columns(rays_ref)
    n = n_segs_ref[0, 0, 0]
    # int32 iota + cast: Mosaic rejects float tpu.iota on hardware.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, SEG), 1).astype(jnp.float32)

    def seg_update(k, t_min, tri_id):
        seg = segs_ref[0, 0, k]
        tcand = _mt_candidates(tris_ref[seg], ox, oy, oz, dx, dy, dz, ln)
        if mode == "any":
            return jnp.minimum(t_min, jnp.min(tcand, axis=1, keepdims=True)), tri_id
        seg_min = jnp.min(tcand, axis=1, keepdims=True)          # (tile, 1)
        ids = jnp.where(tcand <= seg_min, lane, jnp.float32(BIG))
        seg_id = jnp.min(ids, axis=1, keepdims=True) + seg.astype(jnp.float32) * SEG
        closer = seg_min < t_min
        t_min = jnp.where(closer, seg_min, t_min)
        tri_id = jnp.where(closer, seg_id, tri_id)
        return t_min, tri_id

    # Front-to-back early termination (the list is distance-ordered),
    # checked once per CHUNK of B segments so the B-wide unrolled body
    # keeps Mosaic's slab-load/compute pipelining (a per-segment
    # while_loop condition serializes every iteration on a cross-lane
    # reduce — measured SLOWER than no termination at all). A lane is
    # closed when its current closest hit precedes the next chunk's
    # conservative entry distance, or when that distance exceeds its ray
    # length (this closes miss lanes — without the length cap any lane
    # that never hits keeps every tile running to the end of its list).
    # Chunk overrun past n is harmless: list entries beyond n are
    # non-overlapping segments (every candidate BIG) and both modes'
    # updates are monotone mins.
    B = 8

    def cond(carry):
        kb, t_min, _ = carry
        d = dist_ref[0, 0, jnp.minimum(kb * B, cap - 1)]
        if mode == "any":
            # open = unoccluded lane whose length still reaches later segs
            open_metric = jnp.max(
                jnp.where(t_min >= jnp.float32(BIG), ln, jnp.float32(-1.0)))
            return (kb * B < n) & (open_metric > d)
        return (kb * B < n) & (jnp.max(jnp.minimum(t_min, ln)) >= d)

    def body(carry):
        kb, t_min, tri_id = carry
        for u in range(B):
            k = jnp.minimum(kb * B + u, cap - 1)
            t_min, tri_id = seg_update(k, t_min, tri_id)
        return kb + 1, t_min, tri_id

    t0 = jnp.full((tile, 1), BIG, jnp.float32)
    i0 = jnp.full((tile, 1), -1.0, jnp.float32)
    _, t_min, tri_id = jax.lax.while_loop(cond, body, (jnp.int32(0), t0, i0))
    t_ref[...] = t_min
    id_ref[...] = tri_id


@functools.partial(
    jax.jit, static_argnames=("tile", "max_chunks", "mode", "interpret",
                              "n_cull_intervals")
)
def pallas_trace_tri(
    rays: Rays,
    tris: jax.Array,
    tile: int = 32,  # r5 sweep optimum with interval culling (r5_hw_notes)
    max_chunks: int = 2048,
    mode: str = "closest",
    interpret: bool = False,
    n_cull_intervals: int = N_CULL_INTERVALS,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Closest-hit (mode='closest': returns t f32[R], tri i32[R] with -1 for
    miss) or occlusion (mode='any': returns occluded bool[R] and -1s) trace
    of a triangle mesh. Also returns the per-tile overflow flags.
    """
    if mode not in ("closest", "any"):
        raise ValueError(f"unknown mode {mode!r}")
    n_rays = rays.n_rays
    pad = (-n_rays) % tile
    if pad:
        rays = Rays(
            jnp.concatenate([rays.origins, jnp.broadcast_to(rays.origins[-1:], (pad, 3))]),
            jnp.concatenate([rays.directions, jnp.broadcast_to(rays.directions[-1:], (pad, 3))]),
            jnp.concatenate([rays.lengths, jnp.full((pad,), -1.0, jnp.float32)]),
        )
    # Clip every ray to the mesh-AABB exit (semantically free — no hit can
    # lie outside it) so miss lanes can close in the front-to-back
    # termination test and the interval cull sees true spans.
    rays = clip_rays_to_aabb(rays, jnp.min(tris, axis=(0, 1)),
                             jnp.max(tris, axis=(0, 1)))
    seg_ids, seg_dist, n_segs, overflow = _dense_tile_segments_tri(
        rays, tris, tile, max_chunks, n_intervals=n_cull_intervals)
    packed, r_pad = _pack_rays(rays, tile)
    tris3d, _ = _pack_tris(tris)
    n_tiles = r_pad // tile

    # The resident triangle slabs alone can exceed Mosaic's default 16 MB
    # scoped-vmem budget (2048 slabs = 16.8 MB at 262k tris); size the
    # limit to the actual residency (the records kernel's pattern).
    params = pltpu.CompilerParams(
        vmem_limit_bytes=int(tris3d.size) * 4 + 16 * 1024 * 1024)
    t_out, id_out = pl.pallas_call(
        functools.partial(_tri_kernel, mode=mode),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
        ),
        compiler_params=params,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, seg_ids.shape[1]), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, seg_dist.shape[1]), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(n_segs[:, None, None], seg_ids[:, None, :], seg_dist[:, None, :],
      packed, tris3d)

    t = t_out[:n_rays, 0]
    miss = t >= BIG
    if mode == "any":
        return jnp.logical_not(miss), jnp.full((n_rays,), -1, jnp.int32), overflow
    tri = jnp.where(miss, -1, id_out[:n_rays, 0].astype(jnp.int32))
    t = jnp.where(miss, jnp.inf, t)
    return t, tri, overflow

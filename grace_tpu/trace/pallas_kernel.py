"""Fused SPH trace as a streaming Pallas TPU kernel.

The performance path replacing the reference's warp-cooperative trace kernel
(ref: include/grace/cuda/kernels/bintree_trace.cuh:52-197). Three-stage
design:

  stage 1+2  broadphase: per-tile lists of 128-primitive ALIGNED segments
           of the Morton-sorted primitive array. Default is the dense cull
           (grace_tpu.trace.pallas_broadphase — tile AABB x segment AABB as
           one vectorized matrix); `broadphase='xla'` keeps the lockstep BVH
           walk (grace_tpu.trace.broadphase) as the oracle. Segments
           partition primitive space and lists are unique per tile, so each
           primitive is tested at most once per tile; segment padding
           (h = 0) can never hit — no masks needed in the kernel.
  stage 3  THIS KERNEL: grid over ray tiles; per tile, stream its segment
           list with double-buffered HBM->VMEM DMA of (8, 128) component-
           major primitive slabs (the analog of the reference's warp-
           cooperative SMEM staging, bintree_trace.cuh:178-181), and
           evaluate the dense (tile_rays x 128) intersection + cubic-spline
           line integral on the VPU. The SPH integral uses the Clenshaw
           piecewise-Chebyshev form (kernel_integrals.py) — no gathers.

Layouts are chosen for Mosaic's (sublane, lane) tiling rules:
  rays  f32[R_pad, 16]    one row per ray (o, d, 1/d, len, pad) — block
                          (TILE, 16); per-component (TILE, 1) sublane columns.
  prims f32[8, N_pad]     component-major (x, y, z, h, 4 zero rows); manual
                          DMA slices are (8, 128) and 128-lane aligned.
  out   f32[R_pad, 1]     per-ray accumulator column.

Segment lists ride in SMEM per tile (the paged-attention block-table
pattern). Conservative culling: a hit found from any extra primitive in an
overlapped segment is a true hit (the exact per-ray test decides), and
dedup guarantees it is counted exactly once.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grace_tpu.core.tree import Tree
from grace_tpu.core.types import Rays
from grace_tpu.sph.kernel_integrals import (HORNER1_DEG,
                                            cubic_spline_line_integral_horner1)
from grace_tpu.trace.broadphase import collect_tile_chunks

DEFAULT_TILE = 512
SEG = 128  # primitives per aligned segment (= one DMA slab of lanes)


def _pack_rays(rays: Rays, tile: int):
    n = rays.n_rays
    pad = (-n) % tile
    o = jnp.pad(rays.origins, ((0, pad), (0, 0)))
    d = jnp.pad(rays.directions, ((0, pad), (0, 0)), constant_values=1.0)
    ln = jnp.pad(rays.lengths, ((0, pad),), constant_values=-1.0)  # never hits
    inv = 1.0 / d
    cols = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
            inv[:, 0], inv[:, 1], inv[:, 2], ln]
    packed = jnp.stack(cols + [jnp.zeros_like(ln)] * (16 - len(cols)), axis=1)
    return packed, n + pad


def _pack_prims(spheres: jax.Array):
    """Component-major f32[8, N_pad] with h = 0 padding (cannot hit).

    Rows: x, y, z, h, 1/h^2 (0 where h = 0), h^2, 0, 0. The derived rows are
    baked here so the hot kernel never divides (inv_h2) and the hitcount
    compare uses the identical h*h the XLA engine computes."""
    n = spheres.shape[0]
    n_pad = ((n + SEG - 1) // SEG) * SEG
    p = jnp.pad(spheres, ((0, n_pad - n), (0, 0)))
    pt = jnp.transpose(p)                      # (4, N_pad)
    h = pt[3:4, :]
    h2 = h * h
    inv_h2 = jnp.where(h2 > 0.0, 1.0 / jnp.maximum(h2, 1e-30), 0.0)
    zeros = jnp.zeros_like(h)
    return jnp.concatenate([pt, inv_h2, h2, zeros, zeros], axis=0), n_pad


def tile_segments(rays: Rays, tree: Tree, tile: int, max_chunks: int,
                  n_prims: int, stack_size: int = 128):
    """Stages 1+2: per-tile deduplicated 128-aligned segment ids.

    Returns (seg_ids i32[n_tiles, max_chunks], n_segs i32[n_tiles],
    overflow bool[n_tiles]).
    """
    chunks = collect_tile_chunks(rays, tree, tile, max_chunks, stack_size)
    n_seg_total = (n_prims + SEG - 1) // SEG
    valid = jnp.arange(chunks.first.shape[1]) < chunks.n_chunks[:, None]
    lo = chunks.first >> 7
    hi = (chunks.first + jnp.maximum(chunks.count - 1, 0)) >> 7
    big = jnp.int32(n_seg_total)  # sorts after every real segment id
    segs = jnp.concatenate(
        [jnp.where(valid, lo, big), jnp.where(valid & (hi != lo), hi, big)],
        axis=1,
    )
    segs = jnp.sort(segs, axis=1)
    fresh = jnp.concatenate(
        [jnp.ones_like(segs[:, :1], jnp.bool_), segs[:, 1:] != segs[:, :-1]],
        axis=1,
    ) & (segs < big)
    # Stable-compact unique segments to the front.
    order = jnp.argsort(jnp.logical_not(fresh), axis=1, stable=True)
    segs_u = jnp.take_along_axis(segs, order, axis=1)
    n_segs = jnp.sum(fresh, axis=1).astype(jnp.int32)
    seg_ids = jnp.where(
        jnp.arange(segs_u.shape[1]) < n_segs[:, None], segs_u, 0
    )[:, : chunks.first.shape[1]]
    n_kept = jnp.minimum(n_segs, seg_ids.shape[1])
    overflow = chunks.overflow | (n_segs > seg_ids.shape[1])
    return seg_ids, n_kept, overflow


def _seg_compute(slab, ox, oy, oz, dx, dy, dz, ln, acc, mode,
                 integral_deg=HORNER1_DEG):
    """(tile, SEG) accumulator update against one primitive slab.

    The accumulator is the full (tile, SEG) matrix — the expensive cross-lane
    reduction to (tile, 1) happens ONCE per tile after the segment loop, not
    per slab. The integral is the single-piece Horner form
    (kernel_integrals.cubic_spline_line_integral_horner1): one FMA per
    polynomial degree and zero selects, and its clamped v^3*sqrt(v)
    prefactor vanishes for u >= 1 so no explicit in-support mask is needed
    on the cumulative path.
    """
    px = slab[0:1, :]            # (1, SEG)
    py = slab[1:2, :]
    pz = slab[2:3, :]

    # sphere_hit (ref: generic/intersect.h:10-55), tile rays x segment.
    rx = px - ox                 # (TILE, SEG)
    ry = py - oy
    rz = pz - oz
    dot = rx * dx + ry * dy + rz * dz
    bx = rx - dot * dx
    by = ry - dot * dy
    bz = rz - dot * dz
    b2 = bx * bx + by * by + bz * bz
    along = (dot >= 0.0) & (dot < ln)

    if mode == "cumulative":
        inv_h2 = slab[4:5, :]
        u = b2 * inv_h2
        if integral_deg < 0:
            # direct fit: fuse its u < 1 support test into the along
            # select — one where + compare per pair instead of two
            # (the hot loop runs ~13 effective ops/pair; see
            # general_trace_floor_r3.md r5 addendum).
            from grace_tpu.sph.kernel_integrals import (
                cubic_spline_line_integral_direct_raw)

            f = cubic_spline_line_integral_direct_raw(u, -integral_deg)
            return acc + jnp.where(along & (u < 1.0), f * inv_h2, 0.0)
        f = cubic_spline_line_integral_horner1(u, deg=integral_deg)
        return acc + jnp.where(along, f * inv_h2, 0.0)  # 0 outside support
    h2 = slab[5:6, :]
    hit = (b2 < h2) & along
    return acc + hit.astype(jnp.float32)


def _ray_columns(rays_ref):
    rays = rays_ref[...]
    return (rays[:, 0:1], rays[:, 1:2], rays[:, 2:3], rays[:, 3:4],
            rays[:, 4:5], rays[:, 5:6], rays[:, 9:10])


def _trace_tile_kernel_stream(
    n_segs_ref,     # SMEM (1, 1, 1)
    segs_ref,       # SMEM (1, 1, max_chunks)
    rays_ref,       # VMEM (TILE, 16)
    prims_ref,      # HBM (8, N_pad)
    out_ref,        # VMEM (TILE, 1)
    pbuf,           # VMEM scratch (NBUF, 8, SEG)
    sem,            # DMA sems (NBUF,)
    *,
    mode: str,
    integral_deg: int = HORNER1_DEG,
):
    tile = rays_ref.shape[0]
    nbuf = pbuf.shape[0]
    ox, oy, oz, dx, dy, dz, ln = _ray_columns(rays_ref)
    n = n_segs_ref[0, 0, 0]

    def dma(slot, k):
        seg = segs_ref[0, 0, k]
        return pltpu.make_async_copy(
            prims_ref.at[:, pl.ds(seg * SEG, SEG)], pbuf.at[slot], sem.at[slot]
        )

    # Warm the pipeline nbuf deep.
    for w in range(nbuf):
        @pl.when(w < n)
        def _(w=w):
            dma(w, w).start()

    def body(k, acc):
        slot = jax.lax.rem(k, nbuf)
        dma(slot, k).wait()
        acc = _seg_compute(pbuf[slot], ox, oy, oz, dx, dy, dz, ln, acc, mode)

        # Refill THIS slot only after its contents were consumed; issuing the
        # k+nbuf fetch before the wait would race the pending slab.
        @pl.when(k + nbuf < n)
        def _():
            dma(slot, k + nbuf).start()

        return acc

    acc0 = jnp.zeros((tile, SEG), jnp.float32)
    acc = jax.lax.fori_loop(0, n, body, acc0)
    out_ref[...] = jnp.sum(acc, axis=1, keepdims=True)


def _trace_tile_kernel_resident(
    n_segs_ref,     # SMEM (1, 1, 1)
    segs_ref,       # SMEM (1, 1, max_chunks)
    rays_ref,       # VMEM (TILE, 16)
    prims_ref,      # VMEM (n_segs, 8, SEG) — whole particle set resident
    out_ref,        # VMEM (TILE, 1)
    *,
    mode: str,
    integral_deg: int = HORNER1_DEG,
    unroll: int,
):
    """No-DMA variant: the entire (segmented) particle array lives in VMEM
    and slabs are read by dynamic leading-axis indexing. Usable while
    n_segs * 8 * SEG * 4B fits the VMEM budget (~2-3M particles)."""
    tile = rays_ref.shape[0]
    ox, oy, oz, dx, dy, dz, ln = _ray_columns(rays_ref)
    n = n_segs_ref[0, 0, 0]

    # UNROLL-wide main loop amortizes loop/branch overhead (measured: 1.8x
    # from unroll 1 -> 16 at tile=64); the remainder is handled by a scalar
    # tail loop. Duplicate trailing reads in the main loop are avoided by
    # flooring to the unrolled count.

    def body(ku, acc):
        k = ku * unroll
        for u in range(unroll):
            slab = prims_ref[segs_ref[0, 0, k + u]]
            acc = _seg_compute(slab, ox, oy, oz, dx, dy, dz, ln, acc, mode,
                               integral_deg=integral_deg)
        return acc

    def tail(k, acc):
        slab = prims_ref[segs_ref[0, 0, k]]
        return _seg_compute(slab, ox, oy, oz, dx, dy, dz, ln, acc, mode,
                            integral_deg=integral_deg)

    acc0 = jnp.zeros((tile, SEG), jnp.float32)
    n_main = (n // unroll) * unroll
    acc = jax.lax.fori_loop(0, n // unroll, body, acc0)
    acc = jax.lax.fori_loop(n_main, n, tail, acc)
    out_ref[...] = jnp.sum(acc, axis=1, keepdims=True)


_CTZ_MASKS = tuple(
    int(np.int32(np.uint32(m)))
    for m in (0xAAAAAAAA, 0xCCCCCCCC, 0xF0F0F0F0, 0xFF00FF00, 0xFFFF0000)
)


def _ctz_i32(word):
    """Count trailing zeros of a nonzero i32 scalar, using only integer ops
    Mosaic lowers on the scalar core (no bitcasts/clz): isolate the lowest
    set bit (word & -word, an exact power of two) and read its position as
    5 mask tests — bit k of the answer is set iff the power of two survives
    the k-th alternating mask."""
    low = word & (-word)
    s = jnp.int32(0)
    for k, m in enumerate(_CTZ_MASKS):
        s = s | (((low & jnp.int32(m)) != 0).astype(jnp.int32) << k)
    return s


def _trace_tile_kernel_bitmask(
    mask_ref,       # SMEM (1, 1, n_words) i32 — bit s of word w = segment w*32+s
    rays_ref,       # VMEM (TILE, 16)
    prims_ref,      # VMEM (n_segs, 8, SEG) — whole particle set resident
    out_ref,        # VMEM (TILE, 1)
    seg_list,       # SMEM scratch (n_words*32,) i32
    *,
    mode: str,
    integral_deg: int = HORNER1_DEG,
    unroll: int,
):
    """Bitmask-driven resident kernel, two phases per tile:

    1. scalar phase: decode the tile's overlap words into a segment-id list
       in SMEM scratch (while word != 0: seg = ctz; word &= word-1) — the
       compaction the r1 design did as a 46 ms XLA argsort now costs ~3k
       scalar ops inside the kernel, and can never overflow (the scratch
       holds every segment id).
    2. vector phase: the unrolled resident loop over the list (identical to
       _trace_tile_kernel_resident) — unlike a fused while-over-bits loop,
       this keeps the vector pipeline free of the serial scalar dependency
       chain (measured 2x faster than the fused form).
    """
    tile = rays_ref.shape[0]
    n_words = mask_ref.shape[2]
    ox, oy, oz, dx, dy, dz, ln = _ray_columns(rays_ref)

    def word_body(w, n):
        word0 = mask_ref[0, 0, w]

        def emit(state):
            # Branch-free bit-serial extraction, statically unrolled: write
            # the candidate seg id unconditionally, advance the cursor only
            # when the bit is set (unset bits just overwrite the same slot).
            # ~5 independent scalar ops per bit pipelines far better than a
            # ctz/while chain (measured ~30 serial cycles per set bit).
            word, n = state
            for s in range(32):
                seg_list[n] = w * 32 + s
                n = n + ((word >> s) & 1)
            return n

        return jax.lax.cond(word0 != 0, emit, lambda s: s[1], (word0, n))

    n = jax.lax.fori_loop(0, n_words, word_body, jnp.int32(0))

    def body(ku, acc):
        k = ku * unroll
        for u in range(unroll):
            slab = prims_ref[seg_list[k + u]]
            acc = _seg_compute(slab, ox, oy, oz, dx, dy, dz, ln, acc, mode,
                               integral_deg=integral_deg)
        return acc

    def tail(k, acc):
        slab = prims_ref[seg_list[k]]
        return _seg_compute(slab, ox, oy, oz, dx, dy, dz, ln, acc, mode,
                            integral_deg=integral_deg)

    acc0 = jnp.zeros((tile, SEG), jnp.float32)
    acc = jax.lax.fori_loop(0, n // unroll, body, acc0)
    acc = jax.lax.fori_loop((n // unroll) * unroll, n, tail, acc)
    out_ref[...] = jnp.sum(acc, axis=1, keepdims=True)


def _trace_tile_kernel_quarter(
    summary_ref,    # SMEM (1, 1, n_swords) i32 — bit w of sword s: word
    #                 s*32+w of mask_ref is nonzero
    mask_ref,       # SMEM (1, 1, n_words) i32 — bit q of word w = QUARTER
    #                 (32 prims) w*32+q overlaps this tile
    rays_ref,       # VMEM (TILE, 16)
    prims_ref,      # VMEM (n_segs + 1, 8, SEG) — resident slabs, last all 0
    out_ref,        # VMEM (TILE, 1)
    q_list,         # SMEM scratch (n_words*32 + 3,) i32
    *,
    mode: str,
    integral_deg: int = HORNER1_DEG,
    unroll: int,
    pad_qid: int,
):
    """Seg-32 (quarter-granularity) bitmask kernel.

    Culling at 32-prim quarters cuts tested pairs ~2x vs 128-prim segments
    (general_trace_floor_r3.md selectivity table), but 32-lane compute is a
    4x lane-occupancy loss — so the vector phase ASSEMBLES full (8, 128)
    compute slabs from groups of 4 listed quarters: each quarter's parent
    slab is dynamically loaded and lane-rotated (tpu dynamic_rotate via
    pltpu.roll) so quarter j of the group lands on lanes 32j..32j+31, then
    three lane-range selects merge the group. ~11 single-vreg vector ops
    per assembled slab against ~176 cycles of pair tests it replaces.

    The scalar decode walks the summary words first (one bit test skips 32
    empty quarter words): at 1M particles the quarter word array is 1024
    words/tile and ~95% zero — a flat scan would cost more scalar cycles
    than the vector win."""
    tile = rays_ref.shape[0]
    n_swords = summary_ref.shape[2]
    n_words = mask_ref.shape[2]
    ox, oy, oz, dx, dy, dz, ln = _ray_columns(rays_ref)

    def sword_body(sw, n):
        sword0 = summary_ref[0, 0, sw]

        def walk(state):
            _, n = state

            def word_body(b, n):
                word0 = mask_ref[0, 0, sw * 32 + b]

                def emit(state2):
                    word, n = state2
                    for s in range(32):
                        q_list[n] = (sw * 32 + b) * 32 + s
                        n = n + ((word >> s) & 1)
                    return n

                return jax.lax.cond(word0 != 0, emit, lambda st: st[1],
                                    (word0, n))

            # Bound the walk by the REAL word count: the last summary
            # word covers fewer than 32 words when n_words % 32 != 0, and
            # reading past the SMEM block is garbage on hardware (and
            # clamp-to-last in interpret mode, which emits phantom
            # quarter ids).
            hi = jnp.minimum(jnp.int32(32), n_words - sw * 32)
            return jax.lax.fori_loop(0, hi, word_body, n)

        return jax.lax.cond(sword0 != 0, walk, lambda st: st[1], (sword0, n))

    n = jax.lax.fori_loop(0, n_swords, sword_body, jnp.int32(0))

    # Pad the list to a whole group of 4 with the all-zero slab's quarter 0
    # (zero h2 / inv_h2 contribute exactly nothing in either mode).
    n4 = (n + 3) & ~jnp.int32(3)

    def pad_body(k, carry):
        q_list[k] = pad_qid
        return carry

    jax.lax.fori_loop(n, n4, pad_body, 0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, SEG), 1)

    def assemble(base):
        rs = []
        for j in range(4):
            q = q_list[base + j]
            s = prims_ref[q >> 2]
            # place source quarter (q & 3) at target lanes 32j..32j+31
            sh = (((j - (q & 3)) & 3) * 32).astype(jnp.int32)
            rs.append(pltpu.roll(s, sh, axis=1))
        quad = lane >> 5
        return jnp.where(quad == 0, rs[0],
                         jnp.where(quad == 1, rs[1],
                                   jnp.where(quad == 2, rs[2], rs[3])))

    def body(ku, acc):
        k = ku * unroll
        for u in range(unroll):
            slab = assemble((k + u) * 4)
            acc = _seg_compute(slab, ox, oy, oz, dx, dy, dz, ln, acc, mode,
                               integral_deg=integral_deg)
        return acc

    def tail(k, acc):
        slab = assemble(k * 4)
        return _seg_compute(slab, ox, oy, oz, dx, dy, dz, ln, acc, mode,
                            integral_deg=integral_deg)

    n_groups = n4 >> 2
    acc0 = jnp.zeros((tile, SEG), jnp.float32)
    acc = jax.lax.fori_loop(0, n_groups // unroll, body, acc0)
    acc = jax.lax.fori_loop((n_groups // unroll) * unroll, n_groups, tail, acc)
    out_ref[...] = jnp.sum(acc, axis=1, keepdims=True)


def _trace_tile_kernel_qlist(
    n_ref,          # SMEM (1, 1, 1) i32 — listed quarter count
    qlist_ref,      # SMEM (1, 1, max_q) i32 — compacted quarter ids,
    #                 entries >= n pre-padded with pad_qid (the appended
    #                 all-zero slab) by the XLA side
    rays_ref,       # VMEM (TILE, 16)
    prims_ref,      # VMEM (n_segs + 1, 8, SEG) — resident slabs, last all 0
    out_ref,        # VMEM (TILE, 1)
    *,
    mode: str,
    integral_deg: int = HORNER1_DEG,
    unroll: int,
):
    """Quarter kernel fed a PRE-COMPACTED list (broadphase='qlist'): the
    vector phase of _trace_tile_kernel_quarter with zero in-kernel scalar
    decode — the list comes from the XLA-side set-bit compaction
    (pallas_broadphase.compact_mask_words). The scalar decode was the
    per-tile fixed cost (~5k scalar cycles at bench scale) that made fine
    ray tiles lose on hardware (r4 addendum in
    benchmarks/results/general_trace_floor_r3.md); with it hoisted, tile
    size can chase broadphase selectivity down to the seg-32 floor."""
    tile = rays_ref.shape[0]
    ox, oy, oz, dx, dy, dz, ln = _ray_columns(rays_ref)
    n = n_ref[0, 0, 0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, SEG), 1)

    def assemble(base):
        rs = []
        for j in range(4):
            q = qlist_ref[0, 0, base + j]
            s = prims_ref[q >> 2]
            # place source quarter (q & 3) at target lanes 32j..32j+31
            sh = (((j - (q & 3)) & 3) * 32).astype(jnp.int32)
            rs.append(pltpu.roll(s, sh, axis=1))
        quad = lane >> 5
        return jnp.where(quad == 0, rs[0],
                         jnp.where(quad == 1, rs[1],
                                   jnp.where(quad == 2, rs[2], rs[3])))

    def body(ku, acc):
        k = ku * unroll
        for u in range(unroll):
            slab = assemble((k + u) * 4)
            acc = _seg_compute(slab, ox, oy, oz, dx, dy, dz, ln, acc, mode,
                               integral_deg=integral_deg)
        return acc

    def tail(k, acc):
        slab = assemble(k * 4)
        return _seg_compute(slab, ox, oy, oz, dx, dy, dz, ln, acc, mode,
                            integral_deg=integral_deg)

    n_groups = (n + 3) >> 2
    acc0 = jnp.zeros((tile, SEG), jnp.float32)
    acc = jax.lax.fori_loop(0, n_groups // unroll, body, acc0)
    acc = jax.lax.fori_loop((n_groups // unroll) * unroll, n_groups, tail, acc)
    out_ref[...] = jnp.sum(acc, axis=1, keepdims=True)


def _trace_tile_kernel_quarter_stream(
    summary_ref,    # SMEM (1, 1, n_swords) i32
    mask_ref,       # SMEM (1, 1, n_words) i32 quarter-granularity words
    rays_ref,       # VMEM (TILE, 16)
    prims_ref,      # HBM (8, N_pad) component-major
    out_ref,        # VMEM (TILE, 1)
    q_list,         # SMEM scratch (n_words*32 + 3,) i32
    pbuf,           # VMEM scratch (8, 8, SEG): 2 groups x 4 parent slabs
    sem,            # DMA sems (8,)
    *,
    mode: str,
    integral_deg: int = HORNER1_DEG,
):
    """Streaming (any-scene-size) quarter kernel: the seg-32 decode +
    4-quarter slab assembly of _trace_tile_kernel_quarter, with each
    group's 4 PARENT slabs double-buffered from HBM (two groups in
    flight). Tail padding points at quarter 0 and is masked by zeroing
    the lanes of out-of-list quarters (the resident variant's appended
    zero slab has no HBM analog). DMA volume is 4x the bitmask-stream
    kernel per tested primitive (each 128-lane compute slab pulls 4
    parent slabs) — still ~milliseconds of HBM traffic at bench scale."""
    tile = rays_ref.shape[0]
    n_swords = summary_ref.shape[2]
    n_words = mask_ref.shape[2]
    ox, oy, oz, dx, dy, dz, ln = _ray_columns(rays_ref)

    def sword_body(sw, n):
        sword0 = summary_ref[0, 0, sw]

        def walk(state):
            _, n = state

            def word_body(b, n):
                word0 = mask_ref[0, 0, sw * 32 + b]

                def emit(state2):
                    word, n = state2
                    for s in range(32):
                        q_list[n] = (sw * 32 + b) * 32 + s
                        n = n + ((word >> s) & 1)
                    return n

                return jax.lax.cond(word0 != 0, emit, lambda st: st[1],
                                    (word0, n))

            # Bound the walk by the REAL word count: the last summary
            # word covers fewer than 32 words when n_words % 32 != 0, and
            # reading past the SMEM block is garbage on hardware (and
            # clamp-to-last in interpret mode, which emits phantom
            # quarter ids).
            hi = jnp.minimum(jnp.int32(32), n_words - sw * 32)
            return jax.lax.fori_loop(0, hi, word_body, n)

        return jax.lax.cond(sword0 != 0, walk, lambda st: st[1], (sword0, n))

    n = jax.lax.fori_loop(0, n_swords, sword_body, jnp.int32(0))
    n4 = (n + 3) & ~jnp.int32(3)

    def pad_body(k, carry):
        q_list[k] = 0
        return carry

    jax.lax.fori_loop(n, n4, pad_body, 0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, SEG), 1)
    quad = lane >> 5

    def dma(slot, qk):
        seg = q_list[qk] >> 2
        return pltpu.make_async_copy(
            prims_ref.at[:, pl.ds(seg * SEG, SEG)], pbuf.at[slot],
            sem.at[slot])

    for j in range(8):
        @pl.when(j < n4)
        def _(j=j):
            dma(j, j).start()

    def grp_body(kg, acc):
        base_slot = jax.lax.rem(kg, 2) * 4
        rs = []
        for j in range(4):
            dma(base_slot + j, kg * 4 + j).wait()
            q = q_list[kg * 4 + j]
            s = pbuf[base_slot + j]
            sh = ((j - (q & 3)) & 3) * 32
            rs.append(pltpu.roll(s, sh, axis=1))
        slab = jnp.where(quad == 0, rs[0],
                         jnp.where(quad == 1, rs[1],
                                   jnp.where(quad == 2, rs[2], rs[3])))
        # zero the lanes of tail-padding quarters (quarter j of group kg is
        # real iff kg*4 + j < n, i.e. quad < n - kg*4)
        slab = jnp.where(quad < n - kg * 4, slab, 0.0)
        acc = _seg_compute(slab, ox, oy, oz, dx, dy, dz, ln, acc, mode,
                          integral_deg=integral_deg)
        for j in range(4):
            @pl.when((kg + 2) * 4 + j < n4)
            def _(j=j):
                dma(base_slot + j, (kg + 2) * 4 + j).start()

        return acc

    acc0 = jnp.zeros((tile, SEG), jnp.float32)
    acc = jax.lax.fori_loop(0, n4 >> 2, grp_body, acc0)
    out_ref[...] = jnp.sum(acc, axis=1, keepdims=True)


def _trace_tile_kernel_bitmask_stream(
    mask_ref,       # SMEM (1, 1, n_words) i32
    rays_ref,       # VMEM (TILE, 16)
    prims_ref,      # HBM (8, N_pad) component-major
    out_ref,        # VMEM (TILE, 1)
    seg_list,       # SMEM scratch (n_words*32,) i32
    pbuf,           # VMEM scratch (NBUF, 8, SEG)
    sem,            # DMA sems (NBUF,)
    *,
    mode: str,
    integral_deg: int = HORNER1_DEG,
):
    """Bitmask broadphase + streaming DMA: the large-scene variant (r1
    review: the fast path must not require VMEM-resident particles). Phase 1
    decodes the tile's overlap words into an SMEM segment list (identical to
    the resident bitmask kernel); phase 2 is the double-buffered HBM->VMEM
    slab pipeline of the streaming kernel, fetching only listed segments."""
    tile = rays_ref.shape[0]
    n_words = mask_ref.shape[2]
    nbuf = pbuf.shape[0]
    ox, oy, oz, dx, dy, dz, ln = _ray_columns(rays_ref)

    def word_body(w, n):
        word0 = mask_ref[0, 0, w]

        def emit(state):
            word, n = state
            for s in range(32):
                seg_list[n] = w * 32 + s
                n = n + ((word >> s) & 1)
            return n

        return jax.lax.cond(word0 != 0, emit, lambda s: s[1], (word0, n))

    n = jax.lax.fori_loop(0, n_words, word_body, jnp.int32(0))

    def dma(slot, k):
        seg = seg_list[k]
        return pltpu.make_async_copy(
            prims_ref.at[:, pl.ds(seg * SEG, SEG)], pbuf.at[slot], sem.at[slot]
        )

    for w in range(nbuf):
        @pl.when(w < n)
        def _(w=w):
            dma(w, w).start()

    def body(k, acc):
        slot = jax.lax.rem(k, nbuf)
        dma(slot, k).wait()
        acc = _seg_compute(pbuf[slot], ox, oy, oz, dx, dy, dz, ln, acc, mode)

        @pl.when(k + nbuf < n)
        def _():
            dma(slot, k + nbuf).start()

        return acc

    acc = jax.lax.fori_loop(0, n, body, jnp.zeros((tile, SEG), jnp.float32))
    out_ref[...] = jnp.sum(acc, axis=1, keepdims=True)


def _trace_tile_kernel_subtiled(
    n_segs_ref,     # SMEM (1, 1, S)
    segs_ref,       # SMEM (1, S, max_chunks)
    rays_ref,       # VMEM (S*T, 16)
    prims_ref,      # VMEM (n_segs, 8, SEG)
    out_ref,        # VMEM (S*T, 1)
    *,
    mode: str,
    integral_deg: int = HORNER1_DEG,
    subtiles: int,
):
    """Subtiled resident kernel: one grid program serves S fine ray subtiles,
    each with its own (more selective) culled segment list, interleaved in a
    single loop body so per-iteration overhead amortizes over S compute
    blocks. Subtile u with an exhausted list keeps computing its last
    segment but the accumulator update is masked."""
    s = subtiles
    t = rays_ref.shape[0] // s
    cols = []
    for u in range(s):
        sub = rays_ref[u * t:(u + 1) * t, :]
        cols.append((sub[:, 0:1], sub[:, 1:2], sub[:, 2:3], sub[:, 3:4],
                     sub[:, 4:5], sub[:, 5:6], sub[:, 9:10]))
    counts = [n_segs_ref[0, 0, u] for u in range(s)]
    n_max = counts[0]
    for u in range(1, s):
        n_max = jnp.maximum(n_max, counts[u])

    def body(k, accs):
        out = []
        for u in range(s):
            ox, oy, oz, dx, dy, dz, ln = cols[u]
            live = k < counts[u]
            kk = jnp.minimum(k, jnp.maximum(counts[u] - 1, 0))
            slab = prims_ref[segs_ref[0, u, kk]]
            new_acc = _seg_compute(slab, ox, oy, oz, dx, dy, dz, ln,
                                   accs[u], mode,
                                   integral_deg=integral_deg)
            out.append(jnp.where(live, new_acc, accs[u]))
        return tuple(out)

    acc0 = tuple(jnp.zeros((t, SEG), jnp.float32) for _ in range(s))
    accs = jax.lax.fori_loop(0, n_max, body, acc0)
    out_ref[...] = jnp.concatenate(
        [jnp.sum(a, axis=1, keepdims=True) for a in accs], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile", "max_chunks", "mode", "interpret", "stack_size", "broadphase",
        "vmem_resident_limit", "subtiles", "unroll", "integral_deg",
    ),
)
def pallas_trace_sph(
    rays: Rays,
    spheres: jax.Array,
    tree: Tree | None = None,
    tile: int = DEFAULT_TILE,
    max_chunks: int = 2048,
    mode: str = "cumulative",
    interpret: bool = False,
    stack_size: int = 128,
    broadphase: str = "dense",
    vmem_resident_limit: int = 48 * 1024 * 1024,
    subtiles: int = 1,
    unroll: int = 16,
    masks: jax.Array | None = None,
    integral_deg: int = HORNER1_DEG,
) -> Tuple[jax.Array, jax.Array]:
    """Column density (mode='cumulative') or hit counts (mode='hitcount')
    per ray via broadphase + streaming Pallas kernel.

    Returns (per_ray_values f32/i32[R], overflow bool[n_tiles]). Overflowed
    tiles have incomplete sums — re-run with a larger max_chunks.
    ``broadphase``: 'dense' (default; hierarchical-free segment culling,
    see pallas_broadphase.py), 'quarter' (seg-32 culling granularity +
    in-kernel slab assembly; in-kernel scalar decode, works at any scene
    size), 'qlist' (seg-32 culling with the decode hoisted into an XLA
    set-bit compaction — zero scalar decode in the kernel, resident
    scenes only; max_chunks bounds the per-tile list and overflow is
    reported; the fastest general route on hardware at tile=128 —
    r5_hw_notes.md), or 'xla' (lockstep BVH walk oracle).
    ``tree`` is only consulted by the 'xla' broadphase and may be None
    otherwise.
    ``masks`` optionally supplies precomputed bitmask broadphase words
    (pallas_broadphase.masks_for_tile_aabbs over the SAME tile-padded rays
    and spheres) for callers that hoist/reuse the broadphase — ring
    distribution, fixed-ray training loops.
    ``integral_deg`` selects the cumulative-mode line-integral Horner
    flavor (see kernel_integrals.cubic_spline_line_integral_horner1):
    14 (default, ~2e-5 rel err), lower positive degrees trade accuracy
    for FMAs, and NEGATIVE values select the sqrt-free direct fit of
    that |degree| (-12 ~1e-4 — the fast-trace option; hw ablation in
    benchmarks/results/r4_hw_notes.md). Ignored by mode='hitcount'.
    """
    if mode not in ("cumulative", "hitcount"):
        raise ValueError(f"unknown mode {mode!r}")
    if tree is None and broadphase == "xla":
        raise ValueError("broadphase='xla' requires a tree")
    n_rays = rays.n_rays
    pad = (-n_rays) % tile
    if pad:
        # Pad with never-hit rays (length -1) so the broadphase and kernel
        # see whole tiles; the padding shares the last rays' origins to keep
        # the final tile's AABB tight.
        rays = Rays(
            jnp.concatenate([rays.origins, jnp.broadcast_to(rays.origins[-1:], (pad, 3))]),
            jnp.concatenate([rays.directions, jnp.broadcast_to(rays.directions[-1:], (pad, 3))]),
            jnp.concatenate([rays.lengths, jnp.full((pad,), -1.0, jnp.float32)]),
        )
    packed_bm, r_pad_bm = _pack_rays(rays, tile)
    prims_bm, n_prim_pad_bm = _pack_prims(spheres)
    resident_bm = (n_prim_pad_bm // SEG) * 8 * SEG * 4 <= vmem_resident_limit
    if broadphase == "qlist":
        # Seg-32 culling + XLA-side set-bit compaction: zero in-kernel
        # scalar decode (see _trace_tile_kernel_qlist). Resident scenes
        # only (the list-driven group assembly needs the appended zero
        # slab; large scenes use broadphase='quarter' streaming).
        from grace_tpu.trace.pallas_broadphase import quarter_lists

        if not resident_bm:
            raise ValueError(
                "broadphase='qlist' requires the VMEM-resident regime; use "
                "broadphase='quarter' for larger scenes")
        if max_chunks % 4:
            raise ValueError("qlist max_chunks must be a multiple of 4")
        q_ids, n_q, overflow_q = quarter_lists(rays, spheres, tile,
                                               max_q=max_chunks)
        n_tiles = r_pad_bm // tile
        n_segs_res = n_prim_pad_bm // SEG
        pad_qid = n_segs_res * 4
        q_ids = jnp.where(
            jnp.arange(q_ids.shape[1])[None, :] < n_q[:, None], q_ids,
            pad_qid)
        prims3d = prims_bm.reshape(8, n_segs_res, SEG).transpose(1, 0, 2)
        prims3d = jnp.concatenate(
            [prims3d, jnp.zeros((1, 8, SEG), jnp.float32)], axis=0)
        out = pl.pallas_call(
            functools.partial(_trace_tile_kernel_qlist, mode=mode,
                              integral_deg=integral_deg, unroll=unroll),
            out_shape=jax.ShapeDtypeStruct((r_pad_bm, 1), jnp.float32),
            # the resident slab array alone exceeds Mosaic's default 16 MB
            # scoped-vmem budget at bench scale (8193 slabs = 33.6 MB)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(prims3d.size) * 4 + 16 * 1024 * 1024),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, q_ids.shape[1]), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile, 16), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(n_q[:, None, None], q_ids[:, None, :], packed_bm, prims3d)
        values = out[:n_rays, 0]
        if mode == "hitcount":
            values = values.astype(jnp.int32)
        return values, overflow_q
    if broadphase == "quarter":
        # Seg-32 culling granularity + in-kernel 4-quarter slab assembly
        # (see _trace_tile_kernel_quarter); VMEM-resident slabs when the
        # particle set fits, else each group's 4 parent slabs stream from
        # HBM double-buffered (_trace_tile_kernel_quarter_stream).
        from grace_tpu.trace.pallas_broadphase import dense_tile_masks_quarter

        words, summary = dense_tile_masks_quarter(rays, spheres, tile)
        n_tiles = r_pad_bm // tile
        if not resident_bm:
            out = pl.pallas_call(
                functools.partial(_trace_tile_kernel_quarter_stream,
                                  mode=mode, integral_deg=integral_deg),
                out_shape=jax.ShapeDtypeStruct((r_pad_bm, 1), jnp.float32),
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((1, 1, summary.shape[1]),
                                 lambda i: (i, 0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, 1, words.shape[1]),
                                 lambda i: (i, 0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((tile, 16), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.HBM),
                ],
                out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.SMEM((words.shape[1] * 32 + 3,), jnp.int32),
                    pltpu.VMEM((8, 8, SEG), jnp.float32),
                    pltpu.SemaphoreType.DMA((8,)),
                ],
                interpret=interpret,
            )(summary[:, None, :], words[:, None, :], packed_bm, prims_bm)
            values = out[:n_rays, 0]
            if mode == "hitcount":
                values = values.astype(jnp.int32)
            return values, jnp.zeros((n_tiles,), jnp.bool_)
        n_segs_res = n_prim_pad_bm // SEG
        prims3d = prims_bm.reshape(8, n_segs_res, SEG).transpose(1, 0, 2)
        # one all-zero slab appended: the group-of-4 padding target
        prims3d = jnp.concatenate(
            [prims3d, jnp.zeros((1, 8, SEG), jnp.float32)], axis=0)
        out = pl.pallas_call(
            functools.partial(_trace_tile_kernel_quarter, mode=mode,
                              integral_deg=integral_deg,
                              unroll=unroll, pad_qid=n_segs_res * 4),
            out_shape=jax.ShapeDtypeStruct((r_pad_bm, 1), jnp.float32),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 1, summary.shape[1]), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, words.shape[1]), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile, 16), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((words.shape[1] * 32 + 3,), jnp.int32)],
            interpret=interpret,
        )(summary[:, None, :], words[:, None, :], packed_bm, prims3d)
        values = out[:n_rays, 0]
        if mode == "hitcount":
            values = values.astype(jnp.int32)
        return values, jnp.zeros((n_tiles,), jnp.bool_)
    if broadphase == "bitmask" or (broadphase == "dense" and subtiles == 1):
        # Default fast path: bitmask broadphase (no compaction sort, no
        # overflow) + set-bit-iterating kernel — VMEM-resident slabs when
        # the particle set fits, streaming HBM DMA otherwise (r1 review:
        # the fast path must not require residency).
        from grace_tpu.trace.pallas_broadphase import dense_tile_masks

        if masks is None:
            masks = dense_tile_masks(rays, spheres, tile)
        n_tiles = r_pad_bm // tile
        if masks.shape[0] != n_tiles:
            raise ValueError(
                f"precomputed masks cover {masks.shape[0]} tiles, kernel "
                f"needs {n_tiles} (tile-padded rays)")
        common_specs = [
            pl.BlockSpec((1, 1, masks.shape[1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        if resident_bm:
            prims3d = prims_bm.reshape(8, n_prim_pad_bm // SEG, SEG).transpose(1, 0, 2)
            out = pl.pallas_call(
                functools.partial(_trace_tile_kernel_bitmask, mode=mode,
                                  integral_deg=integral_deg,
                                  unroll=unroll),
                out_shape=jax.ShapeDtypeStruct((r_pad_bm, 1), jnp.float32),
                grid=(n_tiles,),
                in_specs=common_specs + [pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SMEM((masks.shape[1] * 32,), jnp.int32)],
                interpret=interpret,
            )(masks[:, None, :], packed_bm, prims3d)
        else:
            out = pl.pallas_call(
                functools.partial(_trace_tile_kernel_bitmask_stream, mode=mode,
                                  integral_deg=integral_deg),
                out_shape=jax.ShapeDtypeStruct((r_pad_bm, 1), jnp.float32),
                grid=(n_tiles,),
                in_specs=common_specs + [pl.BlockSpec(memory_space=pltpu.HBM)],
                out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.SMEM((masks.shape[1] * 32,), jnp.int32),
                    pltpu.VMEM((4, 8, SEG), jnp.float32),
                    pltpu.SemaphoreType.DMA((4,)),
                ],
                interpret=interpret,
            )(masks[:, None, :], packed_bm, prims_bm)
        values = out[:n_rays, 0]
        if mode == "hitcount":
            values = values.astype(jnp.int32)
        return values, jnp.zeros((n_tiles,), jnp.bool_)
    if broadphase in ("dense", "pallas", "list"):
        from grace_tpu.trace.pallas_broadphase import dense_tile_segments

        seg_ids, n_segs, overflow = dense_tile_segments(
            rays, spheres, tile, max_chunks
        )
    else:
        seg_ids, n_segs, overflow = tile_segments(
            rays, tree, tile, max_chunks, spheres.shape[0], stack_size
        )
    packed, r_pad = _pack_rays(rays, tile)
    prims_t, n_prim_pad = _pack_prims(spheres)
    n_tiles = r_pad // tile

    common_in_specs = [
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, seg_ids.shape[1]), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((tile, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    common_args = [n_segs[:, None, None], seg_ids[:, None, :], packed]
    resident = (n_prim_pad // SEG) * 8 * SEG * 4 <= vmem_resident_limit
    if subtiles > 1:
        if not resident:
            raise ValueError("subtiles > 1 requires the VMEM-resident regime")
        # Group S consecutive fine tiles per grid program.
        s_num = subtiles
        if n_tiles % s_num:
            raise ValueError("ray count must fill whole subtile groups")
        prims3d = prims_t.reshape(8, n_prim_pad // SEG, SEG).transpose(1, 0, 2)
        n_groups = n_tiles // s_num
        out = pl.pallas_call(
            functools.partial(
                _trace_tile_kernel_subtiled, mode=mode, subtiles=s_num,
                integral_deg=integral_deg),
            out_shape=jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            grid=(n_groups,),
            in_specs=[
                pl.BlockSpec((1, 1, s_num), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, s_num, seg_ids.shape[1]), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((s_num * tile, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((s_num * tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            interpret=interpret,
        )(
            n_segs.reshape(n_groups, 1, s_num),
            seg_ids.reshape(n_groups, s_num, seg_ids.shape[1]),
            packed,
            prims3d,
        )
        values = out[:n_rays, 0]
        if mode == "hitcount":
            values = values.astype(jnp.int32)
        return values, overflow
    if resident:
        # (n_segs, 8, SEG) VMEM-resident slabs; constant index map keeps the
        # buffer live across grid steps.
        prims3d = prims_t.reshape(8, n_prim_pad // SEG, SEG).transpose(1, 0, 2)
        out = pl.pallas_call(
            functools.partial(_trace_tile_kernel_resident, mode=mode,
                              integral_deg=integral_deg,
                              unroll=unroll),
            out_shape=jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            grid=(n_tiles,),
            in_specs=common_in_specs
            + [pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            interpret=interpret,
        )(*common_args, prims3d)
    else:
        out = pl.pallas_call(
            functools.partial(_trace_tile_kernel_stream, mode=mode,
                              integral_deg=integral_deg),
            out_shape=jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            grid=(n_tiles,),
            in_specs=common_in_specs + [pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((4, 8, SEG), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
            interpret=interpret,
        )(*common_args, prims_t)
    values = out[:n_rays, 0]
    if mode == "hitcount":
        values = values.astype(jnp.int32)
    return values, overflow

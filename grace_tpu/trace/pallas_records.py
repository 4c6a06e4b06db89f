"""Fused per-hit record emission as a single-pass Pallas TPU kernel.

The reference's full per-hit trace (ref: include/grace/cuda/trace_sph.cuh:
111-168) is a GPU-speed two-pass pipeline: hitcount -> exclusive scan ->
allocate -> re-traverse scattering (index, integral, distance) at a per-ray
cursor. A per-lane scatter cursor is exactly what a TPU lacks (and dynamic
VMEM stores are broken on this hardware — see CLAUDE.md), so this module
re-designs record emission around what the VPU does have:

  * records live in a per-ray FIXED-CAPACITY row: out[(ray, c)] for
    c < per_ray_capacity — the segment layout the reference builds with
    offsets materializes here as a rectangular matrix, and the downstream
    ``sort_by_distance`` becomes a *batched lane-axis sort* (one lax.sort
    along axis=1) instead of a global segmented sort.
  * the kernel emits hits with a branch-free RANK drain: per primitive
    slab, an exclusive lane-prefix count of the hit mask assigns each hit
    its within-slab rank once, and drain iteration i selects the rank-i
    hit of every ray by a one-hot (rank == i) mask — a true one-hot, so
    every payload pick is a plain masked lane sum and appends land at
    cursor + i. No dynamic stores anywhere; every op is a full-shape
    vector op. Cost is proportional to max-hits-per-slab over the tile's
    rays, which ray coherence (spatial ray sort) keeps near the mean.
    The rank computation (`rank_method`: Hillis-Steele shifted adds vs one
    MXU matmul against a strict-lower-triangular ones matrix) and the
    number of ranks drained per output-chunk read-modify-write window
    (`group`) are tunable; defaults are the hardware-measured fastest:
    MXU ranks with W=8 grouped RMW (round-4 sweep on the 38k-ray record
    workload: mxu/8 217 ms vs prefix/8 267, network 262, mxu/1 365,
    prefix/1 413 — the round-3 note calling mxu/8 "1.85x slower" compared
    against a stale r2 number from a since-replaced min-extraction drain;
    see benchmarks/results/r4_records_sweep.md).
  * ONE pass total: the cursor doubles as the hitcount, so the reference's
    separate hitcount pass + scan disappear. Per-ray overflow (count >
    capacity) drops writes but keeps counting — counts are always exact.

Broadphase: same bitmask cull as the fast cumulative kernel
(pallas_broadphase.dense_tile_masks) with the set-bit -> SMEM seg-list
decode, or ``broadphase='quarter'`` for the seg-32 granularity +
4-quarter slab assembly of the trace kernels (2x fewer tested pairs;
resident scenes only). Primitive slabs are VMEM-resident when the
particle set fits the VMEM budget (~3M particles) and stream from HBM
through a double-buffered DMA pipeline otherwise (the bitmask-stream
pattern of pallas_kernel.py) — per-hit tracing works at any scene size,
like the reference's trace_sph.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grace_tpu.core.types import Rays
from grace_tpu.sph.kernel_integrals import cubic_spline_line_integral_horner1
from grace_tpu.trace.pallas_kernel import SEG, _pack_prims, _pack_rays, _ray_columns

INDEX_SENTINEL = -1
VALUE_SENTINEL = 0.0
DISTANCE_SENTINEL = -1.0


class RecordTraceResult(NamedTuple):
    """Per-ray-capacity record layout (row r = ray r's hit segment).

    Entries with column >= min(counts[r], capacity) hold the sentinels
    (index -1, integral 0, distance -1). counts are EXACT hit counts even
    when a ray overflows its capacity (excess records are dropped)."""

    counts: jax.Array      # i32[R]
    indices: jax.Array     # i32[R, C] intersected sphere indices (sorted order)
    integrals: jax.Array   # f32[R, C]
    distances: jax.Array   # f32[R, C]

    @property
    def capacity(self) -> int:
        return self.indices.shape[1]

    @property
    def overflowed(self) -> jax.Array:
        return self.counts > self.indices.shape[1]


def _decode_seg_list(mask_ref, seg_list, n_words):
    """Bitmask words -> SMEM segment-id list (the bitmask kernels' scalar
    phase: write the candidate unconditionally, advance the cursor only when
    the bit is set)."""

    def word_body(w, n):
        word0 = mask_ref[0, 0, w]

        def emit(state):
            word, n = state
            for s in range(32):
                seg_list[n] = w * 32 + s
                n = n + ((word >> s) & 1)
            return n

        return jax.lax.cond(word0 != 0, emit, lambda s: s[1], (word0, n))

    return jax.lax.fori_loop(0, n_words, word_body, jnp.int32(0))


def _records_slab_drain_network(slab, seg_base, cur, rays_cols, refs, *,
                                cap):
    """Intersect one (8, SEG) slab and append every hit via a shift-network
    compaction — O(1) vector ops per slab, independent of the hit count,
    with NO cross-lane reductions at all:

      1. exclusive lane-prefix rank of the hit mask (7 shifted adds);
      2. LSB-first bit-shift compaction: each hit moves left by
         d = lane - rank, one masked static shift per bit. Because d is
         non-decreasing along a ray's hits and targets are distinct, the
         network is collision-free (verified exhaustively for all masks up
         to 12 lanes in the round-3 build notes);
      3. per-ray ROTATE right by cur mod SEG (7 masked static rotates), so
         compacted hit j sits at output lane (cur + j) mod SEG;
      4. one read-modify-write of the 1-2 output chunks in the tile's
         cursor window merges every hit of the slab at once (the rank-loop
         drains instead RMW per rank / rank group).

    Cross-lane data movement is only static full-row shifts/rotates, which
    Mosaic lowers without the reduce-latency serial chains that bound the
    pick-based drains (measured: the picks' 3 reduces per extracted hit).
    """
    idx_ref, intg_ref, dist_ref = refs
    ox, oy, oz, dx, dy, dz, ln = rays_cols
    tile = ox.shape[0]
    n_chunks = cap // SEG
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, SEG), 1)

    px, py, pz = slab[0:1, :], slab[1:2, :], slab[2:3, :]
    inv_h2, h2 = slab[4:5, :], slab[5:6, :]
    rx, ry, rz = px - ox, py - oy, pz - oz
    dot = rx * dx + ry * dy + rz * dz
    bx = rx - dot * dx
    by = ry - dot * dy
    bz = rz - dot * dz
    b2 = bx * bx + by * by + bz * bz
    hit = (b2 < h2) & (dot >= 0.0) & (dot < ln)
    f = cubic_spline_line_integral_horner1(b2 * inv_h2) * inv_h2

    # 1. exclusive rank (Hillis-Steele shifted adds).
    m = hit.astype(jnp.int32)
    inc = m
    shift = 1
    while shift < SEG:
        inc = inc + jnp.concatenate(
            [jnp.zeros((tile, shift), jnp.int32), inc[:, :-shift]], axis=1)
        shift *= 2
    rank = inc - m
    m_cnt = inc[:, SEG - 1:SEG]

    # 2. compaction network: payloads (integral, distance, prim lane id)
    # ride together; rem tracks the remaining leftward distance. Masks are
    # int32 0/1, NOT bool: shifting/selecting bool vectors makes Mosaic emit
    # an i8->i1 `arith.trunci` it cannot lower ("Unsupported target bitwidth
    # for truncation") — bools here exist only as immediately-consumed
    # comparisons.
    # vi MUST be hit-masked, not the raw iota: statically shifting a bare
    # iota constant (concat of iota[:, s:]) SIGABRTs the TPU backend
    # ("Check failed: limits[i] <= dim(i) (8 vs. 1)", jellyfish
    # LoweringEmitter) — constant-folding of shifted iotas is broken.
    # Non-hit lanes' vi are masked by `valid`/`in_c` downstream anyway.
    occ = m                                          # int32 0/1
    rem = jnp.where(hit, lane - rank, 0)
    vf, vd = jnp.where(hit, f, 0.0), jnp.where(hit, dot, 0.0)
    vi = jnp.where(hit, seg_base + lane, 0)
    s = 1
    while s < SEG:
        moving = jnp.where((rem & s) != 0, occ, 0)

        def shl(x):
            return jnp.concatenate(
                [x[:, s:], jnp.zeros((tile, s), x.dtype)], axis=1)

        inc_m = shl(moving)
        inc_b = inc_m != 0
        mov_b = moving != 0
        vf = jnp.where(inc_b, shl(vf), jnp.where(mov_b, 0.0, vf))
        vd = jnp.where(inc_b, shl(vd), jnp.where(mov_b, 0.0, vd))
        vi = jnp.where(inc_b, shl(vi), jnp.where(mov_b, 0, vi))
        rem = jnp.where(inc_b, shl(rem) - s, jnp.where(mov_b, 0, rem))
        occ = inc_m | (occ & (1 - moving))
        s *= 2

    # 3. per-ray rotate right by cur mod SEG; valid caps both per-ray count
    # and the global capacity (overflowed rays keep counting, drop writes).
    rot = jax.lax.rem(cur, SEG)                      # (tile, 1)
    valid = jnp.where((lane < m_cnt) & (cur + lane < cap), 1, 0)
    s = 1
    while s < SEG:
        bit = (rot & s) != 0

        def ror(x):
            return jnp.concatenate([x[:, SEG - s:], x[:, :SEG - s]], axis=1)

        vf = jnp.where(bit, ror(vf), vf)
        vd = jnp.where(bit, ror(vd), vd)
        vi = jnp.where(bit, ror(vi), vi)
        valid = jnp.where(bit, ror(valid), valid)
        s *= 2
    p_idx = vi

    # 4. one windowed RMW merges the whole slab: hit j of ray r lands in
    # chunk (cur - rot)//SEG (unwrapped lanes, lane >= rot) or the next one
    # (wrapped lanes, lane < rot).
    base = cur - rot                                 # chunk-aligned (tile, 1)
    has = m_cnt > 0
    big = jnp.int32(cap + SEG)
    cmin0 = jnp.min(jnp.where(has, cur, big))
    cmax0 = jnp.max(jnp.where(has, jnp.minimum(cur + m_cnt - 1, cap - 1), -1))
    for j in range(n_chunks):
        @pl.when((cmin0 < (j + 1) * SEG) & (cmax0 >= j * SEG))
        def _(j=j):
            sl = slice(j * SEG, (j + 1) * SEG)
            # target chunk as int select (bool-valued selects trip Mosaic's
            # i8->i1 truncation, see step-2 comment).
            tgt = jnp.where(lane >= rot, j * SEG, (j - 1) * SEG)
            in_c = (valid != 0) & (base == tgt)
            idx_ref[:, sl] = jnp.where(in_c, p_idx, idx_ref[:, sl])
            intg_ref[:, sl] = jnp.where(in_c, vf, intg_ref[:, sl])
            dist_ref[:, sl] = jnp.where(in_c, vd, dist_ref[:, sl])
    return cur + m_cnt


def _records_slab_drain(slab, seg_base, cur, rays_cols, refs, *, cap,
                        rank_method="mxu", group=8):
    """Intersect one (8, SEG) slab and append every hit to the record rows.

    Returns the updated cursor. See module docstring: hits are drained by
    within-slab RANK (exclusive lane-prefix count of the hit mask), so each
    drain iteration is a true one-hot select with no serial state.

    rank_method: 'mxu' (one matmul against a strict-lower-triangular ones
    matrix) or 'prefix' (Hillis-Steele shifted adds). group: ranks drained
    per chunk read-modify-write window (W one-hot pick sets batched before
    the windowed chunk update)."""
    idx_ref, intg_ref, dist_ref = refs
    ox, oy, oz, dx, dy, dz, ln = rays_cols
    tile = ox.shape[0]
    n_chunks = cap // SEG
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, SEG), 1)

    px, py, pz = slab[0:1, :], slab[1:2, :], slab[2:3, :]
    inv_h2, h2 = slab[4:5, :], slab[5:6, :]

    rx, ry, rz = px - ox, py - oy, pz - oz
    dot = rx * dx + ry * dy + rz * dz
    bx = rx - dot * dx
    by = ry - dot * dy
    bz = rz - dot * dz
    b2 = bx * bx + by * by + bz * bz
    hit = (b2 < h2) & (dot >= 0.0) & (dot < ln)
    f = cubic_spline_line_integral_horner1(b2 * inv_h2) * inv_h2

    if rank_method == "mxu":
        # One MXU matmul against a strict-lower-triangular ones matrix
        # computes every exclusive rank in ~a hundred cycles.
        m = hit.astype(jnp.float32)
        li = jax.lax.broadcasted_iota(jnp.int32, (SEG, SEG), 0)
        lj = jax.lax.broadcasted_iota(jnp.int32, (SEG, SEG), 1)
        tri = (li < lj).astype(jnp.float32)      # T[l', l] = 1 for l' < l
        rank = jax.lax.dot_general(
            m, tri, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        m_cnt = (rank[:, SEG - 1:SEG] + hit[:, SEG - 1:SEG]).astype(jnp.int32)
    else:
        # Hillis-Steele lane prefix: log2(SEG) shifted adds (static-slice
        # shifts, no gathers).
        m = hit.astype(jnp.int32)
        inc = m
        shift = 1
        while shift < SEG:
            inc = inc + jnp.concatenate(
                [jnp.zeros((tile, shift), jnp.int32), inc[:, :-shift]], axis=1)
            shift *= 2
        rank = inc - m                           # exclusive prefix
        m_cnt = inc[:, SEG - 1:SEG]
    n_extract = jnp.max(m_cnt)

    # Scalar chunk window, hoisted ONCE per slab: group g appends at
    # cur + [gW, gW + W), so chunks [cmin + gW, cmax] are the only ones any
    # valid ray touches (clamped so overflowed rays never force extra RMW).
    has = m_cnt > 0
    big = jnp.int32(cap + SEG)
    cmin0 = jnp.min(jnp.where(has, cur, big))
    cmax0 = jnp.max(jnp.where(has, jnp.minimum(cur + m_cnt - 1, cap - 1), -1))

    # Ranks are drained in static groups of W: the 3W one-hot picks of a
    # group share no state (they pipeline freely), and each output chunk is
    # read-modified-written ONCE per group.
    W = group

    def drain_group(g, _):
        base = g * W
        picks = []
        for w in range(W):
            oh = hit & (rank == base + w)        # one lane where m_cnt > it
            pick = lambda x, oh=oh: jnp.sum(
                jnp.where(oh, x, 0.0), axis=1, keepdims=True)
            p_idx = jnp.sum(jnp.where(oh, seg_base + lane, 0), axis=1,
                            keepdims=True)
            picks.append((p_idx, pick(f), pick(dot)))
        for j in range(n_chunks):
            @pl.when((cmin0 + base < (j + 1) * SEG) & (cmax0 >= j * SEG)
                     & (cmin0 + base < cap))
            def _(j=j):
                sl = slice(j * SEG, (j + 1) * SEG)
                colj = jax.lax.broadcasted_iota(
                    jnp.int32, (tile, SEG), 1) + j * SEG
                c_idx = idx_ref[:, sl]
                c_int = intg_ref[:, sl]
                c_dst = dist_ref[:, sl]
                for w in range(W):
                    p_idx, p_int, p_dst = picks[w]
                    ohc = (colj == cur + (base + w)) & (base + w < m_cnt)
                    c_idx = jnp.where(ohc, p_idx, c_idx)
                    c_int = jnp.where(ohc, p_int, c_int)
                    c_dst = jnp.where(ohc, p_dst, c_dst)
                idx_ref[:, sl] = c_idx
                intg_ref[:, sl] = c_int
                dist_ref[:, sl] = c_dst
        return 0

    jax.lax.fori_loop(0, (n_extract + W - 1) // W, drain_group, 0)
    return cur + m_cnt


def _records_tile_kernel(
    mask_ref,       # SMEM (1, 1, n_words) i32 overlap bitmask words
    rays_ref,       # VMEM (TILE, 16)
    prims_ref,      # VMEM (n_segs, 8, SEG) resident slabs
    counts_ref,     # VMEM out (TILE, 1) i32
    idx_ref,        # VMEM out (TILE, C) i32
    intg_ref,       # VMEM out (TILE, C) f32
    dist_ref,       # VMEM out (TILE, C) f32
    seg_list,       # SMEM scratch (n_words*32,) i32
    *,
    cap: int,
    rank_method: str,
    group: int,
    drain: str,
):
    tile = rays_ref.shape[0]
    rays_cols = _ray_columns(rays_ref)

    # Record rows live in the output VMEM blocks, updated by read-modify-
    # write of STATIC 128-column chunks (never a dynamic store — broken on
    # this hardware); the per-slab scalar cursor window keeps the RMW to
    # the 1-2 chunks the tile's cursors actually span, so the append cost
    # is O(128 columns), independent of the ray capacity.
    idx_ref[...] = jnp.full((tile, cap), INDEX_SENTINEL, jnp.int32)
    intg_ref[...] = jnp.full((tile, cap), VALUE_SENTINEL, jnp.float32)
    dist_ref[...] = jnp.full((tile, cap), DISTANCE_SENTINEL, jnp.float32)

    n = _decode_seg_list(mask_ref, seg_list, mask_ref.shape[2])

    def seg_body(k, cur):
        seg = seg_list[k]
        if drain == "network":
            return _records_slab_drain_network(
                prims_ref[seg], seg * SEG, cur, rays_cols,
                (idx_ref, intg_ref, dist_ref), cap=cap)
        return _records_slab_drain(prims_ref[seg], seg * SEG, cur,
                                   rays_cols,
                                   (idx_ref, intg_ref, dist_ref), cap=cap,
                                   rank_method=rank_method, group=group)

    cur = jax.lax.fori_loop(0, n, seg_body, jnp.zeros((tile, 1), jnp.int32))
    counts_ref[...] = cur


def _records_tile_kernel_quarter(
    summary_ref,    # SMEM (1, 1, n_swords) i32 — bit w: word s*32+w nonzero
    mask_ref,       # SMEM (1, 1, n_words) i32 — bit q: QUARTER w*32+q hits
    rays_ref,       # VMEM (TILE, 16)
    prims_ref,      # VMEM (n_segs + 1, 8, SEG) resident slabs, last all 0
    counts_ref,     # VMEM out (TILE, 1) i32
    idx_ref,        # VMEM out (TILE, C) i32
    intg_ref,       # VMEM out (TILE, C) f32
    dist_ref,       # VMEM out (TILE, C) f32
    q_list,         # SMEM scratch (n_words*32 + 3,) i32
    *,
    cap: int,
    rank_method: str,
    group: int,
    drain: str,
    pad_qid: int,
):
    """Seg-32 (quarter-granularity) record kernel: the trace kernels'
    quarter broadphase + 4-quarter slab assembly (pallas_kernel.
    _trace_tile_kernel_quarter) applied to per-hit record emission. The
    drains are index-agnostic — they take a per-lane prim-index BASE
    vector, here assembled per group so lane l of quarter j maps to
    seg_j*128 + off_j*32 + (l - 32 j). Record ordering is preserved:
    quarters are listed ascending and the drains emit lanes left to
    right, so per-ray records stay in ascending-primitive-index order."""
    tile = rays_ref.shape[0]
    rays_cols = _ray_columns(rays_ref)
    n_swords = summary_ref.shape[2]
    n_words = mask_ref.shape[2]

    idx_ref[...] = jnp.full((tile, cap), INDEX_SENTINEL, jnp.int32)
    intg_ref[...] = jnp.full((tile, cap), VALUE_SENTINEL, jnp.float32)
    dist_ref[...] = jnp.full((tile, cap), DISTANCE_SENTINEL, jnp.float32)

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
        q_list[k] = pad_qid
        return carry

    jax.lax.fori_loop(n, n4, pad_body, 0)

    lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, SEG), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, SEG), 1)

    def grp_body(kg, cur):
        base = kg * 4
        rs, bases = [], []
        for j in range(4):
            q = q_list[base + j]
            s = prims_ref[q >> 2]
            sh = ((j - (q & 3)) & 3) * 32
            rs.append(pltpu.roll(s, sh, axis=1))
            # lane l in target quad j holds prim (q>>2)*128 + (q&3)*32
            # + (l - 32 j): base_j + l with base_j below.
            bases.append((q >> 2) * SEG + (q & 3) * 32 - 32 * j)
        quad8 = lane8 >> 5
        slab = jnp.where(quad8 == 0, rs[0],
                         jnp.where(quad8 == 1, rs[1],
                                   jnp.where(quad8 == 2, rs[2], rs[3])))
        quad1 = lane1 >> 5
        seg_base = jnp.where(quad1 == 0, bases[0],
                             jnp.where(quad1 == 1, bases[1],
                                       jnp.where(quad1 == 2, bases[2],
                                                 bases[3])))
        if drain == "network":
            return _records_slab_drain_network(
                slab, seg_base, cur, rays_cols,
                (idx_ref, intg_ref, dist_ref), cap=cap)
        return _records_slab_drain(slab, seg_base, cur, rays_cols,
                                   (idx_ref, intg_ref, dist_ref), cap=cap,
                                   rank_method=rank_method, group=group)

    cur = jax.lax.fori_loop(0, n4 >> 2, grp_body,
                            jnp.zeros((tile, 1), jnp.int32))
    counts_ref[...] = cur


def _records_tile_kernel_stream(
    mask_ref,       # SMEM (1, 1, n_words) i32 overlap bitmask words
    rays_ref,       # VMEM (TILE, 16)
    prims_ref,      # HBM (8, N_pad) component-major
    counts_ref,     # VMEM out (TILE, 1) i32
    idx_ref,        # VMEM out (TILE, C) i32
    intg_ref,       # VMEM out (TILE, C) f32
    dist_ref,       # VMEM out (TILE, C) f32
    seg_list,       # SMEM scratch (n_words*32,) i32
    pbuf,           # VMEM scratch (NBUF, 8, SEG)
    sem,            # DMA sems (NBUF,)
    *,
    cap: int,
    rank_method: str,
    group: int,
    drain: str,
):
    """Streaming (any-scene-size) variant: listed slabs arrive through the
    double-buffered HBM->VMEM DMA pipeline of the bitmask-stream cumulative
    kernel (pallas_kernel._trace_tile_kernel_bitmask_stream)."""
    tile = rays_ref.shape[0]
    nbuf = pbuf.shape[0]
    rays_cols = _ray_columns(rays_ref)

    idx_ref[...] = jnp.full((tile, cap), INDEX_SENTINEL, jnp.int32)
    intg_ref[...] = jnp.full((tile, cap), VALUE_SENTINEL, jnp.float32)
    dist_ref[...] = jnp.full((tile, cap), DISTANCE_SENTINEL, jnp.float32)

    n = _decode_seg_list(mask_ref, seg_list, mask_ref.shape[2])

    def dma(slot, k):
        seg = seg_list[k]
        return pltpu.make_async_copy(
            prims_ref.at[:, pl.ds(seg * SEG, SEG)], pbuf.at[slot], sem.at[slot]
        )

    for w in range(nbuf):
        @pl.when(w < n)
        def _(w=w):
            dma(w, w).start()

    def seg_body(k, cur):
        slot = jax.lax.rem(k, nbuf)
        dma(slot, k).wait()
        if drain == "network":
            cur = _records_slab_drain_network(
                pbuf[slot], seg_list[k] * SEG, cur, rays_cols,
                (idx_ref, intg_ref, dist_ref), cap=cap)
        else:
            cur = _records_slab_drain(pbuf[slot], seg_list[k] * SEG, cur,
                                      rays_cols,
                                      (idx_ref, intg_ref, dist_ref), cap=cap,
                                      rank_method=rank_method, group=group)

        # Refill THIS slot only after its contents were consumed.
        @pl.when(k + nbuf < n)
        def _():
            dma(slot, k + nbuf).start()

        return cur

    cur = jax.lax.fori_loop(0, n, seg_body, jnp.zeros((tile, 1), jnp.int32))
    counts_ref[...] = cur


@functools.partial(
    jax.jit,
    static_argnames=("per_ray_capacity", "tile", "interpret",
                     "vmem_resident_limit", "rank_method", "group", "drain",
                     "broadphase"),
)
def pallas_trace_sph_records(
    rays: Rays,
    spheres: jax.Array,
    per_ray_capacity: int,
    tile: int = 64,
    interpret: bool = False,
    vmem_resident_limit: int = 40 * 1024 * 1024,
    rank_method: str = "mxu",
    group: int = 8,
    drain: str = "pick",
    broadphase: str = "auto",
) -> RecordTraceResult:
    """Single-pass fused per-hit trace (ref: trace_sph.cuh:111-168 re-designed
    — see module docstring). per_ray_capacity must be a multiple of 128.
    Scenes beyond ``vmem_resident_limit`` stream primitive slabs from HBM
    (any scene size, like the reference's trace_sph).

    Hit records of ray r land in row r in ascending-primitive-index order
    (segments are visited ascending and lanes drained left to right), exactly
    the ordering the XLA engine's Morton-ordered traversal produces for the
    same sorted sphere array."""
    if per_ray_capacity % 128:
        raise ValueError("per_ray_capacity must be a multiple of 128 lanes")
    if drain not in ("pick", "network"):
        raise ValueError(f"unknown drain {drain!r} (expected 'pick' or "
                         "'network')")
    if rank_method not in ("prefix", "mxu"):
        raise ValueError(f"unknown rank_method {rank_method!r} (expected "
                         "'prefix' or 'mxu')")
    if broadphase not in ("auto", "bitmask", "quarter"):
        raise ValueError(f"unknown broadphase {broadphase!r} (expected "
                         "'auto', 'bitmask' or 'quarter')")
    n_rays = rays.n_rays
    pad = (-n_rays) % tile
    if pad:
        rays = Rays(
            jnp.concatenate([rays.origins, jnp.broadcast_to(rays.origins[-1:], (pad, 3))]),
            jnp.concatenate([rays.directions, jnp.broadcast_to(rays.directions[-1:], (pad, 3))]),
            jnp.concatenate([rays.lengths, jnp.full((pad,), -1.0, jnp.float32)]),
        )
    packed, r_pad = _pack_rays(rays, tile)
    prims, n_prim_pad = _pack_prims(spheres)
    resident = (n_prim_pad // SEG) * 8 * SEG * 4 <= vmem_resident_limit
    if broadphase == "auto":
        # quarter (seg-32) culling wins for resident scenes: halved pair
        # tests AND halved listed slabs cut the drain's per-group fixed
        # costs (r5 sweep: 176 vs 211 ms on the 38k-ray/9.5M-hit
        # workload, benchmarks/results/r5_records_floor.md); streaming
        # scenes keep the bitmask broadphase.
        broadphase = "quarter" if resident else "bitmask"

    n_tiles = r_pad // tile
    cap = per_ray_capacity

    if broadphase == "quarter":
        # Seg-32 culling + 4-quarter slab assembly (see
        # _records_tile_kernel_quarter). Resident scenes only: the assembly
        # loads parent slabs dynamically from the resident buffer.
        from grace_tpu.trace.pallas_broadphase import dense_tile_masks_quarter

        if not resident:
            raise ValueError(
                "broadphase='quarter' requires the VMEM-resident regime; "
                "use the default bitmask broadphase for larger scenes")
        words, summary = dense_tile_masks_quarter(rays, spheres, tile)
        n_segs_res = n_prim_pad // SEG
        prims3d = prims.reshape(8, n_segs_res, SEG).transpose(1, 0, 2)
        prims3d = jnp.concatenate(
            [prims3d, jnp.zeros((1, 8, SEG), jnp.float32)], axis=0)
        out_shape_q = (
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((r_pad, cap), jnp.int32),
            jax.ShapeDtypeStruct((r_pad, cap), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, cap), jnp.float32),
        )
        counts, idx, intg, dist = pl.pallas_call(
            functools.partial(_records_tile_kernel_quarter, cap=cap,
                              rank_method=rank_method, group=group,
                              drain=drain, pad_qid=n_segs_res * 4),
            out_shape=out_shape_q,
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
            out_specs=(
                pl.BlockSpec((tile, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, cap), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, cap), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, cap), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.SMEM((words.shape[1] * 32 + 3,), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_resident_limit + 16 * 1024 * 1024),
            interpret=interpret,
        )(summary[:, None, :], words[:, None, :], packed, prims3d)
        return RecordTraceResult(
            counts[:n_rays, 0], idx[:n_rays], intg[:n_rays], dist[:n_rays])

    from grace_tpu.trace.pallas_broadphase import dense_tile_masks

    masks = dense_tile_masks(rays, spheres, tile)

    out_shape = (
        jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
        jax.ShapeDtypeStruct((r_pad, cap), jnp.int32),
        jax.ShapeDtypeStruct((r_pad, cap), jnp.float32),
        jax.ShapeDtypeStruct((r_pad, cap), jnp.float32),
    )
    common_specs = [
        pl.BlockSpec((1, 1, masks.shape[1]), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((tile, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, cap), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, cap), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, cap), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )
    # The resident prim slabs alone can exceed Mosaic's default 16 MB
    # scoped-vmem budget; size the limit to the actual residency ceiling.
    params = pltpu.CompilerParams(
        vmem_limit_bytes=vmem_resident_limit + 16 * 1024 * 1024)
    if resident:
        prims3d = prims.reshape(8, n_prim_pad // SEG, SEG).transpose(1, 0, 2)
        counts, idx, intg, dist = pl.pallas_call(
            functools.partial(_records_tile_kernel, cap=cap,
                              rank_method=rank_method, group=group,
                              drain=drain),
            out_shape=out_shape,
            grid=(n_tiles,),
            in_specs=common_specs + [pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=out_specs,
            scratch_shapes=[pltpu.SMEM((masks.shape[1] * 32,), jnp.int32)],
            compiler_params=params,
            interpret=interpret,
        )(masks[:, None, :], packed, prims3d)
    else:
        counts, idx, intg, dist = pl.pallas_call(
            functools.partial(_records_tile_kernel_stream, cap=cap,
                              rank_method=rank_method, group=group,
                              drain=drain),
            out_shape=out_shape,
            grid=(n_tiles,),
            in_specs=common_specs + [pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.SMEM((masks.shape[1] * 32,), jnp.int32),
                pltpu.VMEM((4, 8, SEG), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
            interpret=interpret,
        )(masks[:, None, :], packed, prims)

    return RecordTraceResult(
        counts=counts[:n_rays, 0],
        indices=idx[:n_rays],
        integrals=intg[:n_rays],
        distances=dist[:n_rays],
    )


def sort_records_by_distance(rec: RecordTraceResult) -> RecordTraceResult:
    """Per-ray distance sort of the record matrix (ref: sort_by_distance,
    cuda/sort.cuh:100-131). The reference needs a segmented (sgpu) sort; the
    rectangular layout makes it ONE batched lane-axis lax.sort — sentinel
    slots (distance -1) are keyed to +inf so they stay at the tail."""
    key = jnp.where(rec.indices == INDEX_SENTINEL, jnp.inf, rec.distances)
    _, dist, idx, intg = jax.lax.sort(
        (key, rec.distances, rec.indices, rec.integrals), dimension=1,
        num_keys=1)
    return RecordTraceResult(rec.counts, idx, intg, dist)


def records_to_flat(
    rec: RecordTraceResult,
    capacity: int,
    index_sentinel: int = INDEX_SENTINEL,
    value_sentinel: float = VALUE_SENTINEL,
    distance_sentinel: float = DISTANCE_SENTINEL,
    sentinel_slots: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Convert the rectangular record layout to the reference's flat
    offset-segmented layout (trace_sph's contract): returns (offsets, counts,
    indices[capacity], integrals[capacity], distances[capacity]).

    sentinel_slots=True reserves one extra (pre-filled) slot per ray, the
    trace_with_sentinels_sph contract (ref: trace_sph.cuh:170-241)."""
    c = rec.capacity
    counts = jnp.minimum(rec.counts, c)
    stride = counts + (1 if sentinel_slots else 0)
    offsets = (jnp.cumsum(stride) - stride).astype(jnp.int32)
    colid = jnp.arange(c, dtype=jnp.int32)[None, :]
    valid = colid < counts[:, None]
    dest = jnp.where(valid, offsets[:, None] + colid, capacity)
    indices = jnp.full((capacity,), index_sentinel, jnp.int32).at[dest].set(
        rec.indices, mode="drop")
    integrals = jnp.full((capacity,), value_sentinel, jnp.float32).at[dest].set(
        rec.integrals, mode="drop")
    distances = jnp.full((capacity,), distance_sentinel, jnp.float32).at[dest].set(
        rec.distances, mode="drop")
    return offsets, counts, indices, integrals, distances

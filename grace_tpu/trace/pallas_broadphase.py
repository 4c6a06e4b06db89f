"""Dense segment culling: the TPU-native broadphase.

A vector machine inverts the usual wisdom about BVH traversal: testing EVERY
128-primitive segment's AABB against every ray-tile box as one dense
(n_tiles x n_segments) vectorized op costs ~milliseconds at a million
primitives — far cheaper than any pointer-chasing tree walk, whose dynamic
indexing TPUs fundamentally lack (Mosaic scalar VMEM loads require static
lane indices; XLA lockstep walks pay ~100us of dispatch per visited node).

So the broadphase here is hierarchical-free:

  1. segment AABBs: range-reduce the Morton-sorted primitive AABBs per
     128-block (one reshape + min/max — Morton order makes segments
     spatially compact, which is what keeps the cull selective);
  2. dense overlap matrix [n_tiles, n_segments] on the VPU;
  3. bitmask pack + vectorized set-bit compaction (compact_mask_words)
     into the per-tile segment lists the streaming kernels consume —
     ascending and unique by construction (r5: this replaced a stable
     argsort that cost ~46 ms at 4096x8192).

The BVH is still load-bearing for the generic traversal engine, per-hit
record pipelines, and closest-hit queries; for the tile broadphase the
Morton-ordered flat segmentation IS the acceleration structure. The
lockstep tree-walk broadphase (grace_tpu.trace.broadphase) remains as the
oracle implementation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from grace_tpu.core.types import Rays
from grace_tpu.ops.primitives import sphere_aabb
from grace_tpu.trace.broadphase import tile_aabbs

SEG = 128


def segment_aabbs(spheres: jax.Array,
                  block: int = SEG) -> Tuple[jax.Array, jax.Array]:
    """AABBs of each ``block``-primitive segment of the sorted particle
    array. ``block`` must divide SEG (the padded length is always a SEG
    multiple so finer blocks tile it exactly)."""
    n = spheres.shape[0]
    n_pad = ((n + SEG - 1) // SEG) * SEG
    mins, maxs = sphere_aabb(spheres)
    big = jnp.finfo(jnp.float32).max
    mins = jnp.pad(mins, ((0, n_pad - n), (0, 0)), constant_values=big)
    maxs = jnp.pad(maxs, ((0, n_pad - n), (0, 0)), constant_values=-big)
    seg_min = jnp.min(mins.reshape(-1, block, 3), axis=1)
    seg_max = jnp.max(maxs.reshape(-1, block, 3), axis=1)
    return seg_min, seg_max


def pack_overlap_bits(overlap: jax.Array) -> jax.Array:
    """Pack a bool [n_tiles, n_segs] overlap matrix into i32 bitmask words
    [n_tiles, n_segs/32] (bit s of word w = segment w*32+s).

    The bitmask is the argsort-free broadphase product: per-row compaction
    (a stable argsort over n_segs columns, measured 46 ms at 4096x8192 —
    half the r1 frame) is replaced by this O(n) pack, and the trace kernel
    iterates set bits directly (while word != 0: seg = ctz(word)), skipping
    empty words at ~4 scalar ops each. Memory: n_tiles * n_segs / 8 bytes
    (4 MB at the bench shape) instead of n_tiles * max_chunks i32 lists.
    """
    n_tiles, n_segs = overlap.shape
    pad = (-n_segs) % 32
    if pad:
        overlap = jnp.pad(overlap, ((0, 0), (0, pad)))
    b = overlap.reshape(n_tiles, -1, 32).astype(jnp.uint32)
    words = jnp.sum(b << jnp.arange(32, dtype=jnp.uint32), axis=2, dtype=jnp.uint32)
    return jax.lax.bitcast_convert_type(words, jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile", "seg_block"))
def dense_tile_masks(
    rays: Rays,
    spheres: jax.Array,
    tile: int,
    seg_block: int = 8192,
) -> jax.Array:
    """Bitmask broadphase: i32[n_tiles, ceil(n_segs/32)] overlap words.

    Same dense AABB test as ``dense_tile_segments`` but without the per-row
    compaction sort; cannot overflow (every overlapped segment is always
    representable). Large scenes never materialize the full
    [n_tiles, n_segs] bool matrix: segments are processed in blocks of
    ``seg_block`` and packed to bits immediately, bounding the intermediate
    at n_tiles x seg_block bools (the r1 review's broadphase scaling cliff —
    a 2k-image x 4M-particle scene is 2.1e9 dense bools but only 268 MB of
    packed words)."""
    tmin, tmax = tile_aabbs(rays, tile)
    return masks_for_tile_aabbs(tmin, tmax, spheres, seg_block)


@functools.partial(jax.jit, static_argnames=("tile", "seg_block"))
def dense_tile_masks_quarter(
    rays: Rays,
    spheres: jax.Array,
    tile: int,
    seg_block: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """Quarter-granularity bitmask broadphase for the seg-32 trace kernel.

    Culling at 32-primitive quarters instead of 128-primitive segments cuts
    tested pairs ~2x on the bench scene (measured selectivity table,
    benchmarks/results/general_trace_floor_r3.md). Returns

      words   i32[n_tiles, ceil(n_q / 32)]   bit q of word w = quarter
                                             w*32+q overlaps the tile box
      summary i32[n_tiles, ceil(words / 32)] bit w of summary word s =
                                             word s*32+w is nonzero

    The summary level lets the kernel's scalar decode skip 32 empty words
    per bit test — at quarter granularity the word array is 4x longer and
    ~99% zero, so a flat scan would dominate the tile (the seg-128 kernels
    scan words flat and don't need this)."""
    tmin, tmax = tile_aabbs(rays, tile)
    words = masks_for_tile_aabbs(tmin, tmax, spheres, seg_block, block=32)
    summary = pack_overlap_bits(words != 0)
    return words, summary


def _popcount32(v: jax.Array) -> jax.Array:
    """Per-lane popcount of i32 words (SWAR; logical shifts — jnp's >> is
    arithmetic on int32 and would smear sign bits)."""
    lsr = jax.lax.shift_right_logical
    v = v - (lsr(v, 1) & jnp.int32(0x55555555))
    v = (v & jnp.int32(0x33333333)) + (lsr(v, 2) & jnp.int32(0x33333333))
    v = (v + lsr(v, 4)) & jnp.int32(0x0F0F0F0F)
    return lsr(v * jnp.int32(0x01010101), 24)


def compact_mask_words(words: jax.Array, max_q: int):
    """Vectorized set-bit compaction: quarter-granularity bitmask words ->
    per-tile dense quarter-id lists, entirely in XLA.

    This replaces the trace kernels' in-kernel scalar decode (the
    summary-walk + branch-free 32-emit of _trace_tile_kernel_quarter),
    whose ~5k scalar cycles/tile is what made fine ray tiles LOSE on
    hardware despite testing fewer pairs (r4 addendum,
    benchmarks/results/general_trace_floor_r3.md). The compaction is
    gather-free (TPU gathers are the other slow path): a two-level
    "which word holds output j" search done as broadcast counts + one-hot
    batched matmuls, then a 32-step bit-rank select —

      level A  sword (32-word group) exclusive bases; s(j) = last sword
               with base <= j via a [T, S, max_q] broadcast count
               (the searchsorted-free pattern, CLAUDE.md);
      level B  in-sword word bases; the chosen sword's 32-word base row
               and bit rows are PICKED with one-hot f32 matmuls (exact:
               counts < 2^24, bits split 16/16) — no take_along_axis;
      level C  j's rank within its word selects the bit by a 32-step
               cumulative-count scan (vector ops over [T, max_q]).

    Returns (q_ids i32[T, max_q] ascending, zero-padded; n_q i32[T];
    overflow bool[T]). Cost at bench scale (8192 tiles x 1024 words,
    max_q=256): ~10 fused elementwise passes + two [T, max_q, 32]x2
    batched matmuls — O(ms), amortized over the whole frame.
    """
    lsr = jax.lax.shift_right_logical
    n_tiles, n_words = words.shape
    pad_w = (-n_words) % 32
    if pad_w:
        words = jnp.pad(words, ((0, 0), (0, pad_w)))
    n_swords = words.shape[1] // 32
    w3 = words.reshape(n_tiles, n_swords, 32)                  # [T, S, 32]
    pc = _popcount32(w3)                                       # [T, S, 32]
    csum = jnp.cumsum(pc, axis=2)
    wbase = csum - pc                                          # in-sword excl
    sc = csum[:, :, 31]                                        # [T, S]
    sbase = jnp.cumsum(sc, axis=1) - sc                        # [T, S] excl
    n_q = (sbase[:, -1] + sc[:, -1]).astype(jnp.int32)

    j = jnp.arange(max_q, dtype=jnp.int32)                     # [Q]
    # level A: containing sword = last s with sbase <= j (consecutive equal
    # bases are empty swords; "last" lands on the one that holds j).
    s_of_j = jnp.sum(
        (sbase[:, :, None] <= j[None, None, :]).astype(jnp.int32), axis=1
    ) - 1                                                      # [T, Q]
    s_of_j = jnp.maximum(s_of_j, 0)
    oh_s = (s_of_j[:, :, None] == jnp.arange(n_swords)[None, None, :]
            ).astype(jnp.float32)                              # [T, Q, S]

    # level B: pick the sword's base/word rows with batched one-hot matmuls
    # (f32 exact: bases < 2^24; words split into two 16-bit halves).
    # precision=HIGHEST is REQUIRED for exactness on TPU: the default
    # matmul precision truncates f32 inputs to bf16 (8 mantissa bits —
    # integer-exact only to 256), silently corrupting word bases and the
    # 16-bit word halves on hardware while interpret/CPU runs stay exact.
    # HIGHEST decomposes each f32 into 3 bf16 terms (24 mantissa bits,
    # exact for these < 2^24 integer values) with f32 accumulation.
    def pick_rows(rows_f32):                                   # [T, S, 32]
        return jnp.einsum("tqs,tsk->tqk", oh_s, rows_f32,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)

    base_row = pick_rows(wbase.astype(jnp.float32))            # [T, Q, 32]
    lo_row = pick_rows((words.reshape(n_tiles, n_swords, 32)
                        & jnp.int32(0xFFFF)).astype(jnp.float32))
    hi_row = pick_rows(lsr(w3, 16).astype(jnp.float32))
    sbase_j = jnp.einsum("tqs,ts->tq", oh_s, sbase.astype(jnp.float32),
                         precision=jax.lax.Precision.HIGHEST)
    jloc = j[None, :].astype(jnp.float32) - sbase_j            # [T, Q]

    k_of_j = jnp.sum(
        (base_row <= jloc[:, :, None]).astype(jnp.int32), axis=2
    ) - 1                                                      # [T, Q]
    k_of_j = jnp.maximum(k_of_j, 0)
    oh_k = (k_of_j[:, :, None] == jnp.arange(32)[None, None, :])
    pickk = lambda r: jnp.sum(jnp.where(oh_k, r, 0.0), axis=2)
    word_j = (pickk(lo_row).astype(jnp.int32)
              + (pickk(hi_row).astype(jnp.int32) << 16))       # [T, Q]
    jj = (jloc - pickk(base_row)).astype(jnp.int32)            # rank in word

    # level C: the jj-th set bit of word_j.
    cnt = jnp.zeros_like(word_j)
    b_of_j = jnp.zeros_like(word_j)
    for b in range(32):
        bit = lsr(word_j, b) & 1
        b_of_j = jnp.where((bit == 1) & (cnt == jj), b, b_of_j)
        cnt = cnt + bit
    q_id = (s_of_j * 32 + k_of_j) * 32 + b_of_j
    valid = j[None, :] < n_q[:, None]
    return (jnp.where(valid, q_id, 0), jnp.minimum(n_q, max_q),
            n_q > max_q)


@functools.partial(jax.jit, static_argnames=("tile", "max_q", "seg_block"))
def quarter_lists(
    rays: Rays,
    spheres: jax.Array,
    tile: int,
    max_q: int = 512,
    seg_block: int = 8192,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-tile compacted quarter-id lists (the broadphase='qlist' product):
    quarter-granularity dense cull + XLA set-bit compaction. Returns
    (q_ids i32[n_tiles, max_q], n_q i32[n_tiles], overflow bool[n_tiles])."""
    tmin, tmax = tile_aabbs(rays, tile)
    words = masks_for_tile_aabbs(tmin, tmax, spheres, seg_block, block=32)
    return compact_mask_words(words, max_q)


def masks_for_tile_aabbs(
    tmin: jax.Array,
    tmax: jax.Array,
    spheres: jax.Array,
    seg_block: int = 8192,
    block: int = SEG,
) -> jax.Array:
    """``dense_tile_masks`` from precomputed ray-tile AABBs — the split lets
    distributed callers build masks for REMOTE ray blocks (ship the tiny
    per-tile boxes through a collective, not the rays) and hoist the whole
    broadphase out of a ring circuit (parallel/sharding.ring_pallas_render).
    ``block`` is the culling granularity in primitives (128 for the segment
    kernels, 32 for the quarter kernel).
    """
    seg_min, seg_max = segment_aabbs(spheres, block=block)

    def block_words(args):
        s_min, s_max = args
        overlap = (
            (tmin[:, 0:1] <= s_max[:, 0]) & (s_min[:, 0] <= tmax[:, 0:1])
            & (tmin[:, 1:2] <= s_max[:, 1]) & (s_min[:, 1] <= tmax[:, 1:2])
            & (tmin[:, 2:3] <= s_max[:, 2]) & (s_min[:, 2] <= tmax[:, 2:3])
        )
        return pack_overlap_bits(overlap)

    n_segs = seg_min.shape[0]
    if n_segs <= seg_block:
        return block_words((seg_min, seg_max))
    blk = seg_block
    assert blk % 32 == 0
    pad = (-n_segs) % blk
    # Padded segments are empty (min=+inf > max=-inf): never overlap.
    big = jnp.finfo(jnp.float32).max
    s_min = jnp.concatenate([seg_min, jnp.full((pad, 3), big)], 0)
    s_max = jnp.concatenate([seg_max, jnp.full((pad, 3), -big)], 0)
    words = jax.lax.map(
        block_words,
        (s_min.reshape(-1, blk, 3), s_max.reshape(-1, blk, 3)),
    )  # [n_blocks, n_tiles, blk/32]
    words = jnp.transpose(words, (1, 0, 2)).reshape(tmin.shape[0], -1)
    return words[:, : (n_segs + 31) // 32]


@functools.partial(jax.jit, static_argnames=("tile", "max_chunks"))
def dense_tile_segments(
    rays: Rays,
    spheres: jax.Array,
    tile: int,
    max_chunks: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-tile ascending, unique 128-aligned segment ids by dense culling.

    Returns (seg_ids i32[n_tiles, max_chunks], n_segs i32[n_tiles],
    overflow bool[n_tiles]). r5: the per-row compaction is the
    vectorized set-bit compaction (compact_mask_words) over the packed
    overlap bitmask — the stable-argsort it replaces (cull_segments)
    cost ~46 ms at 4096x8192 (half an r1 frame); the bitmask pack +
    compaction is ~1 ms at that shape with identical output semantics.
    """
    tmin, tmax = tile_aabbs(rays, tile)
    words = masks_for_tile_aabbs(tmin, tmax, spheres)
    return compact_mask_words(words, max_chunks)

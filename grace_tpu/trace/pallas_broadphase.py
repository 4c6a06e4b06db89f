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
  3. per-row compaction (stable argsort) into the per-tile segment lists the
     streaming kernel consumes — ascending and unique by construction.

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


def cull_segments(tmin, tmax, seg_min, seg_max, max_chunks: int):
    """Dense AABB-overlap cull + per-row compaction into ascending unique
    segment-id lists. Shared by the SPH and triangle trace paths."""
    # Six [n_tiles, n_segs] comparisons instead of one [n_tiles, n_segs, 3]
    # broadcast: a trailing dim of 3 occupies 3 of 128 lanes and makes XLA
    # materialize 42x-padded temporaries (measured 25 ms -> ~1 ms at 2048
    # tiles x 8192 segments).
    overlap = (
        (tmin[:, 0:1] <= seg_max[None, :, 0]) & (seg_min[None, :, 0] <= tmax[:, 0:1])
        & (tmin[:, 1:2] <= seg_max[None, :, 1]) & (seg_min[None, :, 1] <= tmax[:, 1:2])
        & (tmin[:, 2:3] <= seg_max[None, :, 2]) & (seg_min[None, :, 2] <= tmax[:, 2:3])
    )  # [n_tiles, n_segs]
    n_segs = jnp.sum(overlap, axis=1).astype(jnp.int32)
    order = jnp.argsort(jnp.logical_not(overlap), axis=1, stable=True)
    keep = min(max_chunks, order.shape[1])
    seg_ids = order[:, :keep].astype(jnp.int32)
    seg_ids = jnp.pad(seg_ids, ((0, 0), (0, max_chunks - keep)))
    seg_ids = jnp.where(
        jnp.arange(max_chunks)[None, :] < n_segs[:, None], seg_ids, 0
    )
    overflow = n_segs > max_chunks
    return seg_ids, jnp.minimum(n_segs, max_chunks), overflow


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
    overflow bool[n_tiles]).
    """
    tmin, tmax = tile_aabbs(rays, tile)
    seg_min, seg_max = segment_aabbs(spheres)
    return cull_segments(tmin, tmax, seg_min, seg_max, max_chunks)

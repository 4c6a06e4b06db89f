"""Tile broadphase: per-ray-tile BVH culling producing primitive chunk lists.

This is the TPU-native restructuring of per-ray traversal: instead of each
ray walking the tree (divergent scalar control flow — hostile to a vector
machine), rays are grouped into coherence-sorted tiles, each tile's bounding
box walks the tree ONCE, and the resulting per-tile lists of primitive
chunks feed the streaming Pallas kernel (grace_tpu.trace.pallas_kernel),
which does nothing but DMA chunk slabs and run full-width ray x primitive
tests. Structurally this is the binning pass of a tile-based rasterizer;
the role the warp-shared stack plays in the reference's trace kernel
(ref: bintree_trace.cuh:96-160) is played here by the tile walk.

Conservative: the tile AABB (hull of all ray segment endpoints) may overlap
leaves no ray in the tile hits — the per-ray test in the kernel filters.
Tight for coherent tiles (images, plane-parallel, sorted rays); degenerate
(everything overlaps) for wide-spread ray bundles, where the per-tile chunk
cap ``max_chunks`` bounds memory and an overflow flag reports truncation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from grace_tpu.core.tree import Tree
from grace_tpu.core.types import Rays


class TileChunks(NamedTuple):
    first: jax.Array     # i32[n_tiles, max_chunks] primitive start of each chunk
    count: jax.Array     # i32[n_tiles, max_chunks] primitives in chunk (<= mpl)
    n_chunks: jax.Array  # i32[n_tiles]
    overflow: jax.Array  # bool[n_tiles] — list truncated (results incomplete)


def tile_aabbs(rays: Rays, tile: int):
    """Per-tile AABB of all ray segments (hull of origin/terminus points)."""
    n = rays.n_rays
    assert n % tile == 0, "ray count must be a multiple of the tile size"
    o = rays.origins.reshape(-1, tile, 3)
    e = (rays.origins + rays.directions * rays.lengths[:, None]).reshape(-1, tile, 3)
    mins = jnp.minimum(jnp.min(o, axis=1), jnp.min(e, axis=1))
    maxs = jnp.maximum(jnp.max(o, axis=1), jnp.max(e, axis=1))
    return mins, maxs


def collect_tile_chunks(
    rays: Rays,
    tree: Tree,
    tile: int,
    max_chunks: int,
    stack_size: int = 128,
) -> TileChunks:
    """Walk the tree once per tile, collecting overlapped leaves as
    (prim_first, prim_count) chunks. Vectorized lockstep over all tiles."""
    tmin, tmax = tile_aabbs(rays, tile)
    n_tiles = tmin.shape[0]
    tids = jnp.arange(n_tiles, dtype=jnp.int32)

    stack = jnp.zeros((n_tiles, stack_size), jnp.int32)
    stack = stack.at[:, 0].set(tree.root)
    sp = jnp.ones((n_tiles,), jnp.int32)
    first = jnp.zeros((n_tiles, max_chunks), jnp.int32)
    count = jnp.zeros((n_tiles, max_chunks), jnp.int32)
    cursor = jnp.zeros((n_tiles,), jnp.int32)

    def body(state):
        stack, sp, first, count, cursor = state
        active = sp > 0
        top_col = jnp.maximum(sp - 1, 0)
        top = stack[tids, top_col]
        at_leaf = active & (top < 0)
        at_node = active & (top >= 0)

        node = jnp.clip(top, 0, tree.capacity - 1)
        kids = tree.children[node]
        boxes = tree.child_aabbs[node]             # [T, 2, 2, 3]
        overlap = jnp.all(
            (tmin[:, None, :] <= boxes[:, :, 1, :])
            & (boxes[:, :, 0, :] <= tmax[:, None, :]),
            axis=-1,
        ) & at_node[:, None]
        hit_l = overlap[:, 0]
        hit_r = overlap[:, 1]
        n_push = hit_l.astype(jnp.int32) + hit_r.astype(jnp.int32)
        fst = jnp.where(hit_l, kids[:, 0], kids[:, 1])
        col0 = jnp.where(at_node & (n_push >= 1), top_col, stack_size)
        stack2 = stack.at[tids, col0].set(fst, mode="drop")
        col1 = jnp.where(at_node & (n_push == 2), top_col + 1, stack_size)
        stack2 = stack2.at[tids, col1].set(kids[:, 1], mode="drop")

        leaf = jnp.clip(jnp.invert(top), 0, tree.leaf_capacity - 1)
        slot = jnp.where(at_leaf & (cursor < max_chunks), cursor, max_chunks)
        first2 = first.at[tids, slot].set(tree.leaves[leaf, 0], mode="drop")
        count2 = count.at[tids, slot].set(tree.leaves[leaf, 1], mode="drop")
        cursor2 = cursor + at_leaf.astype(jnp.int32)

        new_sp = jnp.where(at_leaf | at_node, sp - 1, sp) + jnp.where(at_node, n_push, 0)
        return stack2, new_sp, first2, count2, cursor2

    def cond(state):
        return jnp.any(state[1] > 0)

    from grace_tpu.utils.vma import promote_to_vma, union_vma

    state = (stack, sp, first, count, cursor)
    state = promote_to_vma(state, union_vma(rays, tree))
    stack, sp, first, count, cursor = jax.lax.while_loop(cond, body, state)
    return TileChunks(
        first=first,
        count=count,
        n_chunks=jnp.minimum(cursor, max_chunks),
        overflow=cursor > max_chunks,
    )

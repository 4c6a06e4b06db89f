"""Varying-manual-axes (vma) helpers for running the engines under shard_map.

Under ``jax.shard_map`` every array has a set of mesh axes it "varies" over;
``lax.while_loop``/``lax.scan`` require carry input and output types (incl.
vma) to match. Engine-internal carries built from ``jnp.zeros`` start
invariant and would be promoted by the loop body (e.g. by mixing in sharded
ray data), so we pre-promote them to the union of the referenced inputs' vma.
Outside shard_map every vma is empty and these helpers are no-ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _leaf_vma(x):
    try:
        return frozenset(jax.typeof(x).vma)
    except Exception:
        return frozenset()


def union_vma(*trees) -> frozenset:
    axes: frozenset = frozenset()
    for t in trees:
        for leaf in jax.tree_util.tree_leaves(t):
            axes = axes | _leaf_vma(leaf)
    return axes


def promote_to_vma(tree, axes: frozenset):
    """pvary every leaf of ``tree`` up to the given axis set."""
    if not axes:
        return tree

    def promote(x):
        missing = tuple(sorted(axes - _leaf_vma(x)))
        if not missing:
            return x
        return jax.lax.pcast(x, missing, to="varying")

    return jax.tree_util.tree_map(promote, tree)

"""Leaf-occupancy analysis (analog of ref leaf_sizes.py:1-68: histogram of
leaf sizes and surface-area fraction per occupancy, but computed directly
from a built tree instead of a dumped text file).

Usage: python tools/leaf_sizes.py [n_particles] [max_per_leaf]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def leaf_statistics(tree, spheres):
    import jax.numpy as jnp

    nl = int(tree.n_leaves)
    leaves = np.array(tree.leaves)[:nl]
    counts = leaves[:, 1]
    # Per-leaf AABB surface area from the sorted primitive ranges.
    s = np.array(spheres)
    areas = np.zeros(nl)
    for k, (first, cnt) in enumerate(leaves):
        seg = s[first:first + cnt]
        mins = (seg[:, :3] - seg[:, 3:4]).min(0)
        maxs = (seg[:, :3] + seg[:, 3:4]).max(0)
        e = maxs - mins
        areas[k] = 2 * (e[0] * e[1] + e[0] * e[2] + e[1] * e[2])
    return counts, areas


def main():
    import jax
    import jax.numpy as jnp

    from grace_tpu.build.sph import build_sph_tree
    from grace_tpu.core.types import make_spheres

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    mpl = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    rng = np.random.default_rng(0)
    spheres = make_spheres(rng.random((n, 3)).astype(np.float32),
                           (0.005 + 0.01 * rng.random(n)).astype(np.float32))
    sorted_spheres, tree, _ = jax.jit(build_sph_tree, static_argnums=1)(spheres, mpl)
    counts, areas = leaf_statistics(tree, sorted_spheres)

    print(f"n_particles: {n}  max_per_leaf: {mpl}  n_leaves: {len(counts)}")
    print(f"mean_occupancy: {counts.mean():.2f}  "
          f"occupancy_fraction: {counts.mean() / mpl:.2%}")
    hist, _ = np.histogram(counts, bins=np.arange(1, mpl + 2))
    area_frac = np.zeros(mpl)
    for occ in range(1, mpl + 1):
        area_frac[occ - 1] = areas[counts == occ].sum()
    area_frac /= areas.sum()
    print("occupancy  leaves  area_fraction")
    for occ in range(1, mpl + 1):
        if hist[occ - 1]:
            print(f"{occ:9d}  {hist[occ - 1]:6d}  {area_frac[occ - 1]:.4f}")


if __name__ == "__main__":
    main()

"""Headline benchmark: SPH column-density trace throughput (rays/s/chip).

Mirrors the reference's profile_trace_gadget workload shape
(ref: tests/profile_trace_gadget/profile_trace_gadget.cu): a clustered
particle snapshot, plane-parallel ray field, cumulative (column density)
trace. Baseline for vs_baseline is the north-star target 1e8 rays/s/chip
(BASELINE.json) since the reference publishes no numbers (BASELINE.md).

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

N_PARTICLES = int(os.environ.get("GRACE_BENCH_PARTICLES", 1 << 20))
N_RAYS = int(os.environ.get("GRACE_BENCH_RAYS", 512 * 512))
MAX_PER_LEAF = 32
NORTH_STAR_RAYS_PER_S = 1e8


def make_clustered_particles(rng, n):
    """Gadget-like clustered distribution: Plummer-ish clumps in a unit box."""
    n_clumps = 256
    centers = rng.random((n_clumps, 3)).astype(np.float32)
    assign = rng.integers(0, n_clumps, n)
    scale = 0.02 + 0.05 * rng.random((n_clumps, 1)).astype(np.float32)
    pos = centers[assign] + rng.standard_normal((n, 3)).astype(np.float32) * scale[assign]
    pos = np.clip(pos, 0.0, 1.0)
    # smoothing length ~ local density proxy
    h = (0.005 + 0.01 * rng.random(n)).astype(np.float32)
    return np.concatenate([pos, h[:, None]], axis=1).astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp
    from grace_tpu.build.sph import build_sph_tree
    from grace_tpu.rays.gen import plane_parallel_random_rays, spatial_sort_rays
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph

    rng = np.random.default_rng(2026)
    spheres = jnp.asarray(make_clustered_particles(rng, N_PARTICLES))

    side = int(np.sqrt(N_RAYS))
    rays = plane_parallel_random_rays(
        jax.random.key(0), side, side, (0, 0, -2.0), (1, 0, 0), (0, 1, 0), length=6.0
    )

    build = jax.jit(lambda s: build_sph_tree(s, MAX_PER_LEAF))
    sorted_spheres, tree, _ = build(spheres)
    jax.block_until_ready(sorted_spheres)

    # Ray-coherence sort (part of the pipeline, as in the reference's
    # gen+sort stage) then the fused Pallas trace.
    rays_s, _, _ = jax.jit(spatial_sort_rays)(rays)

    def run():
        img, ovf = pallas_trace_sph(
            rays_s, sorted_spheres, tree, tile=64, max_chunks=2048
        )
        return jnp.sum(img), ovf

    def fetch(r):
        # Scalar fetch forces execution AND surfaces device faults (the axon
        # platform does not raise from block_until_ready alone).
        total, ovf = float(r[0]), bool(jnp.any(r[1]))
        assert not ovf, "tile segment-list overflow; raise max_chunks"
        assert np.isfinite(total) and total > 0
        return total

    fetch(run())  # warm-up / compile + fault check

    # Pipelined throughput measurement: dispatch the iterations back-to-back
    # so the ~25 ms per-call tunnel dispatch latency overlaps device compute
    # (the steady-state rate a real pipeline gets), then block on the last
    # result and re-validate with a scalar fetch.
    n_iter = 7
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        rs = [run() for _ in range(n_iter)]
        jax.block_until_ready(rs[-1])
        dt_run = (time.perf_counter() - t0) / n_iter
        best = dt_run if best is None else min(best, dt_run)
    fetch(rs[-1])
    dt = best

    rays_per_s = (side * side) / dt
    print(
        json.dumps(
            {
                "metric": "sph_column_density_rays_per_s_per_chip",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / NORTH_STAR_RAYS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()

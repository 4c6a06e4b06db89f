"""Round-2 kernel experiments: where does the time go, and how does culling
selectivity scale with tile size?

Measures, on the bench scene (1M clustered particles, 512x512 plane-parallel
rays):
  - broadphase time per tile size
  - mean/max culled segments per tile  -> tested pairs per ray
  - true hits per ray (redundancy = tested / true)
  - fused kernel time for (tile, subtiles, unroll) configs

Usage: python benchmarks/r2_experiments.py [configs|stats|sweep]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def timeit(run, iters=3):
    run()
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best * 1e3


def timeit_pipelined(dispatch, n_iter=7, reps=3):
    """bench.py-style timing: dispatch n_iter calls back-to-back so the
    ~25-50 ms tunnel dispatch latency overlaps device compute, block on the
    last result. `dispatch` must return an un-fetched device value."""
    import jax

    jax.block_until_ready(dispatch())
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        rs = [dispatch() for _ in range(n_iter)]
        jax.block_until_ready(rs[-1])
        dt = (time.perf_counter() - t0) / n_iter
        best = dt if best is None else min(best, dt)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_clustered_particles
    from grace_tpu.build.sph import build_sph_tree
    from grace_tpu.rays.gen import plane_parallel_random_rays, spatial_sort_rays
    from grace_tpu.trace.pallas_broadphase import dense_tile_segments
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph

    n = 1 << 20
    side = 512
    rng = np.random.default_rng(2026)
    spheres = jnp.asarray(make_clustered_particles(rng, n))
    rays = plane_parallel_random_rays(
        jax.random.key(0), side, side, (0, 0, -2.0), (1, 0, 0), (0, 1, 0), 6.0
    )
    build = jax.jit(lambda s: build_sph_tree(s, 32))
    sorted_spheres, tree, _ = build(spheres)
    rays_s, _, _ = jax.jit(spatial_sort_rays)(rays)
    jax.block_until_ready(sorted_spheres)

    mode = sys.argv[1] if len(sys.argv) > 1 else "stats"

    if mode == "stats":
        # True hits (once).
        hc, ovf = pallas_trace_sph(rays_s, sorted_spheres, tree, tile=64,
                                   max_chunks=4096, mode="hitcount")
        total_hits = float(jnp.sum(hc))
        assert not bool(jnp.any(ovf))
        print(f"true_hits_total: {total_hits:.4g}  per_ray: {total_hits/side**2:.1f}")

        for tile in (512, 256, 128, 64, 32, 16):
            mc = 8192
            f = jax.jit(lambda r, s: dense_tile_segments(r, s, tile, mc),
                        static_argnames=())
            segs, nsegs, ovf = f(rays_s, sorted_spheres)
            t_bp = timeit(lambda: float(jnp.sum(f(rays_s, sorted_spheres)[1])))
            mean_segs = float(jnp.mean(nsegs))
            max_segs = int(jnp.max(nsegs))
            pairs_per_ray = mean_segs * 128.0
            print(
                f"tile={tile:4d} bp_ms={t_bp:7.2f} mean_segs={mean_segs:8.1f} "
                f"max_segs={max_segs:6d} pairs/ray={pairs_per_ray:9.0f} "
                f"redundancy={pairs_per_ray * side**2 / total_hits:6.1f}x "
                f"overflow={bool(jnp.any(ovf))}"
            )
        return

    if mode == "configs":
        cfgs = [
            dict(tile=64, max_chunks=2048),                      # r1 bench cfg
            dict(tile=64, max_chunks=2048, unroll=8),
            dict(tile=128, max_chunks=2048, unroll=4),
            dict(tile=128, max_chunks=2048, unroll=8),
            dict(tile=32, max_chunks=4096, unroll=16),
            dict(tile=32, max_chunks=4096, subtiles=4),
            dict(tile=32, max_chunks=4096, subtiles=8),
            dict(tile=64, max_chunks=2048, subtiles=4),
            dict(tile=16, max_chunks=4096, subtiles=8),
        ]
        for cfg in cfgs:
            def run(cfg=cfg):
                v, ovf = pallas_trace_sph(rays_s, sorted_spheres, tree, **cfg)
                s = float(jnp.sum(v))
                assert np.isfinite(s) and not bool(jnp.any(ovf)), cfg
                return s

            try:
                ms = timeit(run)
                print(f"{cfg} -> {ms:7.2f} ms  {side*side/ms*1e3:.3e} rays/s")
            except Exception as e:  # noqa: BLE001
                print(f"{cfg} -> FAILED {type(e).__name__}: {e}")
        return

    if mode == "bitmask":
        # Hardware parity first: hitcounts must match the list-based kernel.
        hc_ref, ovf = pallas_trace_sph(rays_s, sorted_spheres, tree, tile=64,
                                       max_chunks=4096, mode="hitcount",
                                       broadphase="xla")
        sref = float(jnp.sum(hc_ref))
        for tile in (32, 64, 128, 256):
            hc, _ = pallas_trace_sph(rays_s, sorted_spheres, tree, tile=tile,
                                     mode="hitcount", broadphase="bitmask")
            eq = bool(jnp.all(hc == hc_ref))
            print(f"tile={tile} hitcount parity vs xla-bp kernel: {eq} (sum {float(jnp.sum(hc)):.6g} vs {sref:.6g})")

            def run(tile=tile):
                v, _ = pallas_trace_sph(rays_s, sorted_spheres, tree,
                                        tile=tile, broadphase="bitmask")
                return jnp.sum(v)

            ms = timeit_pipelined(run)
            assert np.isfinite(float(run()))
            print(f"  cumulative: {ms:7.2f} ms  {side*side/ms*1e3:.3e} rays/s")

            from grace_tpu.trace.pallas_broadphase import dense_tile_masks
            ms_bp = timeit_pipelined(
                lambda tile=tile: dense_tile_masks(rays_s, sorted_spheres, tile))
            print(f"  mask broadphase alone: {ms_bp:7.2f} ms")
        return

    print(f"unknown mode {mode}")


if __name__ == "__main__":
    main()

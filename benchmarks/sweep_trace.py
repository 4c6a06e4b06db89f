"""Sweep (tile, subtiles) configs for the fused Pallas SPH trace and split
broadphase vs kernel time. Usage: python benchmarks/sweep_trace.py [n] [rays].
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def timeit(run, iters=5):
    run()
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = run()
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best * 1e3, r


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_clustered_particles
    from grace_tpu.build.sph import build_sph_tree
    from grace_tpu.rays.gen import plane_parallel_random_rays, spatial_sort_rays
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph
    from grace_tpu.trace.pallas_broadphase import dense_tile_segments

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 512 * 512
    side = int(np.sqrt(n_rays))

    rng = np.random.default_rng(2026)
    spheres = jnp.asarray(make_clustered_particles(rng, n))
    build = jax.jit(lambda s: build_sph_tree(s, 32))
    sorted_spheres, tree, _ = build(spheres)
    rays = plane_parallel_random_rays(
        jax.random.key(0), side, side, (0, 0, -2.0), (1, 0, 0), (0, 1, 0), 6.0)
    rays_s, _, _ = jax.jit(spatial_sort_rays)(rays)
    jax.block_until_ready(sorted_spheres)

    # Independent accuracy reference (r1 advisor note: seeding ref from the
    # first successful config made that row's sum_ok a self-comparison):
    # canonical bitmask-broadphase config, computed before the sweep.
    ref_v, ref_ovf = pallas_trace_sph(rays_s, sorted_spheres, tree, tile=64,
                                      broadphase="bitmask")
    assert not bool(jnp.any(ref_ovf))
    ref = float(jnp.sum(ref_v))
    for tile, subtiles, mc in [(128, 1, 2048), (128, 2, 2048), (128, 4, 2048),
                               (64, 1, 2048), (64, 4, 2048), (64, 8, 2048),
                               (32, 4, 1024), (32, 8, 1024), (32, 16, 1024),
                               (256, 1, 4096)]:
        def bp():
            s, ns, ov = dense_tile_segments(rays_s, sorted_spheres, tile, mc)
            return float(jnp.sum(ns)), int(jnp.max(ns)), bool(jnp.any(ov))

        t_bp, (tot_segs, max_segs, ovf) = timeit(bp, 3)
        if ovf:
            print(f"tile={tile:4d} s={subtiles:2d}: OVERFLOW (max_chunks={mc})")
            continue

        def run():
            img, ov = pallas_trace_sph(
                rays_s, sorted_spheres, tree, tile=tile, max_chunks=mc,
                subtiles=subtiles)
            return float(jnp.sum(img))

        try:
            t, total = timeit(run, 5)
        except Exception as e:  # noqa: BLE001
            print(f"tile={tile:4d} s={subtiles:2d}: FAIL {type(e).__name__}: {e}")
            continue
        pairs = tot_segs * 128 * tile  # tested (ray, prim) pairs
        ok = abs(total - ref) <= 1e-4 * max(abs(ref), 1e-30)
        print(f"tile={tile:4d} s={subtiles:2d}: {t:7.2f} ms  "
              f"{n_rays / t * 1e3 / 1e6:6.2f} Mray/s  bp={t_bp:6.2f} ms  "
              f"pairs={pairs:.3e} maxsegs={max_segs:5d} sum_ok={ok}")


if __name__ == "__main__":
    main()

"""Sweep (tile, subtiles) configs for the fused Pallas SPH trace and split
broadphase vs kernel time. Usage: python benchmarks/sweep_trace.py [n] [rays].

Scaling configuration (VERDICT r2 #8 / results/bigscene_r2.md): run
`python benchmarks/sweep_trace.py bigscene` for the 2048^2-ray x 4.19M-
particle scene — device-time broadphase + full-trace ms plus the packed
bitmask MB (the broadphase output is n_tiles * n_segs / 8 bytes; the
chunked pack never materializes the dense bool matrix). r2 measured:
broadphase 8.31 ms (268 MB of masks), full trace 2325 ms = 1.8e6 rays/s,
broadphase share 0.4%.
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


def bigscene():
    """The broadphase scaling cliff configuration: 2048^2 rays x 4.19M
    particles (streaming kernel regime). Documents ms + mask MB."""
    import jax
    import jax.numpy as jnp

    import bench
    from bench import make_clustered_particles
    from grace_tpu.rays.gen import plane_parallel_random_rays, spatial_sort_rays
    from grace_tpu.trace.pallas_broadphase import dense_tile_masks
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph

    n, side, tile = 1 << 22, 2048, 64
    rng = np.random.default_rng(2026)
    spheres = jnp.asarray(make_clustered_particles(rng, n))
    rays = plane_parallel_random_rays(
        jax.random.key(0), side, side, (0, 0, -2.0), (1, 0, 0), (0, 1, 0), 6.0)
    rays_s, _, _ = jax.jit(spatial_sort_rays)(rays)

    masks = dense_tile_masks(rays_s, spheres, tile)
    mb = masks.size * 4 / 2**20
    print(f"masks: {masks.shape} = {mb:.0f} MB packed "
          f"(dense bool would be {masks.shape[0] * (n // 128) / 2**23:.0f} MB "
          f"per seg-block without chunking)", flush=True)

    def bp_body(i, acc):
        from grace_tpu.core.types import Rays
        rr = Rays(rays_s.origins, rays_s.directions, rays_s.lengths + acc * 1e-38)
        m = dense_tile_masks(rr, spheres, tile)
        return acc + m[0, 0].astype(jnp.float32) * 1e-38 + 1.0

    bp_ms = bench.device_frame_ms(bp_body, k1=1, k2=4)
    print(f"broadphase: {bp_ms:.2f} ms device", flush=True)

    def trace_body(i, acc):
        from grace_tpu.core.types import Rays
        rr = Rays(rays_s.origins, rays_s.directions, rays_s.lengths + acc * 1e-38)
        v, _ = pallas_trace_sph(rr, spheres, tile=tile, broadphase="bitmask")
        return acc + v[0] * 1e-38 + 1.0

    t_ms = bench.device_frame_ms(trace_body, k1=1, k2=3)
    print(f"full trace: {t_ms:.1f} ms device = {side*side/t_ms*1e3/1e6:.2f} "
          f"Mray/s, broadphase share {bp_ms/t_ms*100:.1f}%")


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_clustered_particles
    from grace_tpu.build.sph import build_sph_tree
    from grace_tpu.rays.gen import plane_parallel_random_rays, spatial_sort_rays
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph
    from grace_tpu.trace.pallas_broadphase import dense_tile_segments

    if len(sys.argv) > 1 and sys.argv[1] == "bigscene":
        bigscene()
        return

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

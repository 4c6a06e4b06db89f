"""Round-3 record-kernel drain sweep on real TPU: pick (prefix/group) vs
shift-network compaction drains, on the 38k-ray bench-scene per-hit
workload (r2 one-rank prefix pick drain: 118 ms).

Usage: python benchmarks/r3_records_sweep.py <config> [...]
  where config is drain:tile, e.g. pick:64 network:64 network:32
Run few configs per process (each compile is ~1-2 min; a process that
times out loses its results).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main(configs):
    import jax
    import jax.numpy as jnp
    import bench
    from grace_tpu.build.sph import build_sph_tree
    from grace_tpu.core.types import Rays
    from grace_tpu.rays.gen import orthographic_projection_rays, spatial_sort_rays
    from grace_tpu.trace.pallas_records import pallas_trace_sph_records
    from grace_tpu.trace.sph import trace_hitcounts_sph

    rng = np.random.default_rng(2026)
    spheres = jnp.asarray(bench.make_clustered_particles(rng, bench.N_PARTICLES))
    ss, tree, _ = jax.jit(lambda s: build_sph_tree(s, 32))(spheres)
    rays = orthographic_projection_rays(196, 196, bench.CAM, bench.LOOK,
                                        bench.UP, bench.VEXT, bench.LENGTH)
    rays_s, _, _ = jax.jit(spatial_sort_rays)(rays)
    hc = trace_hitcounts_sph(rays_s, ss, tree)

    for cfg in configs:
        parts = cfg.split(":")
        drain, tile = parts[0], int(parts[1])
        rank_method = parts[2] if len(parts) > 2 else "prefix"
        group = int(parts[3]) if len(parts) > 3 else 1
        broadphase = parts[4] if len(parts) > 4 else "bitmask"
        kw = dict(per_ray_capacity=512, tile=tile, drain=drain,
                  rank_method=rank_method, group=group, broadphase=broadphase)
        rec = pallas_trace_sph_records(rays_s, ss, **kw)
        ok = bool(jnp.all(rec.counts == hc))
        if not ok:
            print(f"{cfg}: PARITY FAIL", flush=True)
            continue

        def body(i, acc, kw=kw):
            rr = Rays(rays_s.origins, rays_s.directions,
                      rays_s.lengths + acc * 1e-38)
            rec = pallas_trace_sph_records(rr, ss, **kw)
            return acc + rec.integrals[0, 0] * 1e-38 + 1.0

        ms = bench.device_frame_ms(body, k1=1, k2=4)
        print(f"{cfg}: {ms:.1f} ms", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])

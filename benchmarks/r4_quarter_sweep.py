"""Round-4 general-trace sweep on real TPU: quarter (seg-32) vs bitmask
broadphase, tile/unroll/integral flavor.

Usage: python benchmarks/r4_quarter_sweep.py [--pinhole] <config> [...]
  config = broadphase:tile:unroll[:integral_deg]
  e.g.  quarter:128:8  quarter:128:8:-12  bitmask:64:16

--pinhole swaps the orthographic bench bundle for a perspective
(pinhole-camera) bundle over the same scene — the reference's one trace
kernel serves every camera (bintree_trace.cuh); this measures ours on
the non-separable bundle class the splat path cannot take.

Run few configs per process (cold kernel compiles are ~1-2 min each).
Results (2026-08-20, TPU v5e, bench scene): see
benchmarks/results/r4_hw_notes.md and general_trace_floor_r3.md addendum.
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
    from grace_tpu.rays.gen import (orthographic_projection_rays,
                                    pinhole_camera_rays, spatial_sort_rays)
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph

    pinhole = "--pinhole" in configs
    configs = [c for c in configs if not c.startswith("--")]
    rng = np.random.default_rng(2026)
    spheres = jnp.asarray(bench.make_clustered_particles(rng, bench.N_PARTICLES))
    ss, tree, _ = jax.jit(lambda s: build_sph_tree(s, 32))(spheres)
    side = int(np.sqrt(bench.N_RAYS))
    if pinhole:
        rays = pinhole_camera_rays(side, side, bench.CAM, bench.LOOK,
                                   bench.UP, jnp.pi / 3, bench.LENGTH)
    else:
        rays = orthographic_projection_rays(side, side, bench.CAM, bench.LOOK,
                                            bench.UP, bench.VEXT, bench.LENGTH)
    rays_s, _, _ = jax.jit(spatial_sort_rays)(rays)

    # parity gate vs the bitmask kernel's exact hitcounts (16k-ray slice)
    check = jax.tree.map(lambda x: x[:16384], rays_s)
    hc_ref, _ = pallas_trace_sph(check, ss, tile=64, mode="hitcount",
                                 broadphase="bitmask")

    for cfg in configs:
        parts = cfg.split(":")
        bp, tile, unroll = parts[0], int(parts[1]), int(parts[2])
        ideg = int(parts[3]) if len(parts) > 3 else 14
        kw = dict(tile=tile, broadphase=bp, unroll=unroll, integral_deg=ideg)
        hc, _ = pallas_trace_sph(check, ss, mode="hitcount",
                                 **{**kw, "integral_deg": 14})
        if not bool(jnp.all(hc == hc_ref)):
            print(f"{cfg}: PARITY FAIL", flush=True)
            continue

        def body(i, acc, kw=kw):
            rr = Rays(rays_s.origins, rays_s.directions,
                      rays_s.lengths + acc * 1e-38)
            v, _ = pallas_trace_sph(rr, ss, **kw)
            return acc + v[0] * 1e-38 + 1.0

        ms = bench.device_frame_ms(body, k1=2, k2=8)
        print(f"{cfg}: {ms:.2f} ms = "
              f"{side * side / (ms / 1e3) / 1e6:.2f}M rays/s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])

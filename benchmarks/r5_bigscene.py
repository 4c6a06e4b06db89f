"""Beyond-VMEM streaming trace at the r2 large-scene configuration.

Scene: 2048x2048 ortho rays (4.19M) x 4,194,304 clustered particles —
particle slabs (128+ MB) exceed the VMEM budget, so broadphase='quarter'
takes the streaming-DMA route (_trace_tile_kernel_quarter_stream) and
broadphase='bitmask' the bitmask-stream route. Parity is gated on a
16k-ray slice vs the bitmask kernel (the full-scale 4M-ray reference jit
trips the compile helper's HTTP request-size limit on this platform).

r5 measured (device_frame_ms, TPU v5e): quarter-stream t128 deg14
2418 ms (1.73M rays/s), deg-10 2222 ms (1.89M rays/s) — statistically
tied with r2's bitmask-stream 2325 ms (1.80M): at streaming scale the
quarter route's 4x DMA amplification (4 parent slabs per assembled
group) offsets its ~2x pair reduction. The fast integral still buys 9%.
See benchmarks/results/r5_hw_notes.md.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import bench
    from grace_tpu.build.sph import build_sph_tree
    from grace_tpu.core.types import Rays
    from grace_tpu.rays.gen import orthographic_projection_rays, spatial_sort_rays
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph

    bench.enable_compilation_cache()
    n = 4194304
    rng = np.random.default_rng(2026)
    spheres = jnp.asarray(bench.make_clustered_particles(rng, n))
    ss, tree, _ = jax.jit(lambda s: build_sph_tree(s, 32))(spheres)
    rays = orthographic_projection_rays(2048, 2048, bench.CAM, bench.LOOK,
                                        bench.UP, bench.VEXT, bench.LENGTH)
    rays_s, _, _ = jax.jit(spatial_sort_rays)(rays)

    check = jax.tree.map(lambda x: x[:16384], rays_s)
    hc_ref, _ = pallas_trace_sph(check, ss, tile=64, mode="hitcount",
                                 broadphase="bitmask")
    hc_q, _ = pallas_trace_sph(check, ss, mode="hitcount", tile=128,
                               broadphase="quarter", unroll=8)
    assert bool(jnp.all(hc_q == hc_ref)), "slice parity FAILED"
    print("slice parity ok", flush=True)

    for bp, deg in (("quarter", 14), ("quarter", -10), ("bitmask", 14)):
        def body(i, acc, bp=bp, deg=deg):
            rr = Rays(rays_s.origins, rays_s.directions,
                      rays_s.lengths + acc * 1e-38)
            v, _ = pallas_trace_sph(rr, ss, tile=128 if bp == "quarter" else 64,
                                    broadphase=bp, unroll=8, integral_deg=deg)
            return acc + v[0] * 1e-38 + 1.0

        ms = bench.device_frame_ms(body, k1=1, k2=3)
        print(f"bigscene {bp}-stream deg={deg}: {ms:.0f} ms = "
              f"{rays_s.n_rays / (ms / 1e3) / 1e6:.2f} M rays/s", flush=True)


if __name__ == "__main__":
    main()

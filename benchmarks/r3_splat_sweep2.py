"""Round-3 follow-up splat sweep: configs around the tw=32/band=32 winner,
plus the jointly-optimal deg-8 basis (20% less VPU factor work, ~3.1e-4
max rel err vs the deg-10 fit's ~1.0e-4 — both inside the bench 1e-3 gate).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax.numpy as jnp
    import bench
    from grace_tpu.trace.splat import bucket_prims_ortho, splat_image

    rng = np.random.default_rng(2026)
    spheres = jnp.asarray(bench.make_clustered_particles(rng, bench.N_PARTICLES))
    side = int(np.sqrt(bench.N_RAYS))
    args = (spheres, bench.CAM, bench.LOOK, bench.UP, bench.VEXT,
            bench.LENGTH, side, side)

    # Reference image for parity (r2 config, deg10).
    bkt0 = bucket_prims_ortho(*args, tile_w=32, tile_h=128, chunk=512)
    img0 = splat_image(bkt0, tile_w=32, tile_h=128)
    m0 = float(jnp.max(jnp.abs(img0)))

    for tw, band, chunk, basis in (
        (32, 32, 256, "deg8"),
        (32, 32, 512, "deg8"),
        (32, 32, 512, "deg10"),
        (32, 16, 256, "deg8"),
        (64, 32, 256, "deg8"),
        (32, 16, 512, "deg8"),
    ):
        bkt = bucket_prims_ortho(*args, tile_w=tw, tile_h=128, chunk=chunk,
                                 band=band)
        if bool(bkt.overflow):
            print(f"tw={tw} band={band} chunk={chunk} {basis}: OVERFLOW, skip",
                  flush=True)
            continue
        img = splat_image(bkt, tile_w=tw, tile_h=128, basis=basis)
        rel = float(jnp.max(jnp.abs(img - img0))) / m0
        assert rel < 1e-3, f"parity fail {rel}"

        def body(i, acc, bkt=bkt, tw=tw, basis=basis):
            bb = bkt._replace(xcols=bkt.xcols + acc * 1e-38)
            im = splat_image(bb, tile_w=tw, tile_h=128, basis=basis)
            return acc + im[0, 0] * 1e-38 + 1.0

        ms = bench.device_frame_ms(body)
        print(f"tw={tw} band={band} chunk={chunk} {basis}: {ms:.3f} ms -> "
              f"{side*side/(ms/1e3)/1e6:.1f}M rays/s (rel={rel:.1e})",
              flush=True)


if __name__ == "__main__":
    main()

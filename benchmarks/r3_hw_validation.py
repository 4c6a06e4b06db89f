"""Round-3 staged hardware validation (run each stage in its OWN process;
a stage that wedges the device then doesn't lose the earlier stages).

Usage: python benchmarks/r3_hw_validation.py {probe|bucket|splat|records|train}
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def setup():
    import jax.numpy as jnp
    import bench

    rng = np.random.default_rng(2026)
    spheres = jnp.asarray(bench.make_clustered_particles(rng, bench.N_PARTICLES))
    return spheres, int(np.sqrt(bench.N_RAYS))


def probe():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    x = jax.jit(lambda x: jnp.sum(x * 2))(jnp.ones((256, 256)))
    print(f"jit ok: {float(x)} {time.time()-t0:.1f}s")


def bucket():
    """Bench-scale banded bucket prep alone (the r3 wedge suspect chain)."""
    import jax.numpy as jnp
    import bench
    from grace_tpu.trace.splat import bucket_prims_ortho

    spheres, side = setup()
    t0 = time.time()
    bkt = bucket_prims_ortho(spheres, bench.CAM, bench.LOOK, bench.UP,
                             bench.VEXT, bench.LENGTH, side, side,
                             tile_w=16, tile_h=128, chunk=256, band=32)
    n_inst = int(jnp.sum(bkt.last - bkt.first))
    n_lane = int(jnp.sum(bkt.n_slabs)) * 2 * 256
    print(f"bucket ok {time.time()-t0:.1f}s inst={n_inst/1e6:.2f}M "
          f"occ={n_inst/n_lane:.2f} ovf={bool(bkt.overflow)}", flush=True)

    def body(i, acc):
        bb = bucket_prims_ortho(spheres + acc * 1e-38, bench.CAM, bench.LOOK,
                                bench.UP, bench.VEXT, bench.LENGTH, side, side,
                                tile_w=16, tile_h=128, chunk=256, band=32)
        return acc + bb.slabs[0, 0, 0] * 1e-38 + 1.0

    ms = bench.device_frame_ms(body, k1=2, k2=8)
    print(f"banded bucket prep: {ms:.2f} ms device")


def splat():
    """Banded kernel at bench scale: parity vs unbanded + frame time."""
    import jax.numpy as jnp
    import bench
    from grace_tpu.trace.splat import bucket_prims_ortho, splat_image

    spheres, side = setup()
    args = (spheres, bench.CAM, bench.LOOK, bench.UP, bench.VEXT,
            bench.LENGTH, side, side)
    bkt = bucket_prims_ortho(*args, tile_w=16, tile_h=128, chunk=256, band=32)
    assert not bool(bkt.overflow)
    t0 = time.time()
    img = splat_image(bkt, tile_w=16, tile_h=128)
    s = float(jnp.sum(img))
    print(f"banded kernel ok {time.time()-t0:.1f}s sum={s:.6g}", flush=True)

    bkt0 = bucket_prims_ortho(*args, tile_w=32, tile_h=128, chunk=512)
    img0 = splat_image(bkt0, tile_w=32, tile_h=128)
    rel = float(jnp.max(jnp.abs(img - img0)) / jnp.max(jnp.abs(img0)))
    print(f"banded vs r2 config parity: {rel:.2e}", flush=True)
    assert rel < 1e-5

    for tw, band, chunk in ((16, 32, 256), (16, 32, 512), (32, 32, 256),
                            (16, 64, 256), (8, 32, 256)):
        bkt_c = bucket_prims_ortho(*args, tile_w=tw, tile_h=128, chunk=chunk,
                                   band=band)

        def body(i, acc, bkt_c=bkt_c, tw=tw):
            bb = bkt_c._replace(xcols=bkt_c.xcols + acc * 1e-38)
            im = splat_image(bb, tile_w=tw, tile_h=128)
            return acc + im[0, 0] * 1e-38 + 1.0

        ms = bench.device_frame_ms(body)
        print(f"tw={tw} band={band} chunk={chunk}: {ms:.3f} ms -> "
              f"{side*side/(ms/1e3)/1e6:.1f}M rays/s", flush=True)


def records():
    """38k-ray per-hit record benchmark (r2: 118 ms with the min-drain)."""
    import jax
    import jax.numpy as jnp
    import bench
    from grace_tpu.build.sph import build_sph_tree
    from grace_tpu.core.types import Rays
    from grace_tpu.rays.gen import orthographic_projection_rays, spatial_sort_rays
    from grace_tpu.trace.pallas_records import pallas_trace_sph_records
    from grace_tpu.trace.sph import trace_hitcounts_sph

    spheres, side = setup()
    ss, tree, _ = jax.jit(lambda s: build_sph_tree(s, 32))(spheres)
    rays = orthographic_projection_rays(196, 196, bench.CAM, bench.LOOK,
                                        bench.UP, bench.VEXT, bench.LENGTH)
    rays_s, _, _ = jax.jit(spatial_sort_rays)(rays)
    n_rays = rays_s.n_rays
    rec = pallas_trace_sph_records(rays_s, ss, per_ray_capacity=512, tile=64)
    hc = trace_hitcounts_sph(rays_s, ss, tree)
    assert bool(jnp.all(rec.counts == hc)), "record counts != engine"
    print(f"parity ok, {int(jnp.sum(rec.counts))} hits over {n_rays} rays",
          flush=True)

    def body(i, acc):
        rr = Rays(rays_s.origins, rays_s.directions,
                  rays_s.lengths + acc * 1e-38)
        rec = pallas_trace_sph_records(rr, ss, per_ray_capacity=512, tile=64)
        return acc + rec.integrals[0, 0] * 1e-38 + 1.0

    ms = bench.device_frame_ms(body, k1=1, k2=4)
    print(f"record trace ({n_rays} rays): {ms:.1f} ms (r2 min-drain: 118 ms)")


def train():
    """MXU splat train step + sort-free fwd/bwd at bench scale."""
    import jax
    import jax.numpy as jnp
    import bench
    from grace_tpu.trace.splat_grad import (
        OrthoCamera, make_splat_trainer, splat_forward_sortfree)

    spheres, side = setup()
    cam = OrthoCamera(bench.CAM, bench.LOOK, bench.UP, bench.VEXT,
                      bench.LENGTH, side, side)
    w = jnp.ones((spheres.shape[0],), jnp.float32)

    t0 = time.time()
    img = splat_forward_sortfree(spheres, w, cam, tile_w=32, tile_h=128)
    print(f"sortfree fwd ok {time.time()-t0:.1f}s sum={float(jnp.sum(img)):.6g}",
          flush=True)

    def fwd_body(i, acc):
        im = splat_forward_sortfree(spheres + acc * 1e-38, w, cam,
                                    tile_w=32, tile_h=128)
        return acc + im[0, 0] * 1e-38 + 1.0

    ms = bench.device_frame_ms(fwd_body, k1=1, k2=6)
    print(f"sortfree forward frame: {ms:.2f} ms", flush=True)

    render = make_splat_trainer(cam, tile_w=32, tile_h=128)
    tgt = img * 1.01

    @jax.jit
    def step(s, ww):
        def loss_fn(s, ww):
            return jnp.sum((render(s, ww) - tgt) ** 2) / (side * side)
        loss, (gs, gw) = jax.value_and_grad(loss_fn, argnums=(0, 1))(s, ww)
        return s - 1e-6 * gs, ww - 1e-6 * gw, loss

    s1, w1, l1 = step(spheres, w)
    assert np.isfinite(float(l1)) and bool(jnp.all(jnp.isfinite(s1)))
    print(f"train step ok loss={float(l1):.4g}", flush=True)

    def train_body(i, acc):
        _, _, loss = step(spheres + acc * 1e-38, w)
        return acc + loss * 1e-38 + 1.0

    ms = bench.device_frame_ms(train_body, k1=1, k2=4)
    print(f"MXU train step: {ms:.2f} ms (r2 trace-based: 114.8 ms)")


if __name__ == "__main__":
    dict(probe=probe, bucket=bucket, splat=splat, records=records,
         train=train)[sys.argv[1]]()

"""Round-3 splat cost-model experiments (run on real TPU).

Sweeps synthetic (rank, deg) kernel configs over the bench-scene buckets to
split the frame time into VPU-factor vs MXU-contraction components, plus
instance statistics (dead-instance fraction from the square-vs-circle tile
test). Informs the round-3 basis/culling choices; results recorded in
benchmarks/results/.
"""

import functools
import json

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench
from grace_tpu.trace.splat import SplatBuckets, _splat_kernel, bucket_prims_ortho


def splat_image_cfg(buckets, tile_w, tile_h, rank, deg, nbuf=4):
    w_res = buckets.xcols.shape[0]
    h_res = buckets.yrows.shape[0]
    ntx = w_res // tile_h
    nty = h_res // tile_w
    chunk = buckets.slabs.shape[2]
    meta = jnp.stack(
        [buckets.slab_lo, buckets.n_slabs, buckets.first, buckets.last], axis=1)
    meta = meta.reshape(ntx * nty, 1, 4)
    rng = np.random.default_rng(0)
    kernel = functools.partial(
        _splat_kernel, rank=rank, deg=deg,
        a_coeffs=rng.standard_normal((rank, deg + 1)).astype(np.float32) * 0.1,
        b_coeffs=rng.standard_normal((rank, deg + 1)).astype(np.float32) * 0.1,
        matmul_dtype=jnp.float32,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h_res, w_res), jnp.float32),
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec((1, 1, 4), lambda j, i, ntx=ntx: (j * ntx + i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_h, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_w, 1), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((tile_w, tile_h), lambda j, i: (j, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nbuf, 8, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )(meta, buckets.xcols, buckets.yrows, buckets.slabs)


def main():
    rng = np.random.default_rng(2026)
    spheres = jnp.asarray(bench.make_clustered_particles(rng, bench.N_PARTICLES))
    side = int(np.sqrt(bench.N_RAYS))
    results = {}

    # Instance statistics: live instances, and how many would survive an
    # exact circle-vs-tile test.
    from grace_tpu.ops.vecmath import cross, normalize3
    for tw, th in ((32, 128), (64, 128)):
        b = bucket_prims_ortho(spheres, bench.CAM, bench.LOOK, bench.UP,
                               bench.VEXT, bench.LENGTH, side, side,
                               tile_w=tw, tile_h=th, chunk=512)
        n_inst = int(jnp.sum(b.last - b.first))
        # slab work actually done: sum over tiles of n_slabs * 1024
        n_lane = int(jnp.sum(b.n_slabs)) * 1024
        results[f"inst_{tw}x{th}"] = n_inst
        results[f"lanes_{tw}x{th}"] = n_lane
        print(f"tile {tw}x{th}: live instances={n_inst} "
              f"({n_inst/bench.N_PARTICLES:.3f}/particle), lane slots={n_lane} "
              f"(occupancy {n_inst/n_lane:.3f})")

    bkt = bucket_prims_ortho(spheres, bench.CAM, bench.LOOK, bench.UP,
                             bench.VEXT, bench.LENGTH, side, side,
                             tile_w=32, tile_h=128, chunk=512)

    jit_cfg = jax.jit(splat_image_cfg, static_argnames=("tile_w", "tile_h",
                                                        "rank", "deg", "nbuf"))

    for (rank, deg) in ((5, 10), (5, 2), (1, 10), (1, 2), (3, 6), (4, 8), (2, 10)):
        def body(i, acc, rank=rank, deg=deg):
            bb = bkt._replace(xcols=bkt.xcols + acc * 1e-38)
            im = splat_image_cfg(bb, 32, 128, rank, deg)
            return acc + im[0, 0] * 1e-38 + 1.0
        ms = bench.device_frame_ms(body)
        results[f"r{rank}d{deg}_32x128"] = round(ms, 3)
        print(f"rank={rank} deg={deg} tile 32x128: {ms:.3f} ms")

    # Tile geometry at a cheap config (where the VPU share is smaller).
    for tw, th in ((8, 128), (16, 128), (64, 128)):
        bkt2 = bucket_prims_ortho(spheres, bench.CAM, bench.LOOK, bench.UP,
                                  bench.VEXT, bench.LENGTH, side, side,
                                  tile_w=tw, tile_h=th, chunk=512)
        for (rank, deg) in ((5, 10), (3, 6)):
            def body(i, acc, b=bkt2, tw=tw, th=th, rank=rank, deg=deg):
                bb = b._replace(xcols=b.xcols + acc * 1e-38)
                im = splat_image_cfg(bb, tw, th, rank, deg)
                return acc + im[0, 0] * 1e-38 + 1.0
            ms = bench.device_frame_ms(body)
            results[f"r{rank}d{deg}_{tw}x{th}"] = round(ms, 3)
            print(f"rank={rank} deg={deg} tile {tw}x{th}: {ms:.3f} ms")

    with open("benchmarks/results/r3_splat_model.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

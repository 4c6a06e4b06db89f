"""Round-5 hardware sweeps: fast-integral trace, triangle tiles, records.

Modes (run ONE mode with few configs per process — each compile is large,
and a timed-out process loses its results):

  python benchmarks/r5_sweep.py trace quarter:128:8:14 quarter:128:8:-12 \
      qlist:32:8:-12                                   # general trace:
      broadphase:tile:unroll:integral_deg configs (VERDICT r4 #2+#3);
      each parity-checked against the deg-14 bitmask kernel (exact for
      deg 14, 5e-4 physics gate otherwise).
  python benchmarks/r5_sweep.py tri 32:16 64:8        # triangle closest-
      hit fused kernel sweep over tile[:n_cull_intervals] specs
      (VERDICT r4 #4); torus 262k tris, 512^2 pinhole rays.
  python benchmarks/r5_sweep.py rec pick:32:mxu:8 pick:32:mxu:8:quarter
      records drain configs (r3 harness syntax + broadphase slot)
      (VERDICT r4 #5).
  python benchmarks/r5_sweep.py recmodel 32           # CPU: count tested
      pairs / listed slabs / drain ranks of the records workload for the
      cost model in r5 floor notes (no TPU needed).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

REC_SIDE = 196  # records workload: 196^2 = 38,416 rays (r3/r4 sweeps)


def _bench_scene():
    import jax
    import jax.numpy as jnp
    import bench
    from grace_tpu.build.sph import build_sph_tree
    from grace_tpu.rays.gen import orthographic_projection_rays, spatial_sort_rays

    rng = np.random.default_rng(2026)
    spheres = jnp.asarray(bench.make_clustered_particles(rng, bench.N_PARTICLES))
    ss, tree, _ = jax.jit(lambda s: build_sph_tree(s, 32))(spheres)
    side = int(np.sqrt(bench.N_RAYS))
    rays = orthographic_projection_rays(side, side, bench.CAM, bench.LOOK,
                                        bench.UP, bench.VEXT, bench.LENGTH)
    rays_s, _, _ = jax.jit(spatial_sort_rays)(rays)
    return ss, tree, rays_s


def mode_trace(configs):
    """General-trace sweep. Config = broadphase:tile:unroll:deg, e.g.
    quarter:128:8:14, quarter:128:8:-12, qlist:32:8:-12. Each config is
    parity-gated against the deg-14 bitmask kernel (exact for deg 14,
    5e-4 physics gate otherwise)."""
    import jax
    import jax.numpy as jnp
    import bench
    from grace_tpu.core.types import Rays
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph

    ss, tree, rays_s = _bench_scene()
    n_rays = rays_s.n_rays

    # deg-14 bitmask kernel = the reference values (r3/r4 parity anchor).
    ref, ovf = pallas_trace_sph(rays_s, ss, tree, tile=64,
                                broadphase="bitmask")
    assert not bool(jnp.any(ovf))
    ref_max = float(jnp.max(jnp.abs(ref)))

    for cfg in configs:
        parts = cfg.split(":")
        bp, tile, unroll, deg = (parts[0], int(parts[1]), int(parts[2]),
                                 int(parts[3]))
        kw = dict(tile=tile, broadphase=bp, unroll=unroll, integral_deg=deg)
        if len(parts) > 4:
            kw["max_chunks"] = int(parts[4])
        # exact-parity gate on integer hitcounts (identical pair sets); the
        # cumulative values differ across kernels only by f32 addition
        # order (deg 14) or the fit flavor (other degs).
        hc, ovf_hc = pallas_trace_sph(rays_s, ss, tree, mode="hitcount",
                                      **{**kw, "integral_deg": 14})
        hc_ref, _ = pallas_trace_sph(rays_s, ss, tree, tile=64,
                                     mode="hitcount", broadphase="bitmask")
        assert not bool(jnp.any(ovf_hc)), f"{cfg}: overflow"
        assert bool(jnp.all(hc == hc_ref)), f"{cfg}: hitcount parity FAIL"
        v, ovf = pallas_trace_sph(rays_s, ss, tree, **kw)
        assert not bool(jnp.any(ovf)), f"{cfg}: overflow"
        err = float(jnp.max(jnp.abs(v - ref)) / ref_max)
        parity = f"hitcounts exact, relerr={err:.2e}"
        gate = 1e-5 if deg == 14 else 5e-4
        assert err < gate, f"{cfg} breaks the {gate} gate: {err}"

        def body(i_, acc, kw=kw):
            rr = Rays(rays_s.origins, rays_s.directions,
                      rays_s.lengths + acc * 1e-38)
            v, _ = pallas_trace_sph(rr, ss, tree, **kw)
            return acc + v[0] * 1e-38 + 1.0

        ms = bench.device_frame_ms(body, k1=2, k2=8)
        rate = n_rays / (ms / 1e3)
        print(f"{cfg}: {ms:6.1f} ms  {rate/1e6:5.2f} M rays/s  {parity}",
              flush=True)


def mode_tri(tiles):
    """Triangle fused closest-hit tile sweep (262k-tri torus, 512^2 rays)."""
    import jax
    import jax.numpy as jnp
    import bench
    from examples.render_triangle import torus_mesh
    from grace_tpu.core.types import Rays
    from grace_tpu.models.triangle import auto_camera, build_triangle_tree
    from grace_tpu.rays.gen import pinhole_camera_rays
    from grace_tpu.trace.pallas_tri import pallas_trace_tri

    tris = jnp.asarray(torus_mesh(n_u=512, n_v=256))
    sorted_tris, tree, _ = jax.jit(lambda t: build_triangle_tree(t, 8))(tris)
    jax.block_until_ready(sorted_tris)
    n_side = 512
    cam, look_at, length = auto_camera(sorted_tris, n_side)
    rays = pinhole_camera_rays(n_side, n_side, cam, look_at, (0.0, 1.0, 0.0),
                               jnp.pi / 3, length)
    n_rays = rays.n_rays

    ref_t = None
    for spec in tiles:
        tile, K = (int(spec.split(":")[0]),
                   int(spec.split(":")[1]) if ":" in str(spec) else 8)
        t_hit, tri_id, ovf = pallas_trace_tri(rays, sorted_tris, tile=tile,
                                              n_cull_intervals=K)
        assert not bool(jnp.any(ovf))
        hits = int(jnp.sum(tri_id >= 0))
        if ref_t is None:
            ref_t = t_hit
        else:
            same = bool(jnp.all((t_hit == ref_t)))
            assert same, f"tile {tile} changes closest-hit t values"

        def body(i, acc, tile=tile, K=K):
            rr = Rays(rays.origins, rays.directions,
                      rays.lengths + acc * 1e-38)
            t, _, _ = pallas_trace_tri(rr, sorted_tris, tile=tile,
                                       n_cull_intervals=K)
            # misses are +inf: probe only finite hits
            probe = jnp.min(jnp.where(jnp.isfinite(t), t, 0.0))
            return acc + probe * 1e-38 + 1.0

        ms = bench.device_frame_ms(body, k1=1, k2=5)
        print(f"tri closest-hit t{tile} K{K}: {ms:6.1f} ms  "
              f"{n_rays/(ms/1e3)/1e6:5.2f} M rays/s  ({hits} hits)",
              flush=True)


def mode_rec(configs):
    """Records drain sweep rows (r3 harness syntax + broadphase slot)."""
    import jax
    import jax.numpy as jnp
    import bench
    from grace_tpu.core.types import Rays
    from grace_tpu.trace.pallas_records import pallas_trace_sph_records
    from grace_tpu.trace.sph import trace_hitcounts_sph

    ss, tree, _ = _bench_scene()
    from grace_tpu.rays.gen import orthographic_projection_rays, spatial_sort_rays

    rays = orthographic_projection_rays(REC_SIDE, REC_SIDE, bench.CAM,
                                        bench.LOOK, bench.UP, bench.VEXT,
                                        bench.LENGTH)
    rays_s, _, _ = jax.jit(spatial_sort_rays)(rays)
    hc = trace_hitcounts_sph(rays_s, ss, tree)
    print(f"records workload: {rays_s.n_rays} rays, {int(jnp.sum(hc))} hits",
          flush=True)

    for cfg in configs:
        parts = cfg.split(":")
        drain, tile = parts[0], int(parts[1])
        rank_method = parts[2] if len(parts) > 2 else "prefix"
        group = int(parts[3]) if len(parts) > 3 else 1
        broadphase = parts[4] if len(parts) > 4 else "bitmask"
        kw = dict(per_ray_capacity=512, tile=tile, drain=drain,
                  rank_method=rank_method, group=group, broadphase=broadphase)
        rec = pallas_trace_sph_records(rays_s, ss, **kw)
        if not bool(jnp.all(rec.counts == hc)):
            print(f"{cfg}: PARITY FAIL", flush=True)
            continue

        def body(i, acc, kw=kw):
            rr = Rays(rays_s.origins, rays_s.directions,
                      rays_s.lengths + acc * 1e-38)
            rec = pallas_trace_sph_records(rr, ss, **kw)
            return acc + rec.integrals[0, 0] * 1e-38 + 1.0

        ms = bench.device_frame_ms(body, k1=1, k2=4)
        print(f"{cfg}: {ms:.1f} ms", flush=True)


def mode_recmodel(tile):
    """CPU: structural quantities of the records workload for the cost model.

    Reports, for the given ray-tile size on the 196^2-ray bench-scene
    per-hit workload:
      pairs_total   ray x primitive tests implied by the bitmask broadphase
      slabs_total   listed (tile, slab) loop iterations
      hits_total    true hits (== sum of counts)
      ranks_total   sum over (tile, slab) of max-over-rays hits in slab
                    (the drain loop bound n_extract)
      groups_W      drained groups at W in {1, 4, 8, 16}
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import bench
    from grace_tpu.build.sph import build_sph_tree
    from grace_tpu.rays.gen import orthographic_projection_rays, spatial_sort_rays
    from grace_tpu.trace.pallas_broadphase import dense_tile_masks
    from grace_tpu.trace.pallas_kernel import SEG, _pack_prims
    from grace_tpu.core.types import Rays

    rng = np.random.default_rng(2026)
    spheres = jnp.asarray(bench.make_clustered_particles(rng, bench.N_PARTICLES))
    ss, tree, _ = jax.jit(lambda s: build_sph_tree(s, 32))(spheres)
    rays = orthographic_projection_rays(REC_SIDE, REC_SIDE, bench.CAM,
                                        bench.LOOK, bench.UP, bench.VEXT,
                                        bench.LENGTH)
    rays_s, _, _ = jax.jit(spatial_sort_rays)(rays)

    n_rays = rays_s.n_rays
    pad = (-n_rays) % tile
    if pad:
        rays_p = Rays(
            jnp.concatenate([rays_s.origins,
                             jnp.broadcast_to(rays_s.origins[-1:], (pad, 3))]),
            jnp.concatenate([rays_s.directions,
                             jnp.broadcast_to(rays_s.directions[-1:], (pad, 3))]),
            jnp.concatenate([rays_s.lengths,
                             jnp.full((pad,), -1.0, jnp.float32)]),
        )
    else:
        rays_p = rays_s
    masks = np.asarray(dense_tile_masks(rays_p, ss, tile))  # [n_tiles, words]
    n_tiles = masks.shape[0]

    prims, n_pad = _pack_prims(ss)
    prims = np.asarray(prims)          # (8, N_pad)
    o = np.asarray(rays_p.origins)
    d = np.asarray(rays_p.directions)
    ln = np.asarray(rays_p.lengths)

    bits = np.unpackbits(
        masks.astype(np.uint32).view(np.uint8), axis=1, bitorder="little"
    ).astype(bool)                     # [n_tiles, words*32] segment listed?
    n_segs = n_pad // SEG
    bits = bits[:, :n_segs]
    slabs_total = int(bits.sum())
    pairs_total = slabs_total * tile * SEG

    hits_total = 0
    ranks_total = 0
    slabs_with_hits = 0
    px, py, pz = prims[0], prims[1], prims[2]
    h2 = prims[5]
    for t in range(n_tiles):
        rs = slice(t * tile, (t + 1) * tile)
        ot, dt, lt = o[rs], d[rs], ln[rs]
        segs = np.nonzero(bits[t])[0]
        for s0 in range(0, len(segs), 64):       # batch segments
            seg_batch = segs[s0:s0 + 64]
            cols = (seg_batch[:, None] * SEG + np.arange(SEG)[None, :]).ravel()
            rx = px[cols][None, :] - ot[:, 0:1]
            ry = py[cols][None, :] - ot[:, 1:2]
            rz = pz[cols][None, :] - ot[:, 2:3]
            dot = rx * dt[:, 0:1] + ry * dt[:, 1:2] + rz * dt[:, 2:3]
            bx = rx - dot * dt[:, 0:1]
            by = ry - dot * dt[:, 1:2]
            bz = rz - dot * dt[:, 2:3]
            b2 = bx * bx + by * by + bz * bz
            hit = (b2 < h2[cols][None, :]) & (dot >= 0) & (dot < lt[:, None])
            hit = hit.reshape(tile, len(seg_batch), SEG)
            per = hit.sum(axis=2)                # hits per (ray, slab)
            hits_total += int(per.sum())
            mx = per.max(axis=0)                 # max over rays per slab
            ranks_total += int(mx.sum())
            slabs_with_hits += int((mx > 0).sum())

    print(f"tile={tile}: n_tiles={n_tiles} slabs_total={slabs_total} "
          f"pairs_total={pairs_total} ({pairs_total/n_rays:.0f}/ray)")
    print(f"hits_total={hits_total} ranks_total={ranks_total} "
          f"slabs_with_hits={slabs_with_hits}")
    for W in (1, 4, 8, 16):
        groups = (ranks_total + (W - 1) * slabs_with_hits) // W  # ~ sum ceil
        print(f"  W={W:>2}: drain groups ~= {groups}")


if __name__ == "__main__":
    mode = sys.argv[1]
    args = sys.argv[2:]
    if mode == "trace":
        mode_trace(args)
    elif mode == "tri":
        mode_tri(args)
    elif mode == "rec":
        mode_rec(args)
    elif mode == "recmodel":
        mode_recmodel(int(args[0]) if args else 32)
    else:
        raise SystemExit(f"unknown mode {mode}")

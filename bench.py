"""Headline benchmark: SPH column-density render throughput (rays/s/chip).

Mirrors the reference's profile_trace_gadget workload shape
(ref: tests/profile_trace_gadget/profile_trace_gadget.cu): a clustered
particle snapshot, a 512x512 orthographic pixel grid, cumulative (column
density) render. Baseline for vs_baseline is the north-star target 1e8
rays/s/chip (BASELINE.json) since the reference publishes no numbers
(BASELINE.md).

DESIGN (round 5): headline-first, fail-fast. Two prior rounds lost their
driver-parsed number to a crash (r3) and a device-wedge timeout (r4)
because the old bench measured six metrics through many large compiles
and printed its single JSON line only at the very end. Now:

  * The DEFAULT run measures only the headline: build + rays + bucket
    prep + splat, a full-scale splat-vs-trace parity gate, then
    device_frame_ms on the splat. The JSON line prints (flushed)
    the moment it is known, and the process exits 0.
  * Every stage logs a timestamped line to stderr, so a timeout is
    attributable to a stage.
  * The persistent XLA compilation cache (.jax_cache/) makes a warm
    rerun compile nothing.
  * GRACE_BENCH_FULL=1 additionally measures the secondary metrics
    (general fused trace, bucket prep, both train steps) AFTER the
    headline line has printed, and prints them as a second JSON line.

Parity is gated ON DEVICE before timing (a crashed kernel on this
platform can look like a success — the checks force scalar fetches):
the MXU low-rank splat image is compared at full scale against the
independent fused Pallas trace kernel (quarter broadphase; exact same
integral as the bitmask kernel, r4 sweep).
"""

import json
import os
import sys
import time

import numpy as np

N_PARTICLES = int(os.environ.get("GRACE_BENCH_PARTICLES", 1 << 20))
N_RAYS = int(os.environ.get("GRACE_BENCH_RAYS", 512 * 512))
MAX_PER_LEAF = 32
NORTH_STAR_RAYS_PER_S = 1e8
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")

CAM = (0.5, 0.5, -2.0)
LOOK = (0.5, 0.5, 0.5)
UP = (0.0, 1.0, 0.0)
VEXT = 1.2
LENGTH = 6.0

_T0 = time.perf_counter()


def log(msg):
    """Stage marker on stderr: makes any hang attributable to a stage."""
    print(f"[bench +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def enable_compilation_cache():
    """Persistent XLA compile cache: a warm bench rerun compiles nothing."""
    import jax

    try:
        os.makedirs(CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # cache is an optimization, never a failure
        log(f"compilation cache unavailable: {e}")


def make_clustered_particles(rng, n):
    """Gadget-like clustered distribution: Plummer-ish clumps in a unit box."""
    n_clumps = 256
    centers = rng.random((n_clumps, 3)).astype(np.float32)
    assign = rng.integers(0, n_clumps, n)
    scale = 0.02 + 0.05 * rng.random((n_clumps, 1)).astype(np.float32)
    pos = centers[assign] + rng.standard_normal((n, 3)).astype(np.float32) * scale[assign]
    pos = np.clip(pos, 0.0, 1.0)
    # smoothing length ~ local density proxy
    h = (0.005 + 0.01 * rng.random(n)).astype(np.float32)
    return np.concatenate([pos, h[:, None]], axis=1).astype(np.float32)


def pipelined_ms(dispatch, n_iter=7, reps=3):
    """Dispatch n_iter calls back-to-back so the ~25 ms tunnel dispatch
    latency overlaps device compute, then block on the last result.

    CAUTION: on the axon tunnel, repeated dispatch of one executable with
    IDENTICAL args can be deduplicated client-side and report fantasy times;
    use device_frame_ms (data-dependent chained frames) for kernel timing.
    """
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


def device_frame_ms(body, k1=2, k2=18, reps=3):
    """Pure device time per frame — the cudaEvent-equivalent measurement
    (the reference's profilers time kernels with cudaEvents,
    ref: helper/cuda_timer.cuh:5-59, excluding host dispatch).

    ``body(i, acc) -> acc`` must make frame i+1 data-depend on frame i so
    XLA cannot CSE the chain. K frames run inside ONE jit; the per-frame
    time is the slope between two chain lengths, which cancels the ~25 ms
    tunnel round trip and any per-dispatch client overhead exactly.
    """
    import jax
    import jax.numpy as jnp

    # k is TRACED (fori_loop lowers to while) so both chain lengths share
    # one compilation.
    f = jax.jit(lambda k, x: jax.lax.fori_loop(0, k, body, x))
    float(f(jnp.int32(k1), jnp.float32(0.0)))  # compile + fault check

    def chain(k):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            v = float(f(jnp.int32(k), jnp.float32(0.0)))
            dt = time.perf_counter() - t0
            assert np.isfinite(v)
            best = dt if best is None else min(best, dt)
        return best

    return (chain(k2) - chain(k1)) / (k2 - k1) * 1e3


def setup_scene():
    """Build tree + sorted rays + splat buckets for the bench scene."""
    import jax
    import jax.numpy as jnp
    from grace_tpu.build.sph import build_sph_tree
    from grace_tpu.rays.gen import orthographic_projection_rays, spatial_sort_rays
    from grace_tpu.trace.splat import bucket_prims_ortho

    rng = np.random.default_rng(2026)
    spheres = jnp.asarray(make_clustered_particles(rng, N_PARTICLES))
    side = int(np.sqrt(N_RAYS))

    log("tree build (compile + run)")
    build = jax.jit(lambda s: build_sph_tree(s, MAX_PER_LEAF))
    sorted_spheres, tree, _ = build(spheres)
    jax.block_until_ready(sorted_spheres)

    log("ray gen + spatial sort")
    rays = orthographic_projection_rays(side, side, CAM, LOOK, UP, VEXT, LENGTH)
    rays_s, _, inv = jax.jit(spatial_sort_rays)(rays)
    jax.block_until_ready(rays_s.origins)

    log("bucket prep (headline config: 32x128 tiles, band 32, chunk 512)")
    buckets = bucket_prims_ortho(sorted_spheres, CAM, LOOK, UP, VEXT, LENGTH,
                                 side, side, tile_w=32, tile_h=128, chunk=512,
                                 band=32)
    assert not bool(buckets.overflow), "splat tile overflow; enlarge tiles"
    return sorted_spheres, tree, rays_s, inv, buckets, side


def main(sharded: bool = False):
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph
    from grace_tpu.trace.splat import splat_image

    log(f"jax ready: {jax.devices()}")
    sorted_spheres, tree, rays_s, inv, buckets, side = setup_scene()

    # ---- on-device parity gate (before any timing) -------------------------
    # Splat image vs the independent fused Pallas trace kernel's cumulative
    # values at full scale (both approximate the same sums; gate well inside
    # the combined trace-table 5e-4 + separable-fit 3.1e-4 tolerances).
    # Headline splat config (r3 hardware sweep, benchmarks/r3_splat_sweep2.py):
    # 32x128 tiles in 32-column bands, 512-prim chunks, jointly-fit deg-8
    # basis. Trace side: quarter broadphase t128/unroll 8 (r4 sweep best;
    # integral identical to the bitmask kernel). Scalar fetches via rel_err
    # force execution and surface async device faults.
    log("splat image (compile + run)")
    img = splat_image(buckets, tile_w=32, tile_h=128, basis="deg8")
    jax.block_until_ready(img)

    log("fused trace full scale for parity (compile + run)")
    trace_v, ovf_t = pallas_trace_sph(rays_s, sorted_spheres, tree, tile=128,
                                      broadphase="quarter", unroll=8)
    assert not bool(jnp.any(ovf_t)), "trace overflow flag set"
    img_trace = jnp.reshape(trace_v[inv], (side, side))
    rel_err = float(jnp.max(jnp.abs(img - img_trace)) / jnp.max(img_trace))
    assert np.isfinite(rel_err) and rel_err < 1e-3, f"splat/trace mismatch {rel_err}"
    log(f"parity OK: splat vs trace rel_err = {rel_err:.2e}")

    # ---- optional sharded mode (mesh over all available chips; on the one
    # real chip this is the degenerate 1x1 mesh — validates that the sharded
    # fast path produces identical results and comparable speed) ------------
    if sharded:
        from grace_tpu.core.errors import check_overflow
        from grace_tpu.parallel.sharding import (
            make_mesh, sharded_pallas_render, sharded_splat_render)

        n_dev = len(jax.devices())
        mesh = make_mesh(n_dev, 1)
        img_sh = sharded_splat_render(mesh, buckets, tile_w=32, tile_h=128,
                                      basis="deg8")
        rel = float(jnp.max(jnp.abs(img_sh - img)) / jnp.max(img))
        assert rel < 1e-6, f"sharded splat != single-chip splat ({rel})"
        tr_sh, ovf_sh = sharded_pallas_render(mesh, rays_s, sorted_spheres,
                                              tile=64)
        check_overflow(ovf_sh, "sharded trace overflow")
        assert bool(jnp.all(tr_sh == pallas_trace_sph(
            rays_s, sorted_spheres, tree, tile=64)[0])), \
            "sharded trace != single"

        # device-time chained frames (NOT pipelined_ms: identical-arg
        # dispatch dedup on this platform reports fantasy numbers).
        def splat_sh_body(i, acc):
            bb = buckets._replace(xcols=buckets.xcols + acc * 1e-38)
            im = sharded_splat_render(mesh, bb, tile_w=32, tile_h=128,
                                      basis="deg8")
            return acc + im[0, 0] * 1e-38 + 1.0

        splat_sh_ms = device_frame_ms(splat_sh_body)
        rays_per_s = N_RAYS / (splat_sh_ms / 1e3)
        print(json.dumps({
            "metric": "sph_column_density_rays_per_s_sharded",
            "value": rays_per_s,
            "unit": "rays/s",
            "vs_baseline": rays_per_s / NORTH_STAR_RAYS_PER_S,
            "n_devices": n_dev,
            "sharded_equals_single": True,
            "splat_frame_ms": round(splat_sh_ms, 3),
        }), flush=True)
        return

    # ---- headline timing (pure device time via data-dependent chained
    # frames; see device_frame_ms — the reference times kernels with
    # cudaEvents, i.e. device-side, and the axon tunnel dedups identical
    # dispatches) -----------------------------------------------------------
    log("headline timing: device_frame_ms(splat)")

    def splat_body(i, acc):
        bb = buckets._replace(xcols=buckets.xcols + acc * 1e-38)
        im = splat_image(bb, tile_w=32, tile_h=128, basis="deg8")
        return acc + im[0, 0] * 1e-38 + 1.0

    # reps=5: the headline is the scoreboard number — extra best-of reps
    # cost ~1 s total and cut the observed ~11% run-to-run variance.
    splat_ms = device_frame_ms(splat_body, reps=5)
    rays_per_s = N_RAYS / (splat_ms / 1e3)

    # THE headline line: printed the moment it is known, flushed, so a hang
    # in any later (optional) stage cannot lose it.
    print(
        json.dumps(
            {
                "metric": "sph_column_density_rays_per_s_per_chip",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / NORTH_STAR_RAYS_PER_S,
                "splat_frame_ms": round(splat_ms, 3),
                "device_parity_check": "ok",
                "splat_vs_trace_rel_err": rel_err,
            }
        ),
        flush=True,
    )
    log(f"HEADLINE DONE: {rays_per_s:.4g} rays/s ({splat_ms:.3f} ms/frame)")

    if os.environ.get("GRACE_BENCH_FULL", "0") != "1":
        return

    # ---- secondary metrics (manual runs only: GRACE_BENCH_FULL=1) ---------
    secondary = secondary_metrics(sorted_spheres, tree, rays_s, buckets,
                                  img_trace)
    print(json.dumps({"metric": "secondary_metrics", **secondary}), flush=True)


def secondary_metrics(sorted_spheres, tree, rays_s, buckets, img_trace):
    """The non-headline measurements (each logged; run order = cheap first)."""
    import jax
    import jax.numpy as jnp
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph
    from grace_tpu.trace.sph import trace_hitcounts_sph

    side = int(np.sqrt(N_RAYS))
    out = {}

    # fused kernel hitcounts == XLA engine hitcounts, exactly, on a 16k-ray
    # slice (scalar-fetched: surfaces async device faults).
    log("secondary: engine-vs-fused hitcount check (16k rays)")
    check_rays = jax.tree.map(lambda x: x[:16384], rays_s)
    hc_fast, ovf = pallas_trace_sph(check_rays, sorted_spheres, tree,
                                    tile=64, mode="hitcount",
                                    broadphase="bitmask")
    hc_ref = trace_hitcounts_sph(check_rays, sorted_spheres, tree)
    assert bool(jnp.all(hc_fast == hc_ref)) and not bool(jnp.any(ovf)), \
        "fused trace kernel hitcount parity FAILED on device"
    out["engine_parity_check"] = "ok"

    log("secondary: general fused trace timing (qlist t128, r5 best)")

    def trace_body(i, acc):
        from grace_tpu.core.types import Rays
        rr = Rays(rays_s.origins, rays_s.directions,
                  rays_s.lengths + acc * 1e-38)
        # qlist: seg-32 cull + XLA set-bit compaction (r5 sweep best at
        # default deg-14 accuracy; see r5_hw_notes.md). deg=-10 adds
        # another ~17% within the 5e-4 physics gate (reported separately).
        v, _ = pallas_trace_sph(rr, sorted_spheres, tree, tile=128,
                                broadphase="qlist", unroll=8)
        return acc + v[0] * 1e-38 + 1.0

    trace_ms = device_frame_ms(trace_body, k1=2, k2=8)
    out["general_trace_rays_per_s"] = N_RAYS / (trace_ms / 1e3)
    out["general_trace_ms"] = round(trace_ms, 2)

    def trace_fast_body(i, acc):
        from grace_tpu.core.types import Rays
        rr = Rays(rays_s.origins, rays_s.directions,
                  rays_s.lengths + acc * 1e-38)
        v, _ = pallas_trace_sph(rr, sorted_spheres, tree, tile=128,
                                broadphase="qlist", unroll=8,
                                integral_deg=-10)
        return acc + v[0] * 1e-38 + 1.0

    trace_fast_ms = device_frame_ms(trace_fast_body, k1=2, k2=8)
    out["general_trace_fast_rays_per_s"] = N_RAYS / (trace_fast_ms / 1e3)

    log("secondary: bucket prep timing")
    from grace_tpu.trace.splat import bucket_prims_ortho

    def bucket_body(i, acc):
        bb = bucket_prims_ortho(sorted_spheres + acc * 1e-38, CAM, LOOK, UP,
                                VEXT, LENGTH, side, side, tile_w=32,
                                tile_h=128, chunk=512, band=32)
        return acc + bb.slabs[0, 0, 0] * 1e-38 + 1.0

    out["bucket_prep_ms"] = round(device_frame_ms(bucket_body, k1=2, k2=8), 2)

    # MXU train step (trace/splat_grad.py): custom_vjp sort-free splat,
    # forward AND backward rank-K MXU contractions — render -> L2 loss vs
    # target -> particle + weight gradients -> SGD update, full bench scale.
    log("secondary: sort-free splat train step")
    from grace_tpu.trace.splat_grad import OrthoCamera, make_splat_trainer

    cam = OrthoCamera(CAM, LOOK, UP, VEXT, LENGTH, side, side)
    splat_render = make_splat_trainer(cam, tile_w=32, tile_h=128)
    weights = jnp.ones((N_PARTICLES,), jnp.float32)
    target2d = img_trace * 1.01

    @jax.jit
    def train_step(s, w):
        def loss_fn(s, w):
            v = splat_render(s, w)
            return jnp.sum((v - target2d) ** 2) / N_RAYS

        loss, (gs, gw) = jax.value_and_grad(loss_fn, argnums=(0, 1))(s, w)
        return s - 1e-6 * gs, w - 1e-6 * gw, loss

    s1, w1, loss1 = train_step(sorted_spheres, weights)
    assert np.isfinite(float(loss1)) and bool(jnp.all(jnp.isfinite(s1)))

    def train_body(i, acc):
        _, _, loss = train_step(sorted_spheres + acc * 1e-38, weights)
        return acc + loss * 1e-38 + 1.0

    out["train_step_ms"] = round(device_frame_ms(train_body, k1=1, k2=4), 2)

    # General (any-ray-bundle) differentiable step: fused Pallas trace
    # forward + segment-major backward (trace/pallas_render.py).
    log("secondary: general differentiable train step")
    from grace_tpu.trace.pallas_render import make_fused_renderer

    n_bwd_tiles = (N_RAYS + 127) // 128
    renderer = make_fused_renderer(tile=128, max_chunks=2048,
                                   max_tiles_per_seg=n_bwd_tiles)
    target = img_trace.reshape(-1) * 1.01

    @jax.jit
    def train_step_general(s, w):
        def loss_fn(s, w):
            v = renderer(rays_s, s, w)
            return jnp.sum((v - target) ** 2) / N_RAYS

        loss, (gs, gw) = jax.value_and_grad(loss_fn, argnums=(0, 1))(s, w)
        return s - 1e-6 * gs, w - 1e-6 * gw, loss

    sg1, wg1, lossg1 = train_step_general(sorted_spheres, weights)
    assert np.isfinite(float(lossg1)) and bool(jnp.all(jnp.isfinite(sg1)))

    def train_general_body(i, acc):
        _, _, loss = train_step_general(sorted_spheres + acc * 1e-38, weights)
        return acc + loss * 1e-38 + 1.0

    out["train_step_general_ms"] = round(
        device_frame_ms(train_general_body, k1=1, k2=3), 2)
    log("secondary metrics done")
    return out


if __name__ == "__main__":
    main(sharded="--sharded" in sys.argv)

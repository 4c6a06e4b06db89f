"""Sort-free differentiable splat tests (interpret mode on CPU).

The Pallas forward/backward pair is validated against ``splat_reference_jnp``
— a pure-jnp evaluation of the IDENTICAL separable model (same fitted
coefficients, same clamps) — so agreement is to f32 rounding, not to model
tolerance. Physics-level correctness of the model itself is covered by the
bucketed splat tests (test_splat.py) and the bench parity gate."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grace_tpu.core.types import make_spheres
from grace_tpu.trace.splat import render_ortho_splat
from grace_tpu.trace.splat_grad import (
    OrthoCamera,
    make_splat_trainer,
    splat_backward_sortfree,
    splat_forward_sortfree,
    splat_reference_jnp,
)

CAM = OrthoCamera(
    camera_position=(0.5, 0.5, -2.0),
    look_at=(0.5, 0.5, 0.5),
    view_up=(0.0, 1.0, 0.0),
    vertical_extent=1.4,
    length=6.0,
    resolution_x=128,
    resolution_y=64,
)


def scene(rng, n=600):
    pos = (0.15 + 0.7 * rng.random((n, 3))).astype(np.float32)
    h = (0.03 + 0.08 * rng.random(n)).astype(np.float32)
    # A few dead particles: h = 0 and out-of-depth.
    h[:5] = 0.0
    pos[5:8, 2] = 50.0
    spheres = make_spheres(pos, h)
    w = (0.5 + rng.random(n)).astype(np.float32)
    return spheres, jnp.asarray(w)


def test_sortfree_forward_matches_reference_model(rng):
    spheres, w = scene(rng)
    img = splat_forward_sortfree(spheres, w, CAM, tile_w=16, tile_h=128,
                                 interpret=True)
    ref = splat_reference_jnp(spheres, w, CAM)
    # Both paths are f32 with different accumulation orders; each is within
    # ~5e-6 * max of a float64 oracle, so compare with a scaled atol.
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.array(img), np.array(ref),
                               atol=2e-5 * scale)
    assert float(jnp.max(img)) > 0


def test_sortfree_forward_matches_bucketed_splat(rng):
    spheres, w = scene(rng)
    img = splat_forward_sortfree(spheres, w, CAM, tile_w=16, tile_h=128,
                                 interpret=True)
    img_b, ovf = render_ortho_splat(
        spheres, CAM.camera_position, CAM.look_at, CAM.view_up,
        CAM.vertical_extent, CAM.length, CAM.resolution_x, CAM.resolution_y,
        weights=w, tile_w=16, tile_h=128, chunk=128, interpret=True)
    assert not bool(ovf)
    scale = float(jnp.max(jnp.abs(img_b)))
    np.testing.assert_allclose(np.array(img), np.array(img_b),
                               atol=1e-5 * scale)


def test_splat_trainer_gradients_match_reference_model(rng):
    spheres, w = scene(rng, n=300)
    render = make_splat_trainer(CAM, tile_w=16, tile_h=128, interpret=True)
    tgt = jax.random.normal(jax.random.key(3),
                            (CAM.resolution_y, CAM.resolution_x))

    def loss_pallas(s, ww):
        return jnp.sum((render(s, ww) - tgt) ** 2)

    def loss_ref(s, ww):
        return jnp.sum((splat_reference_jnp(s, ww, CAM) - tgt) ** 2)

    (gs_p, gw_p) = jax.grad(loss_pallas, argnums=(0, 1))(spheres, w)
    (gs_r, gw_r) = jax.grad(loss_ref, argnums=(0, 1))(spheres, w)
    gs_p, gs_r = np.array(gs_p), np.array(gs_r)
    gw_p, gw_r = np.array(gw_p), np.array(gw_r)
    np.testing.assert_allclose(gw_p, gw_r, atol=3e-5 * np.abs(gw_r).max())
    np.testing.assert_allclose(gs_p, gs_r, atol=3e-5 * np.abs(gs_r).max())
    assert np.abs(gs_p).sum() > 0 and np.abs(gw_p).sum() > 0
    # Dead particles (h = 0 / out of depth) must get exactly zero gradients.
    assert np.all(gs_p[:5] == 0) and np.all(gw_p[:5] == 0)


def test_splat_trainer_finite_difference(rng):
    """Directional central-difference check of the custom_vjp.

    The loss is kept O(1) (small weights, mean-square) so the f32 FD noise
    floor (~loss * 1e-7 / eps) sits well below the directional derivative;
    per-coordinate FD on a large summed loss is cancellation-dominated."""
    spheres, w = scene(rng, n=64)
    w = w * jnp.float32(1e-3)
    render = make_splat_trainer(CAM, tile_w=16, tile_h=128, interpret=True)

    def loss(s):
        return jnp.mean(render(s, w) ** 2)

    g = np.array(jax.grad(loss)(spheres), np.float64)
    s0 = np.array(spheres, np.float64)
    rng2 = np.random.default_rng(7)
    checked = 0
    for _ in range(4):
        d = rng2.standard_normal(s0.shape)
        d[:8] = 0.0                      # keep dead particles dead
        d /= np.linalg.norm(d)
        eps = 2e-4
        fp = float(loss(jnp.asarray(s0 + eps * d, jnp.float32)))
        fm = float(loss(jnp.asarray(s0 - eps * d, jnp.float32)))
        fd = (fp - fm) / (2 * eps)
        gd = float((g * d).sum())
        if abs(gd) < 1e-4:
            continue
        np.testing.assert_allclose(gd, fd, rtol=2e-2)
        checked += 1
    assert checked >= 2


def test_splat_backward_no_capacity(rng):
    """The bitmask-decoded backward has NO tile-list capacity: a segment
    overlapping every tile of the image still gets full gradients (a huge-h
    particle makes its whole segment's bbox cover the image)."""
    spheres, w = scene(rng, n=256)
    s = np.array(spheres)
    s[100, :3] = (0.5, 0.5, 0.5)
    s[100, 3] = 5.0                      # footprint covers the whole image
    spheres = jnp.asarray(s)
    gs, gw = splat_backward_sortfree(
        spheres, w, jnp.ones((CAM.resolution_y, CAM.resolution_x)),
        CAM, tile_w=16, tile_h=128, interpret=True)

    def loss_ref(sp, ww):
        return jnp.sum(splat_reference_jnp(sp, ww, CAM))

    gs_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(spheres, w)
    gs_r, gw_r = np.array(gs_r), np.array(gw_r)
    # The whole-image footprint sums thousands of terms per gradient entry;
    # the f32 ORACLE itself deviates ~2.5e-4 * max from a float64 run, so
    # compare at the f32 accumulation noise floor, not rounding.
    np.testing.assert_allclose(np.array(gs), gs_r,
                               atol=5e-4 * np.abs(gs_r).max())
    np.testing.assert_allclose(np.array(gw), gw_r,
                               atol=5e-4 * np.abs(gw_r).max())

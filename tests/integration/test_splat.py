"""MXU splat renderer parity and physics tests (interpret mode on CPU).

The splat image must match the XLA engine's cumulative trace over an
identical orthographic pixel grid to the separable-basis fit tolerance,
and must satisfy the same plane-integral normalization as the trace paths
(ref: tests/integrate/integrate.cu:88-101 idiom)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grace_tpu.build.sph import build_sph_tree
from grace_tpu.core.types import make_spheres
from grace_tpu.rays.gen import orthographic_projection_rays
from grace_tpu.sph.kernel_integrals import splat_basis_reference, DENSE_KERNEL_INTEGRAL_TABLE, N_DENSE
from grace_tpu.trace.splat import bucket_prims_ortho, render_ortho_splat
from grace_tpu.trace.sph import trace_cumulative_sph

CAM = (0.5, 0.5, -2.0)
LOOK = (0.5, 0.5, 0.5)
UP = (0.0, 1.0, 0.0)


def test_basis_fit_error_bound():
    """The separable model must be within 1.5e-4 relative of F everywhere
    (including outside the support, where it must be exactly 0 beyond the
    clamp)."""
    x = np.linspace(-1.3, 1.3, 401)
    model = splat_basis_reference(x[:, None], x[None, :])
    beta = np.sqrt(np.minimum(x[:, None] ** 2 + x[None, :] ** 2, 4.0))
    xi = np.clip(beta, 0, 1) * (N_DENSE - 1)
    i0 = np.minimum(xi.astype(int), N_DENSE - 2)
    fr = xi - i0
    truth = np.where(
        beta >= 1.0, 0.0,
        DENSE_KERNEL_INTEGRAL_TABLE[i0] * (1 - fr)
        + DENSE_KERNEL_INTEGRAL_TABLE[i0 + 1] * fr)
    err = np.abs(model - truth).max()
    assert err < 1.5e-4 * truth.max()
    # exactly zero at/beyond the per-axis clamp
    assert np.all(model[np.abs(x) >= 1.0, :] == 0.0)


def _scene(rng, n=3000):
    spheres = make_spheres(rng.random((n, 3)).astype(np.float32),
                           (0.02 + 0.05 * rng.random(n)).astype(np.float32))
    return jax.jit(build_sph_tree, static_argnums=1)(spheres, 16)


def test_splat_matches_engine(rng):
    ss, tree, _ = _scene(rng)
    W = H = 128
    rays = orthographic_projection_rays(W, H, CAM, LOOK, UP, 2.0, 6.0)
    ref = np.array(trace_cumulative_sph(rays, ss, tree)).reshape(H, W)
    img, ovf = render_ortho_splat(ss, CAM, LOOK, UP, 2.0, 6.0, W, H,
                                  tile_w=32, tile_h=128, chunk=256,
                                  interpret=True)
    assert not bool(ovf)
    img = np.array(img)
    assert np.abs(img - ref).max() < 4e-4 * ref.max()
    assert abs(img.sum() / ref.sum() - 1.0) < 1e-4


def test_splat_plane_integral_normalization(rng):
    """sum(image) * pixel_area ~= N_inside (each kernel integrates to 1)."""
    n = 500
    # keep particles well inside so every footprint is fully on the image
    pos = (0.2 + 0.6 * rng.random((n, 3))).astype(np.float32)
    h = (0.02 + 0.03 * rng.random(n)).astype(np.float32)
    spheres = make_spheres(pos, h)
    W = H = 128
    vext = 2.0
    img, ovf = render_ortho_splat(spheres, CAM, LOOK, UP, vext, 6.0, W, H,
                                  tile_w=32, tile_h=128, chunk=256,
                                  interpret=True)
    assert not bool(ovf)
    pixel_area = (vext / H) * (vext / W)
    total = float(jnp.sum(img)) * pixel_area
    # pixel-center quadrature of smooth kernels: coarse-grid error dominates
    assert abs(total / n - 1.0) < 5e-3


def test_splat_depth_culling(rng):
    """Particles behind the camera plane or beyond ray length contribute
    nothing (reference along-ray acceptance, generic/intersect.h:26-54)."""
    pos = np.array([[0.5, 0.5, 0.5], [0.5, 0.5, -3.0], [0.5, 0.5, 9.0]], np.float32)
    h = np.array([0.1, 0.1, 0.1], np.float32)
    spheres = make_spheres(pos, h)
    img_all, _ = render_ortho_splat(spheres, CAM, LOOK, UP, 2.0, 6.0, 128, 128,
                                    tile_w=32, tile_h=128, chunk=256,
                                    interpret=True)
    img_one, _ = render_ortho_splat(spheres[:1], CAM, LOOK, UP, 2.0, 6.0, 128, 128,
                                    tile_w=32, tile_h=128, chunk=256,
                                    interpret=True)
    np.testing.assert_allclose(np.array(img_all), np.array(img_one),
                               rtol=0, atol=1e-6)


def test_splat_weights(rng):
    """Per-particle weights scale contributions linearly (the weighted-scan
    analog, ref: kernels/weights.cuh)."""
    ss, tree, _ = _scene(rng, n=400)
    w = jnp.asarray(2.5 * np.ones(400, np.float32))
    img1, _ = render_ortho_splat(ss, CAM, LOOK, UP, 2.0, 6.0, 128, 128,
                                 tile_w=32, tile_h=128, chunk=256,
                                 interpret=True)
    img2, _ = render_ortho_splat(ss, CAM, LOOK, UP, 2.0, 6.0, 128, 128,
                                 weights=w, tile_w=32, tile_h=128, chunk=256,
                                 interpret=True)
    a, b = np.array(img2), 2.5 * np.array(img1)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5 * np.abs(b).max())


def test_splat_overflow_flag(rng):
    """A footprint wider than a tile span must set the overflow flag."""
    pos = np.array([[0.5, 0.5, 0.5]], np.float32)
    h = np.array([1.5], np.float32)   # far bigger than any tile span
    spheres = make_spheres(pos, h)
    buckets = bucket_prims_ortho(spheres, CAM, LOOK, UP, 2.0, 6.0, 128, 128,
                                 tile_w=32, tile_h=128, chunk=256)
    assert bool(buckets.overflow)


def test_splat_banded_matches_unbanded(rng):
    """Column-banded bucketing (band < tile_h) is a pure layout optimization:
    images match the whole-tile path to f32 rounding, and the engine oracle
    to the fit tolerance."""
    ss, tree, _ = _scene(rng)
    W = H = 128
    rays = orthographic_projection_rays(W, H, CAM, LOOK, UP, 2.0, 6.0)
    ref = np.array(trace_cumulative_sph(rays, ss, tree)).reshape(H, W)
    img0, ovf0 = render_ortho_splat(ss, CAM, LOOK, UP, 2.0, 6.0, W, H,
                                    tile_w=32, tile_h=128, chunk=256,
                                    interpret=True)
    img, ovf = render_ortho_splat(ss, CAM, LOOK, UP, 2.0, 6.0, W, H,
                                  tile_w=16, tile_h=128, chunk=128,
                                  band=32, interpret=True)
    assert not bool(ovf0) and not bool(ovf)
    img, img0 = np.array(img), np.array(img0)
    assert np.abs(img - img0).max() < 1e-6 * img0.max()
    assert np.abs(img - ref).max() < 4e-4 * ref.max()


def test_splat_banded_overflow_flag(rng):
    """A footprint wider than a band span flags overflow at band granularity."""
    spheres = make_spheres(np.array([[0.5, 0.5, 0.5]], np.float32),
                           np.array([0.9], np.float32))
    _, ovf = render_ortho_splat(spheres, CAM, LOOK, UP, 2.0, 6.0, 128, 128,
                                tile_w=64, tile_h=128, chunk=128, band=32,
                                interpret=True)
    assert bool(ovf)


def test_splat_deg8_joint_basis(rng):
    """The jointly-fit deg-8 basis (20% less factor work) stays within its
    documented ~3.1e-4 bound vs the trace oracle and keeps normalization."""
    ss, tree, _ = _scene(rng)
    W = H = 128
    rays = orthographic_projection_rays(W, H, CAM, LOOK, UP, 2.0, 6.0)
    ref = np.array(trace_cumulative_sph(rays, ss, tree)).reshape(H, W)
    b = bucket_prims_ortho(ss, CAM, LOOK, UP, 2.0, 6.0, W, H,
                           tile_w=16, tile_h=128, chunk=128, band=32)
    img = np.array(jnp.asarray(
        __import__("grace_tpu.trace.splat", fromlist=["splat_image"]).splat_image(
            b, tile_w=16, tile_h=128, interpret=True, basis="deg8")))
    assert np.abs(img - ref).max() < 6e-4 * ref.max()
    assert abs(img.sum() / ref.sum() - 1.0) < 1e-4


def test_sorted_first_counts(rng):
    """Two-level exact count over sorted keys == numpy searchsorted, incl.
    chunk-boundary, all-below, and empty-key edge cases."""
    from grace_tpu.trace.splat import _sorted_first_counts

    for n, n_keys, chunk in ((100_000, 512, 1024), (7, 5, 4),
                             (4096, 64, 1024), (2048, 1, 8)):
        keys = np.sort(rng.integers(0, n_keys + 1, n)).astype(np.int32)
        got = np.asarray(_sorted_first_counts(jnp.asarray(keys), n_keys,
                                              chunk=chunk))
        want = np.searchsorted(keys, np.arange(n_keys + 1), side="left")
        assert (got == want).all()
    # every key strictly below every threshold (the n_full == m edge)
    got = np.asarray(_sorted_first_counts(jnp.zeros(2048, jnp.int32), 3,
                                          chunk=1024))
    assert (got == np.array([0, 2048, 2048, 2048])).all()
    # n == 0 (empty key array): all counts zero
    got = np.asarray(_sorted_first_counts(jnp.zeros(0, jnp.int32), 3))
    assert (got == np.zeros(4, np.int32)).all()

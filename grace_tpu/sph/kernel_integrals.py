"""SPH cubic-spline (M4) kernel line integrals.

Behavioral analog of the reference's 51-entry double-precision lookup table of
the dimensionless cubic-spline line integral vs normalized impact parameter
(ref: include/grace/cuda/trace_sph.cuh:22-50). Instead of shipping opaque
constants, this module *derives* the table:

The 3D cubic spline with support radius 1 is
    w(q) = (8/pi) * (1 - 6 q^2 + 6 q^3)   for 0   <= q <= 1/2
    w(q) = (8/pi) * 2 (1 - q)^3           for 1/2 <  q <= 1
and the dimensionless line integral at normalized impact parameter beta is
    F(beta) = Integral_{-z1}^{z1} w(sqrt(beta^2 + z^2)) dz,  z1 = sqrt(1-beta^2).

For a particle with smoothing length h, the physical line integral is
F(b/h) / h^2 — the 1/h^2 scale applied by the reference's OnHit functors
(ref: cuda/functors/trace.cuh:163-193). F(0) = 6/pi = 1.90986..., matching
the reference table's first entry.

Two evaluation paths are provided:
  * ``KERNEL_INTEGRAL_TABLE`` (numpy f64, computed once at import by
    Gauss-Legendre quadrature) + ``lerp`` — bit-for-bit the reference's
    table-lookup scheme, used by the non-differentiable fast path.
  * ``cubic_spline_line_integral`` — closed-form antiderivative in jnp,
    smooth and differentiable, used by the gradient path and by kernels where
    transcendentals beat a VMEM gather.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

N_TABLE = 51  # ref: trace_sph.cuh:22 (N_table = 51)
_SIGMA = 8.0 / np.pi


def _w_dimensionless(q):
    """Cubic spline w(q) with support radius 1 (numpy, f64)."""
    q = np.asarray(q, np.float64)
    inner = 1.0 - 6.0 * q * q + 6.0 * q * q * q
    outer = 2.0 * (1.0 - q) ** 3
    return _SIGMA * np.where(q <= 0.5, inner, np.where(q <= 1.0, outer, 0.0))


def _line_integral_quadrature(beta: float, order: int = 96) -> float:
    """F(beta) by piecewise Gauss-Legendre quadrature (f64)."""
    beta = float(beta)
    if beta >= 1.0:
        return 0.0
    z1 = np.sqrt(1.0 - beta * beta)
    zs = np.sqrt(max(0.25 - beta * beta, 0.0))
    x, w = np.polynomial.legendre.leggauss(order)

    def seg(a, b):
        if b <= a:
            return 0.0
        z = 0.5 * (b - a) * x + 0.5 * (b + a)
        q = np.sqrt(beta * beta + z * z)
        return 0.5 * (b - a) * np.sum(w * _w_dimensionless(q))

    return 2.0 * (seg(0.0, zs) + seg(zs, z1))


def make_kernel_integral_table(n: int = N_TABLE) -> np.ndarray:
    """Table of F(i / (n-1)) for i in [0, n) (f64 numpy)."""
    betas = np.linspace(0.0, 1.0, n)
    return np.array([_line_integral_quadrature(b) for b in betas])


KERNEL_INTEGRAL_TABLE = make_kernel_integral_table()

# Dense table for the differentiable f32 path. The closed form below is exact
# in f64 but suffers ~1e-3 cancellation error in f32 (TPU has no f64 compute),
# so gradients/fast-path use this 2048-entry derived table + lerp: forward
# error ~1e-6 and the interpolant's analytic derivative is its own exact
# finite-difference limit.
N_DENSE = 2048
DENSE_KERNEL_INTEGRAL_TABLE = make_kernel_integral_table(N_DENSE)


def cubic_spline_line_integral(beta):
    """Closed-form F(beta), differentiable, for jnp arrays beta >= 0.

    Antiderivatives used (s = sqrt(z^2 + beta^2)):
      I0 = z
      I1 = Int s   dz = (z s + beta^2 log(z + s)) / 2
      I2 = Int s^2 dz = beta^2 z + z^3 / 3
      I3 = Int s^3 dz = z s^3 / 4 + (3 beta^2 / 8)(z s + beta^2 log(z + s))
    Inner piece integrand  (q <= 1/2): I0 - 6 I2 + 6 I3
    Outer piece integrand  (q >  1/2): 2 (I0 - 3 I1 + 3 I2 - I3)
    """
    beta = jnp.asarray(beta)
    dt = beta.dtype
    b2 = beta * beta
    # Guarded log argument: coefficients beta^2 / beta^4 kill the log blowup
    # as beta -> 0; the epsilon only avoids log(0) NaNs at exactly beta = 0.
    eps = jnp.asarray(1e-20, dt)

    # The eps floor keeps sqrt away from 0 where the outer max clamps, so
    # autodiff sees grad(max) = 0 rather than 0 * sqrt'(0) = NaN; forward
    # error is O(sqrt(eps)) ~ 1e-15.
    z1 = jnp.sqrt(jnp.maximum(1.0 - b2, eps))
    zs = jnp.sqrt(jnp.maximum(0.25 - b2, eps))

    def log_zps(z):
        s = jnp.sqrt(z * z + b2)
        return jnp.log(jnp.maximum(z + s, eps))

    def I1(z):
        s = jnp.sqrt(z * z + b2)
        return 0.5 * (z * s + b2 * log_zps(z))

    def I2(z):
        return b2 * z + z * z * z / 3.0

    def I3(z):
        s = jnp.sqrt(z * z + b2)
        s3 = s * s * s
        return 0.25 * z * s3 + 0.375 * b2 * (z * s + b2 * log_zps(z))

    def g_inner(z):
        return z - 6.0 * I2(z) + 6.0 * I3(z)

    def g_outer(z):
        return 2.0 * (z - 3.0 * I1(z) + 3.0 * I2(z) - I3(z))

    sigma = jnp.asarray(_SIGMA, dt)
    val = 2.0 * sigma * (
        (g_inner(zs) - g_inner(jnp.zeros_like(zs)))
        + (g_outer(z1) - g_outer(zs))
    )
    return jnp.where(beta < 1.0, val, jnp.zeros_like(val))

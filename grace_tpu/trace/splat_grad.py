"""Differentiable MXU splatting: sort-free forward + segment-major backward.

The bucketed splat renderer (trace/splat.py) is the fastest inference path,
but its per-(scene, camera) prep is a 5-operand instance sort — paid every
step when training moves the particles. This module is the TRAINING-grade
splat pipeline, built so that neither direction needs a sort or a scatter:

  forward   particles stay in Morton order; the broadphase is the same
            projected-bbox bitmask cull the trace kernels use (segment
            bbox x pixel tile, packed to i32 words — no compaction sort,
            cannot overflow). Out-of-tile particles inside an overlapped
            segment contribute EXACTLY zero: the separable basis carries an
            explicit (1 - t) factor that vanishes for |dx| >= h
            (kernel_integrals.fit_splat_basis), so no instance masks are
            needed at all.
  backward  the gradient of I = sum_k A_k diag(s) B_k^T w.r.t. the per-
            particle projections is itself rank-K MXU contractions of the
            cotangent tile against the factors and their analytic
            t-derivatives (M_k = G^T A_k, N_k = G B_k). The kernel is
            SEGMENT-major (the pallas_render.py pattern): each grid program
            owns one 128-particle Morton segment's gradient block outright
            and streams the cotangent tiles overlapping it — every
            (tile, segment) pair visited exactly once, no atomics, no
            scatter, and the gradient slab maps 1:1 back to particles.

The chain from projected-space gradients (g_pu, g_pv, g_logh, g_scale) back
to spheres (x, y, z, h) and weights is elementwise XLA outside the kernels
(pu = pos . v and pv = pos . u are linear; scale = w / h^2).

Semantics match trace_cumulative_sph over an orthographic ray grid to the
separable-fit tolerance (~1e-4 relative), the reference's flagship
column-density workload (ref: tests/project_gadget/project_gadget.cu:27-115)
made differentiable — a capability the reference does not have.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grace_tpu.ops.vecmath import cross, normalize3
from grace_tpu.sph.kernel_integrals import (
    SPLAT_A8_COEFFS,
    SPLAT_A_COEFFS,
    SPLAT_B8_COEFFS,
    SPLAT_B_COEFFS,
    SPLAT_DEG,
    SPLAT_DEG8,
    SPLAT_RANK,
)
from grace_tpu.trace.splat import _camera_frame, _factor

SEG = 128  # particles per Morton segment = slab lane width


def _basis_coeffs(basis: str):
    """(deg, a_coeffs, b_coeffs) for a named separable basis fit:
    "deg10" (per-eigenvector, ~1e-4 max rel err) or "deg8" (joint fit,
    ~3.1e-4, ~20% less VPU factor work — the headline inference basis)."""
    try:
        deg, a_c, b_c = {
            "deg10": (SPLAT_DEG, SPLAT_A_COEFFS, SPLAT_B_COEFFS),
            "deg8": (SPLAT_DEG8, SPLAT_A8_COEFFS, SPLAT_B8_COEFFS),
        }[basis]
    except KeyError:
        raise ValueError(f"unknown basis {basis!r} (expected 'deg10' or "
                         "'deg8')") from None
    return deg, np.asarray(a_c, np.float32), np.asarray(b_c, np.float32)


class OrthoCamera(NamedTuple):
    """Static orthographic camera spec (hashable; closed over by the jit)."""

    camera_position: tuple
    look_at: tuple
    view_up: tuple
    vertical_extent: float
    length: float
    resolution_x: int
    resolution_y: int


def _camera_numerics(cam: OrthoCamera):
    view_dir, v, u = _camera_frame(
        cam.camera_position, cam.look_at, cam.view_up)
    c = jnp.asarray(cam.camera_position, jnp.float32)
    w_res, h_res = cam.resolution_x, cam.resolution_y
    aspect = w_res / h_res
    half_w = 0.5 * cam.vertical_extent * aspect
    half_h = 0.5 * cam.vertical_extent
    cu = c @ v
    cv = c @ u
    # Pixel-center affine maps (identical formulas to splat.bucket_prims_ortho
    # / rays.gen.orthographic_projection_rays: pixel (j, i) = ray j*W + i).
    x0 = cu + (2.0 * 0.5 / w_res - 1.0) * half_w
    dx = 2.0 * half_w / w_res
    y0 = cv + (1.0 - 2.0 * 0.5 / h_res) * half_h
    dy = -2.0 * half_h / h_res
    return view_dir, v, u, c, x0, dx, y0, dy


def project_ortho(spheres, weights, cam: OrthoCamera):
    """Morton-order projections: (pu, pv, invh, scale) each f32[n].

    scale folds the weight, the 1/h^2 kernel normalization, and the
    along-ray depth acceptance (for a parallel bundle the foot of the
    perpendicular is at the particle depth for every ray,
    ref: generic/intersect.h:26-54)."""
    view_dir, v, u, c, *_ = _camera_numerics(cam)
    pos = spheres[:, :3]
    h = spheres[:, 3]
    pu = pos @ v
    pv = pos @ u
    depth = (pos - c) @ view_dir
    # NaN-safe where: divide by the SELECTED branch so reverse-mode autodiff
    # through the dead branch stays finite (the oracle splat_reference_jnp
    # differentiates straight through this).
    inv_h = jnp.where(h > 0, 1.0 / jnp.where(h > 0, h, 1.0), 0.0)
    live = (h > 0) & (depth >= 0.0) & (depth < cam.length)
    w = jnp.ones_like(h) if weights is None else weights
    scale = jnp.where(live, w * inv_h * inv_h, 0.0)
    return pu, pv, inv_h, scale


def pack_proj_slabs(pu, pv, invh, scale):
    """(n_segs, 8, SEG) slabs: rows pu, pv, invh, scale, 4 zero."""
    n = pu.shape[0]
    n_pad = ((n + SEG - 1) // SEG) * SEG
    comp = [jnp.pad(a, (0, n_pad - n)) for a in (pu, pv, invh, scale)]
    zeros = jnp.zeros((n_pad,), jnp.float32)
    pt = jnp.stack(comp + [zeros] * 4, axis=0)          # (8, n_pad)
    return pt.reshape(8, n_pad // SEG, SEG).transpose(1, 0, 2)


def projected_overlap(pu, pv, invh, scale, cam: OrthoCamera,
                      tile_w: int, tile_h: int):
    """bool[n_tiles, n_segs]: segment projected bbox vs pixel tile, row-major
    tile order (tile (r, c) = r * ntx + c)."""
    *_, x0, dx, y0, dy = _camera_numerics(cam)
    n = pu.shape[0]
    n_pad = ((n + SEG - 1) // SEG) * SEG
    live = scale > 0
    big = jnp.float32(3.4e38)
    h_eff = jnp.where(live, 1.0 / jnp.maximum(invh, 1e-30), 0.0)
    lo_u = jnp.pad(jnp.where(live, pu - h_eff, big), (0, n_pad - n),
                   constant_values=big)
    hi_u = jnp.pad(jnp.where(live, pu + h_eff, -big), (0, n_pad - n),
                   constant_values=-big)
    lo_v = jnp.pad(jnp.where(live, pv - h_eff, big), (0, n_pad - n),
                   constant_values=big)
    hi_v = jnp.pad(jnp.where(live, pv + h_eff, -big), (0, n_pad - n),
                   constant_values=-big)
    seg_lo_u = jnp.min(lo_u.reshape(-1, SEG), axis=1)
    seg_hi_u = jnp.max(hi_u.reshape(-1, SEG), axis=1)
    seg_lo_v = jnp.min(lo_v.reshape(-1, SEG), axis=1)
    seg_hi_v = jnp.max(hi_v.reshape(-1, SEG), axis=1)

    ntx = cam.resolution_x // tile_h
    nty = cam.resolution_y // tile_w
    cols = jnp.arange(ntx, dtype=jnp.float32)
    rows = jnp.arange(nty, dtype=jnp.float32)
    # Tile (r, c) pixel-CENTER span; the bbox already includes the footprint
    # radius h, and the basis is exactly zero beyond it, so culling against
    # the center span is exact.
    tx_lo = x0 + cols * (tile_h * dx)
    tx_hi = x0 + (cols * tile_h + (tile_h - 1)) * dx
    ty_hi = y0 + rows * (tile_w * dy)                 # dy < 0: top edge
    ty_lo = y0 + (rows * tile_w + (tile_w - 1)) * dy
    ov_u = (seg_lo_u[None, :] <= tx_hi[:, None]) & (seg_hi_u[None, :] >= tx_lo[:, None])
    ov_v = (seg_lo_v[None, :] <= ty_hi[:, None]) & (seg_hi_v[None, :] >= ty_lo[:, None])
    # [nty, ntx, n_segs] -> [n_tiles, n_segs], row-major tile order.
    return (ov_v[:, None, :] & ov_u[None, :, :]).reshape(nty * ntx, -1)


def _sortfree_fwd_kernel(
    mask_ref,      # SMEM (1, 1, n_words) i32
    coord_ref,     # SMEM (1, 1, 4) f32: x0, dx, y0, dy
    prims_ref,     # VMEM (n_segs, 8, SEG) resident proj slabs
    out_ref,       # VMEM (TW, TH)
    seg_list,      # SMEM scratch (n_words*32,) i32
    *,
    ntx: int,
    rank: int,
    deg: int,
    a_coeffs: np.ndarray,
    b_coeffs: np.ndarray,
):
    tw, th = out_ref.shape
    n_words = mask_ref.shape[2]
    t_id = pl.program_id(0)
    x0 = coord_ref[0, 0, 0]
    dx = coord_ref[0, 0, 1]
    y0 = coord_ref[0, 0, 2]
    dy = coord_ref[0, 0, 3]
    row0 = (t_id // ntx) * tw
    col0 = jax.lax.rem(t_id, ntx) * th
    # Mosaic rejects float tpu.iota (hardware-only failure; interpret mode
    # accepts it) — generate int32 and cast.
    ys = y0 + (row0.astype(jnp.float32)
               + jax.lax.broadcasted_iota(jnp.int32, (tw, 1), 0)
               .astype(jnp.float32)) * dy
    xs = x0 + (col0.astype(jnp.float32)
               + jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0)
               .astype(jnp.float32)) * dx
    dn = (((1,), (1,)), ((), ()))

    def word_body(w, n):
        word0 = mask_ref[0, 0, w]

        def emit(state):
            word, n = state
            for s in range(32):
                seg_list[n] = w * 32 + s
                n = n + ((word >> s) & 1)
            return n

        return jax.lax.cond(word0 != 0, emit, lambda s: s[1], (word0, n))

    n = jax.lax.fori_loop(0, n_words, word_body, jnp.int32(0))

    def body(k, acc):
        slab = prims_ref[seg_list[k]]
        pu = slab[0:1, :]
        pv = slab[1:2, :]
        invh = slab[2:3, :]
        scl = slab[3:4, :]
        ya = (ys - pv) * invh
        a_f = _factor(jnp.minimum(ya * ya, 1.0), a_coeffs, deg)
        xb = (xs - pu) * invh
        b_f = _factor(jnp.minimum(xb * xb, 1.0), b_coeffs, deg)
        for k_r in range(rank):
            acc = acc + jax.lax.dot_general(
                a_f[k_r], b_f[k_r] * scl, dn,
                preferred_element_type=jnp.float32)
        return acc

    out_ref[...] = jax.lax.fori_loop(
        0, n, body, jnp.zeros((tw, th), jnp.float32))


def _poly_and_deriv(t, coeffs, deg):
    """[rank] pairs (alpha(t), dalpha/dt) with alpha = (1 - t) * q(t)."""
    m = 1.0 - t
    vals, ders = [], []
    for k in range(coeffs.shape[0]):
        q = jnp.full_like(t, jnp.float32(coeffs[k, deg]))
        dq = jnp.zeros_like(t)
        for d in range(deg - 1, -1, -1):
            dq = dq * t + q
            q = q * t + jnp.float32(coeffs[k, d])
        vals.append(q * m)
        ders.append(dq * m - q)
    return vals, ders


def _sortfree_bwd_kernel(
    mask_ref,      # SMEM (1, 1, n_words) i32: bit t of word w = tile w*32+t
    coord_ref,     # SMEM (1, 1, 4) f32: x0, dx, y0, dy
    prims_ref,     # VMEM (1, 8, SEG) this segment's proj slab
    g_hbm,         # HBM (n_tiles, TW, TH) cotangent tiles
    grad_ref,      # VMEM out (1, 8, SEG): rows g_pu, g_pv, g_t2 (=g_logh
    #                contributions, see below), g_scale, 4 zero
    tile_list,     # SMEM scratch (n_words*32,) i32
    gbuf,          # VMEM scratch (2, TW, TH)
    sem,           # DMA sems (2,)
    *,
    ntx: int,
    tile_w: int,
    tile_h: int,
    rank: int,
    deg: int,
    a_coeffs: np.ndarray,
    b_coeffs: np.ndarray,
):
    slab = prims_ref[0]
    pu = slab[0:1, :]
    pv = slab[1:2, :]
    invh = slab[2:3, :]
    scl = slab[3:4, :]

    # Decode this segment's overlapped-tile bitmask into an SMEM tile list
    # (the bitmask kernels' scalar phase) — no per-segment argsort list
    # build on the host side, and NO capacity: the scratch holds every tile
    # id, so the backward cannot truncate.
    def word_body(w, n):
        word0 = mask_ref[0, 0, w]

        def emit(state):
            word, n = state
            for s in range(32):
                tile_list[n] = w * 32 + s
                n = n + ((word >> s) & 1)
            return n

        return jax.lax.cond(word0 != 0, emit, lambda s: s[1], (word0, n))

    n = jax.lax.fori_loop(0, mask_ref.shape[2], word_body, jnp.int32(0))
    x0 = coord_ref[0, 0, 0]
    dx = coord_ref[0, 0, 1]
    y0 = coord_ref[0, 0, 2]
    dy = coord_ref[0, 0, 3]
    # int32 iota + cast: Mosaic rejects float tpu.iota on hardware.
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (tile_w, 1), 0).astype(
        jnp.float32)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (tile_h, 1), 0).astype(
        jnp.float32)
    # Contraction specs: Gt x A over the row (sublane) dim of both.
    dn_rows = (((0,), (0,)), ((), ()))   # G (TW, TH) x A (TW, P) -> (TH, P)
    dn_cols = (((1,), (0,)), ((), ()))   # G (TW, TH) x B (TH, P) -> (TW, P)

    def dma(slot, k):
        return pltpu.make_async_copy(
            g_hbm.at[tile_list[k]], gbuf.at[slot], sem.at[slot])

    @pl.when(n > 0)
    def _():
        dma(0, 0).start()

    def body(k, accs):
        g_pu, g_pv, g_t2, g_s = accs
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n)
        def _():
            dma(jax.lax.rem(k + 1, 2), k + 1).start()

        dma(slot, k).wait()
        g = gbuf[slot]                                   # (TW, TH)
        t_id = tile_list[k]
        row0 = ((t_id // ntx) * tile_w).astype(jnp.float32)
        col0 = (jax.lax.rem(t_id, ntx) * tile_h).astype(jnp.float32)
        ys = y0 + (row0 + iota_w) * dy                   # (TW, 1)
        xs = x0 + (col0 + iota_h) * dx                   # (TH, 1)

        ya = (ys - pv) * invh                            # (TW, P)
        ya2 = ya * ya
        in_y = (ya2 < 1.0).astype(jnp.float32)
        ty = jnp.minimum(ya2, 1.0)
        a_v, a_d = _poly_and_deriv(ty, a_coeffs, deg)
        xb = (xs - pu) * invh                            # (TH, P)
        xb2 = xb * xb
        in_x = (xb2 < 1.0).astype(jnp.float32)
        tx = jnp.minimum(xb2, 1.0)
        b_v, b_d = _poly_and_deriv(tx, b_coeffs, deg)

        # dt/dpv = -2 ya invh [in support]; dt/dlog(invh) = 2 t [in support].
        dty_dpv = (-2.0) * ya * invh * in_y
        dtx_dpu = (-2.0) * xb * invh * in_x
        dty_dl = 2.0 * ya2 * in_y
        dtx_dl = 2.0 * xb2 * in_x

        for k_r in range(rank):
            m_k = jax.lax.dot_general(g, a_v[k_r], dn_rows,
                                      preferred_element_type=jnp.float32)
            n_k = jax.lax.dot_general(g, b_v[k_r], dn_cols,
                                      preferred_element_type=jnp.float32)
            # d/ds: A_k b_k pairs summed -> colsum over TH of M_k * b_k.
            g_s = g_s + jnp.sum(m_k * b_v[k_r], axis=0, keepdims=True)
            na = n_k * a_d[k_r]                          # (TW, P)
            mb = m_k * b_d[k_r]                          # (TH, P)
            g_pv = g_pv + jnp.sum(na * dty_dpv, axis=0, keepdims=True)
            g_pu = g_pu + jnp.sum(mb * dtx_dpu, axis=0, keepdims=True)
            g_t2 = g_t2 + (jnp.sum(na * dty_dl, axis=0, keepdims=True)
                           + jnp.sum(mb * dtx_dl, axis=0, keepdims=True))
        return g_pu, g_pv, g_t2, g_s

    zero = jnp.zeros((1, SEG), jnp.float32)
    g_pu, g_pv, g_t2, g_s = jax.lax.fori_loop(
        0, n, body, (zero, zero, zero, zero))
    # g_pu/g_pv/g_t2 still need the (shared) scale factor; g_t2 is the
    # gradient w.r.t. log(invh) / scale — the h chain happens outside.
    grad_ref[0] = jnp.concatenate(
        [g_pu * scl, g_pv * scl, g_t2 * scl, g_s,
         jnp.zeros((4, SEG), jnp.float32)], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("cam", "tile_w", "tile_h", "interpret", "basis"),
)
def splat_forward_sortfree(
    spheres, weights, cam: OrthoCamera,
    tile_w: int = 32, tile_h: int = 128,
    interpret: bool = False,
    basis: str = "deg8",
):
    """Sort-free orthographic splat render: f32 image [H, W].

    Prep is projection + bitmask cull only — no instance sort; the right
    forward for moving cameras/scenes and training steps. Full frame
    (prep + render, one jit, TPU v5e, bench scale: 1M sorted particles,
    512x512): 11.2 ms deg8 / 12.5-13.6 ms deg10, vs 12.7 ms prep + 2.2 ms
    render for the bucketed path — use trace/splat.py when the (scene,
    camera) pair repays its prep across many frames, this when it changes
    every frame. Particles should be Morton-sorted (build_sph_tree
    order): the segment-bbox cull degrades to all-tiles-x-all-segments on
    unsorted input (measured 17x slower).
    """
    if cam.resolution_x % tile_h or cam.resolution_y % tile_w:
        raise ValueError("resolution must be a multiple of the tile shape")
    deg, a_c, b_c = _basis_coeffs(basis)
    pu, pv, invh, scale = project_ortho(spheres, weights, cam)
    slabs = pack_proj_slabs(pu, pv, invh, scale)
    overlap = projected_overlap(pu, pv, invh, scale, cam, tile_w, tile_h)
    from grace_tpu.trace.pallas_broadphase import pack_overlap_bits

    masks = pack_overlap_bits(overlap)
    *_, x0, dx, y0, dy = _camera_numerics(cam)
    coords = jnp.stack([x0, dx, y0, dy]).reshape(1, 1, 4)
    ntx = cam.resolution_x // tile_h
    nty = cam.resolution_y // tile_w
    n_tiles = ntx * nty

    kernel = functools.partial(
        _sortfree_fwd_kernel, ntx=ntx, rank=SPLAT_RANK, deg=deg,
        a_coeffs=a_c, b_coeffs=b_c,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (cam.resolution_y, cam.resolution_x), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, masks.shape[1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 4), lambda i: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_w, tile_h),
            lambda i, ntx=ntx: (i // ntx, jax.lax.rem(i, ntx)),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((masks.shape[1] * 32,), jnp.int32)],
        interpret=interpret,
    )(masks[:, None, :], coords, slabs)


@functools.partial(
    jax.jit,
    static_argnames=("cam", "tile_w", "tile_h", "interpret", "basis"),
)
def splat_backward_sortfree(
    spheres, weights, g_image, cam: OrthoCamera,
    tile_w: int = 32, tile_h: int = 128,
    interpret: bool = False,
    basis: str = "deg8",
):
    """Segment-major splat backward: (g_spheres f32[n, 4], g_weights f32[n]).

    The per-segment overlapped-tile lists are a TRANSPOSED bitmask decoded
    inside the kernel (the same argsort-free pattern as the forward and the
    trace kernels), so the backward has no tile-list capacity and cannot
    truncate gradients.
    """
    from grace_tpu.trace.pallas_broadphase import pack_overlap_bits

    pu, pv, invh, scale = project_ortho(spheres, weights, cam)
    slabs = pack_proj_slabs(pu, pv, invh, scale)
    overlap = projected_overlap(pu, pv, invh, scale, cam, tile_w, tile_h)
    n_tiles_total, n_segs = overlap.shape
    masks_t = pack_overlap_bits(jnp.transpose(overlap))  # (n_segs, words)

    ntx = cam.resolution_x // tile_h
    nty = cam.resolution_y // tile_w
    g_tiles = g_image.reshape(nty, tile_w, ntx, tile_h).transpose(
        0, 2, 1, 3).reshape(n_tiles_total, tile_w, tile_h)
    *_, x0, dx, y0, dy = _camera_numerics(cam)
    coords = jnp.stack([x0, dx, y0, dy]).reshape(1, 1, 4)

    deg, a_c, b_c = _basis_coeffs(basis)
    kernel = functools.partial(
        _sortfree_bwd_kernel, ntx=ntx, tile_w=tile_w, tile_h=tile_h,
        rank=SPLAT_RANK, deg=deg,
        a_coeffs=a_c, b_coeffs=b_c,
    )
    grad = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_segs, 8, SEG), jnp.float32),
        grid=(n_segs,),
        in_specs=[
            pl.BlockSpec((1, 1, masks_t.shape[1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 4), lambda i: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, SEG), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, 8, SEG), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((masks_t.shape[1] * 32,), jnp.int32),
            pltpu.VMEM((2, tile_w, tile_h), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(masks_t[:, None, :], coords, slabs, g_tiles)

    n = spheres.shape[0]
    flat = grad.transpose(1, 0, 2).reshape(8, -1)[:, :n]   # (8, n) components
    g_pu, g_pv, g_t2, g_s = flat[0], flat[1], flat[2], flat[3]

    # Chain back through the projection (all elementwise / rank-1):
    #   pu = pos . v, pv = pos . u          -> g_pos = g_pu v + g_pv u
    #   t = ((x - p) invh)^2                -> d/dlog(invh) = 2t  (= g_t2)
    #   invh = 1/h                          -> g_h += -g_t2 / h
    #   scale = w invh^2 [live]             -> g_w = g_s invh^2 [live]
    #                                          g_h += -2 g_s w invh^3 [live]
    view_dir, v, u, c, *_ = _camera_numerics(cam)
    h = spheres[:, 3]
    live = scale > 0
    w = jnp.ones_like(h) if weights is None else weights
    g_pos = g_pu[:, None] * v[None, :] + g_pv[:, None] * u[None, :]
    safe_h = jnp.maximum(h, 1e-30)
    g_h = jnp.where(live,
                    -g_t2 / safe_h - 2.0 * g_s * w * invh * invh * invh,
                    0.0)
    g_spheres = jnp.concatenate([g_pos, g_h[:, None]], axis=1)
    g_weights = jnp.where(live, g_s * invh * invh, 0.0)
    return g_spheres, g_weights


def make_splat_trainer(cam: OrthoCamera, tile_w: int = 32, tile_h: int = 128,
                       interpret: bool = False, basis: str = "deg8"):
    """custom_vjp orthographic splat renderer: MXU forward AND backward.

    render(spheres, weights) -> image f32[H, W]; gradients flow to particle
    positions, smoothing lengths, and weights. Neither direction has a
    capacity: the forward's tile segment lists and the backward's
    segment tile lists are both bitmask-decoded in-kernel, so nothing can
    overflow or truncate.
    """

    @jax.custom_vjp
    def render(spheres, weights):
        return splat_forward_sortfree(spheres, weights, cam,
                                      tile_w=tile_w, tile_h=tile_h,
                                      interpret=interpret, basis=basis)

    def fwd(spheres, weights):
        return render(spheres, weights), (spheres, weights)

    def bwd(res, g):
        spheres, weights = res
        gs, gw = splat_backward_sortfree(
            spheres, weights, g, cam, tile_w=tile_w, tile_h=tile_h,
            interpret=interpret, basis=basis)
        return gs, gw

    render.defvjp(fwd, bwd)
    return render


def splat_reference_jnp(spheres, weights, cam: OrthoCamera,
                        basis: str = "deg8"):
    """Pure-jnp evaluation of the IDENTICAL separable model (same fitted
    coefficients, same clamps) — the differentiable oracle the Pallas
    forward/backward kernels are tested against. O(n_pixels * n) dense;
    tiny scenes only."""
    deg, a_c, b_c = _basis_coeffs(basis)
    pu, pv, invh, scale = project_ortho(spheres, weights, cam)
    *_, x0, dx, y0, dy = _camera_numerics(cam)
    xs = x0 + jnp.arange(cam.resolution_x, dtype=jnp.float32) * dx
    ys = y0 + jnp.arange(cam.resolution_y, dtype=jnp.float32) * dy
    ya = (ys[:, None] - pv[None, :]) * invh[None, :]       # (H, n)
    xb = (xs[:, None] - pu[None, :]) * invh[None, :]       # (W, n)
    a_f = _factor(jnp.minimum(ya * ya, 1.0), a_c, deg)
    b_f = _factor(jnp.minimum(xb * xb, 1.0), b_c, deg)
    img = jnp.zeros((cam.resolution_y, cam.resolution_x), jnp.float32)
    for k in range(SPLAT_RANK):
        img = img + a_f[k] @ (b_f[k] * scale[None, :]).T
    return img

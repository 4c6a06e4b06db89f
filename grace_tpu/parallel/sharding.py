"""Multi-chip distribution (capability the reference lacks: it is single-GPU,
ref SURVEY.md section 2.3 — no NCCL/MPI anywhere).

TPU-native scaling design (BASELINE.json north star):

  * axis "rays":  rays / image tiles are embarrassingly parallel — shard
    them; particles + tree replicated. Zero communication in the forward;
    per-particle gradients are psum-reduced over this axis (inserted
    automatically by shard_map's reverse-mode transpose).
  * axis "space": when particles exceed one chip's HBM, shard particles
    spatially; each shard builds its *local* BVH, and fixed-size ray blocks
    circulate around the ring via ppermute, accumulating column density from
    each particle shard in turn — structurally identical to ring attention:
    blocks move, per-ray accumulators ride along, collectives stay on ICI.

Both axes compose in a 2D mesh; ``sharded_train_step`` demonstrates the
full differentiable pipeline (render -> loss -> particle gradients ->
SGD update) under jit over the mesh.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from grace_tpu.build.sph import build_sph_tree
from grace_tpu.core.types import Rays
from grace_tpu.trace.render import find_hits, integrate_hits


def make_mesh(n_rays_axis: int, n_space_axis: int = 1, devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    n = n_rays_axis * n_space_axis
    import numpy as np

    dev = np.asarray(devices[:n]).reshape(n_rays_axis, n_space_axis)
    return Mesh(dev, axis_names=("rays", "space"))


def replicated_sharded_render(
    mesh: Mesh, rays: Rays, spheres, tree, capacity_per_shard: int
):
    """v1 scaling: rays sharded over the whole mesh, particles replicated."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(("rays", "space")), P(), jax.tree_util.tree_map(lambda _: P(), tree)),
        out_specs=(P(("rays", "space")), P()),
    )
    def shard_render(local_rays, spheres, tree):
        recs = find_hits(local_rays, spheres, tree, capacity_per_shard)
        img = integrate_hits(recs, local_rays, spheres, local_rays.n_rays)
        # Overflowed shards silently drop hits — surface the flag, reduced
        # over the whole mesh so every host sees it (VERDICT r1: sharded
        # consumers must check total_hits > capacity).
        ovf = jax.lax.pmax(
            (recs.total_hits > capacity_per_shard).astype(jnp.int32),
            ("rays", "space"),
        )
        return img, ovf > 0

    return shard_render(rays, spheres, tree)


def sharded_pallas_render(
    mesh: Mesh,
    rays: Rays,
    spheres,
    tile: int = 64,
    mode: str = "cumulative",
    interpret: bool = False,
    broadphase: str = "bitmask",
):
    """v1 scaling of the FAST path: rays sharded over the whole mesh,
    particles replicated, each shard running the fused Pallas trace kernel
    on its local ray block. ``broadphase`` is 'bitmask' (default) or
    'quarter' (the seg-32 kernel, fastest for VMEM-resident scenes —
    pallas_kernel docstring).

    The forward is communication-free; returns (values f32/i32[R],
    overflow bool[]) with the overflow flag pmax'd mesh-wide
    (always False on the bitmask/quarter paths, kept for contract
    uniformity).
    """
    return _sharded_pallas_fn(mesh, tile, mode, interpret,
                              broadphase)(rays, spheres)


@functools.lru_cache(maxsize=None)
def _sharded_pallas_fn(mesh: Mesh, tile: int, mode: str, interpret: bool,
                       broadphase: str = "bitmask"):
    # Cached jitted closure: rebuilding the shard_map per call would re-trace
    # AND run every wrapper op eagerly — pathological on the axon tunnel.
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(("rays", "space")), P()),
        out_specs=(P(("rays", "space")), P()),
        check_vma=False,  # pallas_call out_shapes carry no vma annotations
    )
    def shard_render(local_rays, spheres):
        v, ovf = pallas_trace_sph(
            local_rays, spheres, tile=tile, mode=mode,
            broadphase=broadphase, interpret=interpret)
        flag = jax.lax.pmax(jnp.any(ovf).astype(jnp.int32), ("rays", "space"))
        return v, flag > 0

    return jax.jit(shard_render)


def ring_pallas_render(
    mesh: Mesh,
    rays: Rays,
    spheres,
    tile: int = 64,
    interpret: bool = False,
):
    """v2 scaling of the FAST path: particles spatially sharded over "space",
    ray blocks (with accumulators) circulating the ring via ppermute, the
    fused Pallas cumulative kernel running per step against the resident
    particle shard — ring_render_and_loss's structure with the fused kernel
    inside (r1 review item: the fast renderer must scale past one chip's
    HBM). Returns (values f32[R], overflow bool[]).
    """
    return _ring_pallas_fn(mesh, tile, interpret)(rays, spheres)


@functools.lru_cache(maxsize=None)
def _ring_pallas_fn(mesh: Mesh, tile: int, interpret: bool):
    from grace_tpu.trace.broadphase import tile_aabbs
    from grace_tpu.trace.pallas_broadphase import masks_for_tile_aabbs
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph
    from grace_tpu.utils.vma import promote_to_vma

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(("rays", "space")), P("space")),
        out_specs=(P(("rays", "space")), P()),
        check_vma=False,  # pallas_call out_shapes carry no vma annotations
    )
    def shard_render(local_rays, local_spheres):
        n_space = jax.lax.axis_size("space")
        idx = jax.lax.axis_index("space")
        perm = [(i, (i + 1) % n_space) for i in range(n_space)]

        # Broadphase hoisted OUT of the ring (one batched pass instead of a
        # serialized per-step cull): every block's per-tile AABBs are tiny,
        # so gather THEM over the ring and build this shard's masks against
        # all n_space blocks up front. Needs whole ray tiles; ragged blocks
        # fall back to in-step culling.
        hoist = local_rays.n_rays % tile == 0
        if hoist:
            tmin, tmax = tile_aabbs(local_rays, tile)
            tmin_all = jax.lax.all_gather(tmin, "space")   # (n_space, T, 3)
            tmax_all = jax.lax.all_gather(tmax, "space")
            masks_all = jax.vmap(
                lambda a, b: masks_for_tile_aabbs(a, b, local_spheres)
            )(tmin_all, tmax_all)                          # (n_space, T, W)

        def step(carry, t):
            rays_blk, acc, ovf = carry
            if hoist:
                # After t forward ppermutes, this shard holds the block that
                # STARTED at ring position idx - t.
                b = jax.lax.rem(idx - t + n_space, n_space)
                masks = jax.lax.dynamic_index_in_dim(
                    masks_all, b, keepdims=False)
            else:
                masks = None
            v, o = pallas_trace_sph(
                rays_blk, local_spheres, tile=tile, mode="cumulative",
                broadphase="bitmask", interpret=interpret, masks=masks)
            acc = acc + v
            ovf = ovf | jnp.any(o)
            rays_nxt = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(x, "space", perm), rays_blk)
            acc_nxt = jax.lax.ppermute(acc, "space", perm)
            return (rays_nxt, acc_nxt, ovf), None

        acc0 = jnp.zeros((local_rays.n_rays,), jnp.float32)
        init = promote_to_vma(
            (local_rays, acc0, jnp.zeros((), jnp.bool_)),
            frozenset(("rays", "space")))
        (_, img, ovf), _ = jax.lax.scan(
            step, init, jnp.arange(n_space, dtype=jnp.int32))
        flag = jax.lax.pmax(ovf.astype(jnp.int32), ("rays", "space"))
        return img, flag > 0

    return jax.jit(shard_render)


def sharded_splat_render(
    mesh: Mesh,
    buckets,
    tile_w: int = 64,
    tile_h: int = 128,
    interpret: bool = False,
    basis: str = "deg10",
):
    """MXU splat renderer over the mesh: image TILE ROWS sharded across all
    devices (row-major tile order makes the leading meta axis the row axis
    for banded and unbanded buckets alike), instance slabs replicated.
    Communication-free forward; the per-(scene, camera) bucket prep stays
    replicated (it is ~1%% of frame time).

    Returns the full image f32[H, W] sharded over rows.
    """
    n_dev = mesh.devices.size
    h_res = buckets.yrows.shape[0]
    nty = h_res // tile_w
    if nty % n_dev:
        raise ValueError(f"tile rows {nty} must divide over {n_dev} devices")
    keys_per_row = buckets.first.shape[0] // nty
    return _sharded_splat_fn(mesh, tile_w, tile_h, nty, keys_per_row,
                             interpret, basis)(buckets)


@functools.lru_cache(maxsize=None)
def _sharded_splat_fn(mesh: Mesh, tile_w: int, tile_h: int, nty: int,
                      ntx: int, interpret: bool, basis: str = "deg10"):
    from grace_tpu.trace.splat import SplatBuckets, splat_image

    # Leading-axis row sharding of the per-tile metadata + pixel-row coords.
    specs = SplatBuckets(
        slabs=P(), slab_lo=P(("rays", "space")), n_slabs=P(("rays", "space")),
        first=P(("rays", "space")), last=P(("rays", "space")),
        xcols=P(), yrows=P(("rays", "space")), overflow=P(),
    )

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(specs,),
        out_specs=P(("rays", "space")),
        check_vma=False,  # pallas_call out_shapes carry no vma annotations
    )
    def shard_render(local):
        # The shard's 2D [local_rows, ntx] meta flattens back to the 1-D
        # row-major tile order splat_image expects.
        flat = SplatBuckets(
            slabs=local.slabs,
            slab_lo=local.slab_lo.reshape(-1),
            n_slabs=local.n_slabs.reshape(-1),
            first=local.first.reshape(-1),
            last=local.last.reshape(-1),
            xcols=local.xcols, yrows=local.yrows, overflow=local.overflow,
        )
        return splat_image(flat, tile_w=tile_w, tile_h=tile_h,
                           interpret=interpret, basis=basis)

    @jax.jit
    def run(buckets):
        # Reshape key meta to [nty, keys_per_row] so the leading axis is tile
        # rows (keys are row-major over (row, column-tile, band)).
        def rows(a):
            return a.reshape(nty, ntx)

        local_buckets = SplatBuckets(
            slabs=buckets.slabs,
            slab_lo=rows(buckets.slab_lo), n_slabs=rows(buckets.n_slabs),
            first=rows(buckets.first), last=rows(buckets.last),
            xcols=buckets.xcols, yrows=buckets.yrows, overflow=buckets.overflow,
        )
        return shard_render(local_buckets)

    return run


def ring_render_and_loss(
    local_rays: Rays,
    local_spheres,
    target,
    capacity: int,
    max_per_leaf: int,
    space_axis: str = "space",
):
    """Inside-shard_map body: ring column-density render + local loss.

    Each space shard builds the BVH of its resident particles once, then the
    ray blocks (with their accumulators) make a full circuit of the ring; at
    every step the block accumulates the local shard's contribution before
    being ppermute'd to the next neighbor. After axis_size steps every block
    is home with the full integral.
    """
    n_space = jax.lax.axis_size(space_axis)
    idx = jax.lax.axis_index(space_axis)
    perm = [(i, (i + 1) % n_space) for i in range(n_space)]

    sorted_spheres, tree, _ = build_sph_tree(local_spheres, max_per_leaf)

    def step(carry, _):
        rays_blk, acc, ovf = carry
        recs = find_hits(rays_blk, jax.lax.stop_gradient(sorted_spheres), tree, capacity)
        acc = acc + integrate_hits(recs, rays_blk, sorted_spheres, rays_blk.n_rays)
        ovf = ovf | (recs.total_hits > capacity)
        rays_nxt = jax.tree_util.tree_map(
            lambda x: jax.lax.ppermute(x, space_axis, perm), rays_blk
        )
        acc_nxt = jax.lax.ppermute(acc, space_axis, perm)
        return (rays_nxt, acc_nxt, ovf), None

    # scan requires a consistent carry type under shard_map: ppermute makes
    # every carry leaf varying over the mesh axes, so promote any
    # still-invariant leaf (e.g. broadcast constants) before the scan.
    from grace_tpu.utils.vma import promote_to_vma

    acc0 = jnp.zeros((local_rays.n_rays,), jnp.float32)
    ovf0 = jnp.zeros((), jnp.bool_)
    init = promote_to_vma((local_rays, acc0, ovf0),
                          frozenset(("rays", space_axis)))
    (rays_out, img, ovf), _ = jax.lax.scan(step, init, None, length=n_space)
    # After n_space ppermutes the block is back at its home shard. The
    # overflow flag traveled with the block; reduce so every shard agrees.
    overflow = jax.lax.pmax(ovf.astype(jnp.int32), ("rays", space_axis)) > 0
    local_loss = jnp.sum((img - target) ** 2)
    return img, local_loss, overflow


def sharded_train_step(
    mesh: Mesh,
    rays: Rays,
    spheres,
    targets,
    capacity: int,
    max_per_leaf: int,
    lr: float = 1e-3,
):
    """Full differentiable training step over a ("rays", "space") mesh.

    Rays and targets are sharded over both axes (each space lane starts with
    its own resident ray block); particles are sharded over "space" and
    replicated over "rays". The loss gradient w.r.t. the local particle shard
    is psum'd over "rays" by shard_map's transpose; the returned updated
    particles keep the P("space") sharding.

    Returns (new_spheres, loss, overflow). overflow=True means some shard's
    hit buffer overflowed ``capacity`` and the loss/gradient are silently
    truncated — callers MUST check it (errors.check_overflow raises).
    """

    def train(rays, spheres, targets):
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(("rays", "space")), P("space"), P(("rays", "space"))),
            out_specs=(P("space"), P(), P()),
        )
        def grad_shard(local_rays, local_spheres, local_targets):
            def loss_fn(ls):
                _, local_loss, overflow = ring_render_and_loss(
                    local_rays, ls, local_targets, capacity, max_per_leaf
                )
                # Total loss over every ray shard: psum over both axes.
                return jax.lax.psum(local_loss, ("rays", "space")), overflow

            (loss, overflow), g = jax.value_and_grad(loss_fn, has_aux=True)(
                local_spheres)
            return g, loss, overflow

        g, loss, overflow = grad_shard(rays, spheres, targets)
        new_spheres = spheres - lr * g
        return new_spheres, loss, overflow

    return jax.jit(train)(rays, spheres, targets)

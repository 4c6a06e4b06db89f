"""Fused per-hit record kernel parity tests (interpret mode on CPU).

The single-pass Pallas record kernel must agree with the XLA engine's
two-pass trace_sph on per-ray counts (exactly), per-ray hit index SETS
(exactly — within-ray order is not a contract on either path, matching the
reference which only fixes order after sort_by_distance), and payloads to
polynomial-fit tolerance. Distance sorting on the rectangular layout must
produce monotone per-ray sequences that are permutations of the unsorted
records.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from grace_tpu.build.sph import build_sph_tree
from grace_tpu.core.types import Rays, make_spheres
from grace_tpu.trace.pallas_records import (
    INDEX_SENTINEL,
    pallas_trace_sph_records,
    records_to_flat,
    sort_records_by_distance,
)
from grace_tpu.trace.sph import (
    trace_hitcounts_sph,
    trace_sph,
    trace_with_sentinels_sph,
)


def setup(rng, n=600, r=192, seed=7):
    spheres = make_spheres(
        rng.random((n, 3)).astype(np.float32),
        (0.05 + 0.08 * rng.random(n)).astype(np.float32),
    )
    ss, tree, _ = jax.jit(build_sph_tree, static_argnums=1)(spheres, 8)
    d = rng.standard_normal((r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = Rays(
        jnp.asarray(rng.random((r, 3)).astype(np.float32) * 0.2 - 0.2),
        jnp.asarray(d),
        jnp.full((r,), 3.0, jnp.float32),
    )
    return ss, tree, rays


def test_records_match_xla_engine(rng):
    ss, tree, rays = setup(rng)
    rec = pallas_trace_sph_records(rays, ss, per_ray_capacity=128, tile=64,
                                   interpret=True)
    hc = trace_hitcounts_sph(rays, ss, tree)
    assert bool(jnp.all(rec.counts == hc))
    assert not bool(jnp.any(rec.overflowed))

    ref = trace_sph(rays, ss, tree, capacity=8192)
    off, cnt = np.asarray(ref.offsets), np.asarray(ref.counts)
    ri, rg, rd = map(np.asarray, (rec.indices, rec.integrals, rec.distances))
    fi, fg, fd = map(np.asarray, (ref.indices, ref.integrals, ref.distances))
    for k in range(rays.n_rays):
        c = cnt[k]
        # identical hit sets; payloads compared in primitive-index order
        o1 = np.argsort(ri[k, :c])
        o2 = np.argsort(fi[off[k]:off[k] + c])
        np.testing.assert_array_equal(ri[k, :c][o1], fi[off[k]:off[k] + c][o2])
        # The Horner fit bounds ABSOLUTE error in F (times the 1/h^2 scale
        # of each record); grazing hits have tiny F with large relative
        # error by design, so the tolerance is absolute at the segment's
        # magnitude scale plus a loose rtol.
        seg_ref = fg[off[k]:off[k] + c][o2]
        atol = 1e-4 * (1.0 + np.abs(seg_ref).max(initial=0.0))
        np.testing.assert_allclose(rg[k, :c][o1], seg_ref, rtol=2e-3,
                                   atol=atol)
        np.testing.assert_allclose(
            rd[k, :c][o1], fd[off[k]:off[k] + c][o2], rtol=1e-5, atol=1e-6)
        # sentinel fill past the count
        assert np.all(ri[k, c:] == INDEX_SENTINEL)


def test_sort_records_by_distance(rng):
    ss, _, rays = setup(rng)
    rec = pallas_trace_sph_records(rays, ss, per_ray_capacity=128, tile=64,
                                   interpret=True)
    srt = sort_records_by_distance(rec)
    cnt = np.asarray(rec.counts)
    d_s = np.asarray(srt.distances)
    for k in range(rays.n_rays):
        c = cnt[k]
        assert np.all(np.diff(d_s[k, :c]) >= 0)
        assert np.all(d_s[k, :c] >= 0)
        # permutation of the same hits
        np.testing.assert_array_equal(
            np.sort(np.asarray(srt.indices)[k, :c]),
            np.sort(np.asarray(rec.indices)[k, :c]),
        )
        assert np.all(np.asarray(srt.indices)[k, c:] == INDEX_SENTINEL)


def test_facade_engine_pallas(rng):
    ss, tree, rays = setup(rng, n=400, r=128)
    ref = trace_sph(rays, ss, tree, capacity=8192)
    got = trace_sph(rays, ss, tree, capacity=8192, engine="pallas",
                    per_ray_capacity=128, interpret=True)
    assert bool(jnp.all(got.counts == ref.counts))
    assert bool(jnp.all(got.offsets == ref.offsets))
    assert int(got.total_hits) == int(ref.total_hits)
    # same flat segment contents as sets
    off, cnt = np.asarray(ref.offsets), np.asarray(ref.counts)
    gi, fi = np.asarray(got.indices), np.asarray(ref.indices)
    for k in range(rays.n_rays):
        s = slice(off[k], off[k] + cnt[k])
        np.testing.assert_array_equal(np.sort(gi[s]), np.sort(fi[s]))


def test_facade_sentinels_pallas(rng):
    ss, tree, rays = setup(rng, n=400, r=128)
    got = trace_with_sentinels_sph(
        rays, ss, tree, capacity=16384, engine="pallas",
        per_ray_capacity=128, interpret=True)
    off, cnt = np.asarray(got.offsets), np.asarray(got.counts)
    gi = np.asarray(got.indices)
    gd = np.asarray(got.distances)
    for k in range(rays.n_rays):
        # one sentinel entry terminates each segment
        assert gi[off[k] + cnt[k]] == -1
        assert gd[off[k] + cnt[k]] == -1.0
        assert np.all(gi[off[k]:off[k] + cnt[k]] >= 0)


def test_per_ray_overflow_counts_exact(rng):
    # capacity 128 < max hits: counts stay exact, overflowed flags raised,
    # surviving records are valid hits.
    spheres = make_spheres(
        np.full((512, 3), 0.5, np.float32),
        np.full((512,), 0.4, np.float32),
    )
    ss, tree, _ = jax.jit(build_sph_tree, static_argnums=1)(spheres, 8)
    rays = Rays(
        jnp.asarray(np.tile([[0.5, 0.5, -2.0]], (64, 1)).astype(np.float32)),
        jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (64, 1)).astype(np.float32)),
        jnp.full((64,), 6.0, jnp.float32),
    )
    rec = pallas_trace_sph_records(rays, ss, per_ray_capacity=128, tile=64,
                                   interpret=True)
    # Brute-force truth: every ray passes through every sphere's center
    # (b2 = 0 < r^2, dot = 2.5 in [0, 6)). The XLA engine is NOT the oracle
    # here: 512 co-located primitives degenerate its traversal stack.
    assert bool(jnp.all(rec.counts == 512))
    assert bool(jnp.all(rec.overflowed))
    assert bool(jnp.all(rec.indices >= 0))  # all 128 slots filled with hits


def test_records_to_flat_roundtrip(rng):
    ss, tree, rays = setup(rng, n=300, r=64)
    rec = pallas_trace_sph_records(rays, ss, per_ray_capacity=128, tile=64,
                                   interpret=True)
    offsets, counts, fi, fg, fd = records_to_flat(rec, capacity=4096)
    assert bool(jnp.all(offsets == jnp.cumsum(counts) - counts))
    off, cnt = np.asarray(offsets), np.asarray(counts)
    ri = np.asarray(rec.indices)
    for k in range(rays.n_rays):
        np.testing.assert_array_equal(
            np.asarray(fi)[off[k]:off[k] + cnt[k]], ri[k, :cnt[k]])


def test_records_streaming_matches_resident(rng):
    """Forcing the HBM-streaming variant (tiny vmem_resident_limit) must
    reproduce the resident kernel's records bit-for-bit — the per-hit path
    works at any scene size (ref: trace_sph.cuh works for any N)."""
    ss, tree, rays = setup(rng)
    rec_r = pallas_trace_sph_records(rays, ss, per_ray_capacity=128, tile=64,
                                     interpret=True)
    rec_s = pallas_trace_sph_records(rays, ss, per_ray_capacity=128, tile=64,
                                     interpret=True, vmem_resident_limit=1024)
    assert bool(jnp.all(rec_r.counts == rec_s.counts))
    assert bool(jnp.all(rec_r.indices == rec_s.indices))
    assert bool(jnp.all(rec_r.integrals == rec_s.integrals))
    assert bool(jnp.all(rec_r.distances == rec_s.distances))


def test_network_drain_matches_pick(rng):
    """The shift-network compaction drain must produce byte-identical
    records to the pick drain (both resident and forced-streaming), incl.
    per-ray capacity overflow."""
    ss, tree, rays = setup(rng)
    base = pallas_trace_sph_records(rays, ss, per_ray_capacity=256, tile=32,
                                    interpret=True)
    for kw in (dict(), dict(vmem_resident_limit=1024)):
        rec = pallas_trace_sph_records(rays, ss, per_ray_capacity=256,
                                       tile=32, interpret=True,
                                       drain="network", **kw)
        for a, b in zip(rec, base):
            assert np.array_equal(np.asarray(a), np.asarray(b))
    # overflow: tighter capacity keeps exact counts, valid prefix identical
    rec = pallas_trace_sph_records(rays, ss, per_ray_capacity=128, tile=32,
                                   interpret=True, drain="network")
    assert np.array_equal(np.asarray(rec.counts), np.asarray(base.counts))
    nv = np.minimum(np.asarray(rec.counts), 128)
    got, want = np.asarray(rec.indices), np.asarray(base.indices)
    for r in range(got.shape[0]):
        assert np.array_equal(got[r, :nv[r]], want[r, :nv[r]])


def test_rank_method_group_parity(rng):
    """Every (rank_method, group) re-parametrization of the pick drain must
    reproduce the default prefix/1 records exactly (the sweep configs are
    kept selectable for hardware measurement — ADVICE r3)."""
    ss, tree, rays = setup(rng, n=300, r=64)
    base = pallas_trace_sph_records(rays, ss, per_ray_capacity=128, tile=32,
                                    interpret=True)
    for rank_method in ("prefix", "mxu"):
        for group in (1, 8):
            if (rank_method, group) == ("prefix", 1):
                continue
            rec = pallas_trace_sph_records(rays, ss, per_ray_capacity=128,
                                           tile=32, interpret=True,
                                           rank_method=rank_method,
                                           group=group)
            for a, b in zip(rec, base):
                assert np.array_equal(np.asarray(a), np.asarray(b)), (
                    rank_method, group)


def test_bad_drain_and_rank_method_raise(rng):
    ss, tree, rays = setup(rng, n=300, r=64)
    with pytest.raises(ValueError, match="drain"):
        pallas_trace_sph_records(rays, ss, per_ray_capacity=128, tile=32,
                                 interpret=True, drain="netwrok")
    with pytest.raises(ValueError, match="rank_method"):
        pallas_trace_sph_records(rays, ss, per_ray_capacity=128, tile=32,
                                 interpret=True, rank_method="mxuu")


def test_quarter_broadphase_matches_bitmask(rng):
    """The seg-32 quarter broadphase + assembled-slab record kernel must
    reproduce the bitmask kernel's records EXACTLY (same drains, same
    ascending-primitive order, same counts/overflow semantics) for both
    drain families."""
    ss, tree, rays = setup(rng)
    base = pallas_trace_sph_records(rays, ss, per_ray_capacity=256, tile=32,
                                    interpret=True)
    for drain in ("pick", "network"):
        rec = pallas_trace_sph_records(rays, ss, per_ray_capacity=256,
                                       tile=32, interpret=True,
                                       broadphase="quarter", drain=drain)
        for a, b in zip(rec, base):
            assert np.array_equal(np.asarray(a), np.asarray(b)), drain
    # overflow: tighter capacity keeps exact counts, valid prefix identical
    rec = pallas_trace_sph_records(rays, ss, per_ray_capacity=128, tile=32,
                                   interpret=True, broadphase="quarter")
    assert np.array_equal(np.asarray(rec.counts), np.asarray(base.counts))
    nv = np.minimum(np.asarray(rec.counts), 128)
    got, want = np.asarray(rec.indices), np.asarray(base.indices)
    for r in range(got.shape[0]):
        assert np.array_equal(got[r, :nv[r]], want[r, :nv[r]])

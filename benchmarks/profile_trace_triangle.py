"""Triangle-mesh trace profiler (analog of ref tests/profile_trace_triangle/
profile_trace_triangle.cu:24-186: multi-camera pinhole ray gen + closest-hit
traversal timing + permanent-memory report; the tree-build stage also covers
ref tests/profile_tree_triangle).

Usage: python benchmarks/profile_trace_triangle.py [mesh.ply] [n_side] [cams]

Without a PLY argument a procedural high-res torus is generated (the
reference defaults to the Stanford dragon, not shipped here). Timing is
device-time via bench.device_frame_ms (the cudaEvent analog on this
platform); the fused Pallas closest-hit kernel and the XLA lockstep engine
are both profiled, plus the any-hit (occlusion) pass.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import bench
    from examples.render_triangle import torus_mesh
    from grace_tpu.core.types import Rays
    from grace_tpu.models.triangle import (
        auto_camera, build_triangle_tree, trace_any_hit, trace_closest_hit)
    from grace_tpu.rays.gen import pinhole_camera_rays
    from grace_tpu.trace.pallas_tri import pallas_trace_tri

    ply = sys.argv[1] if len(sys.argv) > 1 and sys.argv[1].endswith(".ply") else None
    off = 1 if ply else 0
    n_side = int(sys.argv[1 + off]) if len(sys.argv) > 1 + off else 512
    n_cams = int(sys.argv[2 + off]) if len(sys.argv) > 2 + off else 3
    if ply:
        from grace_tpu.io.ply import read_ply

        verts, faces = read_ply(ply)
        tris = jnp.asarray(verts[faces])
        print(f"{faces.shape[0]} triangles from {ply}")
    else:
        tris = jnp.asarray(torus_mesh(n_u=512, n_v=256))
        print(f"procedural torus: {tris.shape[0]} triangles")

    n_rays = n_side * n_side
    sorted_tris, tree, _ = jax.jit(
        lambda t: build_triangle_tree(t, 8))(tris)
    jax.block_until_ready(sorted_tris)
    cam0, look_at, length = auto_camera(sorted_tris, n_side)

    # The reference orbits several cameras around the mesh
    # (profile_trace_triangle.cu: setup_cameras); replicate with n_cams
    # azimuthal positions at the auto-framing distance.
    center = np.asarray(look_at, np.float32)
    radius = float(np.linalg.norm(np.asarray(cam0) - center))
    cams = [
        center + radius * np.asarray(
            [np.sin(2 * np.pi * k / n_cams), 0.0,
             np.cos(2 * np.pi * k / n_cams)], np.float32)
        for k in range(n_cams)
    ]

    print(f"rays: {n_rays} ({n_side}x{n_side}), cameras: {n_cams}")
    tree_bytes = 4 * (tree.children.size + tree.child_aabbs.size
                      + tree.leaves.size)
    mem = sorted_tris.size * 4 + tree_bytes + n_rays * 16 * 4 + n_rays * 8
    print(f"permanent trace memory: {mem / 2**30:.3f} GiB "
          f"(tris + tree + rays + results)")

    def build_body(i, acc):
        st, _, _ = build_triangle_tree(tris + acc * 1e-38, 8)
        return acc + st[0, 0, 0] * 1e-38 + 1.0

    t_build = bench.device_frame_ms(build_body, k1=1, k2=5)
    print(f"triangle tree build:        {t_build:8.3f} ms")

    gen = jax.jit(lambda c: pinhole_camera_rays(
        n_side, n_side, c, look_at, (0.0, 1.0, 0.0), jnp.pi / 3, length))
    rays_per_cam = [gen(jnp.asarray(c)) for c in cams]
    jax.block_until_ready(rays_per_cam[-1])

    def gen_body(i, acc):
        r = gen(jnp.asarray(cams[0]) + acc * 1e-38)
        return acc + r.origins[0, 0] * 1e-38 + 1.0

    t_gen = bench.device_frame_ms(gen_body, k1=2, k2=10)
    print(f"ray generation:             {t_gen:8.3f} ms")

    rays0 = rays_per_cam[0]

    def closest_pallas_body(i, acc):
        rr = Rays(rays0.origins, rays0.directions, rays0.lengths + acc * 1e-38)
        t, _, _ = pallas_trace_tri(rr, sorted_tris, mode="closest")
        probe = jnp.min(jnp.where(jnp.isfinite(t), t, 0.0))
        return acc + probe * 1e-38 + 1.0

    t_closest = bench.device_frame_ms(closest_pallas_body, k1=1, k2=5)
    print(f"closest-hit (fused Pallas): {t_closest:8.3f} ms "
          f"({n_rays / (t_closest / 1e3) / 1e6:.1f}M rays/s)")

    def closest_xla_body(i, acc):
        rr = Rays(rays0.origins, rays0.directions, rays0.lengths + acc * 1e-38)
        hit = trace_closest_hit(rr, sorted_tris, tree)
        return acc + jnp.where(jnp.isfinite(hit.t[0]), hit.t[0], 0.0) * 1e-38 + 1.0

    t_xla = bench.device_frame_ms(closest_xla_body, k1=1, k2=3)
    print(f"closest-hit (XLA engine):   {t_xla:8.3f} ms")

    def any_body(i, acc):
        rr = Rays(rays0.origins, rays0.directions, rays0.lengths + acc * 1e-38)
        t, _, _ = pallas_trace_tri(rr, sorted_tris, mode="any")
        return acc + t[0] * 1e-38 + 1.0

    t_any = bench.device_frame_ms(any_body, k1=1, k2=5)
    print(f"any-hit (fused Pallas):     {t_any:8.3f} ms")

    # Cross-camera totals (the reference reports per-trial means over
    # cameras x iterations; chain all cameras in one frame here).
    def all_body(i, acc):
        for r in rays_per_cam:
            rr = Rays(r.origins, r.directions, r.lengths + acc * 1e-38)
            t, _, _ = pallas_trace_tri(rr, sorted_tris, mode="closest")
            acc = acc + jnp.min(jnp.where(jnp.isfinite(t), t, 0.0)) * 1e-38
        return acc + 1.0

    t_all = bench.device_frame_ms(all_body, k1=1, k2=4)
    print(f"all {n_cams} cameras, closest:   {t_all:8.3f} ms "
          f"({t_all / n_cams:.3f} ms/camera)")


if __name__ == "__main__":
    main()

"""Mosaic lowering gate: compile EVERY Pallas entry point on the real TPU.

Interpret-mode tests (the whole CPU suite) structurally cannot catch Mosaic
verification errors — e.g. the round-3 f32 `tpu.iota` regression compiled in
interpret mode but was rejected by Mosaic on hardware, crashing the round's
official bench (VERDICT r3 weak #1/#2). This gate closes that hole: it
`jit(...).lower(...).compile()`s every kernel variant at tiny shapes —
compile only, no dispatch — in seconds of wall time.

Run after ANY kernel edit, and always before a round ends:

    python benchmarks/lowering_gate.py            # on TPU
    python benchmarks/lowering_gate.py --only splat   # subset

Exit code 0 = every variant lowered through Mosaic; 1 = at least one
failed (failures are printed with the Mosaic error).
"""

import pathlib
import sys
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp


# ---- tiny shared inputs (numpy: device-committed jit closure constants make
# lowering fetch them over the tunnel, see CLAUDE.md) -------------------------

_rng = np.random.default_rng(7)
N_SPHERES = 200            # pads to 2 x 128-lane segments
N_RAYS = 128               # 2 x 64-ray tiles
N_TRIS = 100

SPHERES = np.concatenate(
    [_rng.random((N_SPHERES, 3), dtype=np.float32),
     (0.05 + 0.05 * _rng.random((N_SPHERES,), dtype=np.float32))[:, None]],
    axis=1)
WEIGHTS = np.ones((N_SPHERES,), np.float32)
TRIS = _rng.random((N_TRIS, 3, 3), dtype=np.float32)

CAM = (0.5, 0.5, -2.0)
LOOK = (0.5, 0.5, 0.5)
UP = (0.0, 1.0, 0.0)
VEXT = 1.2
LENGTH = 6.0


def _rays():
    from grace_tpu.rays.gen import orthographic_projection_rays

    return orthographic_projection_rays(16, 8, CAM, LOOK, UP, VEXT, LENGTH)


def _compile(fn, *arrays):
    """Trace + lower + Mosaic-compile fn over the given arrays. No dispatch."""
    jax.jit(fn).lower(*arrays).compile()


# ---- gate registry ----------------------------------------------------------

def gate_trace_bitmask_resident():
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph

    _compile(lambda s: pallas_trace_sph(_rays(), s, broadphase="bitmask",
                                        tile=64), SPHERES)


def gate_trace_bitmask_stream():
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph

    _compile(lambda s: pallas_trace_sph(_rays(), s, broadphase="bitmask",
                                        tile=64, vmem_resident_limit=0),
             SPHERES)


def gate_trace_quarter():
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph

    _compile(lambda s: pallas_trace_sph(_rays(), s, broadphase="quarter",
                                        tile=64), SPHERES)


def gate_trace_quarter_stream():
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph

    _compile(lambda s: pallas_trace_sph(_rays(), s, broadphase="quarter",
                                        tile=64, vmem_resident_limit=0),
             SPHERES)


def gate_trace_quarter_fastint():
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph

    _compile(lambda s: pallas_trace_sph(_rays(), s, broadphase="quarter",
                                        tile=64, integral_deg=-12), SPHERES)


def gate_trace_qlist():
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph

    _compile(lambda s: pallas_trace_sph(_rays(), s, broadphase="qlist",
                                        tile=64, max_chunks=64), SPHERES)


def gate_trace_qlist_fastint():
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph

    _compile(lambda s: pallas_trace_sph(_rays(), s, broadphase="qlist",
                                        tile=32, max_chunks=64,
                                        integral_deg=-12, unroll=8), SPHERES)


def gate_trace_hitcount():
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph

    _compile(lambda s: pallas_trace_sph(_rays(), s, broadphase="bitmask",
                                        tile=64, mode="hitcount"), SPHERES)


def gate_trace_list_resident():
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph

    _compile(lambda s: pallas_trace_sph(_rays(), s, broadphase="list",
                                        tile=64, max_chunks=64), SPHERES)


def gate_trace_list_stream():
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph

    _compile(lambda s: pallas_trace_sph(_rays(), s, broadphase="list",
                                        tile=64, max_chunks=64,
                                        vmem_resident_limit=0), SPHERES)


def gate_trace_subtiled():
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph

    _compile(lambda s: pallas_trace_sph(_rays(), s, broadphase="dense",
                                        tile=64, max_chunks=64, subtiles=2),
             SPHERES)


def gate_trace_xla_broadphase():
    from grace_tpu.build.sph import build_sph_tree
    from grace_tpu.trace.pallas_kernel import pallas_trace_sph

    def fn(s):
        ss, tree, _ = build_sph_tree(s, 32)
        return pallas_trace_sph(_rays(), ss, tree, broadphase="xla",
                                tile=64, max_chunks=64)

    _compile(fn, SPHERES)


def gate_records_pick():
    from grace_tpu.trace.pallas_records import pallas_trace_sph_records

    _compile(lambda s: pallas_trace_sph_records(_rays(), s, 128, tile=64),
             SPHERES)


def gate_records_network():
    from grace_tpu.trace.pallas_records import pallas_trace_sph_records

    _compile(lambda s: pallas_trace_sph_records(_rays(), s, 128, tile=64,
                                                drain="network"), SPHERES)


def gate_records_mxu_group():
    from grace_tpu.trace.pallas_records import pallas_trace_sph_records

    _compile(lambda s: pallas_trace_sph_records(_rays(), s, 128, tile=64,
                                                rank_method="mxu", group=8),
             SPHERES)


def gate_records_quarter():
    from grace_tpu.trace.pallas_records import pallas_trace_sph_records

    _compile(lambda s: pallas_trace_sph_records(_rays(), s, 128, tile=64,
                                                broadphase="quarter"),
             SPHERES)


def gate_records_stream():
    from grace_tpu.trace.pallas_records import pallas_trace_sph_records

    _compile(lambda s: pallas_trace_sph_records(_rays(), s, 128, tile=64,
                                                vmem_resident_limit=0),
             SPHERES)


def gate_tri_closest():
    from grace_tpu.trace.pallas_tri import pallas_trace_tri

    _compile(lambda t: pallas_trace_tri(_rays(), t, tile=64, max_chunks=64),
             TRIS)


def gate_tri_any():
    from grace_tpu.trace.pallas_tri import pallas_trace_tri

    _compile(lambda t: pallas_trace_tri(_rays(), t, tile=64, max_chunks=64,
                                        mode="any"), TRIS)


def gate_splat_deg10():
    from grace_tpu.trace.splat import render_ortho_splat

    _compile(lambda s: render_ortho_splat(s, CAM, LOOK, UP, VEXT, LENGTH,
                                          128, 64, tile_w=32, tile_h=128,
                                          chunk=128), SPHERES)


def gate_splat_deg8_banded():
    from grace_tpu.trace.splat import bucket_prims_ortho, splat_image

    def fn(s):
        b = bucket_prims_ortho(s, CAM, LOOK, UP, VEXT, LENGTH, 128, 64,
                               tile_w=32, tile_h=128, chunk=128, band=32)
        return splat_image(b, tile_w=32, tile_h=128, basis="deg8")

    _compile(fn, SPHERES)


def gate_splat_trainer_fwd_bwd():
    from grace_tpu.trace.splat_grad import OrthoCamera, make_splat_trainer

    cam = OrthoCamera(CAM, LOOK, UP, VEXT, LENGTH, 128, 64)
    render = make_splat_trainer(cam, tile_w=32, tile_h=128)

    def step(s, w):
        def loss(s, w):
            return jnp.sum(render(s, w) ** 2)

        return jax.value_and_grad(loss, argnums=(0, 1))(s, w)

    _compile(step, SPHERES, WEIGHTS)


def gate_fused_renderer_fwd_bwd():
    from grace_tpu.trace.pallas_render import make_fused_renderer

    renderer = make_fused_renderer(tile=128, max_chunks=64,
                                   max_tiles_per_seg=128)

    def step(s, w):
        def loss(s, w):
            return jnp.sum(renderer(_rays(), s, w) ** 2)

        return jax.value_and_grad(loss, argnums=(0, 1))(s, w)

    _compile(step, SPHERES, WEIGHTS)


GATES = [
    ("trace/bitmask-resident", gate_trace_bitmask_resident),
    ("trace/bitmask-stream", gate_trace_bitmask_stream),
    ("trace/bitmask-hitcount", gate_trace_hitcount),
    ("trace/quarter", gate_trace_quarter),
    ("trace/quarter-stream", gate_trace_quarter_stream),
    ("trace/quarter-fastint", gate_trace_quarter_fastint),
    ("trace/qlist", gate_trace_qlist),
    ("trace/qlist-fastint", gate_trace_qlist_fastint),
    ("trace/list-resident", gate_trace_list_resident),
    ("trace/list-stream", gate_trace_list_stream),
    ("trace/subtiled", gate_trace_subtiled),
    ("trace/xla-broadphase", gate_trace_xla_broadphase),
    ("records/pick", gate_records_pick),
    ("records/network", gate_records_network),
    ("records/mxu-group", gate_records_mxu_group),
    ("records/quarter", gate_records_quarter),
    ("records/stream", gate_records_stream),
    ("tri/closest", gate_tri_closest),
    ("tri/any", gate_tri_any),
    ("splat/deg10", gate_splat_deg10),
    ("splat/deg8-banded", gate_splat_deg8_banded),
    ("splat/trainer-fwd-bwd", gate_splat_trainer_fwd_bwd),
    ("renderer/fused-fwd-bwd", gate_fused_renderer_fwd_bwd),
]


def main(argv):
    only = None
    if "--only" in argv:
        only = argv[argv.index("--only") + 1]
    backend = jax.devices()[0].platform
    print(f"lowering gate: backend={backend} "
          f"({len(GATES)} variants{f', filter={only!r}' if only else ''})")
    if backend not in ("tpu", "axon"):
        print("WARNING: not a TPU backend — Mosaic verification NOT "
              "exercised; this run only checks harness plumbing.")
    failures = []
    for name, fn in GATES:
        if only and only not in name:
            continue
        t0 = time.perf_counter()
        try:
            fn()
            print(f"  ok    {name:28s} {time.perf_counter() - t0:6.1f}s")
        except Exception:
            failures.append(name)
            print(f"  FAIL  {name}")
            traceback.print_exc(limit=4)
    if failures:
        print(f"FAILED: {failures}")
        return 1
    print("all kernels lowered through Mosaic")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

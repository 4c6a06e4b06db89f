"""grace_tpu — a TPU-native SPH/BVH ray-tracing framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the GRACE
CUDA library (Morton keys, LBVH construction, generic BVH traversal, SPH
cubic-spline line integration, ray generation, segmented post-processing),
extended with differentiable rendering and multi-chip sharding.

See COMPONENTS.md for the reference-component -> module map.
"""

from grace_tpu.core.types import Octants, Rays, RaySortType, make_spheres
from grace_tpu.core.tree import Tree
from grace_tpu.build.sph import (
    albvh_sph,
    build_primitive_tree,
    build_sph_tree,
    euclidean_deltas_sph,
    morton_keys_sph,
    sort_by_morton,
    surface_area_deltas_sph,
    xor_deltas_sph,
)
from grace_tpu.trace.sph import (
    SphTraceResult,
    trace_cumulative_sph,
    trace_hitcounts_sph,
    trace_sph,
    trace_with_sentinels_sph,
)

from grace_tpu.rays import gen as ray_gen
from grace_tpu.rays import statistics as ray_statistics
from grace_tpu.rays import hypothesis as ray_hypothesis
from grace_tpu.trace.pallas_kernel import pallas_trace_sph
from grace_tpu.trace.pallas_records import (
    RecordTraceResult,
    pallas_trace_sph_records,
    sort_records_by_distance,
)
from grace_tpu.trace.render import render_column_density
from grace_tpu.trace.splat import render_ortho_splat
from grace_tpu.trace.splat_grad import (
    OrthoCamera,
    make_splat_trainer,
    splat_backward_sortfree,
    splat_forward_sortfree,
)
from grace_tpu.trace.pallas_render import make_fused_renderer
from grace_tpu.io.checkpoint import load_scene, save_scene

__version__ = "0.1.0"

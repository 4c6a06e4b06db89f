"""Kernel/launch configuration constants (analog of ref cuda/kernel_config.h:5-13).

The reference hard-codes CUDA launch geometry (512/256 threads per block,
MAX_BLOCKS=112 for Kepler, WARP_SIZE=32, STACK_SIZE=64 ints per warp). The
TPU-native equivalents are tile shapes and traversal-stack depths chosen for
the VPU's (8, 128) registers and VMEM capacity.
"""

# Number of rays processed together by one Pallas traversal tile. The VPU is
# 8x128 lanes; a (8, 128)-shaped ray tile keeps every AABB test a full-width
# vector op (TPU analog of the reference's one-warp ray packet,
# ref: bintree_trace.cuh:96-102).
TRACE_TILE_RAYS = 256

# Depth of the shared per-tile traversal stack (node indices). The reference
# uses 64 ints per warp (ref: kernel_config.h:13); tile-shared stacks see the
# union of the tile's traversal so we keep generous headroom.
TRACE_STACK_SIZE = 512

# Default maximum primitives per leaf, matching the value used throughout the
# reference test suite (max_per_leaf = 32, e.g. profile_tree.cu:30).
DEFAULT_MAX_PER_LEAF = 32

# Default per-ray traversal stack depth for the vectorized XLA engine.
VECTOR_STACK_SIZE = 64

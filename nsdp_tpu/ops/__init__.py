"""TPU-native geometry primitives.

Replaces the reference's CUDA extension ``pointnet2_ops_lib`` (see
``pointnet2_ops/_ext-src/src/*.cu`` in the reference) with pure-JAX/XLA and
Pallas implementations.  All ops are fixed-shape, batched, differentiable where
meaningful, and compile into the surrounding XLA graph.
"""

from nsdp_tpu.ops.fps import furthest_point_sample, furthest_point_sample_xla
from nsdp_tpu.ops.knn import knn, knn_xla, square_distance
from nsdp_tpu.ops.gather import index_points, gather_operation, grouping_operation
from nsdp_tpu.ops.geometry import (
    ball_query,
    fibonacci_sphere,
    three_nn,
    three_interpolate,
)

__all__ = [
    "furthest_point_sample",
    "furthest_point_sample_xla",
    "knn",
    "knn_xla",
    "square_distance",
    "index_points",
    "gather_operation",
    "grouping_operation",
    "ball_query",
    "fibonacci_sphere",
    "three_nn",
    "three_interpolate",
]

# Pallas kernels (imported lazily by the dispatchers above; exposed for
# direct use):
#   nsdp_tpu.ops.fps_pallas.furthest_point_sample_pallas
#   nsdp_tpu.ops.knn_pallas.knn_pallas
#   nsdp_tpu.ops.attention_pallas.{fused_vector_attention,
#       knn_vector_attention, knn_vector_attention_proj}

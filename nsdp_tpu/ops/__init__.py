"""TPU-native geometry primitives.

Replaces the reference's CUDA extension ``pointnet2_ops_lib`` (see
``pointnet2_ops/_ext-src/src/*.cu`` in the reference) with pure-JAX/XLA and
Pallas implementations.  All ops are fixed-shape, batched, differentiable where
meaningful, and compile into the surrounding XLA graph.
"""

from nsdp_tpu.ops.fps import furthest_point_sample
from nsdp_tpu.ops.knn import knn, square_distance
from nsdp_tpu.ops.gather import index_points, gather_operation, grouping_operation
from nsdp_tpu.ops.geometry import ball_query, three_nn, three_interpolate

__all__ = [
    "furthest_point_sample",
    "knn",
    "square_distance",
    "index_points",
    "gather_operation",
    "grouping_operation",
    "ball_query",
    "three_nn",
    "three_interpolate",
]

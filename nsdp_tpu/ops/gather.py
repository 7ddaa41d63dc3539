"""Batched gather primitives.

The reference implements these as CUDA kernels with hand-written atomicAdd
backward passes (``sampling_gpu.cu:8-57``, ``group_points_gpu.cu``); on TPU a
``take_along_axis`` gather is a single XLA op with autodiff for free.
"""

import jax
import jax.numpy as jnp


def index_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather point features by index, API-compatible with the reference's
    ``index_points`` (``model/utils.py:58-70``).

    Args:
      points: (B, N, C).
      idx: (B, S) or (B, S, K) integer indices into the N axis.

    Returns:
      (B, S, C) or (B, S, K, C).
    """
    B = points.shape[0]
    C = points.shape[-1]
    out_shape = idx.shape + (C,)
    flat_idx = idx.reshape(B, -1)
    out = jnp.take_along_axis(points, flat_idx[..., None], axis=1)
    return out.reshape(out_shape)


def gather_operation(features: jax.Array, idx: jax.Array) -> jax.Array:
    """Channel-first gather, (B, C, N) x (B, m) -> (B, C, m).

    Mirrors ``pointnet2_utils.gather_operation`` (reference
    ``pointnet2_ops/pointnet2_utils.py``).
    """
    return jnp.take_along_axis(features, idx[:, None, :], axis=2)


def grouping_operation(features: jax.Array, idx: jax.Array) -> jax.Array:
    """Neighbourhood gather, (B, C, N) x (B, np, ns) -> (B, C, np, ns).

    Mirrors ``pointnet2_utils.grouping_operation``.
    """
    B, C, N = features.shape
    np_, ns = idx.shape[1], idx.shape[2]
    flat = jnp.take_along_axis(features, idx.reshape(B, 1, -1), axis=2)
    return flat.reshape(B, C, np_, ns)

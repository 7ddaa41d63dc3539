"""Radius neighbourhoods and 3-NN feature interpolation.

TPU-native equivalents of the reference CUDA kernels ``ball_query_gpu.cu``,
``interpolate_gpu.cu`` (shipped by the reference but unused on its model path;
provided here for full pointnet2 API parity).
"""

from functools import partial

import jax
import jax.numpy as jnp

from nsdp_tpu.ops.knn import square_distance


@partial(jax.jit, static_argnames=("nsample",))
def ball_query(
    radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array
) -> jax.Array:
    """Radius neighbourhood query with first-hit padding.

    Matches the reference kernel semantics (``ball_query_gpu.cu:9-54``): for
    each centre, the first ``nsample`` points (in index order) with squared
    distance < radius^2 are returned; rows with fewer hits are padded with the
    first hit; rows with no hits are all zeros.

    Args:
      radius: neighbourhood radius.
      nsample: max neighbours (static).
      xyz: (B, N, 3) points.
      new_xyz: (B, S, 3) query centres.

    Returns:
      (B, S, nsample) int32 indices.
    """
    B, N, _ = xyz.shape
    d2 = square_distance(new_xyz, xyz)  # (B, S, N)
    mask = d2 < radius * radius
    # Rank hits by ascending index: key N-i is larger for earlier indices, 0
    # for non-hits, so top_k returns the first nsample hits in index order.
    iota = jnp.arange(N, dtype=jnp.int32)
    key = jnp.where(mask, N - iota, 0)
    if nsample > N:  # fewer points than requested slots: pad the key axis
        key = jnp.pad(key, ((0, 0), (0, 0), (0, nsample - N)))
    topk_key, idx = jax.lax.top_k(key, nsample)
    has_hit_slot = topk_key > 0
    first = idx[..., 0:1]
    out = jnp.where(has_hit_slot, idx, first)
    any_hit = jnp.any(mask, axis=-1, keepdims=True)
    return jnp.where(any_hit, out, 0).astype(jnp.int32)


@jax.jit
def three_nn(unknown: jax.Array, known: jax.Array):
    """Three nearest neighbours of each unknown point among known points.

    Equivalent of ``interpolate_gpu.cu:9-58``.

    Args:
      unknown: (B, n, 3).
      known: (B, m, 3).

    Returns:
      (dist, idx): (B, n, 3) euclidean distances and int32 indices.
    """
    d2 = square_distance(unknown, known)
    neg, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


@jax.jit
def three_interpolate(
    features: jax.Array, idx: jax.Array, weight: jax.Array
) -> jax.Array:
    """Weighted interpolation of features from 3 neighbours.

    Equivalent of ``interpolate_gpu.cu:59-154`` (autodiff replaces the
    hand-written atomicAdd backward).

    Args:
      features: (B, C, m).
      idx: (B, n, 3) int indices into m.
      weight: (B, n, 3) interpolation weights.

    Returns:
      (B, C, n).
    """
    B, C, m = features.shape
    n = idx.shape[1]
    flat = jnp.take_along_axis(features, idx.reshape(B, 1, -1), axis=2)
    flat = flat.reshape(B, C, n, 3)
    return jnp.sum(flat * weight[:, None, :, :], axis=-1)


def interpolation_weights(dist: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Inverse-distance weights used with :func:`three_interpolate`."""
    recip = 1.0 / (dist + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)


def fibonacci_sphere(samples: int = 1) -> jnp.ndarray:
    """``samples`` points evenly distributed on the unit sphere (golden-angle
    spiral; reference ``model/utils.py:13-36``)."""
    import numpy as np

    i = np.arange(samples, dtype=np.float64)
    phi = np.pi * (3.0 - np.sqrt(5.0))
    y = 1.0 - (i / max(samples - 1, 1)) * 2.0
    radius = np.sqrt(np.maximum(1.0 - y * y, 0.0))
    theta = phi * i
    return jnp.asarray(
        np.stack([np.cos(theta) * radius, y, np.sin(theta) * radius], axis=1),
        dtype=jnp.float32,
    )

"""Furthest-point sampling (FPS) on TPU.

Semantics match the reference CUDA kernel
(``pointnet2_ops/_ext-src/src/sampling_gpu.cu:69-229`` in the reference repo):

* the first selected index is always 0 (``idxs[0] = 0`` unconditionally);
* points with squared norm <= 1e-3 are never selected and never update the
  running min-distance (the kernel ``continue``s past them);
* the running min-distance buffer is initialised to 1e10
  (``sampling.cpp:66-87``);
* each step selects the argmax of the running min-distance (ties resolve to
  the lowest index here; the CUDA tree reduction has a slightly different —
  effectively arbitrary — tie order, so exact tie parity is not guaranteed).

FPS is inherently sequential over the ``npoint`` output samples, so it is
expressed as a ``lax.fori_loop`` whose body is a fully-vectorised
distance-update + masked argmax over all N input points: O(npoint * N) VPU
work, batched over B.  The per-step working set (B x N floats) lives in
registers/VMEM after XLA fusion; no N^2 buffer is ever materialised.
"""

from functools import partial

import jax
import jax.numpy as jnp


def furthest_point_sample(xyz: jax.Array, npoint: int) -> jax.Array:
    """Iterative furthest-point sampling.

    Dispatches to the VMEM-resident Pallas kernel on TPU
    (:mod:`nsdp_tpu.ops.fps_pallas`) and to the XLA ``fori_loop``
    implementation elsewhere; both have identical semantics.

    Args:
      xyz: (B, N, 3) float point coordinates.
      npoint: number of samples to draw (static).

    Returns:
      (B, npoint) int32 indices into the N axis.
    """
    if jax.default_backend() in ("tpu", "axon"):
        from nsdp_tpu.ops.fps_pallas import furthest_point_sample_pallas

        return furthest_point_sample_pallas(xyz, npoint)
    return furthest_point_sample_xla(xyz, npoint)


@partial(jax.jit, static_argnames=("npoint",))
def furthest_point_sample_xla(xyz: jax.Array, npoint: int) -> jax.Array:
    """Reference XLA implementation (any backend)."""
    if xyz.ndim != 3 or xyz.shape[-1] != 3:
        raise ValueError(f"expected (B, N, 3) input, got {xyz.shape}")
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)

    # Points at (near) the origin are excluded from selection, mirroring the
    # reference kernel's `mag <= 1e-3` skip (a padding convention).
    valid = jnp.sum(xyz * xyz, axis=-1) > 1e-3  # (B, N)

    def body(i, carry):
        min_dist, idxs, last = carry
        # Distance of every point to the most recently selected point.
        last_xyz = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum((xyz - last_xyz) ** 2, axis=-1)  # (B, N)
        min_dist = jnp.where(valid, jnp.minimum(min_dist, d), min_dist)
        cand = jnp.where(valid, min_dist, -jnp.inf)
        nxt = jnp.argmax(cand, axis=-1).astype(jnp.int32)  # (B,)
        idxs = jax.lax.dynamic_update_slice_in_dim(
            idxs, nxt[:, None], i, axis=1
        )
        return min_dist, idxs, nxt

    init_idxs = jnp.zeros((B, npoint), dtype=jnp.int32)
    init_last = jnp.zeros((B,), dtype=jnp.int32)  # idxs[0] = 0, unconditionally
    init_dist = jnp.full((B, N), 1e10, dtype=jnp.float32)

    _, idxs, _ = jax.lax.fori_loop(
        1, npoint, body, (init_dist, init_idxs, init_last)
    )
    return idxs

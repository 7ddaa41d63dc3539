"""Pallas TPU kernel for fused k-nearest-neighbour search.

Fuses distance computation and k-smallest extraction per query tile entirely
in VMEM: a (TILE, Mpad) distance block is built coordinate-wise in exact
float32 (no low-precision matmul identity, no N x M HBM buffer) and reduced
by k unrolled min-extraction passes (k is small: 7/10/16 in this model).
Ties resolve to the lowest index, matching ``lax.top_k`` and the reference's
stable argsort.

Padding contract: padded point lanes get +inf distance, padded query rows
produce garbage rows that the caller slices off.  An optional ``kv_mask``
excludes arbitrary *valid-shaped* points from selection (static-shape
partial point clouds): the mask is folded into the unused 4th coordinate row
of the transposed points layout as an additive distance penalty, so the
kernel pays one broadcast add and no extra input.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _knn_kernel(q_ref, p_ref, out_ref, *, k: int, m_valid: int,
                return_dist: bool, dist_ref=None):
    # q_ref: (1, 8, T) query tile coords (rows 0-2), p_ref: (1, 8, Mpad)
    q = q_ref[0]
    p = p_ref[0]
    T = q.shape[-1]
    M = p.shape[-1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (T, M), 1)
    # Row 3 of the points layout is the kv_mask distance penalty (zero when
    # no mask was given), added before selection.
    d2 = jnp.broadcast_to(p[3, :].reshape(1, M), (T, M))
    for c in range(3):
        qc = q[c, :].reshape(T, 1)
        pc = p[c, :].reshape(1, M)
        diff = qc - pc
        d2 = d2 + diff * diff
    d2 = jnp.where(lane < m_valid, d2, jnp.inf)

    big = jnp.int32(M)
    idx_cols = []
    dist_cols = []
    for j in range(k):
        m = jnp.min(d2, axis=-1, keepdims=True)  # (T, 1)
        idx_j = jnp.min(
            jnp.where(d2 == m, lane, big), axis=-1, keepdims=True
        )  # (T, 1) lowest-index tie break
        idx_cols.append(idx_j)
        if return_dist:
            dist_cols.append(m)
        d2 = jnp.where(lane == idx_j, jnp.inf, d2)

    idx = jnp.concatenate(idx_cols, axis=-1)  # (T, k)
    kpad = out_ref.shape[-1]
    out_ref[0] = jnp.pad(idx, ((0, 0), (0, kpad - k)))
    if return_dist:
        d = jnp.concatenate(dist_cols, axis=-1)
        dist_ref[0] = jnp.pad(d, ((0, 0), (0, kpad - k)))


@partial(
    jax.jit,
    static_argnames=("k", "tile", "return_dist", "interpret"),
)
def knn_pallas(
    query: jax.Array,
    points: jax.Array,
    k: int,
    tile: int = 512,
    return_dist: bool = False,
    interpret: bool = False,
    kv_mask: jax.Array = None,
):
    """Fused kNN: (B, Nq, 3) x (B, M, 3) -> (B, Nq, k) int32 indices.

    Drop-in equivalent of :func:`nsdp_tpu.ops.knn.knn` (ordered by increasing
    distance, ties to lowest index), with the distance block kept in VMEM.
    ``kv_mask`` (B, M), nonzero = selectable, excludes points from the
    neighbourhoods (see module docstring).
    """
    B, Nq, C = query.shape
    M = points.shape[1]
    if C != 3:
        raise ValueError("knn_pallas expects 3-D coordinates")
    if k > M:
        raise ValueError(f"k={k} > number of points {M}")

    tile = min(tile, _round_up(Nq, 128))
    nq_pad = _round_up(Nq, tile)
    m_pad = _round_up(M, 128)
    kpad = _round_up(k, 128)

    qt = jnp.swapaxes(query.astype(jnp.float32), 1, 2)  # (B, 3, Nq)
    qt = jnp.pad(qt, ((0, 0), (0, 5), (0, nq_pad - Nq)))
    pt = jnp.swapaxes(points.astype(jnp.float32), 1, 2)
    pt = jnp.pad(pt, ((0, 0), (0, 5), (0, m_pad - M)))
    if kv_mask is not None:
        from nsdp_tpu.ops.knn import mask_penalty

        pt = pt.at[:, 3, :].set(mask_penalty(kv_mask, m_pad))

    n_tiles = nq_pad // tile
    grid = (B, n_tiles)
    out_shapes = [jax.ShapeDtypeStruct((B, nq_pad, kpad), jnp.int32)]
    out_specs = [
        pl.BlockSpec((1, tile, kpad), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM)
    ]
    if return_dist:
        out_shapes.append(jax.ShapeDtypeStruct((B, nq_pad, kpad), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, tile, kpad), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM)
        )

    kernel = partial(_knn_kernel, k=k, m_valid=M, return_dist=return_dist)
    if return_dist:
        def kernel2(q_ref, p_ref, out_ref, dist_ref):
            _knn_kernel(q_ref, p_ref, out_ref, k=k, m_valid=M,
                        return_dist=True, dist_ref=dist_ref)
        kernel = kernel2
    else:
        def kernel1(q_ref, p_ref, out_ref):
            _knn_kernel(q_ref, p_ref, out_ref, k=k, m_valid=M,
                        return_dist=False)
        kernel = kernel1

    results = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes) if return_dist else out_shapes[0],
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, tile), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, m_pad), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs) if return_dist else out_specs[0],
        interpret=interpret,
    )(qt, pt)

    if return_dist:
        idx, dist = results
        return idx[:, :Nq, :k], dist[:, :Nq, :k]
    return results[:, :Nq, :k]

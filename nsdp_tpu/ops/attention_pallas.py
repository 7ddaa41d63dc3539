"""Generic fused local vector-attention Pallas kernel.

One kernel covers every kNN-attention pattern in the encoder (reference
``model/encoder/blocks.py``): local self-attention (queries == kv set),
``pos_only`` attention (no feature projections; logits and values are the
position encodings), and the set-abstraction cross-attention (FPS centres
attending to the full cloud).  Per query tile, entirely in VMEM:

  1. exact-f32 squared distances to every kv point,
  2. k-pass min-extraction kNN (ties -> lowest index),
  3. one-hot MXU gathers of kv positions / keys / values per slot,
  4. the fc_delta position MLP and fc_gamma attention MLP,
  5. per-channel streaming softmax over the k slots, weighted sum.

The (Nq, k, d) neighbourhood tensors that make the XLA path bandwidth-bound
never exist.  Residual adds and BatchNorm stay outside (one elementwise
pass).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mlp2(x, w0, b0, w1, b1):
    h = jnp.maximum(jnp.dot(x, w0, preferred_element_type=_F32) + b0, 0.0)
    return jnp.dot(h, w1, preferred_element_type=_F32) + b1


def _attn_kernel(
    xyzq_ref, kvt_ref, kvxyz_ref, q_ref, k_ref, v_ref,
    dw0_ref, db0_ref, dw1_ref, db1_ref,
    gw0_ref, gb0_ref, gw1_ref, gb1_ref,
    out_ref,
    *, k: int, m_valid: int, pos_only: bool,
):
    xyzq = xyzq_ref[0]  # (T, 8)
    kvt = kvt_ref[0]  # (8, Mpad) transposed kv coords
    kvxyz = kvxyz_ref[0]  # (Mpad, 8)
    T = xyzq.shape[0]
    M = kvt.shape[-1]

    dw0, db0 = dw0_ref[0], db0_ref[0]
    dw1, db1 = dw1_ref[0], db1_ref[0]
    gw0, gb0 = gw0_ref[0], gb0_ref[0]
    gw1, gb1 = gw1_ref[0], gb1_ref[0]
    D = dw1.shape[-1]

    if not pos_only:
        q = q_ref[0]  # (T, D)
        K_a = k_ref[0]  # (Mpad, D)
        V_a = v_ref[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (T, M), 1)
    d2 = jnp.zeros((T, M), _F32)
    for c in range(3):
        diff = xyzq[:, c : c + 1] - kvt[c, :].reshape(1, M)
        d2 = d2 + diff * diff
    d2 = jnp.where(lane < m_valid, d2, jnp.inf)

    m_run = jnp.full((T, D), -jnp.inf, _F32)
    s_run = jnp.zeros((T, D), _F32)
    acc = jnp.zeros((T, D), _F32)
    big = jnp.int32(M)

    for _ in range(k):
        m = jnp.min(d2, axis=-1, keepdims=True)
        idx = jnp.min(jnp.where(d2 == m, lane, big), axis=-1, keepdims=True)
        d2 = jnp.where(lane == idx, jnp.inf, d2)
        onehot = (lane == idx).astype(_F32)

        xyz_n = jnp.dot(onehot, kvxyz, preferred_element_type=_F32)
        pos = _mlp2(xyzq - xyz_n, dw0, db0, dw1, db1)  # (T, D)
        if pos_only:
            logits = _mlp2(pos, gw0, gb0, gw1, gb1)
            value = pos
        else:
            k_n = jnp.dot(onehot, K_a, preferred_element_type=_F32)
            v_n = jnp.dot(onehot, V_a, preferred_element_type=_F32)
            logits = _mlp2(q - k_n + pos, gw0, gb0, gw1, gb1)
            value = v_n + pos

        m_new = jnp.maximum(m_run, logits)
        scale = jnp.exp(m_run - m_new)
        e = jnp.exp(logits - m_new)
        m_run, s_run = m_new, s_run * scale + e
        acc = acc * scale + e * value

    out_ref[0] = acc / s_run


@partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def fused_vector_attention(
    xyz_q,
    kv_xyz,
    q_feats: Optional[jax.Array],
    K_a: Optional[jax.Array],
    V_a: Optional[jax.Array],
    delta_w0, delta_b0, delta_w1, delta_b1,
    gamma_w0, gamma_b0, gamma_w1, gamma_b1,
    k: int,
    tile: int = 256,
    interpret: bool = False,
):
    """Fused kNN vector attention (pre-residual, pre-norm).

    Args:
      xyz_q: (B, Nq, 3) query positions.
      kv_xyz: (B, M, 3) key/value positions (the kNN target set).
      q_feats: (B, Nq, D) projected query features, or None for pos_only.
      K_a / V_a: (B, M, D) projected key/value features (None for pos_only).
      delta_* / gamma_*: fc_delta / fc_gamma weights.
      k: neighbours per query (includes self when xyz_q == kv_xyz).

    Returns:
      (B, Nq, D) float32.
    """
    B, Nq, _ = xyz_q.shape
    M = kv_xyz.shape[1]
    D = delta_w1.shape[-1]
    k = min(k, M)
    pos_only = q_feats is None

    tile = min(tile, _round_up(Nq, 128))
    q_pad = _round_up(Nq, tile)
    m_pad = _round_up(M, 128)
    n_tiles = q_pad // tile

    xyzq = jnp.pad(xyz_q.astype(_F32), ((0, 0), (0, q_pad - Nq), (0, 5)))
    kvt = jnp.pad(
        jnp.swapaxes(kv_xyz.astype(_F32), 1, 2),
        ((0, 0), (0, 5), (0, m_pad - M)),
    )
    kvxyz = jnp.pad(kv_xyz.astype(_F32), ((0, 0), (0, m_pad - M), (0, 5)))
    if pos_only:
        qf = jnp.zeros((B, q_pad, 1), _F32)
        K_p = jnp.zeros((B, m_pad, 1), _F32)
        V_p = jnp.zeros((B, m_pad, 1), _F32)
        feat_d = 1
    else:
        qf = jnp.pad(q_feats.astype(_F32), ((0, 0), (0, q_pad - Nq), (0, 0)))
        K_p = jnp.pad(K_a.astype(_F32), ((0, 0), (0, m_pad - M), (0, 0)))
        V_p = jnp.pad(V_a.astype(_F32), ((0, 0), (0, m_pad - M), (0, 0)))
        feat_d = D

    dw0 = jnp.pad(delta_w0.astype(_F32), ((0, 8 - delta_w0.shape[0]), (0, 0)))[None]
    dw1 = delta_w1.astype(_F32)[None]
    gw0 = gamma_w0.astype(_F32)[None]
    gw1 = gamma_w1.astype(_F32)[None]
    db0 = delta_b0.astype(_F32)[None, None]
    db1 = delta_b1.astype(_F32)[None, None]
    gb0 = gamma_b0.astype(_F32)[None, None]
    gb1 = gamma_b1.astype(_F32)[None, None]

    const = lambda shape: pl.BlockSpec(
        shape, lambda b, t: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    per_b = lambda shape: pl.BlockSpec(
        shape, lambda b, t: (b,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM,
    )

    out = pl.pallas_call(
        partial(_attn_kernel, k=k, m_valid=M, pos_only=pos_only),
        out_shape=jax.ShapeDtypeStruct((B, q_pad, D), _F32),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, 8), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            per_b((1, 8, m_pad)),
            per_b((1, m_pad, 8)),
            pl.BlockSpec((1, tile, feat_d), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            per_b((1, m_pad, feat_d)),
            per_b((1, m_pad, feat_d)),
            const((1, 8, D)),
            const((1, 1, D)),
            const((1, D, D)),
            const((1, 1, D)),
            const((1, D, D)),
            const((1, 1, D)),
            const((1, D, D)),
            const((1, 1, D)),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, D), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xyzq, kvt, kvxyz, qf, K_p, V_p,
      dw0, db0, dw1, db1, gw0, gb0, gw1, gb1)
    return out[:, :Nq]

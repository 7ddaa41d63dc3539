"""Fused fast path for the cross-attention neural-field decoder.

The XLA decoder materialises (B, Q, k+1, dim) neighbourhood tensors in HBM —
at Q=65k and dim=200 that is ~0.4 GB per intermediate and the decode is
bandwidth-bound.  This module provides:

* :func:`fused_cross_attention` — the CrossTransformerBlock core on the
  generic global-token Pallas kernel: per query tile entirely in VMEM, the
  kNN over the anchors, one-hot MXU gathers, the position-encoding and
  attention MLPs, and the per-channel softmax over neighbours + the global
  token.  Only (T, dim) tensors ever exist; nothing per-neighbour touches
  HBM.
* :func:`decode_fast` — the full CrossTransformerDecoder forward
  (fused attention + conditioned ResNet-FC stack) as a function of the raw
  flax parameter subtree, numerically equivalent to
  ``CrossTransformerDecoder.apply`` for 2-D global latents.

Used by the inference/serving path (``nsdp_tpu.models.fast_predict``).
"""

import jax
import jax.numpy as jnp


def fused_cross_attention(
    xyz_q, q_glob, k_glob, v_glob, anchors, K_a, V_a,
    delta_w0, delta_b0, delta_w1, delta_b1,
    gamma_w0, gamma_b0, gamma_w1, gamma_b1,
    k: int = 7,
    tile: int = 256,
    interpret: bool = None,
):
    """Fused CrossTransformerBlock core (global-latent query + k nearest
    anchors + global token slot).

    Thin wrapper over the generic global-token kernel
    (:func:`nsdp_tpu.ops.attention_pallas.fused_vector_attention`): the
    query features are the broadcast global-latent projection.
    """
    from nsdp_tpu.ops.attention_pallas import fused_vector_attention

    B, Q, _ = xyz_q.shape
    qf = jnp.broadcast_to(q_glob[:, None, :], (B, Q, q_glob.shape[-1]))
    return fused_vector_attention(
        xyz_q, anchors, qf, K_a, V_a,
        delta_w0, delta_b0, delta_w1, delta_b1,
        gamma_w0, gamma_b0, gamma_w1, gamma_b1,
        k=k, tile=tile, interpret=interpret,
        k_glob=k_glob, v_glob=v_glob,
        # inference-only cross attention: no gradients, so the exact-zero
        # self-delta property is not needed even where a surface-sample
        # query coincides with an anchor — skip the per-slot roll
        # reconstruction (see fused_vector_attention's exact_self doc)
        exact_self=False,
    )


# ---------------------------------------------------------------------------
# Full decoder forward from raw params
# ---------------------------------------------------------------------------

def _dense(params, x):
    return x @ params["kernel"] + params["bias"]


def decode_fast(
    params,
    xyz_q,
    encoding,
    nneigh: int = 7,
    tile: int = None,
    interpret: bool = None,
    compute_dtype=None,
):
    """CrossTransformerDecoder forward with the fused attention kernel.

    Args:
      params: the decoder's flax param subtree (``.../decoder``).
      xyz_q: (B, Q, 3) queries.
      encoding: {'z': (B, dim_inp), 'anchors', 'anchor_feats'} — 2-D global
        latent (the standard encoder output).

    Returns:
      (B, Q, out_dim).
    """
    ct = params["ct1"]
    z = encoding["z"]
    anchors = encoding["anchors"]
    feats = encoding["anchor_feats"]

    q_glob = z @ ct["w_qs"]["kernel"]
    k_glob = z @ ct["w_k_global"]["kernel"]
    v_glob = z @ ct["w_v_global"]["kernel"]
    K_a = feats @ ct["w_ks"]["kernel"]
    V_a = feats @ ct["w_vs"]["kernel"]

    from nsdp_tpu.ops.attention_pallas import fused_vector_attention

    if tile is None:
        # tile 512 is the measured optimum for the exact_self=False cross
        # kernel at the standard 100-anchor set (1.998 vs 2.295 ms @256,
        # Q=65536 f32, round-4 sweep); large anchor sets fall back to 256
        # to bound the k-unrolled (tile, M) one-hot VMEM (cf. the same
        # guard in nn/blocks.py's training decoder site)
        tile = 512 if anchors.shape[1] <= 256 else 256

    B, Q, _ = xyz_q.shape
    qf = jnp.broadcast_to(q_glob[:, None, :], (B, Q, q_glob.shape[-1]))
    lat = fused_vector_attention(
        xyz_q, anchors, qf, K_a, V_a,
        ct["fc_delta"]["fc0"]["kernel"], ct["fc_delta"]["fc0"]["bias"],
        ct["fc_delta"]["fc1"]["kernel"], ct["fc_delta"]["fc1"]["bias"],
        ct["fc_gamma"]["fc0"]["kernel"], ct["fc_gamma"]["fc0"]["bias"],
        ct["fc_gamma"]["fc1"]["kernel"], ct["fc_gamma"]["fc1"]["bias"],
        k=nneigh, tile=tile, interpret=interpret,
        k_glob=k_glob, v_glob=v_glob, compute_dtype=compute_dtype,
        exact_self=False,  # inference-only (see fused_cross_attention)
    )

    net = _dense(params["init_enc"], lat)
    i = 0
    while f"blocks_{i}" in params:
        net = net + _dense(params[f"fc_c_{i}"], lat)
        blk = params[f"blocks_{i}"]
        h = _dense(blk["fc_0"], jax.nn.relu(net))
        dx = _dense(blk["fc_1"], jax.nn.relu(h))
        if "shortcut" in blk:
            net = net @ blk["shortcut"]["kernel"] + dx
        else:
            net = net + dx
        i += 1
    return _dense(params["fc_out"], jax.nn.relu(net))

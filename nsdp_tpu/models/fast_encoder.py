"""Raw-param fast path for the PointTransformerEncoder (eval mode).

Mirrors ``nsdp_tpu.models.encoders.PointTransformerEncoder`` exactly but
evaluates from the raw parameter/batch-stat trees, routing every kNN
vector-attention through the fused Pallas kernel
(:mod:`nsdp_tpu.ops.attention_pallas`) and FPS through the VMEM-resident
kernel.  The tiny full self-attention over the final anchors (100 points)
stays in XLA.  Inference only (BatchNorm in running-average mode).
"""

import jax
import jax.numpy as jnp

from nsdp_tpu.ops import furthest_point_sample, index_points
from nsdp_tpu.ops.attention_pallas import (
    fused_vector_attention,
    kv_proj_profitable,
)


def _dense(p, x):
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _bn(p, s, x, eps=1e-5):
    inner_p, inner_s = p["bn"], s["bn"]
    inv = jax.lax.rsqrt(inner_s["var"] + eps)
    return (x - inner_s["mean"]) * inv * inner_p["scale"] + inner_p["bias"]


def _mlp2(p, x):
    return _dense(p["fc1"], jax.nn.relu(_dense(p["fc0"], x)))


def _mlp_weights(p):
    return (
        p["fc0"]["kernel"], p["fc0"]["bias"],
        p["fc1"]["kernel"], p["fc1"]["bias"],
    )


def _transformer_block(p, s, xyz, feats, k, pos_only, interpret,
                       compute_dtype=None, kv_mask=None):
    """TransformerBlock (local kNN) with fused attention + residual + BN."""
    if pos_only:
        res = fused_vector_attention(
            xyz, xyz, None, None, None,
            *_mlp_weights(p["fc_delta"]), *_mlp_weights(p["fc_gamma"]),
            k=k, interpret=interpret, compute_dtype=compute_dtype,
            kv_mask=kv_mask,
        )
    else:
        wk = p["w_ks"]["kernel"]
        if kv_proj_profitable(xyz.shape[1], feats.shape[-1], wk.shape[-1]):
            # raw-feature gather + in-kernel K/V projection (see
            # attention_pallas.knn_vector_attention_proj)
            res = fused_vector_attention(
                xyz, xyz,
                feats @ p["w_qs"]["kernel"], None, None,
                *_mlp_weights(p["fc_delta"]), *_mlp_weights(p["fc_gamma"]),
                k=k, interpret=interpret, compute_dtype=compute_dtype,
                kv_mask=kv_mask,
                kv_feats=feats, wk=wk, wv=p["w_vs"]["kernel"],
            )
        else:
            res = fused_vector_attention(
                xyz, xyz,
                feats @ p["w_qs"]["kernel"],
                feats @ wk,
                feats @ p["w_vs"]["kernel"],
                *_mlp_weights(p["fc_delta"]), *_mlp_weights(p["fc_gamma"]),
                k=k, interpret=interpret, compute_dtype=compute_dtype,
                kv_mask=kv_mask,
            )
        res = res + feats
    return _bn(p["bn"], s["bn"], res)


def _group_all_block(p, s, xyz, feats):
    """Full self-attention TransformerBlock (anchor count is tiny) in XLA."""
    pos = _mlp2(p["fc_delta"], xyz[:, :, None, :] - xyz[:, None, :, :])
    q = feats @ p["w_qs"]["kernel"]
    k_ = feats @ p["w_ks"]["kernel"]
    v = feats @ p["w_vs"]["kernel"]
    logits = _mlp2(p["fc_gamma"], q[:, :, None, :] - k_[:, None, :, :] + pos)
    attn = jax.nn.softmax(logits, axis=-2)
    res = jnp.sum(attn * (v[:, None, :, :] + pos), axis=-2) + feats
    return _bn(p["bn"], s["bn"], res)


def _elementwise(p, s, x):
    h = _dense(p["conv1"], x)
    h = jax.nn.relu(_bn(p["bn1"], s["bn1"], h))
    h = _dense(p["conv2"], h)
    h = jax.nn.relu(_bn(p["bn2"], s["bn2"], h))
    return _bn(p["bn3"], s["bn3"], x + h)


def _set_abstraction(p, s, xyz, points, npoint, k, interpret,
                     compute_dtype=None, kv_mask=None):
    """TransformerSetAbstraction with two fused cross-attention rounds."""
    xyz_ng = jax.lax.stop_gradient(xyz)
    if kv_mask is not None:
        # masked points go to the origin, which FPS never selects
        xyz_ng = xyz_ng * kv_mask[..., None].astype(xyz_ng.dtype)
    fps_idx = furthest_point_sample(xyz_ng, npoint)
    new_xyz = index_points(xyz, fps_idx)

    # TSA's position encoding is (neighbour - centre), the opposite sign of
    # the other blocks (reference ``encoder/blocks.py:295`` vs ``:114``);
    # negating both coordinate sets flips the delta and keeps distances.
    nq_xyz, nkv_xyz = -new_xyz, -xyz
    delta = _mlp_weights(p["fc_delta1"])
    q1 = index_points(points @ p["w_qs"]["kernel"], fps_idx)
    use_proj = kv_proj_profitable(
        xyz.shape[1], points.shape[-1], p["w_ks"]["kernel"].shape[-1]
    )
    if use_proj:
        res1 = fused_vector_attention(
            nq_xyz, nkv_xyz, q1, None, None,
            *delta, *_mlp_weights(p["fc_gamma1"]),
            k=k, interpret=interpret, compute_dtype=compute_dtype,
            kv_mask=kv_mask, kv_feats=points,
            wk=p["w_ks"]["kernel"], wv=p["w_vs"]["kernel"],
        )
    else:
        K1 = points @ p["w_ks"]["kernel"]
        V1 = points @ p["w_vs"]["kernel"]
        res1 = fused_vector_attention(
            nq_xyz, nkv_xyz, q1, K1, V1, *delta,
            *_mlp_weights(p["fc_gamma1"]),
            k=k, interpret=interpret, compute_dtype=compute_dtype,
            kv_mask=kv_mask,
        )

    h = _dense(p["conv1"], res1)
    h = jax.nn.relu(_bn(p["bn1"], s["bn1"], h))
    h = _dense(p["conv2"], h)
    res1 = _bn(p["bnorm0"], s["bnorm0"], res1 + h)

    q2 = res1 @ p["w_qs2"]["kernel"]
    if use_proj:
        res2 = fused_vector_attention(
            nq_xyz, nkv_xyz, q2, None, None,
            *delta, *_mlp_weights(p["fc_gamma2"]),
            k=k, interpret=interpret, compute_dtype=compute_dtype,
            kv_mask=kv_mask, kv_feats=points,
            wk=p["w_ks2"]["kernel"], wv=p["w_vs2"]["kernel"],
        )
    else:
        K2 = points @ p["w_ks2"]["kernel"]
        V2 = points @ p["w_vs2"]["kernel"]
        res2 = fused_vector_attention(
            nq_xyz, nkv_xyz, q2, K2, V2, *delta,
            *_mlp_weights(p["fc_gamma2"]),
            k=k, interpret=interpret, compute_dtype=compute_dtype,
            kv_mask=kv_mask,
        )

    out = _bn(p["bnorm1"], s["bnorm1"], res1 + res2)
    out = out + index_points(points, fps_idx)
    return new_xyz, _bn(p["bnorm2"], s["bnorm2"], out)


def encode_fast(encoder_module, params, batch_stats, xyz, interpret=False,
                compute_dtype=None, point_mask=None):
    """PointTransformerEncoder forward from raw params (eval mode).

    Args:
      encoder_module: the (unbound) flax encoder, for its hyper-parameters.
      params / batch_stats: the encoder's variable subtrees.
      xyz: (B, N, 3) or (B, N, 3+F) when the encoder has features.
      point_mask: optional (B, N), nonzero = real conditioning point
        (static-shape partial point clouds; padded rows must be zero) —
        same contract as the flax encoder's ``point_mask``.  BatchNorm
        needs no masking here: the fast path is eval-only (running stats).

    Returns:
      {'z', 'anchors', 'anchor_feats'} like the flax encoder.
    """
    enc = encoder_module
    if enc.has_features:
        feats = _dense(params["enc_sdf"], xyz[:, :, 3:])
        xyz = xyz[:, :, :3]
        feats = _transformer_block(
            params["transformer_begin"], batch_stats["transformer_begin"],
            xyz, feats, enc.nneighbor_reduced, False, interpret, compute_dtype,
            kv_mask=point_mask,
        )
    else:
        feats = _transformer_block(
            params["transformer_begin"], batch_stats["transformer_begin"],
            xyz, None, enc.nneighbor_reduced, True, interpret, compute_dtype,
            kv_mask=point_mask,
        )

    n_levels = len(enc.npoints_per_layer) - 1
    for i in range(n_levels):
        old_n = enc.npoints_per_layer[i]
        new_n = enc.npoints_per_layer[i + 1]
        xyz, feats = _set_abstraction(
            params[f"transition_downs_{i}"]["sa"],
            batch_stats[f"transition_downs_{i}"]["sa"],
            xyz, feats, new_n, min(enc.nneighbor, old_n), interpret,
            compute_dtype, kv_mask=point_mask if i == 0 else None,
        )
        feats = _elementwise(
            params[f"elementwise_extras_{i}"],
            batch_stats[f"elementwise_extras_{i}"], feats,
        )
        feats = _transformer_block(
            params[f"transformer_downs_{i}"],
            batch_stats[f"transformer_downs_{i}"],
            xyz, feats, min(enc.nneighbor, new_n), False, interpret,
            compute_dtype,
        )
        if i == 0 and enc.d_reduced != enc.d_transformer:
            feats = _dense(params["fc1"], feats)
        feats = _elementwise(
            params[f"elementwise_{i}"], batch_stats[f"elementwise_{i}"], feats
        )

    for i in range(enc.nfinal_transformers):
        p = params[f"final_transformers_{i}"]
        s = batch_stats[f"final_transformers_{i}"]
        if enc.full_SA:
            feats = _group_all_block(p, s, xyz, feats)
        else:
            feats = _transformer_block(
                p, s, xyz, feats, 2 * enc.nneighbor, False, interpret,
                compute_dtype,
            )
        feats = _elementwise(
            params[f"final_elementwise_{i}"],
            batch_stats[f"final_elementwise_{i}"], feats,
        )

    lat = jnp.max(feats, axis=1)
    z = _mlp2(params["fc_middle"], lat)
    return {"z": z, "anchors": xyz, "anchor_feats": feats}

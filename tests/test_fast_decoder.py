"""Fused Pallas decoder fast path == flax CrossTransformerDecoder."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nsdp_tpu.models.decoders import CrossTransformerDecoder
from nsdp_tpu.models.fast_decoder import decode_fast, fused_cross_attention
from nsdp_tpu.nn.blocks import CrossTransformerBlock


def _encoding(rng, B=2, A=24, dim_inp=16):
    return {
        "z": jnp.asarray(rng.randn(B, dim_inp).astype(np.float32)),
        "anchors": jnp.asarray(rng.randn(B, A, 3).astype(np.float32)),
        "anchor_feats": jnp.asarray(
            rng.randn(B, A, dim_inp).astype(np.float32)
        ),
    }


def test_fused_cross_attention_matches_flax(rng):
    B, Q, A, dim_inp, dim, k = 2, 100, 24, 16, 12, 5
    enc = _encoding(rng, B, A, dim_inp)
    xyz_q = jnp.asarray(rng.randn(B, Q, 3).astype(np.float32))

    block = CrossTransformerBlock(dim_inp, dim, nneigh=k)
    variables = block.init(
        jax.random.PRNGKey(0), xyz_q, enc["z"], enc["anchors"],
        enc["anchor_feats"],
    )
    ref = block.apply(
        variables, xyz_q, enc["z"], enc["anchors"], enc["anchor_feats"]
    )

    p = variables["params"]
    got = fused_cross_attention(
        xyz_q,
        enc["z"] @ p["w_qs"]["kernel"],
        enc["z"] @ p["w_k_global"]["kernel"],
        enc["z"] @ p["w_v_global"]["kernel"],
        enc["anchors"],
        enc["anchor_feats"] @ p["w_ks"]["kernel"],
        enc["anchor_feats"] @ p["w_vs"]["kernel"],
        p["fc_delta"]["fc0"]["kernel"], p["fc_delta"]["fc0"]["bias"],
        p["fc_delta"]["fc1"]["kernel"], p["fc_delta"]["fc1"]["bias"],
        p["fc_gamma"]["fc0"]["kernel"], p["fc_gamma"]["fc0"]["bias"],
        p["fc_gamma"]["fc1"]["kernel"], p["fc_gamma"]["fc1"]["bias"],
        k=k, tile=128, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_decode_fast_matches_flax_decoder(rng):
    B, Q, A = 2, 70, 24
    enc = _encoding(rng, B, A, 16)
    xyz_q = jnp.asarray(rng.randn(B, Q, 3).astype(np.float32))

    dec = CrossTransformerDecoder(
        dim_inp=16, dim=12, nneigh=5, hidden_dim=8, n_blocks=3, out_dim=3
    )
    variables = dec.init(jax.random.PRNGKey(1), xyz_q, enc)
    ref = dec.apply(variables, xyz_q, enc)
    got = decode_fast(
        variables["params"], xyz_q, enc, nneigh=5, tile=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )

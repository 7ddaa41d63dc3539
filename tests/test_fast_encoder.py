"""Raw-param fast encoder == flax PointTransformerEncoder (eval)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nsdp_tpu.models.encoders import PointTransformerEncoder
from nsdp_tpu.models.fast_encoder import encode_fast


ENC_KW = dict(
    npoints_per_layer=[48, 16, 8],
    nneighbor=6,
    nneighbor_reduced=4,
    nfinal_transformers=2,
    d_transformer=16,
    d_reduced=12,
    full_SA=True,
)


# the featureless (pos-only begin) encoder is exercised in the smoke tier
# inside test_fast_predict_matches_flax[arbitrary] (its canonicalise net);
# the standalone check is slow-tier (VERDICT r4 item 7)
@pytest.mark.parametrize(
    "has_features", [pytest.param(False, marks=pytest.mark.slow), True]
)
def test_encode_fast_matches_flax(has_features, rng):
    enc = PointTransformerEncoder(
        **ENC_KW, has_features=has_features, inp_feat_dim=4
    )
    B, N = 2, 48
    chans = 7 if has_features else 3
    xyz = jnp.asarray(rng.randn(B, N, chans).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), xyz, train=False)
    ref = enc.apply(variables, xyz, train=False)
    got = encode_fast(
        enc, variables["params"], variables["batch_stats"], xyz,
        interpret=True,
    )
    for key in ("z", "anchors", "anchor_feats"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]),
            rtol=1e-3, atol=2e-4, err_msg=key,
        )


@pytest.mark.slow
def test_encode_fast_no_full_sa(rng):
    kw = dict(ENC_KW, full_SA=False)
    enc = PointTransformerEncoder(**kw, has_features=False)
    xyz = jnp.asarray(rng.randn(1, 48, 3).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), xyz, train=False)
    ref = enc.apply(variables, xyz, train=False)
    got = encode_fast(
        enc, variables["params"], variables["batch_stats"], xyz,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got["anchor_feats"]), np.asarray(ref["anchor_feats"]),
        rtol=1e-3, atol=2e-4,
    )

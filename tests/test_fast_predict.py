"""Fast predict path == standard flax eval path, all model types."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nsdp_tpu.models import build_model
from nsdp_tpu.models.fast_predict import make_fast_predict


CFG = {
    "model": {
        "type": "arbitrary",
        "use_normals": False,
        "encoder": "pointransformer",
        "encoder_kwargs": dict(
            npoints_per_layer=[32, 16, 8], nneighbor=6, nneighbor_reduced=4,
            nfinal_transformers=1, d_transformer=16, d_reduced=12,
            full_SA=True,
        ),
        "decoder": "crossatten",
        "decoder_kwargs": dict(
            dim_inp=16, dim=10, nneigh=5, hidden_dim=8, out_dim=3
        ),
    }
}


def _inputs(rng, B=2, N=32, Q=20):
    surf_src = rng.randn(B, N, 3).astype(np.float32)
    surf_tgt = rng.randn(B, N, 3).astype(np.float32)
    mask = (rng.rand(B, N, 1) > 0.5).astype(np.float32)
    pts = rng.randn(B, Q, 3).astype(np.float32)
    inputs = np.concatenate([surf_src, surf_tgt * mask, mask], -1)
    return jnp.asarray(pts), jnp.asarray(inputs)


@pytest.mark.parametrize(
    "model_type",
    [
        # the arbitrary composition internally runs BOTH single nets
        # (canonicalise + forward decode), so it alone carries the smoke
        # signal; the standalone nets are slow-tier (VERDICT r4 item 7)
        pytest.param("forward", marks=pytest.mark.slow),
        pytest.param("backward", marks=pytest.mark.slow),
        "arbitrary",
    ],
)
def test_fast_predict_matches_flax(model_type, rng):
    cfg = {"model": dict(CFG["model"], type=model_type)}
    model = build_model(cfg)
    pts, inputs = _inputs(rng)

    if model_type == "arbitrary":
        args = (pts, inputs[..., 0:3], inputs[..., 3:6], inputs[..., 6:7])
    else:
        args = (pts, inputs)
    variables = model.init(jax.random.PRNGKey(0), *args, train=False)
    ref = model.apply(variables, *args, train=False)

    predict = make_fast_predict(
        model, variables, model_type, nneigh=5, interpret=True
    )
    got = predict(pts, inputs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-3, atol=2e-4
    )

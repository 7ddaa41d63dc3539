"""Numerical parity: flax model vs torch replica with shared weights.

Validates both the JAX model semantics (attention math, BN, residuals, FPS,
kNN) and the torch->flax converter against reference-format state_dict keys.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from nsdp_tpu.models import build_model, build_deformation_network
from nsdp_tpu.utils.torch_convert import convert_state_dict

from tests import torch_ref


ENC_KW = dict(
    npoints_per_layer=[32, 16, 8],
    nneighbor=6,
    nneighbor_reduced=4,
    nfinal_transformers=2,
    d_transformer=16,
    d_reduced=12,
    full_SA=True,
)
DEC_KW = dict(dim_inp=16, dim=10, nneigh=5, hidden_dim=8, n_blocks=2, out_dim=3)


def _config(model_type):
    return {
        "model": {
            "type": model_type,
            "use_normals": False,
            "encoder": "pointransformer",
            "encoder_kwargs": ENC_KW,
            "decoder": "crossatten",
            "decoder_kwargs": DEC_KW,
        }
    }


def _inputs(rng, B=2, N=32, Q=20):
    surf_src = rng.randn(B, N, 3).astype(np.float32)
    surf_tgt = rng.randn(B, N, 3).astype(np.float32)
    mask = (rng.rand(B, N, 1) > 0.5).astype(np.float32)
    pts = rng.randn(B, Q, 3).astype(np.float32)
    inputs = np.concatenate([surf_src, surf_tgt * mask, mask], -1)
    return pts, inputs


def _enc_kw_torch(no_input_corr, use_normals=False):
    kw = dict(ENC_KW)
    if no_input_corr:
        if use_normals:
            kw.update(has_features=True, inp_feat_dim=3)
        else:
            kw.update(has_features=False, inp_feat_dim=0)
    else:
        kw.update(has_features=True, inp_feat_dim=7 if use_normals else 4)
    return kw


@pytest.mark.parametrize("model_type", ["forward", "backward"])
def test_deformation_network_parity(model_type, rng):
    no_corr = model_type == "backward"
    tmodel = torch_ref.DefNet(_enc_kw_torch(no_corr), DEC_KW, no_corr)
    tmodel.eval()

    pts, inputs = _inputs(rng)
    with torch.no_grad():
        tout = tmodel(torch.tensor(pts), torch.tensor(inputs)).numpy()

    jmodel = build_model(_config(model_type))
    variables = jmodel.init(
        jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(inputs), train=False
    )
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, batch_stats = convert_state_dict(
        sd, variables["params"], variables.get("batch_stats", {})
    )
    jout = jmodel.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(pts),
        jnp.asarray(inputs),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(jout), tout, rtol=1e-3, atol=2e-4)


def _inputs_normals(rng, B=2, N=32, Q=20):
    """10-channel use_normals inputs: [src xyz, src normals, tgt*mask, mask]."""
    surf_src = rng.randn(B, N, 3).astype(np.float32)
    normals = rng.randn(B, N, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    surf_tgt = rng.randn(B, N, 3).astype(np.float32)
    mask = (rng.rand(B, N, 1) > 0.5).astype(np.float32)
    pts = rng.randn(B, Q, 3).astype(np.float32)
    inputs = np.concatenate([surf_src, normals, surf_tgt * mask, mask], -1)
    return pts, inputs


@pytest.mark.parametrize("model_type", ["forward", "backward"])
def test_use_normals_parity(model_type, rng):
    """3-/7-feature encoder inputs end-to-end vs the torch replica
    (reference dims ``deformation_networks.py:16-30``; channel contract
    and upstream-inconsistency notes in ``models/deformation.py``)."""
    no_corr = model_type == "backward"
    tmodel = torch_ref.DefNet(
        _enc_kw_torch(no_corr, use_normals=True), DEC_KW, no_corr,
        use_normals=True,
    )
    tmodel.eval()

    pts, inputs = _inputs_normals(rng)
    with torch.no_grad():
        tout = tmodel(torch.tensor(pts), torch.tensor(inputs)).numpy()

    cfg = _config(model_type)
    cfg["model"]["use_normals"] = True
    jmodel = build_model(cfg)
    variables = jmodel.init(
        jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(inputs),
        train=False,
    )
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, batch_stats = convert_state_dict(
        sd, variables["params"], variables.get("batch_stats", {})
    )
    jout = jmodel.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(pts), jnp.asarray(inputs), train=False,
    )
    np.testing.assert_allclose(np.asarray(jout), tout, rtol=1e-3, atol=2e-4)


def test_use_normals_arbitrary_rejected():
    cfg = _config("arbitrary")
    cfg["model"]["use_normals"] = True
    with pytest.raises(ValueError, match="use_normals"):
        build_model(cfg)


def test_flow_arbitrary_parity(rng):
    tmodel = torch_ref.FlowArb(
        _enc_kw_torch(True), _enc_kw_torch(False), DEC_KW
    )
    tmodel.eval()

    pts, inputs = _inputs(rng)
    surf_src, surf_tgt, mask = inputs[..., 0:3], inputs[..., 3:6], inputs[..., 6:7]
    with torch.no_grad():
        tout = tmodel(
            torch.tensor(pts),
            torch.tensor(surf_src),
            torch.tensor(surf_tgt),
            torch.tensor(mask),
        ).numpy()

    jmodel = build_model(_config("arbitrary"))
    variables = jmodel.init(
        jax.random.PRNGKey(0),
        jnp.asarray(pts),
        jnp.asarray(surf_src),
        jnp.asarray(surf_tgt),
        jnp.asarray(mask),
        train=False,
    )
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, batch_stats = convert_state_dict(
        sd, variables["params"], variables.get("batch_stats", {})
    )
    jout = jmodel.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(pts),
        jnp.asarray(surf_src),
        jnp.asarray(surf_tgt),
        jnp.asarray(mask),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(jout), tout, rtol=1e-3, atol=2e-4)


def test_pointnetplusplus_encoder_parity(rng):
    enc_kw = dict(
        npoints_per_layer=[32, 16, 8], nneighbor=6, d_transformer=16,
        nfinal_transformers=2,
    )
    tenc = torch_ref.EncoderPNPP(**enc_kw, has_features=False)
    tenc.eval()
    xyz = rng.randn(2, 32, 3).astype(np.float32)
    with torch.no_grad():
        tout = tenc(torch.tensor(xyz))

    from nsdp_tpu.models.encoders import PointNetPlusPlusEncoder

    jenc = PointNetPlusPlusEncoder(**enc_kw, has_features=False)
    variables = jenc.init(jax.random.PRNGKey(0), jnp.asarray(xyz), train=False)
    sd = {k: v.numpy() for k, v in tenc.state_dict().items()}
    params, batch_stats = convert_state_dict(
        sd, variables["params"], variables.get("batch_stats", {})
    )
    jout = jenc.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(xyz),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(jout["z"]), tout["z"].numpy(), rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(jout["anchor_feats"]), tout["anchor_feats"].numpy(),
        rtol=1e-3, atol=2e-4,
    )


def test_interp_decoder_parity(rng):
    tdec = torch_ref.InterpDecoder(16, 10, out_dim=3, hidden_dim=8, n_blocks=2)
    tdec.eval()
    enc_np = {
        "z": rng.randn(2, 16).astype(np.float32),
        "anchors": rng.randn(2, 8, 3).astype(np.float32),
        "anchor_feats": rng.randn(2, 8, 16).astype(np.float32),
    }
    q = rng.randn(2, 12, 3).astype(np.float32)
    with torch.no_grad():
        tout = tdec(
            torch.tensor(q), {k: torch.tensor(v) for k, v in enc_np.items()}
        ).numpy()

    from nsdp_tpu.models.decoders import PointInterpDecoder

    jdec = PointInterpDecoder(dim_inp=16, dim=10, out_dim=3, hidden_dim=8,
                              n_blocks=2)
    enc_j = {k: jnp.asarray(v) for k, v in enc_np.items()}
    variables = jdec.init(jax.random.PRNGKey(0), jnp.asarray(q), enc_j)
    sd = {k: v.numpy() for k, v in tdec.state_dict().items()}
    params, batch_stats = convert_state_dict(
        sd, variables["params"], variables.get("batch_stats", {})
    )
    jout = jdec.apply({"params": params}, jnp.asarray(q), enc_j)
    np.testing.assert_allclose(np.asarray(jout), tout, rtol=1e-3, atol=2e-4)


def test_train_mode_uses_batch_stats(rng):
    """Train-mode BN must normalise by batch stats and update running stats."""
    jmodel = build_model(_config("forward"))
    pts, inputs = _inputs(rng)
    variables = jmodel.init(
        jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(inputs), train=False
    )
    out, mutated = jmodel.apply(
        variables,
        jnp.asarray(pts),
        jnp.asarray(inputs),
        train=True,
        mutable=["batch_stats"],
    )
    # running stats must have moved away from init (0 mean / 1 var)
    leaves_before = jax.tree.leaves(variables["batch_stats"])
    leaves_after = jax.tree.leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_before, leaves_after)
    )
    assert changed

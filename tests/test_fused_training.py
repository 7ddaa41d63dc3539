"""Fused-attention flax path (model.fused_attention): same params tree,
same outputs, working gradients — on CPU via kernel interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nsdp_tpu.models import build_model
from nsdp_tpu.training import create_train_state, make_steps, optimizer_factory

# smoke-excluded: minutes-scale on the 1-core box (see tests/conftest.py)
pytestmark = pytest.mark.slow


BASE = {
    "type": "forward",
    "use_normals": False,
    "encoder": "pointransformer",
    "encoder_kwargs": dict(
        npoints_per_layer=[32, 16, 8], nneighbor=6, nneighbor_reduced=4,
        nfinal_transformers=1, d_transformer=16, d_reduced=12, full_SA=True,
    ),
    "decoder": "crossatten",
    "decoder_kwargs": dict(dim_inp=16, dim=10, nneigh=5, hidden_dim=8, out_dim=3),
}


def _batch(rng, B=2, N=32, Q=16):
    surf = rng.randn(B, N, 3).astype(np.float32)
    mask = np.ones((B, N, 1), np.float32)
    inputs = np.concatenate([surf, surf * mask, mask], -1)
    return {
        "surface_samples_inputs": inputs,
        "space_samples_src": rng.randn(B, Q, 3).astype(np.float32),
        "space_samples_tgt": rng.randn(B, Q, 3).astype(np.float32),
    }


def test_param_trees_identical(rng):
    batch = _batch(rng)
    pts = jnp.asarray(batch["space_samples_src"])
    inputs = jnp.asarray(batch["surface_samples_inputs"])

    m_std = build_model({"model": dict(BASE)})
    m_fused = build_model({"model": dict(BASE, fused_attention=True)})
    v_std = m_std.init(jax.random.PRNGKey(0), pts, inputs, train=False)
    v_fused = m_fused.init(jax.random.PRNGKey(0), pts, inputs, train=False)

    flat_std = jax.tree_util.tree_structure(v_std)
    flat_fused = jax.tree_util.tree_structure(v_fused)
    assert flat_std == flat_fused
    for a, b in zip(jax.tree.leaves(v_std), jax.tree.leaves(v_fused)):
        assert a.shape == b.shape


def test_fused_forward_matches_standard(rng):
    batch = _batch(rng)
    pts = jnp.asarray(batch["space_samples_src"])
    inputs = jnp.asarray(batch["surface_samples_inputs"])

    m_std = build_model({"model": dict(BASE)})
    m_fused = build_model({"model": dict(BASE, fused_attention=True)})
    variables = m_std.init(jax.random.PRNGKey(0), pts, inputs, train=False)

    ref = m_std.apply(variables, pts, inputs, train=False)
    got = m_fused.apply(variables, pts, inputs, train=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-3, atol=2e-4
    )


def test_fused_train_step_matches_standard(rng):
    batch = _batch(rng)
    pts = jnp.asarray(batch["space_samples_src"])
    inputs = jnp.asarray(batch["surface_samples_inputs"])

    m_std = build_model({"model": dict(BASE)})
    m_fused = build_model({"model": dict(BASE, fused_attention=True)})
    _, tx = optimizer_factory({"optimizer": "SGD", "lr": 1e-2, "momentum": 0.0})

    variables = m_std.init(jax.random.PRNGKey(0), pts, inputs, train=False)
    from nsdp_tpu.training.state import TrainState

    def mk_state():
        # fresh copies: train_step donates its buffers
        params = jax.tree.map(jnp.copy, variables["params"])
        return TrainState(
            params=params,
            batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    steps_std = make_steps(m_std, "forward", tx)
    steps_fused = make_steps(m_fused, "forward", tx)

    s1, loss1 = steps_std["train_step"](mk_state(), batch, 1e-2)
    s2, loss2 = steps_fused["train_step"](mk_state(), batch, 1e-2)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    # SGD updates (linear in grads) must agree closely
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-4
        )


def test_fused_arbitrary_train_step_matches_standard(rng):
    """Custom-VJP gradients through the full 3-net FlowArbitrary
    composition (the shipped stage-2 configs set fused_attention: true)."""
    batch = _batch(rng)
    pts = jnp.asarray(batch["space_samples_src"])
    inputs = jnp.asarray(batch["surface_samples_inputs"])

    base = dict(BASE, type="arbitrary")
    m_std = build_model({"model": base})
    m_fused = build_model({"model": dict(base, fused_attention=True)})
    _, tx = optimizer_factory({"optimizer": "SGD", "lr": 1e-2, "momentum": 0.0})

    args = (pts, inputs[..., 0:3], inputs[..., 3:6], inputs[..., 6:7])
    variables = m_std.init(jax.random.PRNGKey(0), *args, train=False)
    from nsdp_tpu.training.state import TrainState

    def mk_state():
        params = jax.tree.map(jnp.copy, variables["params"])
        return TrainState(
            params=params,
            batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    steps_std = make_steps(m_std, "arbitrary", tx)
    steps_fused = make_steps(m_fused, "arbitrary", tx)

    s1, loss1 = steps_std["train_step"](mk_state(), batch, 1e-2)
    s2, loss2 = steps_fused["train_step"](mk_state(), batch, 1e-2)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=3e-4
        )
    # BN stats (incl. the stage-2 double-update compensation) agree too
    for a, b in zip(
        jax.tree.leaves(s1.batch_stats), jax.tree.leaves(s2.batch_stats)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )

"""Stage-1 -> stage-2 subnet grafting, incl. torch checkpoint sources."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

# smoke-excluded: every case pays a full stage-2 model init/compile
# (~20-40 s each on this box); grafting is a train-CLI startup feature,
# covered by the full tier (CLAUDE.md test tiers)
pytestmark = pytest.mark.slow

from tests import torch_ref
from tests.test_model_parity import DEC_KW, _config, _enc_kw_torch

from nsdp_tpu.models import build_model
from nsdp_tpu.training import create_train_state, optimizer_factory
from nsdp_tpu.training.checkpoints import save_checkpoints
from nsdp_tpu.training.partial_load import load_subnetwork
from nsdp_tpu.training.state import TrainState


def _arb_state():
    model = build_model(_config("arbitrary"))
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(1, 16, 3), jnp.float32)
    surf = jnp.asarray(rng.randn(1, 32, 3), jnp.float32)
    mask = jnp.ones((1, 32, 1), jnp.float32)
    _, tx = optimizer_factory({})
    state = create_train_state(
        build_model(_config("arbitrary")), jax.random.PRNGKey(0),
        (pts, surf, surf, mask), tx,
    )
    return model, state


def test_load_subnetwork_from_torch(tmp_path):
    tnet = torch_ref.DefNet(_enc_kw_torch(False), DEC_KW, False)
    pt = str(tmp_path / "forward.pt")
    torch.save(tnet.state_dict(), pt)

    model, state = _arb_state()
    before = jax.tree.leaves(state.params["model_deform"])[0].copy()
    state = load_subnetwork(state, pt, "model_deform")
    after = jax.tree.leaves(state.params["model_deform"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_load_subnetwork_from_msgpack(tmp_path):
    # save a stage-1 style checkpoint of the backward net and graft it
    model, state = _arb_state()
    sub_state = TrainState(
        params=state.params["model_canonicalize"],
        batch_stats=state.batch_stats["model_canonicalize"],
        opt_state=(),
        step=jnp.zeros((), jnp.int32),
    )
    # perturb so the graft is observable
    sub_state = sub_state.replace(
        params=jax.tree.map(lambda x: x + 1.0, sub_state.params)
    )
    save_checkpoints(0, sub_state, str(tmp_path))

    state2 = load_subnetwork(
        state, str(tmp_path / "model_00000"), "model_canonicalize"
    )
    a = jax.tree.leaves(state2.params["model_canonicalize"])[0]
    b = jax.tree.leaves(state.params["model_canonicalize"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b) + 1.0, rtol=1e-6)


def test_load_subnetwork_rejects_non_arbitrary(tmp_path):
    cfg = _config("forward")
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(1, 16, 3), jnp.float32)
    inputs = jnp.asarray(rng.randn(1, 32, 7), jnp.float32)
    _, tx = optimizer_factory({})
    state = create_train_state(
        model, jax.random.PRNGKey(0), (pts, inputs), tx
    )
    with pytest.raises(KeyError):
        load_subnetwork(state, "whatever", "model_deform")

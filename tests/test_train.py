"""End-to-end training slice: overfit the tiny model on the synthetic fixture,
plus checkpoint naming-contract round trips."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nsdp_tpu.data import DataLoader
from nsdp_tpu.data.datasets import Deform4DFlowDataset
from nsdp_tpu.data.synthetic import generate_synthetic_dataset, synthetic_config
from nsdp_tpu.models import build_model
from nsdp_tpu.training import (
    create_train_state,
    load_best_checkpoints,
    load_checkpoints,
    make_steps,
    optimizer_factory,
    save_best_checkpoints,
    save_checkpoints,
)


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_train")
    return generate_synthetic_dataset(
        str(root), n_identities=1, n_motions_per_identity=1, n_frames=3
    )


def _setup(fixture, model_type="forward"):
    cfg = synthetic_config(
        fixture, model_type=model_type, arbitrary=(model_type == "arbitrary")
    )
    model = build_model(cfg)
    ds = Deform4DFlowDataset(
        cfg,
        "identity_seen",
        "train_seen",
        num_sampled_pairs=-1,
        rng=np.random.RandomState(0),
    )
    loader = DataLoader(ds, batch_size=2, shuffle=True, seed=0, drop_last=True)
    batch = next(iter(loader))
    schedule, tx = optimizer_factory(cfg["training"])

    if model_type == "arbitrary":
        inputs = batch["surface_samples_inputs"]
        example = (
            jnp.asarray(batch["space_samples_src"]),
            jnp.asarray(inputs[..., 0:3]),
            jnp.asarray(inputs[..., 3:6]),
            jnp.asarray(inputs[..., 6:7]),
        )
    else:
        example = (
            jnp.asarray(batch["space_samples_src"]),
            jnp.asarray(batch["surface_samples_inputs"]),
        )
    state = create_train_state(model, jax.random.PRNGKey(0), example, tx)
    steps = make_steps(model, model_type, tx)
    return cfg, model, loader, schedule, state, steps


@pytest.mark.slow
@pytest.mark.parametrize("model_type", ["forward", "arbitrary"])
def test_overfit_decreases_loss(fixture, model_type):
    cfg, model, loader, schedule, state, steps = _setup(fixture, model_type)
    lr = schedule.get_learning_rate(0)
    losses = []
    for epoch in range(30):
        for batch in loader:
            state, loss = steps["train_step"](state, batch, lr)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses
    # validation step runs and is finite
    val = steps["validate_step"](state, batch)
    assert np.isfinite(float(val))


@pytest.mark.slow
@pytest.mark.parametrize("model_type", ["forward", "backward"])
def test_use_normals_train_step(fixture, model_type):
    """use_normals end-to-end: the dataset emits 10-channel inputs and the
    3-/7-feature encoders train on them."""
    cfg = synthetic_config(fixture, model_type=model_type)
    cfg["model"]["use_normals"] = True
    cfg["data"]["inverse"] = model_type == "backward"
    model = build_model(cfg)
    ds = Deform4DFlowDataset(
        cfg, "identity_seen", "train_seen", num_sampled_pairs=-1,
        rng=np.random.RandomState(0),
    )
    loader = DataLoader(ds, batch_size=2, shuffle=True, seed=0, drop_last=True)
    batch = next(iter(loader))
    assert batch["surface_samples_inputs"].shape[-1] == 10
    _, tx = optimizer_factory(cfg["training"])
    example = (
        jnp.asarray(batch["space_samples_src"]),
        jnp.asarray(batch["surface_samples_inputs"]),
    )
    state = create_train_state(model, jax.random.PRNGKey(0), example, tx)
    steps = make_steps(model, model_type, tx)
    state, loss0 = steps["train_step"](state, batch, 1e-3)
    state, loss1 = steps["train_step"](state, batch, 1e-3)
    assert np.isfinite(float(loss0)) and np.isfinite(float(loss1))
    val = steps["validate_step"](state, batch)
    assert np.isfinite(float(val))


@pytest.mark.slow
def test_checkpoint_roundtrip(fixture, tmp_path):
    cfg, model, loader, schedule, state, steps = _setup(fixture, "forward")
    exp_dir = str(tmp_path / "exp")
    os.makedirs(exp_dir)

    batch = next(iter(loader))
    state, _ = steps["train_step"](state, batch, 1e-3)
    save_checkpoints(7, state, exp_dir)
    assert os.path.exists(os.path.join(exp_dir, "model_00007"))
    assert os.path.exists(os.path.join(exp_dir, "opt_00007"))

    # fresh state restores exactly
    _, _, _, _, state2, _ = _setup(fixture, "forward")
    state2, next_epoch = load_checkpoints(state2, exp_dir)
    assert next_epoch == 8
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(state.opt_state), jax.tree.leaves(state2.opt_state)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_best_checkpoint_roundtrip(tmp_path):
    # The naming/resume contract is pure tree serialization — a tiny
    # synthetic TrainState exercises it identically to a model state at
    # none of the two jit-init compiles this test used to pay (~36 s of
    # the smoke tier; VERDICT r4 item 7).
    from nsdp_tpu.training.state import TrainState

    def mk(seed):
        r = np.random.RandomState(seed)
        return TrainState(
            params={"enc": {"w": jnp.asarray(r.randn(4, 3))},
                    "b": jnp.asarray(r.randn(5))},
            batch_stats={"bn": {"mean": jnp.asarray(r.randn(3))}},
            opt_state=(),
            step=jnp.zeros((), jnp.int32),
        )

    state = mk(0)
    exp_dir = str(tmp_path / "exp_best")
    os.makedirs(exp_dir)
    save_best_checkpoints(12, state, exp_dir, 0.0425)
    files = os.listdir(exp_dir)
    assert any(f.startswith("modelbest_00012_") for f in files)

    state2 = mk(1)

    class Args:
        continue_from_epoch = 0
        best_val_loss = 1e9

    args = Args()
    state2, next_epoch, best = load_best_checkpoints(state2, exp_dir, args)
    assert next_epoch == 13 and abs(best - 0.0425) < 1e-6
    assert args.continue_from_epoch == 13
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(state.batch_stats), jax.tree.leaves(state2.batch_stats)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_lr_schedule():
    from nsdp_tpu.training import StepLearningRateSchedule

    s = StepLearningRateSchedule({"initial": 1e-3, "interval": 200, "factor": 0.1})
    assert s.get_learning_rate(0) == 1e-3
    assert s.get_learning_rate(199) == 1e-3
    assert abs(s.get_learning_rate(200) - 1e-4) < 1e-12
    assert abs(s.get_learning_rate(401) - 1e-5) < 1e-12


@pytest.mark.slow
def test_test_on_batch_semantics(fixture):
    """Library equivalent of the reference test_on_batch_* closures."""
    from nsdp_tpu.training.steps import test_on_batch

    cfg, model, loader, schedule, state, steps = _setup(fixture, "forward")
    ds_cfg = synthetic_config(fixture, model_type="forward")
    from nsdp_tpu.data.datasets import Deform4DFlowDataset

    ds = Deform4DFlowDataset(
        ds_cfg, "identity_seen", "test_unseen_motions", load_mesh=True,
        rng=np.random.RandomState(0),
    )
    batch = ds.collate_fn([ds[0]])
    loss, out = test_on_batch(steps, state, dict(batch), compute_loss=True)
    assert np.isfinite(loss)
    assert out["surface_samples_tgt_pred"].shape == batch["surface_samples_src"].shape
    assert out["verts_tgt_pred"].shape == batch["verts_src"].shape


@pytest.mark.slow
def test_nan_guard_skips_bad_updates(fixture):
    from nsdp_tpu.training.steps import make_steps
    from nsdp_tpu.training import optimizer_factory, create_train_state
    import copy

    cfg = synthetic_config(fixture, model_type="forward")
    model = build_model(cfg)
    _, tx = optimizer_factory(cfg["training"])
    steps = make_steps(model, "forward", tx, nan_guard=True)

    ds = Deform4DFlowDataset(
        cfg, "identity_seen", "train_seen", rng=np.random.RandomState(0)
    )
    loader = DataLoader(ds, batch_size=2, drop_last=True)
    batch = next(iter(loader))
    example = (
        jnp.asarray(batch["space_samples_src"]),
        jnp.asarray(batch["surface_samples_inputs"]),
    )
    state = create_train_state(model, jax.random.PRNGKey(0), example, tx)
    before = jax.tree.map(jnp.copy, state.params)

    bad = dict(batch)
    bad["space_samples_tgt"] = batch["space_samples_tgt"] * np.nan
    state, loss = steps["train_step"](state, bad, 1e-3)
    assert not np.isfinite(float(loss))  # surfaced to the logger
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a good batch still updates
    state, loss = steps["train_step"](state, batch, 1e-3)
    assert np.isfinite(float(loss))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(state.params))
    )
    assert changed


@pytest.mark.slow
def test_training_deterministic(fixture):
    """Same seed, same data order -> bitwise-identical losses."""
    losses = []
    for _ in range(2):
        cfg, model, loader, schedule, state, steps = _setup(fixture, "forward")
        run = []
        for epoch in range(2):
            for batch in loader:
                state, loss = steps["train_step"](state, batch, 1e-3)
                run.append(float(loss))
        losses.append(run)
    assert losses[0] == losses[1]

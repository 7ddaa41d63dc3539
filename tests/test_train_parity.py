"""Training-DYNAMICS parity: multi-step loss/param trajectories vs torch.

Forward parity (test_model_parity) proves the math matches at one point in
weight space; this file proves the *trajectory* matches: Adam bias
correction, torch-style L2-into-grad weight decay, per-epoch LR stepping,
and BatchNorm running-stat updates (including the Bessel-corrected running
variance and the stage-2 encode-once double-EMA compensation in
``training/steps.py``).  Reference semantics:
``/root/reference/model/__init__.py:10-41`` (optimizer),
``model/deformation_networks.py:63-77`` (stage-1 step),
``model/flow_arbitrary.py:30-47`` (stage-2 step, canonicalize encoder run
twice per step).

Both sides start from the SAME converted weights and consume the SAME batch
stream; per-step losses and final params/batch_stats must agree to f32
tolerance.  Any drift in optimizer or BN semantics compounds over steps and
fails these assertions.

Known degeneracy: every ``fc_gamma`` second-layer bias has an analytically
zero gradient (per-channel softmax over slots is invariant to a bias shared
by all slots; see CLAUDE.md).  Without weight decay its Adam update is
sign(fp-noise)-driven and framework-dependent, so those leaves are compared
with a loose absolute bound (they provably cannot affect any output); all
other leaves are held tight.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from nsdp_tpu.models import build_model
from nsdp_tpu.training import create_train_state, make_steps, optimizer_factory
from nsdp_tpu.utils.torch_convert import convert_state_dict

from tests import torch_ref
from tests.test_model_parity import DEC_KW, _config, _enc_kw_torch, _inputs

# smoke-excluded: minutes-scale on the 1-core box (see tests/conftest.py)
pytestmark = pytest.mark.slow


def _tree_paths_and_leaves(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [
        ("/".join(str(getattr(k, "key", k)) for k in path), np.asarray(leaf))
        for path, leaf in flat
    ]


def _is_gamma_second_bias(path: str) -> bool:
    return "fc_gamma" in path and path.endswith("fc1/bias")


def _assert_trees_close(jax_tree, torch_tree, tight_atol, loose_atol, what):
    jleaves = _tree_paths_and_leaves(jax_tree)
    tleaves = _tree_paths_and_leaves(torch_tree)
    assert [p for p, _ in jleaves] == [p for p, _ in tleaves]
    for (path, jv), (_, tv) in zip(jleaves, tleaves):
        atol = loose_atol if _is_gamma_second_bias(path) else tight_atol
        np.testing.assert_allclose(
            jv, tv, atol=atol, rtol=0,
            err_msg=f"{what}: {path}",
        )


def _lr_at(step, lr0, interval=8, factor=0.5):
    """Emulates per-epoch StepLearningRateSchedule with step==epoch."""
    return lr0 * factor ** (step // interval)


def _seed_torch(seed=0):
    torch.manual_seed(seed)


def _batches(seed, n_steps, B=2, N=32, Q=20):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_steps):
        pts, inputs = _inputs(rng, B=B, N=N, Q=Q)
        tgt = rng.randn(B, Q, 3).astype(np.float32)
        out.append((pts, inputs, tgt))
    return out


def _torch_l2(pred, tgt):
    return (0.5 * ((pred - tgt) ** 2).sum(-1)).mean()


def _train_torch(tmodel, batches, forward_fn, lr0, weight_decay):
    opt = torch.optim.Adam(
        tmodel.parameters(), lr=lr0, weight_decay=weight_decay
    )
    tmodel.train()
    losses = []
    for step, (pts, inputs, tgt) in enumerate(batches):
        for g in opt.param_groups:
            g["lr"] = _lr_at(step, lr0)
        opt.zero_grad()
        loss = _torch_l2(forward_fn(tmodel, pts, inputs), torch.tensor(tgt))
        loss.backward()
        opt.step()
        losses.append(float(loss))
    return losses


def _train_jax(model, model_type, variables, batches, lr0, weight_decay):
    _, tx = optimizer_factory(
        {"optimizer": "Adam", "lr": lr0, "weight_decay": weight_decay}
    )
    steps = make_steps(model, model_type, tx)
    pts0, inputs0, _ = batches[0]
    i0 = jnp.asarray(inputs0)
    if model_type == "arbitrary":
        example = (jnp.asarray(pts0), i0[..., 0:3], i0[..., 3:6], i0[..., 6:7])
    else:
        example = (jnp.asarray(pts0), i0)
    state = create_train_state(model, jax.random.PRNGKey(0), example, tx)
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    losses = []
    for step, (pts, inputs, tgt) in enumerate(batches):
        batch = {
            "space_samples_src": jnp.asarray(pts),
            "space_samples_tgt": jnp.asarray(tgt),
            "surface_samples_inputs": jnp.asarray(inputs),
        }
        state, loss = steps["train_step"](state, batch, _lr_at(step, lr0))
        losses.append(float(loss))
    return losses, state


def _converted_variables(tmodel, jmodel, example_args):
    variables = jmodel.init(jax.random.PRNGKey(0), *example_args, train=False)
    # .copy(): torch's in-place optimizer updates must not mutate the
    # converted arrays after the fact (tensor.numpy() shares storage)
    sd = {k: v.numpy().copy() for k, v in tmodel.state_dict().items()}
    params, batch_stats = convert_state_dict(
        sd, variables["params"], variables.get("batch_stats", {})
    )
    return {"params": params, "batch_stats": batch_stats}


def _final_torch_trees(tmodel, state):
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    return convert_state_dict(sd, state.params, state.batch_stats)


def test_stage1_training_trajectory_parity():
    """30 steps of the stage-1 forward net: Adam + weight decay + LR steps."""
    n_steps, lr0, wd = 30, 1e-3, 1e-2
    batches = _batches(seed=1, n_steps=n_steps)

    _seed_torch(11)
    tmodel = torch_ref.DefNet(_enc_kw_torch(False), DEC_KW, False)
    jmodel = build_model(_config("forward"))
    pts0, inputs0, _ = batches[0]
    variables = _converted_variables(
        tmodel, jmodel, (jnp.asarray(pts0), jnp.asarray(inputs0))
    )

    tlosses = _train_torch(
        tmodel, batches,
        lambda m, pts, inputs: m(torch.tensor(pts), torch.tensor(inputs)),
        lr0, wd,
    )
    jlosses, state = _train_jax(
        jmodel, "forward", variables, batches, lr0, wd
    )

    np.testing.assert_allclose(jlosses, tlosses, rtol=5e-4, atol=1e-5)
    t_params, t_stats = _final_torch_trees(tmodel, state)
    _assert_trees_close(
        state.params, t_params, tight_atol=2e-4,
        loose_atol=2 * lr0 * n_steps, what="params",
    )
    _assert_trees_close(
        state.batch_stats, t_stats, tight_atol=1e-4, loose_atol=1e-4,
        what="batch_stats",
    )


def test_stage2_training_trajectory_parity():
    """12 steps of the FlowArbitrary composition (3 net passes per step).

    The canonicalize encoder's BN running stats receive TWO EMA updates per
    torch step (the net is called twice, ``flow_arbitrary.py:19-20``); the
    encode-once JAX composition compensates analytically
    (``steps._double_bn_update``) — this test fails if that compensation or
    the Bessel-corrected running variance drifts.

    lr matches the reference stage-2 schedule (5e-5, ``arbitrary.yaml``).
    It must stay small here: at step counts ~v_hat≈g^2, Adam's update is
    ±lr*sign(g) elementwise, so elements whose true gradient is below fp
    noise get a framework-dependent sign — harmless at 5e-5, but at 1e-3 the
    resulting 2e-3 param perturbation is enough to flip discrete FPS/kNN
    selections on a 32-point cloud and fork the trajectories.
    """
    n_steps, lr0, wd = 12, 5e-5, 0.0
    batches = _batches(seed=2, n_steps=n_steps)

    _seed_torch(12)
    tmodel = torch_ref.FlowArb(_enc_kw_torch(True), _enc_kw_torch(False), DEC_KW)
    jmodel = build_model(_config("arbitrary"))
    pts0, inputs0, _ = batches[0]
    i0 = jnp.asarray(inputs0)
    variables = _converted_variables(
        tmodel, jmodel,
        (jnp.asarray(pts0), i0[..., 0:3], i0[..., 3:6], i0[..., 6:7]),
    )

    def fwd(m, pts, inputs):
        ti = torch.tensor(inputs)
        return m(
            torch.tensor(pts), ti[..., 0:3], ti[..., 3:6], ti[..., 6:7]
        )

    tlosses = _train_torch(tmodel, batches, fwd, lr0, wd)
    jlosses, state = _train_jax(
        jmodel, "arbitrary", variables, batches, lr0, wd
    )

    np.testing.assert_allclose(jlosses, tlosses, rtol=1e-4, atol=2e-6)
    # Any single Adam element moves at most ~lr/step, so raw params can
    # never drift past this bound; it catches gross semantic errors (wrong
    # lr application, missing update) cheaply.
    t_params, t_stats = _final_torch_trees(tmodel, state)
    _assert_trees_close(
        state.params, t_params, tight_atol=2.5 * lr0 * n_steps,
        loose_atol=2.5 * lr0 * n_steps, what="params",
    )
    # batch_stats cover BOTH encoders — including the double-updated
    # canonicalize encoder.  They are EMAs of *activation* statistics, so
    # they inherit ~1e-4 noise from lr-scale param drift; a semantic error
    # (missing second EMA update, biased running var) shows at ~1e-2 —
    # 20x this tolerance.
    _assert_trees_close(
        state.batch_stats, t_stats, tight_atol=5e-4, loose_atol=5e-4,
        what="batch_stats",
    )
    # The functionally meaningful final check: after 12 identical steps the
    # two models must be the same FUNCTION (degenerate weight-space
    # directions — Adam sign-noise — provably cannot show up here).
    vrng = np.random.RandomState(99)
    vpts, vinputs = _inputs(vrng)
    vi = jnp.asarray(vinputs)
    jout = jmodel.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(vpts), vi[..., 0:3], vi[..., 3:6], vi[..., 6:7],
        train=False,
    )
    tmodel.eval()
    with torch.no_grad():
        tv = torch.tensor(vinputs)
        tout = tmodel(
            torch.tensor(vpts), tv[..., 0:3], tv[..., 3:6], tv[..., 6:7]
        ).numpy()
    np.testing.assert_allclose(np.asarray(jout), tout, rtol=2e-3, atol=5e-4)


def test_bessel_corrected_running_var():
    """The BN running variance must use the unbiased batch variance (torch
    semantics), not flax's biased one — detectable in one step at small n."""
    from nsdp_tpu.nn.blocks import BatchNorm

    x = np.random.RandomState(3).randn(2, 8, 4).astype(np.float32)
    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    _, mutated = bn.apply(
        variables, jnp.asarray(x), True, mutable=["batch_stats"]
    )
    n = x.shape[0] * x.shape[1]
    batch_var = x.reshape(-1, 4).var(axis=0) * n / (n - 1)
    expected = 0.9 * 1.0 + 0.1 * batch_var
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["bn"]["var"]), expected, rtol=1e-5
    )

    tbn = torch.nn.BatchNorm1d(4)
    tbn.train()
    tbn(torch.tensor(x).transpose(1, 2))
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["bn"]["var"]),
        tbn.running_var.numpy(), rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["bn"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-5, atol=1e-7,
    )

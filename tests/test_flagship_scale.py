"""Flagship-scale conversion + eval rehearsal (VERDICT r1, item 5).

The published checkpoints (`/root/reference/README.md:79-84`) are full-scale:
encoder d_reduced=120 / d=256, hierarchy 5000->500->100, 3 final
transformers; decoder dim 200 / hidden 128 / 5 ResNet blocks.  Round-1
parity only exercised the converter at toy dims.  This file is the closest
zero-egress proxy for the real files: a full-size torch FlowArbitrary
replica is saved in the reference's ``{"model_state_dict": ...}`` format,
converted through the offline CLI (``scripts/convert_checkpoint.py``), and
evaluated by ``test.py`` end-to-end on a flagship-shaped synthetic set;
l2/fnc/cd from the converted JAX model must match the torch replica's own
eval through the same metric code.

Runtime ~4-6 min on CPU (one full-size pair: 3 encoder passes in both
frameworks + jit compile) — the slowest test in the suite, by design.
"""

import os

import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from nsdp_tpu.data.datasets import Deform4DFlowDataset
from nsdp_tpu.data.synthetic import generate_synthetic_dataset, synthetic_config
from nsdp_tpu.utils.metrics import compute_evaluation_metrics

from tests import torch_ref

# smoke-excluded: minutes-scale on the 1-core box (see tests/conftest.py)
pytestmark = pytest.mark.slow

ENC = dict(npoints_per_layer=[5000, 500, 100], nneighbor=16,
           nneighbor_reduced=10, nfinal_transformers=3, d_transformer=256,
           d_reduced=120, full_SA=True)
DEC = dict(dim_inp=256, dim=200, nneigh=7, hidden_dim=128, n_blocks=5,
           out_dim=3)


def _enc_kw(no_corr):
    kw = dict(ENC)
    kw.update(has_features=not no_corr, inp_feat_dim=0 if no_corr else 4)
    return kw


def test_flagship_conversion_and_eval(tmp_path):
    # --- full-size torch replica, saved in the reference's wrapper format
    torch.manual_seed(7)
    tmodel = torch_ref.FlowArb(_enc_kw(True), _enc_kw(False), DEC)
    tmodel.eval()
    pt_path = str(tmp_path / "arbitrary.pt")
    torch.save({"model_state_dict": tmodel.state_dict()}, pt_path)

    # --- offline converter CLI (flagship dims are its default config)
    from scripts import convert_checkpoint

    msgpack_path = str(tmp_path / "arbitrary.msgpack")
    convert_checkpoint.main([pt_path, msgpack_path, "--model-type", "arbitrary"])
    assert os.path.getsize(msgpack_path) > 10_000_000  # ~16M params, f32

    # --- flagship-shaped synthetic test set (5000 surface / 5000 space)
    fixture = generate_synthetic_dataset(
        str(tmp_path / "data"), n_identities=1, n_motions_per_identity=1,
        n_frames=2, n_surface=5000, n_space=5000,
    )
    cfg = synthetic_config(
        fixture, model_type="arbitrary", arbitrary=True,
        n_surface=5000, n_space=5000, tiny_model=False,
    )
    cfg["experiment"]["out_dir"] = str(tmp_path / "out")
    cfg["test"]["weight_file"] = msgpack_path
    cfg["test"]["num_sampled_pairs"] = 1
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    # --- the real eval CLI end-to-end with the converted weights
    from nsdp_tpu.utils.logger import StatsLogger

    StatsLogger.reset()
    import test as test_cli

    test_cli.main([cfg_path])
    exp_dir = os.path.join(cfg["experiment"]["out_dir"], "synthetic")
    stats = os.path.join(exp_dir, cfg["test"]["motion_split"] + ".txt")
    assert os.path.exists(stats)
    mesh_dir = os.path.join(
        exp_dir, cfg["test"]["motion_split"], cfg["test"]["mesh_folder"]
    )
    assert os.listdir(mesh_dir)

    # --- metric-level parity: torch replica vs converted JAX model through
    # the SAME metric code on the SAME batch
    ds = Deform4DFlowDataset(
        cfg, cfg["test"]["iden_split"], cfg["test"]["motion_split"],
        load_mesh=True, num_sampled_pairs=1, rng=np.random.RandomState(0),
    )
    np.random.seed(0)
    batch = ds.collate_fn([ds[0]])
    inputs = batch["surface_samples_inputs"]
    surf_src = inputs[:, :, 0:3]
    surf_tgt = inputs[:, :, 3:6]
    mask = inputs[:, :, 6:7]

    with torch.no_grad():
        t_verts = tmodel(
            torch.tensor(batch["verts_src"]), torch.tensor(surf_src),
            torch.tensor(surf_tgt), torch.tensor(mask),
        ).numpy()

    from nsdp_tpu.models import build_model
    from nsdp_tpu.training import create_train_state, make_steps, optimizer_factory
    from nsdp_tpu.training.checkpoints import load_model_variables

    model = build_model(cfg)
    _, tx = optimizer_factory(cfg.get("training", {}))
    steps = make_steps(model, "arbitrary", tx)
    pts0 = jnp.asarray(batch["verts_src"])
    example = (
        pts0, jnp.asarray(surf_src), jnp.asarray(surf_tgt), jnp.asarray(mask)
    )
    state = create_train_state(model, jax.random.PRNGKey(0), example, tx)
    state = load_model_variables(msgpack_path, state)
    j_verts = np.asarray(
        steps["predict"](state, pts0, jnp.asarray(inputs))
    )

    # raw prediction parity at full scale through the converted file
    np.testing.assert_allclose(j_verts, t_verts, rtol=1e-3, atol=5e-4)

    t_batch = dict(batch, verts_tgt_pred=t_verts)
    j_batch = dict(batch, verts_tgt_pred=j_verts)
    t_metrics = compute_evaluation_metrics(t_batch, rng=np.random.RandomState(1))
    j_metrics = compute_evaluation_metrics(j_batch, rng=np.random.RandomState(1))
    # l2/cd are Lipschitz in the vertex positions, so the 5e-4 vertex bound
    # asserted above translates directly; rtol 1e-3 holds.  fnc does NOT:
    # the replica is untrained, its predicted vertices are near-degenerate,
    # and a face normal's direction is the cross product of tiny edge
    # vectors — a permitted 5e-4 vertex deviation rotates the normal of a
    # short-edged face by up to (5e-4 / edge_length) radians, unboundedly
    # amplifying into the fnc mean (observed: rel. diff 1.17e-3 flaked the
    # old rtol=1e-3 across reruns).  rtol 5e-3 gives 4x margin over the
    # observed worst case while still catching real conversion bugs, which
    # show O(1) metric differences.
    for k, rtol in (("l2", 1e-3), ("fnc", 5e-3), ("cd", 1e-3)):
        np.testing.assert_allclose(
            j_metrics[k], t_metrics[k], rtol=rtol, atol=1e-5,
            err_msg=f"metric {k}",
        )

"""The real-data parity runbook exercised on the synthetic stand-in.

``scripts/eval_reference_parity.py`` is the one-command check for the day
the published checkpoints (``/root/reference/README.md:79-84``) are
downloadable; until then this test feeds it a freshly-saved torch replica
as the "published" ``.pt`` over the synthetic fixture set and asserts the
converted model agrees within the 1% gate (VERDICT r2 item 10).
"""

import json
import os

import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")

from nsdp_tpu.data.synthetic import generate_synthetic_dataset, synthetic_config

from tests import torch_ref


@pytest.mark.slow
@pytest.mark.parametrize("torch_side", ["replica", "reference"])
def test_parity_runbook_synthetic(tmp_path, torch_side):
    """--torch-side=replica diffs against the in-repo torch replica;
    --torch-side=reference runs the REFERENCE'S OWN model code (imported
    from /root/reference, CUDA FPS shimmed) as the torch side — so the
    day real data arrives the comparison target is the reference itself
    (VERDICT r4 item 8)."""
    if torch_side == "reference":
        from nsdp_tpu.utils.reference_loader import reference_available

        if not reference_available():
            pytest.skip("reference tree not present")
    fixture = generate_synthetic_dataset(
        str(tmp_path / "data"), n_identities=1, n_motions_per_identity=1,
        n_frames=2, n_surface=200, n_space=200,
    )
    cfg = synthetic_config(
        fixture, model_type="arbitrary", arbitrary=True,
        n_surface=128, n_space=128, tiny_model=True,
    )
    cfg["experiment"]["out_dir"] = str(tmp_path / "out")
    cfg["test"]["num_sampled_pairs"] = 1
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    # the "published" checkpoint: a torch replica at the config's dims
    torch.manual_seed(3)

    def enc_kw(no_corr):
        kw = dict(cfg["model"]["encoder_kwargs"])
        kw.update(has_features=not no_corr, inp_feat_dim=0 if no_corr else 4)
        return kw

    dec = dict(cfg["model"]["decoder_kwargs"])
    dec.setdefault("n_blocks", 5)
    tmodel = torch_ref.FlowArb(enc_kw(True), enc_kw(False), dec)
    pt_path = str(tmp_path / "published.pt")
    torch.save({"model_state_dict": tmodel.state_dict()}, pt_path)

    from nsdp_tpu.utils.logger import StatsLogger

    StatsLogger.reset()
    from scripts import eval_reference_parity

    report_path = str(tmp_path / "report.json")
    rc = eval_reference_parity.main(
        [cfg_path, pt_path, "--max_pairs", "1", "--out", report_path,
         "--torch-side", torch_side]
    )
    assert rc == 0
    with open(report_path) as f:
        report = json.load(f)
    assert report["ok"]
    assert report["torch_side"] == torch_side
    for k in ("l2", "fnc", "cd"):
        assert report["metrics"][k]["rel_diff"] <= 0.01
    # the CLI artifacts exist (test.py really ran on the converted file)
    out_dir = os.path.join(cfg["experiment"]["out_dir"], "reference_parity")
    assert os.path.isfile(os.path.join(out_dir, "converted.msgpack"))


def _dry_run_setup(tmp_path, n_frames=2):
    """Tiny fixture + config + 'published' replica for --dry-run tests."""
    fixture = generate_synthetic_dataset(
        str(tmp_path / "data"), n_identities=1, n_motions_per_identity=1,
        n_frames=n_frames, n_surface=200, n_space=200,
    )
    cfg = synthetic_config(
        fixture, model_type="arbitrary", arbitrary=True,
        n_surface=128, n_space=128, tiny_model=True,
    )
    cfg["experiment"]["out_dir"] = str(tmp_path / "out")
    cfg["test"]["num_sampled_pairs"] = 1
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    torch.manual_seed(3)

    def enc_kw(no_corr):
        kw = dict(cfg["model"]["encoder_kwargs"])
        kw.update(has_features=not no_corr, inp_feat_dim=0 if no_corr else 4)
        return kw

    dec = dict(cfg["model"]["decoder_kwargs"])
    dec.setdefault("n_blocks", 5)
    tmodel = torch_ref.FlowArb(enc_kw(True), enc_kw(False), dec)
    pt_path = str(tmp_path / "published.pt")
    torch.save({"model_state_dict": tmodel.state_dict()}, pt_path)
    return fixture, cfg, cfg_path, pt_path, tmodel


def test_parity_runbook_dry_run_ok(tmp_path):
    """--dry-run validates a healthy root + checkpoint and runs NO eval."""
    _, cfg, cfg_path, pt_path, _ = _dry_run_setup(tmp_path)
    from scripts import eval_reference_parity

    report_path = str(tmp_path / "report.json")
    rc = eval_reference_parity.main(
        [cfg_path, pt_path, "--max_pairs", "1", "--dry-run",
         "--out", report_path]
    )
    assert rc == 0
    with open(report_path) as f:
        report = json.load(f)
    assert report["ok"] and report["dry_run"]
    assert report["dataset"]["pairs"] >= 1
    assert report["checkpoint"]["n_missing"] == 0
    assert report["checkpoint"]["n_shape_mismatches"] == 0
    # dry run must not have produced eval artifacts
    out_dir = os.path.join(cfg["experiment"]["out_dir"], "reference_parity")
    assert not os.path.exists(os.path.join(out_dir, "converted.msgpack"))


def test_parity_runbook_dry_run_broken_dataset(tmp_path):
    """A frame file deleted from the root is reported, not discovered at
    eval time on the real-data day."""
    fixture, _, cfg_path, pt_path, _ = _dry_run_setup(tmp_path)
    # break the directory contract: delete one flow.npz
    victims = [
        os.path.join(root, "flow.npz")
        for root, _, files in os.walk(fixture["dataset_dir"])
        if "flow.npz" in files
    ]
    os.remove(victims[0])
    from scripts import eval_reference_parity

    report_path = str(tmp_path / "report.json")
    rc = eval_reference_parity.main(
        [cfg_path, pt_path, "--max_pairs", "1", "--dry-run",
         "--out", report_path]
    )
    assert rc == 1
    with open(report_path) as f:
        report = json.load(f)
    assert not report["ok"]
    assert any("flow.npz" in p for p in report["problems"])


def test_parity_runbook_dry_run_broken_checkpoint(tmp_path):
    """A checkpoint with a missing key and a wrong-shaped tensor fails the
    inventory check with both problems named."""
    _, _, cfg_path, pt_path, tmodel = _dry_run_setup(tmp_path)
    sd = dict(tmodel.state_dict())
    dense_keys = [k for k, v in sd.items() if v.dim() == 2]
    sd.pop(dense_keys[0])
    sd[dense_keys[1]] = torch.zeros(3, 3)
    torch.save(sd, pt_path)  # raw state_dict format this time

    from scripts import eval_reference_parity

    report_path = str(tmp_path / "report.json")
    rc = eval_reference_parity.main(
        [cfg_path, pt_path, "--max_pairs", "1", "--dry-run",
         "--out", report_path]
    )
    assert rc == 1
    with open(report_path) as f:
        report = json.load(f)
    assert not report["ok"]
    assert report["checkpoint"]["n_missing"] == 1
    assert report["checkpoint"]["n_shape_mismatches"] == 1

"""CLI entry points run end-to-end on the synthetic fixture."""

import os

import numpy as np
import pytest
import yaml

from nsdp_tpu.data.synthetic import generate_synthetic_dataset, synthetic_config
from nsdp_tpu.utils.logger import StatsLogger


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_cli")
    return generate_synthetic_dataset(
        str(root), n_identities=1, n_motions_per_identity=1, n_frames=3,
        n_surface=200, n_space=200,
    )


def _write_cfg(fixture, tmp_path, **kw):
    cfg = synthetic_config(fixture, **kw)
    cfg["experiment"]["out_dir"] = str(tmp_path / "out")
    path = str(tmp_path / "cfg.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return cfg, path


@pytest.mark.slow
def test_train_cli(fixture, tmp_path):
    StatsLogger.reset()
    import train as train_cli

    cfg, cfg_path = _write_cfg(fixture, tmp_path)
    train_cli.main([cfg_path, "--seed", "0"])

    exp_dir = os.path.join(cfg["experiment"]["out_dir"], "synthetic")
    files = os.listdir(exp_dir)
    assert "params.json" in files
    assert "stats.txt" in files
    assert any(f.startswith("model_") for f in files)
    assert any(f.startswith("modelbest_") for f in files)


@pytest.mark.slow
def test_train_cli_wandb_watch_gating(fixture, tmp_path, monkeypatch):
    """The watch flag is derived from args+config on every process (the
    collective-deadlock fix: watch_stats is a shard_map pmean, so all
    processes must call it) and ``logger.log_frequency`` gates how often
    param/grad norms are logged: epochs 0..3 with log_frequency=2 →
    exactly 2 watch logs (epochs 0 and 2)."""
    import sys
    import types

    StatsLogger.reset()
    import train as train_cli

    watch_logs = []

    fake = types.ModuleType("wandb")

    class _Hist:
        def __init__(self, seq):
            self.seq = list(seq)

    fake.Histogram = _Hist
    fake.login = lambda *a, **kw: None
    fake.init = lambda *a, **kw: None

    def _log(values, commit=True):
        if any(k.startswith("param_norm/") for k in values):
            watch_logs.append(values)

    fake.log = _log
    monkeypatch.setitem(sys.modules, "wandb", fake)

    cfg, cfg_path = _write_cfg(fixture, tmp_path)
    cfg["training"]["epochs"] = 4
    cfg["logger"]["log_frequency"] = 2
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    train_cli.main([cfg_path, "--seed", "0", "--with_wandb_logger"])

    assert len(watch_logs) == 2
    assert all(
        np.isfinite(v) for w in watch_logs for k, v in w.items()
        if k.startswith(("param_norm/", "grad_norm/"))
    )
    StatsLogger.reset()


@pytest.mark.slow
def test_test_cli(fixture, tmp_path):
    StatsLogger.reset()
    import train as train_cli
    import test as test_cli

    cfg, cfg_path = _write_cfg(fixture, tmp_path)
    train_cli.main([cfg_path, "--seed", "0"])
    exp_dir = os.path.join(cfg["experiment"]["out_dir"], "synthetic")
    model_file = sorted(
        f for f in os.listdir(exp_dir) if f.startswith("model_")
    )[-1]

    cfg["test"]["weight_file"] = os.path.join(exp_dir, model_file)
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    StatsLogger.reset()
    test_cli.main([cfg_path])

    split_dir = os.path.join(exp_dir, cfg["test"]["motion_split"])
    meshes = os.path.join(split_dir, "meshes")
    assert os.path.isdir(os.path.join(meshes, "deformed"))
    assert len(os.listdir(os.path.join(meshes, "deformed"))) > 0
    pcs = os.path.join(split_dir, "pointclouds")
    assert os.path.isdir(os.path.join(pcs, "deformed"))
    stats = os.path.join(exp_dir, cfg["test"]["motion_split"] + ".txt")
    assert os.path.exists(stats)


@pytest.mark.slow
def test_test_cli_padded_partial_runs_fused_path(fixture, tmp_path,
                                                 monkeypatch):
    """test.py on padded partial shapes at batch>1 actually executes the
    fused path, and its outputs match the flax route (VERDICT r3 item 6).

    ``NSDP_FAST_PREDICT=1`` lifts the TPU-backend gate (the kernels run in
    interpreter mode on CPU); the wrapped ``make_fast_predict`` counts real
    executions of the fused callable — path selection is asserted, not
    assumed.  The flax-route run (``NSDP_FAST_PREDICT=0``) must produce the
    same per-pair losses and metrics.
    """
    StatsLogger.reset()
    import test as test_cli
    import nsdp_tpu.models.fast_predict as fp

    cfg, cfg_path = _write_cfg(fixture, tmp_path)
    cfg["data"]["partial_shape_ratio"] = 0.6
    cfg["data"]["pad_partial_shapes"] = True
    cfg["test"]["batch_size"] = 2
    cfg["test"]["generate_mesh"] = False
    cfg["test"]["generate_pointcloud"] = False

    def run(out_name, force):
        cfg["experiment"]["out_dir"] = str(tmp_path / out_name)
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        StatsLogger.reset()
        monkeypatch.setenv("NSDP_FAST_PREDICT", force)
        # the dataset's partial-hole sampling uses the global np.random
        # stream: reseed so both routes see identical holes
        np.random.seed(7)
        test_cli.main([cfg_path, "--matmul_precision", "highest"])
        stats = os.path.join(
            cfg["experiment"]["out_dir"], "synthetic",
            cfg["test"]["motion_split"] + ".txt",
        )
        import re

        with open(stats) as f:
            lines = [l for l in f.read().splitlines() if "loss:" in l]
        # every float on a progress line (loss + aggregated l2/fnc/cd);
        # the epoch/batch ints carry no decimal point and don't match
        return [
            [float(x) for x in re.findall(r"-?\d+\.\d+(?:e-?\d+)?", line)]
            for line in lines
        ]

    calls = {"n": 0}
    orig = fp.make_fast_predict

    def counting(*a, **kw):
        inner = orig(*a, **kw)

        def wrapped(*args, **kwargs):
            calls["n"] += 1
            return inner(*args, **kwargs)

        return wrapped

    monkeypatch.setattr(fp, "make_fast_predict", counting)

    fused_vals = run("out_fused", "1")
    assert calls["n"] > 0, "fused path was never executed"
    n_fused_calls = calls["n"]

    flax_vals = run("out_flax", "0")
    assert calls["n"] == n_fused_calls, "flax route ran the fused path"

    assert len(fused_vals) == len(flax_vals) > 0
    for a, b in zip(fused_vals, flax_vals):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)


def test_config_validation(tmp_path):
    from nsdp_tpu.utils.config import load_config

    bad = str(tmp_path / "bad.yaml")
    with open(bad, "w") as f:
        yaml.safe_dump({"experiment": {}}, f)
    with pytest.raises(ValueError):
        load_config(bad)


def test_shipped_configs_parse():
    from nsdp_tpu.utils.config import load_config

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    n = 0
    for dirpath, _, files in os.walk(root):
        for fname in files:
            if fname.endswith(".yaml"):
                cfg = load_config(os.path.join(dirpath, fname))
                assert cfg["model"]["type"] in ("forward", "backward", "arbitrary")
                n += 1
    assert n >= 12


@pytest.mark.slow
def test_run_cli_userhandle(tmp_path):
    """run.py end-to-end: mesh-only dataset, synthesized handle target."""
    import numpy as np
    from nsdp_tpu.data.synthetic import icosphere, deform_frame
    from nsdp_tpu.utils import meshio

    dataset_dir = tmp_path / "frames"
    split_dir = tmp_path / "splits" / "tosca"
    split_dir.mkdir(parents=True)
    verts, faces = icosphere(1)
    for name in ("cat0",):
        frame = dataset_dir / name / "0000"
        frame.mkdir(parents=True)
        np.savetxt(str(frame / "orig_to_gaps.txt"), np.eye(4))
        meshio.save_mesh(
            str(frame / "model_normalized.obj"),
            deform_frame(verts, 0.2, 1), faces,
        )
    for split in ("test_unseen_identities", "identity_unseen"):
        with open(split_dir / (split + ".lst"), "w") as f:
            f.write("cat0\n")

    fixture = {
        "dataset_dir": str(dataset_dir),
        "split_dir": str(tmp_path / "splits"),
    }
    cfg = synthetic_config(fixture, model_type="arbitrary", arbitrary=True)
    cfg["experiment"]["out_dir"] = str(tmp_path / "out")
    cfg["data"]["type"] = "tosca"
    cfg["data"]["mesh_file"] = "model_normalized.obj"
    cfg["data"]["userhandle"] = {
        "cliptail": False, "head": True, "tail": False,
        "frontleftfoot": False, "frontrightfoot": False,
        "behindleftfoot": False, "behindrightfoot": False,
        "xtrans": -0.15, "ytrans": -0.2, "ztrans": -0.2,
    }
    cfg["test"]["iden_split"] = "identity_unseen"
    cfg["test"]["motion_split"] = "test_unseen_identities"
    cfg["test"]["generate_pointcloud"] = False
    cfg["test"].pop("weight_file", None)
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    StatsLogger.reset()
    import run as run_cli

    run_cli.main([cfg_path])

    exp_dir = os.path.join(cfg["experiment"]["out_dir"], "synthetic")
    drag_dirs = [d for d in os.listdir(exp_dir) if d.startswith("drag_head")]
    assert drag_dirs, os.listdir(exp_dir)
    assert "x-0.15y-0.20z-0.20" in drag_dirs[0]
    deformed = os.path.join(exp_dir, drag_dirs[0], "meshes", "deformed")
    assert len(os.listdir(deformed)) == 1

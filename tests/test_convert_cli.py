"""Offline checkpoint converter CLI: torch .pt -> msgpack, loadable."""

import os

import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")

from tests import torch_ref
from tests.test_model_parity import ENC_KW, DEC_KW, _config, _enc_kw_torch


@pytest.mark.slow
def test_convert_cli_roundtrip(tmp_path):
    # deterministic weights: with torch's default (unseeded) init the
    # jax-vs-torch tolerance below is marginal for unlucky draws
    torch.manual_seed(0)
    tmodel = torch_ref.FlowArb(_enc_kw_torch(True), _enc_kw_torch(False), DEC_KW)
    pt_path = str(tmp_path / "arbitrary.pt")
    torch.save(tmodel.state_dict(), pt_path)

    cfg = _config("arbitrary")
    cfg["experiment"] = {"out_dir": str(tmp_path), "name": "x"}
    cfg["data"] = {"type": "deform4d", "dataset_dir": ".", "split_dir": "."}
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    out_path = str(tmp_path / "arbitrary.msgpack")
    from scripts.convert_checkpoint import main

    main([pt_path, out_path, "--model-type", "arbitrary", "--config", cfg_path])
    assert os.path.exists(out_path)

    # loadable through the standard weight-file path
    import jax
    import jax.numpy as jnp

    from nsdp_tpu.models import build_model
    from nsdp_tpu.training import create_train_state, optimizer_factory
    from nsdp_tpu.training.checkpoints import load_model_variables

    model = build_model(cfg)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(1, 20, 3), jnp.float32)
    surf = jnp.asarray(rng.randn(1, 32, 3), jnp.float32)
    mask = jnp.ones((1, 32, 1), jnp.float32)
    _, tx = optimizer_factory({})
    state = create_train_state(
        model, jax.random.PRNGKey(0), (pts, surf, surf, mask), tx
    )
    state = load_model_variables(out_path, state)

    # converted weights == direct conversion
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        pts, surf, surf, mask, train=False,
    )
    tmodel.eval()
    with torch.no_grad():
        tout = tmodel(
            torch.tensor(np.asarray(pts)),
            torch.tensor(np.asarray(surf)),
            torch.tensor(np.asarray(surf)),
            torch.tensor(np.asarray(mask)),
        ).numpy()
    np.testing.assert_allclose(np.asarray(out), tout, rtol=1e-3, atol=2e-4)

#!/usr/bin/env python
"""Real-data parity runbook: published torch checkpoint vs converted model.

The one-command check for the day the published checkpoints and datasets
(``/root/reference/README.md:79-84``) are downloadable: convert the ``.pt``,
run the real ``test.py`` CLI on it, and diff l2/fnc/cd pair-by-pair against
a torch replica evaluated through the SAME dataset and metric code.  Exits
nonzero if any aggregate metric differs by more than ``--threshold``
(default 1%).

  python scripts/eval_reference_parity.py CONFIG TORCH_PT \
      [--dataset_dir D] [--split_dir S] [--max_pairs N] \
      [--threshold 0.01] [--out report.json] [--dry-run] \
      [--torch-side {replica,reference}]

``--torch-side=reference`` runs the REFERENCE'S OWN model code (imported
from /root/reference with its one CUDA op shimmed) as the torch side of
the diff instead of the in-repo replica — the strongest available oracle.

Run once per published model/config pair (S1 forward/backward, S2
arbitrary).  Until egress exists, ``tests/test_reference_parity_runbook.py``
exercises this script end-to-end on the synthetic stand-in with a
freshly-saved torch replica as the "published" file.

``--dry-run`` validates everything that can be validated WITHOUT running
eval — the dataset root's directory contract (split files, per-frame
``orig_to_gaps.txt`` / ``surface_points.npz`` / ``flow.npz`` / mesh, a full
parse of the first pair) and the checkpoint's key/shape inventory against
the published ``.pt`` names (reference ``model/__init__.py:85-92`` formats)
— so the day egress exists, the parity claim is one command with no
debugging.  Exits nonzero with a JSON problem list otherwise.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _enc_kw(config, no_corr):
    kw = dict(config["model"]["encoder_kwargs"])
    kw.update(has_features=not no_corr, inp_feat_dim=0 if no_corr else 4)
    return kw


def _load_state_dict(torch_file):
    """The published file's raw tensor dict (both on-disk formats)."""
    import torch

    payload = torch.load(torch_file, map_location="cpu", weights_only=False)
    return payload.get("model_state_dict", payload) \
        if isinstance(payload, dict) else payload


def dry_run(config, torch_file, max_pairs=0):
    """Validate the dataset root + checkpoint inventory without evaluating.

    Returns a JSON-able report with ``ok`` and a ``problems`` list.  Pure
    numpy/torch — no jax import, no device, no eval pass.
    """
    import numpy as np

    from nsdp_tpu.data import dataset_dict

    problems = []
    report = {"dry_run": True, "dataset": {}, "checkpoint": {}}

    # -- dataset root contract -------------------------------------------
    dtype = config["data"]["type"]
    dcfg = config["data"]
    try:
        Dataset = dataset_dict[dtype]
        ds = Dataset(
            config,
            iden_split=config["test"]["iden_split"],
            motion_split=config["test"]["motion_split"],
            load_mesh=True,
            num_sampled_pairs=max_pairs or config["test"]["num_sampled_pairs"],
            rng=np.random.RandomState(0),
        )
    except Exception as e:
        problems.append(f"dataset construction failed: {e!r}")
        ds = None
    if ds is not None:
        report["dataset"]["pairs"] = len(ds)
        if len(ds) == 0:
            problems.append(
                "dataset produced 0 evaluation pairs (empty/mismatched "
                "split files or missing sequence directories?)"
            )
        # every frame directory referenced by the pair list must carry the
        # full file contract; user-handle datasets are mesh-only
        flow = dtype in ("deform4d", "deformtransfer")
        required = [dcfg["norm_params_file"], dcfg["mesh_file"]]
        if flow:
            required += [dcfg["surface_flow_file"], dcfg["space_flow_file"]]
        frame_dirs = sorted({
            d for i in range(len(ds)) for d in ds._resolve_pair_dirs(i)
        })
        report["dataset"]["frame_dirs"] = len(frame_dirs)
        missing = [
            os.path.join(d, f)
            for d in frame_dirs
            for f in required
            if not os.path.isfile(os.path.join(d, f))
        ]
        if missing:
            problems.append(
                f"{len(missing)} required frame files missing, e.g. "
                f"{missing[:5]}"
            )
        # full parse of the first pair: npz keys, 4x4 matrix, mesh load,
        # subsampling/mask assembly
        if len(ds) and not missing:
            try:
                item = ds[0]
                report["dataset"]["first_item_keys"] = sorted(item)
            except Exception as e:
                problems.append(f"first pair failed to assemble: {e!r}")

    # -- checkpoint key/shape inventory ------------------------------------
    try:
        sd = _load_state_dict(torch_file)
        got = {k: tuple(v.shape) for k, v in sd.items()}
    except Exception as e:
        problems.append(f"checkpoint unreadable: {e!r}")
        got = None
    if got is not None:
        expected_model = build_torch_replica(config, None)
        expected = {
            k: tuple(v.shape)
            for k, v in expected_model.state_dict().items()
        }
        missing_keys = sorted(set(expected) - set(got))
        unexpected = sorted(set(got) - set(expected))
        mismatched = sorted(
            k for k in set(expected) & set(got) if expected[k] != got[k]
        )
        report["checkpoint"] = {
            "keys": len(got),
            "expected_keys": len(expected),
            "missing": missing_keys[:10],
            "n_missing": len(missing_keys),
            "unexpected": unexpected[:10],
            "n_unexpected": len(unexpected),
            "shape_mismatches": [
                {"key": k, "got": got[k], "expected": expected[k]}
                for k in mismatched[:10]
            ],
            "n_shape_mismatches": len(mismatched),
        }
        if missing_keys:
            problems.append(
                f"checkpoint missing {len(missing_keys)} expected keys"
            )
        if mismatched:
            problems.append(
                f"checkpoint has {len(mismatched)} shape mismatches"
            )
        # unexpected keys alone are a warning, not a failure: the reference
        # allocates parameters it never uses (see utils/torch_convert._merge)
        if unexpected:
            report["checkpoint"]["note"] = (
                f"{len(unexpected)} unused torch keys will be dropped "
                "by the converter"
            )

    report["problems"] = problems
    report["ok"] = not problems
    return report


def build_torch_replica(config, torch_file):
    """The torch re-implementation, optionally loading a published
    checkpoint into it (``torch_file=None`` returns the fresh replica —
    the expected-key inventory for ``--dry-run``)."""
    from tests import torch_ref

    model_type = config["model"]["type"]
    dec = dict(config["model"]["decoder_kwargs"])
    dec.setdefault("n_blocks", 5)
    if model_type == "arbitrary":
        model = torch_ref.FlowArb(
            _enc_kw(config, True), _enc_kw(config, False), dec
        )
    else:
        no_corr = model_type == "backward"
        model = torch_ref.DefNet(_enc_kw(config, no_corr), dec, no_corr)
    if torch_file is not None:
        model.load_state_dict(_load_state_dict(torch_file))
    model.eval()
    return model


def build_torch_reference(config, torch_file):
    """The torch side built from the REFERENCE'S OWN code: imports
    ``/root/reference/model`` (CUDA FPS shimmed, see
    ``nsdp_tpu/utils/reference_loader.py``) and loads the published file
    through the reference's own ``build_model``
    (``model/__init__.py:107-116``) — so the diff target is the reference
    itself, not the replica."""
    from nsdp_tpu.utils.reference_loader import reference_model_package

    # The context only scopes sys.modules/sys.path hygiene; the built
    # model keeps references to its (already-imported) module objects,
    # so it stays fully usable after exit.
    with reference_model_package() as ref:
        model, *_ = ref.build_model(config, weight_file=torch_file)
    model.eval()
    return model


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config_file", help="evaluation config YAML")
    parser.add_argument("torch_file", help="published torch checkpoint (.pt)")
    parser.add_argument("--dataset_dir", default=None)
    parser.add_argument("--split_dir", default=None)
    parser.add_argument("--out_dir", default=None,
                        help="working/output directory (default: alongside "
                        "the config's experiment out_dir)")
    parser.add_argument("--max_pairs", type=int, default=0,
                        help="bound the evaluated pairs (0 = all)")
    parser.add_argument("--threshold", type=float, default=0.01,
                        help="max allowed relative aggregate difference")
    parser.add_argument("--out", default=None, help="write report JSON here")
    parser.add_argument(
        "--dry-run", action="store_true",
        help="validate the dataset root contract and the checkpoint key "
        "inventory, then exit without evaluating",
    )
    parser.add_argument(
        "--torch-side", default="replica", choices=["replica", "reference"],
        help="what the torch side of the metric diff runs: the in-repo "
        "replica (tests/torch_ref.py) or the reference's OWN model code "
        "imported from /root/reference (NSDP_REFERENCE_ROOT) with its "
        "CUDA FPS shimmed — 'reference' makes the comparison target the "
        "reference itself the day real data arrives",
    )
    args = parser.parse_args(argv)

    if args.dry_run:
        from nsdp_tpu.utils.config import load_config as _load_config

        config = _load_config(args.config_file)
        if args.dataset_dir:
            config["data"]["dataset_dir"] = args.dataset_dir
        if args.split_dir:
            config["data"]["split_dir"] = args.split_dir
        report = dry_run(config, args.torch_file, max_pairs=args.max_pairs)
        print(json.dumps(report, indent=2))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(report, f, indent=2)
        return 0 if report["ok"] else 1

    import numpy as np
    import torch
    import yaml

    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from nsdp_tpu.data import dataset_dict
    from nsdp_tpu.models import build_model
    from nsdp_tpu.training import (
        create_train_state,
        make_steps,
        optimizer_factory,
    )
    from nsdp_tpu.training.checkpoints import load_model_variables
    from nsdp_tpu.utils.config import load_config
    from nsdp_tpu.utils.logger import StatsLogger
    from nsdp_tpu.utils.metrics import compute_evaluation_metrics

    from scripts import convert_checkpoint

    config = load_config(args.config_file)
    if args.dataset_dir:
        config["data"]["dataset_dir"] = args.dataset_dir
    if args.split_dir:
        config["data"]["split_dir"] = args.split_dir
    out_dir = args.out_dir or os.path.join(
        config["experiment"]["out_dir"] or ".", "reference_parity"
    )
    os.makedirs(out_dir, exist_ok=True)
    model_type = config["model"]["type"]
    if args.max_pairs:
        config["test"]["num_sampled_pairs"] = args.max_pairs

    # 1. convert the published file through the offline CLI
    cfg_path = os.path.join(out_dir, "parity_config.yaml")
    msgpack_path = os.path.join(out_dir, "converted.msgpack")
    config["experiment"]["out_dir"] = out_dir
    config["test"]["weight_file"] = msgpack_path
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    convert_checkpoint.main(
        [args.torch_file, msgpack_path, "--model-type", model_type,
         "--config", cfg_path]
    )

    # 2. the real eval CLI end-to-end on the converted weights
    StatsLogger.reset()
    import test as test_cli

    # parity wants bit-level agreement with the torch replica, so override
    # the CLI's round-3 'default' precision default
    test_cli.main([cfg_path, "--matmul_precision", "highest"])
    StatsLogger.reset()

    # 3. pair-by-pair metric parity: torch oracle vs converted JAX model
    #    through the same dataset + metric code (same metric-sampling rng)
    if args.torch_side == "reference":
        tmodel = build_torch_reference(config, args.torch_file)
    else:
        tmodel = build_torch_replica(config, args.torch_file)

    Dataset = dataset_dict[config["data"]["type"]]
    ds = Dataset(
        config,
        iden_split=config["test"]["iden_split"],
        motion_split=config["test"]["motion_split"],
        load_mesh=True,
        num_sampled_pairs=config["test"]["num_sampled_pairs"],
        rng=np.random.RandomState(0),
    )
    model = build_model(config)
    _, tx = optimizer_factory(config.get("training", {}))
    steps = make_steps(model, model_type, tx)

    item0 = ds[0]
    inputs0 = jnp.asarray(item0["surface_samples_inputs"])[None]
    pts0 = jnp.asarray(item0["surface_samples_src"])[None]
    if model_type == "arbitrary":
        example = (
            pts0, inputs0[..., 0:3], inputs0[..., 3:6], inputs0[..., 6:7]
        )
    else:
        example = (pts0, inputs0)
    state = create_train_state(model, jax.random.PRNGKey(0), example, tx)
    state = load_model_variables(msgpack_path, state)

    n_pairs = len(ds)
    # raw per-pair values (the parity gate) and the reference-style
    # filtered aggregate (values > 1.0 dropped, test.py:139) side by side:
    # the drop rule can empty a metric entirely (untrained weights), so
    # parity is gated on the raw means, which are always defined.
    raw = {"l2": [[], []], "fnc": [[], []], "cd": [[], []]}
    agg = {"l2": [[], []], "fnc": [[], []], "cd": [[], []]}
    for i in range(n_pairs):
        batch = ds.collate_fn([ds[i]])
        inputs = batch["surface_samples_inputs"]
        with torch.no_grad():
            if model_type == "arbitrary":
                t_verts = tmodel(
                    torch.tensor(batch["verts_src"]),
                    torch.tensor(inputs[:, :, 0:3]),
                    torch.tensor(inputs[:, :, 3:6]),
                    torch.tensor(inputs[:, :, 6:7]),
                ).numpy()
            else:
                t_verts = tmodel(
                    torch.tensor(batch["verts_src"]), torch.tensor(inputs)
                ).numpy()
        j_verts = np.asarray(
            steps["predict"](
                state, jnp.asarray(batch["verts_src"]), jnp.asarray(inputs)
            )
        )
        t_m = compute_evaluation_metrics(
            dict(batch, verts_tgt_pred=t_verts), rng=np.random.RandomState(i)
        )
        j_m = compute_evaluation_metrics(
            dict(batch, verts_tgt_pred=j_verts), rng=np.random.RandomState(i)
        )
        for k in agg:
            raw[k][0].append(float(t_m[k]))
            raw[k][1].append(float(j_m[k]))
            # the reference's aggregation drops values > 1.0 (test.py:139)
            if t_m[k] <= 1.0:
                agg[k][0].append(float(t_m[k]))
            if j_m[k] <= 1.0:
                agg[k][1].append(float(j_m[k]))

    report = {"pairs": n_pairs, "torch_side": args.torch_side, "metrics": {}}
    ok = True
    for k in raw:
        t_mean = float(np.mean(raw[k][0]))
        j_mean = float(np.mean(raw[k][1]))
        rel = abs(j_mean - t_mean) / max(abs(t_mean), 1e-12)
        t_f, j_f = agg[k]
        report["metrics"][k] = {
            "torch": t_mean,
            "jax": j_mean,
            "rel_diff": rel,
            "torch_filtered": float(np.mean(t_f)) if t_f else None,
            "jax_filtered": float(np.mean(j_f)) if j_f else None,
            "kept_torch": len(t_f),
            "kept_jax": len(j_f),
        }
        if not np.isfinite(rel) or rel > args.threshold:
            ok = False
        # the two sides must also drop the same pairs
        if len(t_f) != len(j_f):
            ok = False
    report["threshold"] = args.threshold
    report["ok"] = ok
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

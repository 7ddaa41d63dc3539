"""Checkpointing with the reference's on-disk naming contract.

File names match ``utils/checkpoints.py`` in the reference exactly so
experiment directories look identical:

* ``model_{epoch:05d}`` / ``opt_{epoch:05d}`` every ``save_frequency`` epochs;
* ``modelbest_{epoch:05d}_{loss:03f}`` for the best validation loss;
* resume scans the directory for the highest epoch id.

Contents are flax msgpack bytes of ``{"params": ..., "batch_stats": ...}``
(model files) and the optax state (opt files).  ``load_model_variables``
additionally accepts torch checkpoint files (the published pretrained
``forward.pt``/``backward.pt``/``arbitrary.pt``), converted on the fly via
:mod:`nsdp_tpu.utils.torch_convert` — the analogue of the reference accepting
both raw ``state_dict`` and ``{"model_state_dict": ...}`` formats.
"""

import os
import re
from typing import Any, Optional, Tuple

import jax
from flax import serialization

_MODEL_RE = re.compile(r"^model_(\d{5})$")
_BEST_RE = re.compile(r"^modelbest_(\d{5})_([\d.]+)$")


def _to_bytes(tree) -> bytes:
    return serialization.to_bytes(jax.tree.map(lambda x: jax.device_get(x), tree))


def save_checkpoints(epoch: int, state, experiment_directory: str) -> None:
    """Write ``model_{epoch:05d}`` and ``opt_{epoch:05d}``."""
    model_path = os.path.join(experiment_directory, f"model_{epoch:05d}")
    opt_path = os.path.join(experiment_directory, f"opt_{epoch:05d}")
    with open(model_path, "wb") as f:
        f.write(
            _to_bytes({"params": state.params, "batch_stats": state.batch_stats})
        )
    with open(opt_path, "wb") as f:
        f.write(_to_bytes({"opt_state": state.opt_state, "step": state.step}))


def load_checkpoints(state, experiment_directory: str, args=None):
    """Resume from the latest ``model_*``/``opt_*`` pair, if any.

    Returns (state, continue_from_epoch).  Also sets
    ``args.continue_from_epoch`` when an argparse namespace is provided,
    matching the reference CLI contract.
    """
    if not os.path.isdir(experiment_directory):
        return state, None
    ids = [
        int(m.group(1))
        for f in os.listdir(experiment_directory)
        if (m := _MODEL_RE.match(f))
    ]
    if not ids:
        return state, None
    max_id = max(ids)
    model_path = os.path.join(experiment_directory, f"model_{max_id:05d}")
    opt_path = os.path.join(experiment_directory, f"opt_{max_id:05d}")
    if not (os.path.exists(model_path) and os.path.exists(opt_path)):
        return state, None

    print(f"Loading model checkpoint from {model_path}")
    with open(model_path, "rb") as f:
        target = {"params": state.params, "batch_stats": state.batch_stats}
        restored = serialization.from_bytes(target, f.read())
    print(f"Loading optimizer checkpoint from {opt_path}")
    with open(opt_path, "rb") as f:
        opt_restored = serialization.from_bytes(
            {"opt_state": state.opt_state, "step": state.step}, f.read()
        )
    state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=opt_restored["opt_state"],
        step=opt_restored["step"],
    )
    if args is not None:
        args.continue_from_epoch = max_id + 1
    return state, max_id + 1


def save_best_checkpoints(
    epoch: int, state, experiment_directory: str, val_loss: float
) -> None:
    path = os.path.join(
        experiment_directory, f"modelbest_{epoch:05d}_{val_loss:03f}"
    )
    with open(path, "wb") as f:
        f.write(
            _to_bytes({"params": state.params, "batch_stats": state.batch_stats})
        )


def load_best_checkpoints(state, experiment_directory: str, args=None):
    """Restore the latest ``modelbest_*`` checkpoint, if any.

    Returns (state, continue_from_epoch, best_val_loss).
    """
    if not os.path.isdir(experiment_directory):
        return state, None, None
    entries = [
        (m.group(1), m.group(2))
        for f in os.listdir(experiment_directory)
        if (m := _BEST_RE.match(f))
    ]
    if not entries:
        return state, None, None
    epoch_s, loss_s = sorted(f"{e}_{l}" for e, l in entries)[-1].split("_", 1)
    epoch, val_loss = int(epoch_s), float(loss_s)
    path = os.path.join(
        experiment_directory, f"modelbest_{epoch:05d}_{val_loss:03f}"
    )
    if not os.path.exists(path):
        return state, None, None
    print(f"Loading model checkpoint from {path}")
    with open(path, "rb") as f:
        target = {"params": state.params, "batch_stats": state.batch_stats}
        restored = serialization.from_bytes(target, f.read())
    state = state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"]
    )
    if args is not None:
        args.continue_from_epoch = epoch + 1
        args.best_val_loss = val_loss
    return state, epoch + 1, val_loss


def load_model_variables(path: str, state):
    """Load a weight file into the train state's params/batch_stats.

    Accepts this framework's msgpack files and — when the file is a torch
    checkpoint — converts it via ``nsdp_tpu.utils.torch_convert``.
    """
    with open(path, "rb") as f:
        data = f.read()
    try:
        target = {"params": state.params, "batch_stats": state.batch_stats}
        restored = serialization.from_bytes(target, data)
        return state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        )
    except Exception:
        from nsdp_tpu.utils.torch_convert import load_torch_checkpoint

        params, batch_stats = load_torch_checkpoint(
            path, state.params, state.batch_stats
        )
        return state.replace(params=params, batch_stats=batch_stats)

"""Convert reference torch checkpoints to nsdp_tpu flax variables.

The reference publishes pretrained ``forward.pt`` / ``backward.pt`` /
``arbitrary.pt`` torch ``state_dict`` files (reference ``README.md:79-84``;
both raw ``state_dict`` and ``{"model_state_dict": ...}`` wrappers occur, see
``model/__init__.py:85-92``).  This module maps those keys onto the flax
parameter tree produced by :mod:`nsdp_tpu.models`.

Key translation rules:
  * ModuleList indices join their parent name: ``transition_downs.0`` ->
    ``transition_downs_0``; ``blocks.1`` -> ``blocks_1``; ``fc_c.2`` ->
    ``fc_c_2``.
  * two-layer Sequential MLPs map indices ``0``/``2`` to ``fc0``/``fc1``.
  * BatchNorm modules gain the wrapper level ``bn`` (``bn1`` ->
    ``bn1/bn``); ``weight``/``bias`` become ``scale``/``bias`` in params,
    ``running_mean``/``running_var`` become ``mean``/``var`` in batch_stats,
    ``num_batches_tracked`` is dropped.
  * Linear ``weight`` (out, in) transposes to Dense ``kernel`` (in, out);
    1x1 ``Conv1d`` weight (out, in, 1) squeezes then transposes.

Torch is imported lazily (CPU build is available in the image) and only when
a torch checkpoint is actually loaded.
"""

from typing import Any, Dict, Tuple

import numpy as np
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict

# nn.ModuleList containers in the reference model tree.
_MODULE_LISTS = {
    "transition_downs",
    "transformer_downs",
    "elementwise",
    "elementwise_extras",
    "final_transformers",
    "final_elementwise",
    "blocks",
    "fc_c",
}
# two-layer Linear/ReLU/Linear Sequentials.
_SEQ_MLPS = {
    "fc_delta",
    "fc_delta1",
    "fc_gamma",
    "fc_gamma1",
    "fc_gamma2",
    "fc_middle",
    "fc_begin",
}
_SEQ_INDEX = {"0": "fc0", "2": "fc1"}
# BatchNorm1d module names (everything else named conv*/fc*/w_* is Dense).
_BN_NAMES = {"bn", "bn1", "bn2", "bn3", "bnorm0", "bnorm1", "bnorm2"}


def translate_state_dict(
    state_dict: Dict[str, np.ndarray],
) -> Tuple[Dict[tuple, np.ndarray], Dict[tuple, np.ndarray]]:
    """Translate a torch state_dict into flat (params, batch_stats) dicts."""
    params: Dict[tuple, np.ndarray] = {}
    batch_stats: Dict[tuple, np.ndarray] = {}

    for key, value in state_dict.items():
        tokens = key.split(".")
        leaf = tokens[-1]
        mods = tokens[:-1]
        if leaf == "num_batches_tracked":
            continue

        path = []
        i = 0
        while i < len(mods):
            tok = mods[i]
            nxt = mods[i + 1] if i + 1 < len(mods) else None
            if tok in _MODULE_LISTS and nxt is not None and nxt.isdigit():
                path.append(f"{tok}_{nxt}")
                i += 2
            elif tok in _SEQ_MLPS and nxt is not None and nxt.isdigit():
                path.append(tok)
                path.append(_SEQ_INDEX[nxt])
                i += 2
            else:
                path.append(tok)
                i += 1

        value = np.asarray(value)
        is_bn = path and path[-1] in _BN_NAMES
        if is_bn:
            path.append("bn")
            if leaf == "weight":
                params[tuple(path) + ("scale",)] = value
            elif leaf == "bias":
                params[tuple(path) + ("bias",)] = value
            elif leaf == "running_mean":
                batch_stats[tuple(path) + ("mean",)] = value
            elif leaf == "running_var":
                batch_stats[tuple(path) + ("var",)] = value
            else:
                raise ValueError(f"unexpected BatchNorm leaf in {key}")
        else:
            if leaf == "weight":
                if value.ndim == 3:  # 1x1 Conv1d
                    value = value[:, :, 0]
                params[tuple(path) + ("kernel",)] = value.T
            elif leaf == "bias":
                params[tuple(path) + ("bias",)] = value
            else:
                raise ValueError(f"unexpected leaf {leaf!r} in {key}")

    return params, batch_stats


def _merge(template: Any, flat_new: Dict[tuple, np.ndarray], what: str):
    """Replace template leaves with translated arrays, validating coverage.

    Missing keys (flax parameter with no torch source) are an error.  Extra
    torch keys are dropped with a warning: the reference model allocates
    parameters it never uses (e.g. the q/k/v projections of a ``pos_only``
    first transformer block), and those appear in published checkpoints.
    """
    flat_t = flatten_dict(template if isinstance(template, dict) else dict(template))
    missing = set(flat_t) - set(flat_new)
    if missing:
        raise ValueError(
            f"torch->{what} conversion missing {len(missing)} keys, "
            f"e.g. {sorted(missing)[:3]}"
        )
    extra = set(flat_new) - set(flat_t)
    if extra:
        import warnings

        warnings.warn(
            f"torch->{what}: dropping {len(extra)} unused torch keys, "
            f"e.g. {['/'.join(k) for k in sorted(extra)[:3]]}"
        )
    out = {}
    for k, tmpl in flat_t.items():
        v = flat_new[k]
        if tuple(v.shape) != tuple(tmpl.shape):
            raise ValueError(
                f"shape mismatch at {'/'.join(k)}: torch {v.shape} vs flax {tmpl.shape}"
            )
        out[k] = jnp.asarray(v, dtype=tmpl.dtype)
    return unflatten_dict(out)


def convert_state_dict(state_dict, params_template, batch_stats_template):
    """Translate + merge a torch state_dict into flax (params, batch_stats)."""
    state_dict = {k: np.asarray(v) for k, v in state_dict.items()}
    flat_p, flat_bs = translate_state_dict(state_dict)
    params = _merge(params_template, flat_p, "params")
    batch_stats = _merge(batch_stats_template, flat_bs, "batch_stats")
    return params, batch_stats


def load_torch_checkpoint(path, params_template, batch_stats_template):
    """Load a torch checkpoint file and convert it.

    Accepts both raw state_dicts and ``{"model_state_dict": ...}`` wrappers,
    like the reference loader.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    state_dict = {k: v.detach().cpu().numpy() for k, v in obj.items()}
    return convert_state_dict(state_dict, params_template, batch_stats_template)

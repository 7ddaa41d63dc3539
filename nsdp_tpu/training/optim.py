"""Optimizers and learning-rate schedules.

Mirrors the reference's ``optimizer_factory`` + ``StepLearningRateSchedule``
(``model/__init__.py:10-41``, ``model/learningrate.py:17-34``) on optax.

The learning rate is stepped per *epoch* (``lr = initial * factor**(epoch //
interval)``), so the gradient transformation is built LR-less
(``scale_by_adam`` / ``trace``) and the step function applies ``-lr *
update`` with the epoch's rate passed in as a traced scalar — one compiled
step function for all epochs, no recompilation when the LR changes.

Weight decay matches torch semantics (L2 added to the gradient *before* the
adaptive rescaling, not decoupled AdamW).
"""

from typing import Any, Dict

import jax
import numpy as np
import optax


class StepLearningRateSchedule:
    """lr(epoch) = initial * factor ** (epoch // interval)."""

    def __init__(self, specs: Dict[str, Any]):
        self.initial = specs["initial"]
        self.interval = specs["interval"]
        self.factor = specs["factor"]

    def get_learning_rate(self, epoch: int) -> float:
        return self.initial * (self.factor ** (epoch // self.interval))


def optimizer_factory(config: Dict[str, Any]):
    """Build (schedule, LR-less optax transformation) from a training config.

    Supported: ``optimizer: Adam`` (default) and ``SGD`` with momentum, the
    two the reference supports.
    """
    name = config.get("optimizer", "Adam")
    lr_init = config.get("lr", 1e-3)
    lr_step = config.get("lr_step", 100)
    lr_decay = config.get("lr_decay", 0.1)
    momentum = config.get("momentum", 0.9)
    weight_decay = config.get("weight_decay", 0.0)

    schedule = StepLearningRateSchedule(
        {"initial": lr_init, "interval": lr_step, "factor": lr_decay}
    )

    parts = []
    clip_grad = config.get("clip_grad", 0.0)
    if clip_grad:  # per-element value clipping (reference ``clamp_gradient``)
        parts.append(optax.clip(clip_grad))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if name == "Adam":
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    elif name == "SGD":
        parts.append(optax.trace(decay=momentum, nesterov=False))
    else:
        raise NotImplementedError(f"unknown optimizer {name!r}")
    return schedule, optax.chain(*parts)


def print_num_parameters(params, name: str = "model") -> int:
    """Parameter count, printed like the reference (``learningrate.py:6-9``)."""
    n = int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))
    print(f"Number of parameters in {name}:  {n} / {n}")
    return n

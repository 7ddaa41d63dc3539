"""Train state: a pytree bundling params, BN stats and optimizer state."""

from functools import partial
from typing import Any

import jax
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    """Immutable training state threaded through the jitted step."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def create_train_state(model, rng, example_inputs, tx) -> TrainState:
    """Initialise parameters by tracing the model once on example inputs.

    Args:
      model: unbound flax module.
      rng: PRNG key.
      example_inputs: tuple of positional inputs for ``model.init``.
      tx: optax gradient transformation (LR-less; see ``optim``).
    """
    # jit the init: eager initialisation dispatches thousands of tiny ops,
    # which is pathological over remote-device transports.
    variables = jax.jit(partial(model.init, train=False))(
        rng, *example_inputs
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jax.numpy.zeros((), jax.numpy.int32),
    )

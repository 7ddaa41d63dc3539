"""Load a pretrained stage-1 network into one branch of the arbitrary model.

The reference builds FlowArbitrary from independently pretrained forward and
backward nets (``model/__init__.py:82-104``); here the stage-1 checkpoint
(flax msgpack from this framework, or a published torch ``.pt``) is grafted
into the ``model_deform`` / ``model_canonicalize`` subtree of the composite
train state.
"""

from flax import serialization


def load_subnetwork(state, path: str, subtree: str):
    """Return ``state`` with params/batch_stats of ``subtree`` replaced.

    Args:
      state: TrainState of the FlowArbitrary model.
      path: checkpoint of a single DeformationNetwork (msgpack or torch).
      subtree: 'model_deform' or 'model_canonicalize'.
    """
    params = dict(state.params)
    batch_stats = dict(state.batch_stats)
    if subtree not in params:
        raise KeyError(
            f"{subtree!r} not in params (keys: {list(params)}); "
            "is this an 'arbitrary' model state?"
        )
    sub_p = params[subtree]
    sub_bs = batch_stats[subtree]

    with open(path, "rb") as f:
        data = f.read()
    try:
        restored = serialization.from_bytes(
            {"params": sub_p, "batch_stats": sub_bs}, data
        )
        new_p, new_bs = restored["params"], restored["batch_stats"]
    except Exception:
        from nsdp_tpu.utils.torch_convert import load_torch_checkpoint

        new_p, new_bs = load_torch_checkpoint(path, sub_p, sub_bs)

    params[subtree] = new_p
    batch_stats[subtree] = new_bs
    return state.replace(params=params, batch_stats=batch_stats)

"""Import the reference NSDP codebase as an executable torch oracle.

Every numeric-parity claim in this repo used to route through
``tests/torch_ref.py`` — a replica authored from SURVEY.md's behavioural
spec.  A transcription error in that replica would be invisible (both
sides would share it).  This module closes that gap zero-egress: it
``sys.path``-imports the reference's own ``model`` package
(``/root/reference/model/__init__.py:52-76``) so tests and the eval
runbook can run the REFERENCE'S OWN code as the parity oracle.

The reference model's only CUDA dependency is
``pointnet2_ops_lib.pointnet2_ops.pointnet2_utils.furthest_point_sample``
(``/root/reference/model/encoder/blocks.py:197,283``).  Before importing,
a CPU shim with the CUDA kernel's exact semantics is injected into
``sys.modules``:

- deterministically starts at index 0
  (``pointnet2_ops_lib/pointnet2_ops/_ext-src/src/sampling_gpu.cu:86``)
- skips points with ``||p||^2 <= 1e-3``
  (``sampling_gpu.cu:100-101``)
- running min-distance initialised to 1e10 (``sampling.cpp:66-87``)
- argmax ties resolve to the lowest index (the kernel's tree reduction
  keeps the first-seen maximum)

Everything is restored on exit: the fake ``pointnet2_ops_lib`` packages,
any ``model``/``model.*`` modules, and the ``sys.path`` entry — so
importing the reference cannot leak into other tests.
"""

import contextlib
import importlib
import os
import sys
import types

import numpy as np

DEFAULT_REFERENCE_ROOT = os.environ.get(
    "NSDP_REFERENCE_ROOT", "/root/reference"
)


def fps_cuda_semantics(points: np.ndarray, npoint: int) -> np.ndarray:
    """Furthest-point sampling with the reference CUDA kernel's semantics.

    Args:
      points: ``(B, N, 3)`` float array.
      npoint: number of samples to select per batch element.

    Returns:
      ``(B, npoint)`` int32 selected indices.
    """
    points = np.asarray(points, dtype=np.float32)
    B, N, _ = points.shape
    out = np.zeros((B, npoint), dtype=np.int32)
    for b in range(B):
        p = points[b]
        valid = (p**2).sum(-1) > 1e-3
        mind = np.full(N, 1e10, dtype=np.float64)
        sel = 0
        out[b, 0] = sel
        for i in range(1, npoint):
            d = ((p - p[sel]) ** 2).sum(-1)
            mind = np.where(valid, np.minimum(mind, d), mind)
            sel = int(np.argmax(np.where(valid, mind, -np.inf)))
            out[b, i] = sel
    return out


def reference_available(root: str = None) -> bool:
    root = root or DEFAULT_REFERENCE_ROOT
    return os.path.isfile(os.path.join(root, "model", "__init__.py"))


def _fake_pointnet2_modules():
    """Build the three-module fake ``pointnet2_ops_lib`` package tree."""
    import torch

    def furthest_point_sample(xyz, npoint):
        idx = fps_cuda_semantics(xyz.detach().cpu().numpy(), int(npoint))
        return torch.from_numpy(idx)  # int32, callers apply .long()

    utils_mod = types.ModuleType(
        "pointnet2_ops_lib.pointnet2_ops.pointnet2_utils"
    )
    utils_mod.furthest_point_sample = furthest_point_sample
    ops_mod = types.ModuleType("pointnet2_ops_lib.pointnet2_ops")
    ops_mod.pointnet2_utils = utils_mod
    lib_mod = types.ModuleType("pointnet2_ops_lib")
    lib_mod.pointnet2_ops = ops_mod
    return {
        "pointnet2_ops_lib": lib_mod,
        "pointnet2_ops_lib.pointnet2_ops": ops_mod,
        "pointnet2_ops_lib.pointnet2_ops.pointnet2_utils": utils_mod,
    }


@contextlib.contextmanager
def reference_model_package(root: str = None):
    """Context manager yielding the reference's imported ``model`` package.

    Usage::

        with reference_model_package() as ref:
            model, train_fn, val_fn, test_fn = ref.build_model(config)

    The yielded package exposes the reference's real ``build_model``,
    ``optimizer_factory``, ``Deformation_Networks``, ``FlowArbitrary`` and
    the six per-batch closures (``model/__init__.py:6-8,10-118``).
    """
    root = root or DEFAULT_REFERENCE_ROOT
    if not reference_available(root):
        raise FileNotFoundError(
            f"reference tree not found under {root!r} "
            "(set NSDP_REFERENCE_ROOT)"
        )

    fake = _fake_pointnet2_modules()
    touched = list(fake)
    saved = {name: sys.modules.get(name) for name in touched}
    # The reference uses absolute `from model...` imports; any module
    # named `model` (or submodule) already loaded would shadow or be
    # shadowed — stash and restore them all.
    saved.update(
        {
            name: mod
            for name, mod in list(sys.modules.items())
            if name == "model" or name.startswith("model.")
        }
    )
    for name in list(sys.modules):
        if name == "model" or name.startswith("model."):
            del sys.modules[name]
    sys.modules.update(fake)
    sys.path.insert(0, root)
    try:
        ref_model = importlib.import_module("model")
        yield ref_model
    finally:
        with contextlib.suppress(ValueError):
            sys.path.remove(root)
        for name in list(sys.modules):
            if (
                name == "model"
                or name.startswith("model.")
                or name in touched
            ):
                del sys.modules[name]
        for name, mod in saved.items():
            if mod is not None:
                sys.modules[name] = mod

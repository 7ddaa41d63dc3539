"""Deformation-field serving: warm, bucketed, numpy-in/numpy-out.

Production entry for interactive editing / pose-transfer backends: loads a
checkpoint once, pre-compiles the fused inference path at a ladder of query
bucket sizes, and serves arbitrary-size query sets by exact bucket padding.

    service = DeformationService.from_config("configs/deform4d/arbitrary.yaml")
    deformed = service.deform(points, surface_samples_inputs)  # numpy
"""

from typing import Dict, Optional, Sequence

import numpy as np


class DeformationService:
    """Stateful server around a deformation model checkpoint."""

    def __init__(
        self,
        config: Dict,
        weight_file: Optional[str] = None,
        buckets: Sequence[int] = (4096, 16384, 65536),
        warm: bool = False,
        mesh=None,
        use_fused: Optional[bool] = None,
        interpret: Optional[bool] = None,
    ):
        """Args beyond the obvious:

        mesh: optional ('data','query') device mesh — the fused path is
          shard_map-ped over it (queries split over 'query'; serve batch
          must divide 'data', so build the mesh with data=1 for single-
          request serving).  Query buckets are rounded up to a multiple of
          the query axis.
        use_fused: force the fused Pallas path on/off (default: auto —
          fused on TPU for the flagship encoder/decoder pair).
        interpret: run the Pallas kernels in interpreter mode (CPU tests).
        """
        import jax
        import jax.numpy as jnp

        from nsdp_tpu.models import build_model
        from nsdp_tpu.training import create_train_state, optimizer_factory
        from nsdp_tpu.training.checkpoints import load_model_variables

        self._jnp = jnp
        self.config = config
        self.buckets = sorted(buckets)
        self.model_type = config["model"]["type"]
        self.model = build_model(config)

        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.randn(1, 128, 3), jnp.float32)
        surf = jnp.asarray(rng.randn(1, 256, 3), jnp.float32)
        mask = jnp.ones((1, 256, 1), jnp.float32)
        inputs = jnp.concatenate([surf, surf * mask, mask], -1)
        _, tx = optimizer_factory(config.get("training", {}))
        if self.model_type == "arbitrary":
            example = (pts, surf, surf, mask)
        else:
            example = (pts, inputs)
        state = create_train_state(
            self.model, jax.random.PRNGKey(0), example, tx
        )
        if weight_file:
            state = load_model_variables(weight_file, state)
        self.state = state
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        if use_fused is None:
            use_fused = (
                jax.default_backend() in ("tpu", "axon")
                and config["model"]["decoder"] == "crossatten"
                and config["model"]["encoder"] == "pointransformer"
            )
        self._q_mult = int(mesh.shape["query"]) if mesh is not None else 1
        if use_fused:
            from nsdp_tpu.models.fast_predict import make_fast_predict

            self._predict = make_fast_predict(
                self.model,
                variables,
                self.model_type,
                nneigh=config["model"]["decoder_kwargs"].get("nneigh", 7),
                interpret=bool(interpret),
                mesh=mesh,
            )
        else:
            if mesh is not None:
                raise ValueError(
                    "mesh-sharded serving requires the fused path "
                    "(use_fused=True)"
                )
            from nsdp_tpu.training import make_steps

            steps = make_steps(self.model, self.model_type, tx)
            self._predict = lambda p, i: steps["predict"](self.state, p, i)

        if warm:
            self.warmup(int(inputs.shape[1]))

    @classmethod
    def from_config(cls, config_path: str, **kwargs) -> "DeformationService":
        from nsdp_tpu.utils.config import load_config

        config = load_config(config_path)
        kwargs.setdefault("weight_file", config.get("test", {}).get("weight_file"))
        return cls(config, **kwargs)

    def _bucket(self, q: int) -> int:
        out = None
        for b in self.buckets:
            if q <= b:
                out = b
                break
        if out is None:
            # round up to a multiple of the largest bucket
            big = self.buckets[-1]
            out = ((q + big - 1) // big) * big
        # shard_map needs the query axis divisible by the mesh
        m = self._q_mult
        return ((out + m - 1) // m) * m

    def warmup(self, n_surface: int) -> None:
        """Pre-compile every bucket size for a given conditioning size."""
        jnp = self._jnp
        rng = np.random.RandomState(0)
        inputs = jnp.asarray(rng.randn(1, n_surface, 7), jnp.float32)
        for b in self.buckets:
            pts = jnp.asarray(rng.randn(1, b, 3), jnp.float32)
            np.asarray(self._predict(pts, inputs))

    def deform(
        self, points: np.ndarray, surface_samples_inputs: np.ndarray
    ) -> np.ndarray:
        """Evaluate the deformation field.

        Args:
          points: (Q, 3) or (B, Q, 3) query positions.
          surface_samples_inputs: (N, 7) or (B, N, 7) conditioning.

        Returns:
          deformed positions, same leading shape as ``points``.
        """
        jnp = self._jnp
        squeeze = points.ndim == 2
        if squeeze:
            points = points[None]
            surface_samples_inputs = surface_samples_inputs[None]
        q = points.shape[1]
        target = self._bucket(q)
        if target != q:
            pad = np.zeros((points.shape[0], target - q, 3), points.dtype)
            padded = np.concatenate([points, pad], axis=1)
        else:
            padded = points
        out = np.asarray(
            self._predict(
                jnp.asarray(padded, jnp.float32),
                jnp.asarray(surface_samples_inputs, jnp.float32),
            )
        )[:, :q]
        return out[0] if squeeze else out

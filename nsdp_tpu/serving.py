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
        self._variables = variables
        self._use_fused = use_fused
        self._interpret = bool(interpret)
        self._mesh = mesh
        self._halves = {}  # {masked: (cano_fn, deform_fn)}, lazy
        self._predict_masked = None  # built lazily on first masked deform
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
            self._predict = lambda p, i, m=None: steps["predict"](
                self.state, p, i, m
            )

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

    def warmup(
        self,
        n_surface: int,
        masked: Optional[bool] = None,
        sessions: Optional[bool] = None,
    ) -> None:
        """Pre-compile the serving surface at every bucket size.

        Covers the unmasked predict, the masked (padded-partial) predict,
        and the edit-session canonicalize/deform halves, so no request path
        hits a first-call trace+compile (multi-second latency through the
        TPU tunnel).

        Args:
          n_surface: conditioning cloud size to compile for.
          masked: also warm the ``point_mask`` paths (default: on when the
            config sets ``data.pad_partial_shapes``).
          sessions: also warm the edit-session halves (default: on for the
            'arbitrary' composition, which is the interactive model).
        """
        jnp = self._jnp
        if masked is None:
            masked = bool(
                self.config.get("data", {}).get("pad_partial_shapes", False)
            )
        if sessions is None:
            sessions = self.model_type == "arbitrary"
        rng = np.random.RandomState(0)
        inputs = jnp.asarray(rng.randn(1, n_surface, 7), jnp.float32)
        pmask = jnp.ones((1, n_surface), jnp.float32)
        for b in self.buckets:
            # warm at the shape requests actually pad to: _bucket rounds
            # up to a multiple of the mesh's query axis, so warming the
            # raw bucket size would compile shapes never served
            pts = jnp.asarray(rng.randn(1, self._bucket(b), 3), jnp.float32)
            np.asarray(self._predict(pts, inputs))
            if masked:
                np.asarray(
                    self._masked_predict()(pts, inputs, pmask)
                    if self._use_fused
                    else self._predict(pts, inputs, pmask)
                )
            if sessions:
                for m in ((False, True) if masked else (False,)):
                    cano_fn, deform_fn = self._get_halves(m)
                    margs = (pmask,) if m else ()
                    space_cano, surf_cano = cano_fn(
                        pts, inputs[..., 0:3], *margs
                    )
                    np.asarray(
                        deform_fn(
                            space_cano, surf_cano, inputs[..., 3:6],
                            inputs[..., 6:7], *margs
                        )
                    )

    def _masked_predict(self):
        if self._predict_masked is None and self._mesh is None:
            # single-device fused predict already accepts the optional mask
            self._predict_masked = self._predict
        if self._predict_masked is None:
            from nsdp_tpu.models.fast_predict import make_fast_predict

            self._predict_masked = make_fast_predict(
                self.model,
                self._variables,
                self.model_type,
                nneigh=self.config["model"]["decoder_kwargs"].get("nneigh", 7),
                interpret=self._interpret,
                mesh=self._mesh,
                with_mask=True,
            )
        return self._predict_masked

    def deform(
        self,
        points: np.ndarray,
        surface_samples_inputs: np.ndarray,
        point_mask: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Evaluate the deformation field.

        Args:
          points: (Q, 3) or (B, Q, 3) query positions.
          surface_samples_inputs: (N, 7) or (B, N, 7) conditioning.
          point_mask: optional (N,) or (B, N) validity mask for padded
            partial conditioning clouds (``data.pad_partial_shapes``
            contract: padded rows zero, nonzero = real point); served by
            the fused and flax paths alike.

        Returns:
          deformed positions, same leading shape as ``points``.
        """
        jnp = self._jnp
        squeeze = points.ndim == 2
        if squeeze:
            points = points[None]
            surface_samples_inputs = surface_samples_inputs[None]
            if point_mask is not None:
                point_mask = np.asarray(point_mask)[None]
        q = points.shape[1]
        target = self._bucket(q)
        if target != q:
            pad = np.zeros((points.shape[0], target - q, 3), points.dtype)
            padded = np.concatenate([points, pad], axis=1)
        else:
            padded = points
        if point_mask is not None:
            predict_m = (
                self._masked_predict() if self._use_fused else self._predict
            )
            out = np.asarray(
                predict_m(
                    jnp.asarray(padded, jnp.float32),
                    jnp.asarray(surface_samples_inputs, jnp.float32),
                    jnp.asarray(point_mask, jnp.float32),
                )
            )[:, :q]
        else:
            out = np.asarray(
                self._predict(
                    jnp.asarray(padded, jnp.float32),
                    jnp.asarray(surface_samples_inputs, jnp.float32),
                )
            )[:, :q]
        return out[0] if squeeze else out

    # -- interactive editing sessions -----------------------------------------

    def _get_halves(self, masked: bool = False):
        if masked not in self._halves:
            self._halves[masked] = self._build_halves(masked)
        return self._halves[masked]

    def _build_halves(self, masked: bool = False):
        """Jitted canonicalize/deform halves (fused or flax path).

        ``masked=True`` builds the variants taking a trailing ``point_mask``
        (B, N) argument, so padded-partial conditioning runs the same
        fused interactive path as full shapes.
        """
        import jax
        from functools import partial

        if self._use_fused:
            from nsdp_tpu.models.fast_predict import make_fast_arbitrary_halves

            impls = make_fast_arbitrary_halves(
                self.model,
                nneigh=self.config["model"]["decoder_kwargs"].get("nneigh", 7),
                interpret=self._interpret,
            )
            base_cano, base_deform = impls["canonicalize"], impls["deform"]
        else:
            model = self.model

            def base_cano(variables, points, surf_src, point_mask=None):
                def method(m, points, surf, pm, train):
                    enc = m.model_canonicalize.encode(
                        surf, train=train, point_mask=pm
                    )
                    space_cano = m.model_canonicalize.decode(
                        points, enc, train=train
                    )
                    surf_cano = m.model_canonicalize.decode(
                        surf, enc, train=train
                    )
                    if pm is not None:
                        # same contract as FlowArbitrary.__call__: padded
                        # rows stay at the origin in the conditioning
                        surf_cano = surf_cano * pm[..., None].astype(
                            surf_cano.dtype
                        )
                    return space_cano, surf_cano

                return model.apply(
                    variables, points, surf_src, point_mask, False,
                    method=method,
                )

            def base_deform(variables, space_cano, surf_cano, surf_tgt,
                            mask, point_mask=None):
                def method(m, sc, su, tgt, msk, pm, train):
                    cond = self._jnp.concatenate([su, tgt, msk], axis=-1)
                    return m.model_deform(
                        sc, cond, train=train, point_mask=pm
                    )

                return model.apply(
                    variables, space_cano, surf_cano, surf_tgt, mask,
                    point_mask, False, method=method,
                )

        # fixed positional arity per variant (shard_map needs static specs)
        if masked:
            cano_impl = lambda v, p, s, pm: base_cano(v, p, s, pm)
            deform_impl = (
                lambda v, sc, su, t, m, pm: base_deform(v, sc, su, t, m, pm)
            )
        else:
            cano_impl = lambda v, p, s: base_cano(v, p, s)
            deform_impl = (
                lambda v, sc, su, t, m: base_deform(v, sc, su, t, m)
            )

        if self._mesh is not None:
            from nsdp_tpu.parallel.mesh import shard_map
            from jax.sharding import PartitionSpec as P

            extra = (P("data"),) if masked else ()
            cano_impl = shard_map(
                cano_impl, mesh=self._mesh,
                in_specs=(P(), P("data", "query"), P("data")) + extra,
                out_specs=(P("data", "query"), P("data")),
            )
            deform_impl = shard_map(
                deform_impl, mesh=self._mesh,
                in_specs=(P(), P("data", "query"), P("data"), P("data"),
                          P("data")) + extra,
                out_specs=P("data", "query"),
            )
        return (
            jax.jit(partial(cano_impl, self._variables)),
            jax.jit(partial(deform_impl, self._variables)),
        )

    def edit_session(
        self,
        points: np.ndarray,
        surface_samples_src: np.ndarray,
        point_mask: Optional[np.ndarray] = None,
    ) -> "EditSession":
        """Open an interactive editing session over a fixed source shape.

        The canonicalisation half (backward net: encode the source surface,
        canonicalise the query points and the surface) depends only on the
        source, so it runs ONCE here; each handle drag afterwards re-runs
        only the forward half — about half the full evaluation (the
        reference re-runs all three net passes per drag,
        ``model/flow_arbitrary.py:15-27``).

        Args:
          points: (Q, 3) query positions to deform at every drag (e.g. the
            mesh vertices).
          surface_samples_src: (N, 3) source surface samples.
          point_mask: optional (N,) validity mask for padded-partial
            conditioning (``data.pad_partial_shapes`` contract); the
            session's canonicalisation and every drag run the masked
            fused path.
        """
        if self.model_type != "arbitrary":
            raise ValueError(
                "edit sessions need the 'arbitrary' composition "
                f"(got {self.model_type!r})"
            )
        masked = point_mask is not None
        cano_fn, _ = self._get_halves(masked)
        jnp = self._jnp
        q = points.shape[0]
        target = self._bucket(q)
        padded = np.concatenate(
            [points, np.zeros((target - q, 3), points.dtype)], axis=0
        )
        pm = None
        margs = ()
        if masked:
            pm = jnp.asarray(
                np.asarray(point_mask, np.float32).reshape(1, -1)
            )
            margs = (pm,)
        space_cano, surf_cano = cano_fn(
            jnp.asarray(padded, jnp.float32)[None],
            jnp.asarray(surface_samples_src, jnp.float32)[None],
            *margs,
        )
        return EditSession(self, space_cano, surf_cano, q, pm)


class EditSession:
    """Precomputed canonicalisation + per-drag forward evaluation."""

    def __init__(self, service, space_cano, surf_cano, q, point_mask=None):
        self._service = service
        self._space_cano = space_cano
        self._surf_cano = surf_cano
        self._q = q
        self._point_mask = point_mask

    def drag(self, surface_samples_tgt, handle_mask) -> np.ndarray:
        """Deform the session's query points toward a (partial) target.

        Args:
          surface_samples_tgt: (N, 3) masked target positions (zeros
            outside the handle, like ``surface_samples_inputs[:, 3:6]``).
          handle_mask: (N, 1) or (N,) handle indicator.

        Returns:
          (Q, 3) deformed query positions.
        """
        svc = self._service
        _, deform_fn = svc._get_halves(self._point_mask is not None)
        jnp = svc._jnp
        mask = np.asarray(handle_mask, np.float32).reshape(-1, 1)
        margs = () if self._point_mask is None else (self._point_mask,)
        out = deform_fn(
            self._space_cano,
            self._surf_cano,
            jnp.asarray(surface_samples_tgt, jnp.float32)[None],
            jnp.asarray(mask)[None],
            *margs,
        )
        return np.asarray(out)[0, : self._q]

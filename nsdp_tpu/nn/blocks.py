"""Point-transformer building blocks, re-designed for TPU in flax.linen.

Semantics follow the reference's AIR-Nets-derived modules (reference
``model/encoder/blocks.py`` and ``model/decoder/blocks.py``) but the
implementation is channels-last, fixed-shape, gather-based JAX: kNN uses the
blockwise MXU kernel from :mod:`nsdp_tpu.ops.knn` instead of materialising
N x N distance matrices and argsorting all columns, and neighbourhood
features are formed with ``take_along_axis`` gathers that XLA fuses into the
surrounding attention arithmetic.

Conventions:
  * all point/feature tensors are (B, N, C) channels-last;
  * BatchNorm wraps ``flax.linen.BatchNorm`` with torch-compatible
    hyper-parameters (eps 1e-5, running-average momentum 0.9 == torch 0.1);
    stats are taken over batch and point axes, matching torch
    ``BatchNorm1d`` applied to (B, C, N);
  * ``train=True`` uses batch statistics and updates the ``batch_stats``
    collection; ``train=False`` uses running statistics.
"""

import contextlib
from contextvars import ContextVar
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn

from nsdp_tpu.ops import furthest_point_sample, index_points, knn

# Cross-replica ("sync") BatchNorm axis.  When the training step runs under
# ``shard_map`` over the 'data' mesh axis (nsdp_tpu.training.steps with a
# mesh), every op in the model is batch-pointwise EXCEPT BatchNorm, whose
# batch statistics must span the *global* batch to match single-device
# training exactly.  Threading an ``axis_name`` attribute through every
# module that owns a BatchNorm would churn the whole model API for one
# tracing-time flag, so the axis is carried by a context variable instead:
# :func:`bn_sync_axis` is entered *inside* the shard-mapped function body, so
# it is active exactly while that body is being traced and the psums it
# triggers bind to the enclosing shard_map's axis name.
_BN_SYNC_AXIS: ContextVar[Optional[str]] = ContextVar(
    "nsdp_bn_sync_axis", default=None
)


@contextlib.contextmanager
def bn_sync_axis(axis_name: Optional[str]):
    """Within this context, BatchNorm computes batch statistics globally via
    ``jax.lax.psum`` over the named mesh axis (use inside a ``shard_map``
    body during tracing)."""
    token = _BN_SYNC_AXIS.set(axis_name)
    try:
        yield
    finally:
        _BN_SYNC_AXIS.reset(token)


class TwoLayerMLP(fnn.Module):
    """Dense -> ReLU -> Dense, the reference's ubiquitous `fc_*` Sequential."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, x):
        x = fnn.Dense(self.features, dtype=self.dtype, name="fc0")(x)
        x = fnn.relu(x)
        return fnn.Dense(self.features, dtype=self.dtype, name="fc1")(x)


class DenseWeights(fnn.Module):
    """Declares Dense-compatible params (kernel/bias) and returns them raw.

    Produces the exact same parameter tree as ``fnn.Dense`` with the same
    name and initialisers, so checkpoints are interchangeable between the
    standard path (Dense applies the weights) and the fused-kernel path
    (the Pallas kernel consumes them directly)."""

    features: int
    use_bias: bool = True

    @fnn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel",
            fnn.initializers.lecun_normal(),
            (in_features, self.features),
        )
        bias = (
            self.param(
                "bias", fnn.initializers.zeros_init(), (self.features,)
            )
            if self.use_bias
            else None
        )
        return kernel, bias


class TwoLayerMLPWeights(fnn.Module):
    """Raw weights of a :class:`TwoLayerMLP` (same param tree)."""

    features: int

    @fnn.compact
    def __call__(self, in_features: int):
        k0, b0 = DenseWeights(self.features, name="fc0")(in_features)
        k1, b1 = DenseWeights(self.features, name="fc1")(self.features)
        return k0, b0, k1, b1


BN_MOMENTUM = 0.9  # EMA decay; equals torch BatchNorm1d's momentum=0.1


class _TorchExactBatchNorm(fnn.Module):
    """BatchNorm with torch's exact training dynamics.

    Differs from ``flax.linen.BatchNorm`` in one semantic: the running
    variance is updated with the *unbiased* (Bessel-corrected) batch variance,
    as torch does (``torch.nn.BatchNorm1d`` docs; normalisation itself still
    uses the biased variance in train mode).  flax updates with the biased
    variance, which drifts the ``batch_stats`` trajectory away from a torch
    run — detectable at small batch x point counts and a systematic bias at
    any size.  Parameter / variable tree is identical to ``fnn.BatchNorm``
    (params ``scale``/``bias``; batch_stats ``mean``/``var``), so checkpoints
    and the torch converter are unaffected.
    """

    momentum: float = BN_MOMENTUM
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, x, use_running_average: bool, mask=None):
        feat = x.shape[-1]
        scale = self.param("scale", fnn.initializers.ones_init(), (feat,),
                           jnp.float32)
        bias = self.param("bias", fnn.initializers.zeros_init(), (feat,),
                          jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        reduce_axes = tuple(range(x.ndim - 1))
        sync_axis = _BN_SYNC_AXIS.get()
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            if sync_axis is not None:
                # Global-batch statistics across the shard_map axis: one
                # psum for (sum, count), then a second for the centred
                # squared sum — the same two-pass mean/var a single device
                # computes, so sharded == unsharded up to f32 reduction
                # order (no E[x^2]-E[x]^2 cancellation).
                if mask is None:
                    n_local = 1
                    for a in reduce_axes:
                        n_local *= x.shape[a]
                    s = jnp.sum(xf, axis=reduce_axes)
                    n = jnp.float32(n_local)
                else:
                    w = mask.astype(jnp.float32)[..., None]
                    s = jnp.sum(xf * w, axis=reduce_axes)
                    n = jnp.sum(w)
                s, n = jax.lax.psum((s, n), sync_axis)
                n = jnp.maximum(n, 1.0)
                mean = s / n
                if mask is None:
                    ss = jnp.sum(jnp.square(xf - mean), axis=reduce_axes)
                else:
                    ss = jnp.sum(
                        jnp.square(xf - mean) * w, axis=reduce_axes
                    )
                var = jax.lax.psum(ss, sync_axis) / n
            elif mask is None:
                mean = jnp.mean(xf, axis=reduce_axes)
                var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes)
                n = 1
                for a in reduce_axes:
                    n *= x.shape[a]
                n = jnp.float32(n)
            else:
                # statistics over valid rows only (static-shape partial
                # point clouds): weighted mean/var, Bessel over the valid
                # count — equals torch BN run on the compacted rows.
                w = mask.astype(jnp.float32)[..., None]  # (..., 1)
                n = jnp.maximum(jnp.sum(w), 1.0)
                mean = jnp.sum(xf * w, axis=reduce_axes) / n
                var = jnp.sum(jnp.square(xf - mean) * w, axis=reduce_axes) / n
            if not self.is_initializing():
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * unbiased
        out_dtype = self.dtype or x.dtype
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(out_dtype)


class BatchNorm(fnn.Module):
    """BatchNorm over all axes but the last, torch-``BatchNorm1d``-compatible."""

    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, x, train: bool, mask=None):
        return _TorchExactBatchNorm(
            momentum=BN_MOMENTUM,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x, use_running_average=not train, mask=mask)


def vector_attention(query, key, value, pos_enc, value_pos_enc, gamma_mlp):
    """Point-Transformer *vector* attention.

    attn = softmax_over_neighbours(gamma(q - k + pos));  out = sum attn*(v+pos_v)

    The softmax is per-channel over the neighbour axis (-2), the defining
    property of vector attention (reference ``model/encoder/blocks.py:117-126``).

    Args:
      query: (B, N, D).
      key, value: (B, N, K, D) gathered neighbour features.
      pos_enc: (B, N, K, D) relative position encoding added inside gamma.
      value_pos_enc: (B, N, K, D) encoding added to values.
      gamma_mlp: callable (the attention MLP, applied pre-softmax).

    Returns:
      (B, N, D).
    """
    attn = gamma_mlp(query[:, :, None, :] - key + pos_enc)
    attn = jax.nn.softmax(attn, axis=-2)
    return jnp.sum(attn * (value + value_pos_enc), axis=-2)


class TransformerBlock(fnn.Module):
    """Local (kNN) or full vector self-attention with residual + BatchNorm.

    Mirrors reference ``model/encoder/blocks.py:52-134``: neighbourhoods are
    the k nearest points *including the point itself*; ``pos_only=True`` drops
    the q/k/v projections and attends purely over position encodings (used as
    the very first block when the input has no features); ``group_all=True``
    performs full self-attention (every point attends to all points).
    """

    d_model: int
    k: int
    pos_only: bool = False
    group_all: bool = False
    dtype: Optional[jnp.dtype] = None
    fused: bool = False  # differentiable Pallas attention (TPU; f32)

    @fnn.compact
    def __call__(self, xyz, feats=None, train: bool = False, kv_mask=None):
        B, n, _ = xyz.shape
        if kv_mask is not None and self.group_all:
            raise ValueError(
                "kv_mask is only supported for kNN attention (full "
                "self-attention runs post-downsampling on real points)"
            )

        if self.fused and not self.group_all:
            from nsdp_tpu.ops.attention_pallas import knn_vector_attention

            dw = TwoLayerMLPWeights(self.d_model, name="fc_delta")(3)
            gw = TwoLayerMLPWeights(self.d_model, name="fc_gamma")(self.d_model)
            kk = min(self.k, n)
            if self.pos_only:
                # tile 256 is ~15% faster fwd+bwd than 128 at the hot
                # pos-only shape (Q=M=5000, k=10, batch 16: 24.2 ->
                # 20.7 ms; chip sweep, docs/PERFORMANCE.md).  Scoped VMEM
                # stays moderate without K/V gather tables (k unrolled
                # (T, M) one-hots ~52 MB at the flagship shape).  The
                # featured branch below keeps the 128 default: 256
                # measured *slower* there and 1024 (the only faster
                # point, -4%) risks the k-unrolled one-hot VMEM blowup
                # in fusion contexts (commit 8e4c9b3).
                res = knn_vector_attention(
                    xyz, xyz, None, None, None, None, None, kv_mask,
                    *dw, *gw, kk, 256,
                )
            else:
                from nsdp_tpu.ops.attention_pallas import (
                    knn_vector_attention_proj, kv_proj_profitable,
                )

                q = fnn.Dense(self.d_model, use_bias=False, name="w_qs")(feats)
                # The bf16 gate is a hardware workaround, not profitability:
                # under compute_dtype=bfloat16 this site's proj kernel
                # crashes the TPU worker (deterministic 3/3 in the round-5
                # bench, B=16 flagship shapes) while the f32 model — and
                # every kernel-level micro-repro, including bf16-operand
                # and in-loop variants — runs clean, as do the bf16 TSA
                # proj sites below.  Casting the operands f32 at the call
                # site does NOT help (the wrapper casts f32 regardless), so
                # the fault is an in-situ Mosaic/XLA interaction of the
                # surrounding bf16 program, bisected 2026-08-20
                # (/tmp-level repro scripts recorded in docs/PERFORMANCE.md).
                # bf16 models keep the projected-table path here — the
                # round-4 configuration, ~87 ms/step.
                if (kv_proj_profitable(n, feats.shape[-1], self.d_model)
                        and feats.dtype == jnp.float32):
                    # project-in-kernel K/V: gather the raw feature table
                    # once per slot instead of separate K and V tables —
                    # halves the dominant (T, M) gathers at large-M sites
                    # (the forward net's featured begin block).  Same
                    # param tree as the Dense path (DenseWeights).
                    wk, _ = DenseWeights(
                        self.d_model, use_bias=False, name="w_ks"
                    )(feats.shape[-1])
                    wv, _ = DenseWeights(
                        self.d_model, use_bias=False, name="w_vs"
                    )(feats.shape[-1])
                    res = knn_vector_attention_proj(
                        xyz, xyz, q, feats, wk, wv, kv_mask, *dw, *gw, kk
                    ) + feats
                else:
                    k_ = fnn.Dense(
                        self.d_model, use_bias=False, name="w_ks"
                    )(feats)
                    v = fnn.Dense(
                        self.d_model, use_bias=False, name="w_vs"
                    )(feats)
                    res = knn_vector_attention(
                        xyz, xyz, q, k_, v, None, None, kv_mask, *dw, *gw, kk
                    ) + feats
            return BatchNorm(dtype=self.dtype, name="bn")(res, train, kv_mask)

        fc_delta = TwoLayerMLP(self.d_model, dtype=self.dtype, name="fc_delta")
        fc_gamma = TwoLayerMLP(self.d_model, dtype=self.dtype, name="fc_gamma")

        if self.group_all:
            knn_xyz = jnp.broadcast_to(xyz[:, None, :, :], (B, n, n, 3))
            gather = lambda t: jnp.broadcast_to(
                t[:, None, :, :], (B, n, n, t.shape[-1])
            )
        else:
            # torch argsort slicing is lenient when k exceeds the point
            # count; clamp to match.
            idx = knn(
                jax.lax.stop_gradient(xyz),
                jax.lax.stop_gradient(xyz),
                min(self.k, n),
                kv_mask=kv_mask,
            )
            knn_xyz = index_points(xyz, idx)
            gather = lambda t: index_points(t, idx)

        pos_enc = fc_delta(xyz[:, :, None, :] - knn_xyz)

        if self.pos_only:
            attn = jax.nn.softmax(fc_gamma(pos_enc), axis=-2)
            res = jnp.sum(attn * pos_enc, axis=-2)
        else:
            q = fnn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="w_qs")(feats)
            k = gather(fnn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="w_ks")(feats))
            v = gather(fnn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="w_vs")(feats))
            res = vector_attention(q, k, v, pos_enc, pos_enc, fc_gamma) + feats
        return BatchNorm(dtype=self.dtype, name="bn")(res, train, kv_mask)


class ElementwiseMLP(fnn.Module):
    """Per-point MLP with residual: D->BN->ReLU->D->BN->ReLU->(+x)->BN.

    Reference ``model/encoder/blocks.py:137-159`` (1x1 Conv1d == Dense on a
    channels-last layout; no permutes needed on TPU).
    """

    dim: int
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        h = fnn.Dense(self.dim, dtype=self.dtype, name="conv1")(x)
        h = fnn.relu(BatchNorm(dtype=self.dtype, name="bn1")(h, train))
        h = fnn.Dense(self.dim, dtype=self.dtype, name="conv2")(h)
        h = fnn.relu(BatchNorm(dtype=self.dtype, name="bn2")(h, train))
        return BatchNorm(dtype=self.dtype, name="bn3")(x + h, train)


class TransformerSetAbstraction(fnn.Module):
    """Attention-based downsampling (FPS centres cross-attend to neighbours).

    Reference ``model/encoder/blocks.py:221-313``: FPS picks ``npoint``
    centres, each centre runs two rounds of vector cross-attention over its
    ``nneigh`` nearest input points (shared position encoding), with a 1x1
    conv residual between rounds and a residual to the gathered input
    features at the end.
    """

    npoint: int
    nneigh: int
    dim: int
    dtype: Optional[jnp.dtype] = None
    fused: bool = False  # differentiable Pallas attention (TPU; f32)

    @fnn.compact
    def __call__(self, xyz, points, train: bool = False, kv_mask=None):
        B = xyz.shape[0]
        xyz_ng = jax.lax.stop_gradient(xyz)
        if kv_mask is None:
            fps_xyz = xyz_ng
        else:
            # Masked points are zeroed to the origin, which FPS never selects
            # (the reference CUDA kernel's ||p||^2 <= 1e-3 skip, see ops/fps).
            fps_xyz = xyz_ng * kv_mask[..., None].astype(xyz_ng.dtype)
        fps_idx = furthest_point_sample(fps_xyz, self.npoint)
        # The reference computes new_xyz INSIDE torch.no_grad()
        # (``model/encoder/blocks.py:282-285``): the downsampled anchor
        # coordinates are detached, so no gradient flows into the input
        # coordinates through anchor positions (pos encodings, later
        # levels, decoder anchors) — only through the still-differentiable
        # grouped_xyz neighbour gathers.  Irrelevant in stage 1 (inputs are
        # leaves) but it changes model_canonicalize's gradients in the
        # stage-2 composition, where the input coords are themselves
        # network outputs.  PointNetSetAbstraction does NOT detach
        # (``blocks.py:196-199``).  Verified against the reference's own
        # code in tests/test_reference_code_parity.py.
        new_xyz = index_points(xyz_ng, fps_idx)

        dense = lambda name: fnn.Dense(
            self.dim, use_bias=False, dtype=self.dtype, name=name
        )

        if self.fused:
            from nsdp_tpu.ops.attention_pallas import (
                knn_vector_attention,
                knn_vector_attention_proj,
                kv_proj_profitable,
            )

            # TSA's position delta is (neighbour - centre); negating both
            # coordinate sets flips the kernel's (query - neighbour) delta
            # while distances are unchanged.
            dw = TwoLayerMLPWeights(self.dim, name="fc_delta1")(3)
            g1w = TwoLayerMLPWeights(self.dim, name="fc_gamma1")(self.dim)
            g2w = TwoLayerMLPWeights(self.dim, name="fc_gamma2")(self.dim)
            kk = min(self.nneigh, xyz.shape[1])
            q1 = index_points(dense("w_qs")(points), fps_idx)
            use_proj = kv_proj_profitable(
                xyz.shape[1], points.shape[-1], self.dim
            )
            # tile stays at the 128 default: 256 measured as noise at the
            # hot TSA shape (500 centres over 5000 points, k=16, batch 16:
            # 5.74 vs 5.79 ms) and 512 overruns scoped VMEM with the
            # k-unrolled (T, M) one-hots (~117 MB, commit 8e4c9b3).  (512
            # DID win 24% on a bf16-operand table variant of the kernel,
            # but that variant regressed end-to-end and was reverted —
            # docs/PERFORMANCE.md, "gather operand width".)
            if use_proj:
                # raw-feature gather + in-kernel K/V projection (one big
                # gather per slot instead of two; DenseWeights keeps the
                # param tree identical to the Dense path)
                dense_w = lambda name: DenseWeights(
                    self.dim, use_bias=False, name=name
                )(points.shape[-1])[0]
                res1 = knn_vector_attention_proj(
                    -new_xyz, -xyz, q1, points,
                    dense_w("w_ks"), dense_w("w_vs"),
                    kv_mask, *dw, *g1w, kk,
                )
            else:
                res1 = knn_vector_attention(
                    -new_xyz, -xyz, q1,
                    dense("w_ks")(points), dense("w_vs")(points),
                    None, None, kv_mask, *dw, *g1w, kk,
                )
            h = fnn.Dense(self.dim, dtype=self.dtype, name="conv1")(res1)
            h = fnn.relu(BatchNorm(dtype=self.dtype, name="bn1")(h, train))
            h = fnn.Dense(self.dim, dtype=self.dtype, name="conv2")(h)
            res1 = BatchNorm(dtype=self.dtype, name="bnorm0")(res1 + h, train)
            q2 = fnn.Dense(
                self.dim, use_bias=False, dtype=self.dtype, name="w_qs2"
            )(res1)
            if use_proj:
                res2 = knn_vector_attention_proj(
                    -new_xyz, -xyz, q2, points,
                    dense_w("w_ks2"), dense_w("w_vs2"),
                    kv_mask, *dw, *g2w, kk,
                )
            else:
                res2 = knn_vector_attention(
                    -new_xyz, -xyz, q2,
                    dense("w_ks2")(points), dense("w_vs2")(points),
                    None, None, kv_mask, *dw, *g2w, kk,
                )
            new_points = BatchNorm(dtype=self.dtype, name="bnorm1")(
                res1 + res2, train
            )
            new_points = new_points + index_points(points, fps_idx)
            new_points = BatchNorm(dtype=self.dtype, name="bnorm2")(
                new_points, train
            )
            return new_xyz, new_points

        idx = knn(
            jax.lax.stop_gradient(new_xyz), xyz_ng, self.nneigh,
            kv_mask=kv_mask,
        )

        fc_delta1 = TwoLayerMLP(self.dim, dtype=self.dtype, name="fc_delta1")
        fc_gamma1 = TwoLayerMLP(self.dim, dtype=self.dtype, name="fc_gamma1")
        fc_gamma2 = TwoLayerMLP(self.dim, dtype=self.dtype, name="fc_gamma2")

        grouped_xyz = index_points(xyz, idx)
        pos_enc = fc_delta1(grouped_xyz - new_xyz[:, :, None, :])

        # Round 1: queries are the FPS centres' own features.
        q1 = index_points(dense("w_qs")(points), fps_idx)
        k1 = index_points(dense("w_ks")(points), idx)
        v1 = index_points(dense("w_vs")(points), idx)
        res1 = vector_attention(q1, k1, v1, pos_enc, pos_enc, fc_gamma1)

        h = fnn.Dense(self.dim, dtype=self.dtype, name="conv1")(res1)
        h = fnn.relu(BatchNorm(dtype=self.dtype, name="bn1")(h, train))
        h = fnn.Dense(self.dim, dtype=self.dtype, name="conv2")(h)
        res1 = BatchNorm(dtype=self.dtype, name="bnorm0")(res1 + h, train)

        # Round 2: queries are the round-1 outputs.
        q2 = fnn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="w_qs2")(res1)
        k2 = index_points(dense("w_ks2")(points), idx)
        v2 = index_points(dense("w_vs2")(points), idx)
        res2 = vector_attention(q2, k2, v2, pos_enc, pos_enc, fc_gamma2)

        new_points = BatchNorm(dtype=self.dtype, name="bnorm1")(res1 + res2, train)
        new_points = new_points + index_points(points, fps_idx)
        new_points = BatchNorm(dtype=self.dtype, name="bnorm2")(new_points, train)
        return new_xyz, new_points


class PointNetSetAbstraction(fnn.Module):
    """PointNet++-style downsampling: FPS + kNN grouping + max-pool.

    Reference ``model/encoder/blocks.py:162-217``. Used by the ablation
    ``pointnet++`` encoder.
    """

    npoint: int
    nneigh: int
    dim: int
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, xyz, points, train: bool = False, kv_mask=None):
        xyz_ng = jax.lax.stop_gradient(xyz)
        if kv_mask is None:
            fps_xyz = xyz_ng
        else:
            fps_xyz = xyz_ng * kv_mask[..., None].astype(xyz_ng.dtype)
        fps_idx = furthest_point_sample(fps_xyz, self.npoint)
        new_xyz = index_points(xyz, fps_idx)

        points = fnn.Dense(self.dim, dtype=self.dtype, name="fc1")(points)
        points_ori = index_points(points, fps_idx)

        h = fnn.Dense(self.dim, dtype=self.dtype, name="conv1")(points)
        h = fnn.relu(BatchNorm(dtype=self.dtype, name="bn1")(h, train, kv_mask))
        h = fnn.Dense(self.dim, dtype=self.dtype, name="conv2")(h)
        h = fnn.relu(BatchNorm(dtype=self.dtype, name="bn2")(h, train, kv_mask))
        points = points + h

        idx = knn(
            jax.lax.stop_gradient(new_xyz), xyz_ng, self.nneigh,
            kv_mask=kv_mask,
        )
        grouped = index_points(points, idx)
        new_points = points_ori + jnp.max(grouped, axis=2)
        new_points = BatchNorm(dtype=self.dtype, name="bn")(new_points, train)
        return new_xyz, new_points


class TransitionDown(fnn.Module):
    """Downsampling dispatcher: ``attentive`` or ``maxpool`` set abstraction.

    Reference ``model/encoder/blocks.py:18-49``.
    """

    npoint: int
    nneigh: int
    dim: int
    sa_type: str = "attentive"
    dtype: Optional[jnp.dtype] = None
    fused: bool = False

    @fnn.compact
    def __call__(self, xyz, points, train: bool = False, kv_mask=None):
        if self.sa_type == "attentive":
            sa = TransformerSetAbstraction(
                self.npoint, self.nneigh, self.dim, dtype=self.dtype,
                fused=self.fused, name="sa"
            )
        elif self.sa_type == "maxpool":
            sa = PointNetSetAbstraction(
                self.npoint, self.nneigh, self.dim, dtype=self.dtype, name="sa"
            )
        else:
            raise ValueError(f"unknown set abstraction type {self.sa_type!r}")
        return sa(xyz, points, train, kv_mask)


class CrossTransformerBlock(fnn.Module):
    """Query points cross-attend to their nearest anchors plus a global token.

    Reference ``model/decoder/blocks.py:12-95``: keys/values are the
    ``nneigh`` nearest anchors of each query plus one global token projected
    from the global latent; the global token's position encoding is zero.
    The reference's ``separate_delta`` recomputes the value-side position
    encoding with the *same* ``fc_delta`` parameters — numerically identical
    to reusing it, so it is computed once here.
    """

    dim_inp: int
    dim: int
    nneigh: int = 7
    reduce_dim: bool = True
    dtype: Optional[jnp.dtype] = None
    fused: bool = False  # differentiable Pallas attention (TPU; f32)

    @fnn.compact
    def __call__(self, xyz_q, lat_rep, xyz, points):
        B, nQ, _ = xyz_q.shape
        dense = lambda name: fnn.Dense(
            self.dim, use_bias=False, dtype=self.dtype, name=name
        )

        if self.fused and lat_rep.ndim == 2:
            from nsdp_tpu.ops.attention_pallas import knn_vector_attention

            dw = TwoLayerMLPWeights(self.dim, name="fc_delta")(3)
            gw = TwoLayerMLPWeights(self.dim, name="fc_gamma")(self.dim)
            q_glob = dense("w_qs")(lat_rep)
            k_glob = dense("w_k_global")(lat_rep)
            v_glob = dense("w_v_global")(lat_rep)
            qf = jnp.broadcast_to(q_glob[:, None, :], (B, nQ, self.dim))
            # tile 512: 25% faster fwd+bwd than 128 at decoder shapes
            # (small anchor set, weight-grad matmuls amortise over rows).
            # Guarded by the kv-set size: the kernel keeps k unrolled
            # (tile, M) one-hots live at once, so a large anchor set at
            # tile 512 overruns the 100 MB scoped-VMEM limit (the same
            # blowup that reverted the TSA tile, commit 8e4c9b3) — configs
            # with >256 final anchors fall back to the default 128 tile.
            tile = 512 if xyz.shape[1] <= 256 else 128
            res = knn_vector_attention(
                xyz_q, xyz, qf,
                dense("w_ks")(points), dense("w_vs")(points),
                k_glob, v_glob, None, *dw, *gw,
                min(self.nneigh, xyz.shape[1]), tile,
            )
            if not self.reduce_dim:
                res = fnn.Dense(self.dim_inp, dtype=self.dtype, name="fc")(res)
            return res

        fc_delta = TwoLayerMLP(self.dim, dtype=self.dtype, name="fc_delta")
        fc_gamma = TwoLayerMLP(self.dim, dtype=self.dtype, name="fc_gamma")

        k_anchors = min(self.nneigh, xyz.shape[1])
        knn_idx = knn(
            jax.lax.stop_gradient(xyz_q), jax.lax.stop_gradient(xyz), k_anchors
        )

        if lat_rep.ndim == 2:
            q = jnp.broadcast_to(
                dense("w_qs")(lat_rep)[:, None, :], (B, nQ, self.dim)
            )
            k_glob = jnp.broadcast_to(
                dense("w_k_global")(lat_rep)[:, None, None, :], (B, nQ, 1, self.dim)
            )
            v_glob = jnp.broadcast_to(
                dense("w_v_global")(lat_rep)[:, None, None, :], (B, nQ, 1, self.dim)
            )
        else:
            q = dense("w_qs")(lat_rep)
            k_glob = dense("w_k_global")(lat_rep)[:, :, None, :]
            v_glob = dense("w_v_global")(lat_rep)[:, :, None, :]

        k = jnp.concatenate(
            [index_points(dense("w_ks")(points), knn_idx), k_glob], axis=2
        )
        v = jnp.concatenate(
            [index_points(dense("w_vs")(points), knn_idx), v_glob], axis=2
        )
        anchor_xyz = index_points(xyz, knn_idx)
        pos_enc = fc_delta(xyz_q[:, :, None, :] - anchor_xyz)
        zeros = jnp.zeros((B, nQ, 1, self.dim), dtype=pos_enc.dtype)
        pos_enc = jnp.concatenate([pos_enc, zeros], axis=2)

        res = vector_attention(q, k, v, pos_enc, pos_enc, fc_gamma)
        if not self.reduce_dim:
            res = fnn.Dense(self.dim_inp, dtype=self.dtype, name="fc")(res)
        return res


class ResnetBlockFC(fnn.Module):
    """Fully-connected ResNet block with zero-initialised second layer.

    Reference ``model/decoder/blocks.py:99-142`` (from convolutional
    occupancy networks): out = shortcut(x) + fc1(relu(fc0(relu(x)))),
    with fc1's weight zero-initialised so the block starts as identity.
    """

    size_in: int
    size_out: Optional[int] = None
    size_h: Optional[int] = None
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, x):
        size_out = self.size_out or self.size_in
        size_h = self.size_h or min(self.size_in, size_out)

        net = fnn.Dense(size_h, dtype=self.dtype, name="fc_0")(fnn.relu(x))
        dx = fnn.Dense(
            size_out,
            kernel_init=fnn.initializers.zeros_init(),
            dtype=self.dtype,
            name="fc_1",
        )(fnn.relu(net))

        if self.size_in == size_out:
            x_s = x
        else:
            x_s = fnn.Dense(
                size_out, use_bias=False, dtype=self.dtype, name="shortcut"
            )(x)
        return x_s + dx

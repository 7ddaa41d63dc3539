"""API-compatibility layer mirroring the reference's ``pointnet2_ops``.

The reference vendors a CUDA extension with Python wrappers
(``pointnet2_ops/pointnet2_utils.py:279-380`` — ``QueryAndGroup`` /
``GroupAll`` — and ``pointnet2_ops/pointnet2_modules.py`` —
``PointnetSAModule(MSG)`` / ``PointnetFPModule``).  Only
``furthest_point_sample`` is used by the NSDP model path, but the full
surface is provided here so ablation/extension code written against the
pointnet2 API ports directly.  Tensors follow the pointnet2 convention:
positions channels-last (B, N, 3), features channels-FIRST (B, C, N).
"""

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as fnn

from nsdp_tpu.ops.fps import furthest_point_sample
from nsdp_tpu.ops.gather import gather_operation, grouping_operation
from nsdp_tpu.ops.geometry import ball_query, three_interpolate, three_nn
from nsdp_tpu.ops.knn import knn


def query_and_group(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    features: Optional[jax.Array] = None,
    use_xyz: bool = True,
) -> jax.Array:
    """Ball-query grouping: (B,N,3),(B,S,3)[,(B,C,N)] -> (B, C(+3), S, nsample).

    Grouped xyz are expressed relative to their centre, as in the reference
    ``QueryAndGroup.forward``.
    """
    idx = ball_query(radius, nsample, xyz, new_xyz)
    xyz_t = jnp.swapaxes(xyz, 1, 2)  # (B, 3, N)
    grouped_xyz = grouping_operation(xyz_t, idx)  # (B, 3, S, nsample)
    grouped_xyz = grouped_xyz - jnp.swapaxes(new_xyz, 1, 2)[..., None]
    if features is not None:
        grouped_features = grouping_operation(features, idx)
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_features], axis=1)
        return grouped_features
    if not use_xyz:
        raise ValueError("cannot have not features and not use xyz")
    return grouped_xyz


def group_all(
    xyz: jax.Array, features: Optional[jax.Array] = None, use_xyz: bool = True
) -> jax.Array:
    """Single-group variant: (B,N,3)[,(B,C,N)] -> (B, C(+3), 1, N)."""
    grouped_xyz = jnp.swapaxes(xyz, 1, 2)[:, :, None, :]
    if features is not None:
        grouped_features = features[:, :, None, :]
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_features], axis=1)
        return grouped_features
    return grouped_xyz


class _SharedMLP(fnn.Module):
    """Conv2d-1x1 + BN + ReLU stack over (B, C, S, nsample)."""

    channels: Sequence[int]

    @fnn.compact
    def __call__(self, x, train: bool = False):
        # channels-last internally for TPU-friendly layout
        h = jnp.moveaxis(x, 1, -1)  # (B, S, nsample, C)
        for i, c in enumerate(self.channels):
            h = fnn.Dense(c, name=f"conv{i}")(h)
            h = fnn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name=f"bn{i}",
            )(h)
            h = fnn.relu(h)
        return jnp.moveaxis(h, -1, 1)


class PointnetSAModuleMSG(fnn.Module):
    """Multi-scale-grouping set abstraction (pointnet2_modules.py)."""

    npoint: Optional[int]
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True

    @fnn.compact
    def __call__(self, xyz, features=None, train: bool = False):
        if self.npoint is not None:
            fps_idx = furthest_point_sample(xyz, self.npoint)
            new_xyz = jnp.swapaxes(
                gather_operation(jnp.swapaxes(xyz, 1, 2), fps_idx), 1, 2
            )
        else:
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)

        outs: List[jax.Array] = []
        for i, (radius, nsample, mlp) in enumerate(
            zip(self.radii, self.nsamples, self.mlps)
        ):
            if self.npoint is not None:
                grouped = query_and_group(
                    radius, nsample, xyz, new_xyz, features, self.use_xyz
                )
            else:
                grouped = group_all(xyz, features, self.use_xyz)
            h = _SharedMLP(mlp, name=f"mlp{i}")(grouped, train)
            outs.append(jnp.max(h, axis=-1))  # (B, C, S)
        return new_xyz, jnp.concatenate(outs, axis=1)


class PointnetSAModule(PointnetSAModuleMSG):
    """Single-scale set abstraction."""

    @classmethod
    def create(cls, mlp, npoint=None, radius=None, nsample=None, use_xyz=True):
        return cls(
            npoint=npoint,
            radii=[radius],
            nsamples=[nsample],
            mlps=[mlp],
            use_xyz=use_xyz,
        )


class PointnetFPModule(fnn.Module):
    """Feature propagation: 3-NN inverse-distance interpolation + MLP."""

    mlp: Sequence[int]

    @fnn.compact
    def __call__(
        self, unknown, known, unknow_feats, known_feats, train: bool = False
    ):
        if known is not None:
            dist, idx = three_nn(unknown, known)
            recip = 1.0 / (dist + 1e-8)
            weight = recip / jnp.sum(recip, axis=2, keepdims=True)
            interpolated = three_interpolate(known_feats, idx, weight)
        else:
            interpolated = jnp.broadcast_to(
                known_feats[..., 0:1],
                known_feats.shape[:2] + (unknown.shape[1],),
            )
        if unknow_feats is not None:
            new_features = jnp.concatenate(
                [interpolated, unknow_feats], axis=1
            )
        else:
            new_features = interpolated
        h = _SharedMLP(self.mlp, name="mlp")(new_features[..., None], train)
        return h[..., 0]

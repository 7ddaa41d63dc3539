"""Static-shape helpers: bucket padding for variable-size test meshes.

Test-time meshes have arbitrary vertex counts; jit requires static shapes.
The decoder evaluates query points independently, so padding the *query* axis
is exact: padded rows are evaluated and sliced off, never influencing real
outputs.  (Conditioning point clouds are NOT padded — zero-padding would
corrupt FPS/kNN neighbourhoods — they keep their native size, which is fixed
per dataset.)
"""

import math

import numpy as np


def next_bucket(n: int, bucket: int = 4096) -> int:
    """Smallest multiple of ``bucket`` >= n (at least one bucket)."""
    return max(bucket, int(math.ceil(n / bucket)) * bucket)


def pad_queries(points: np.ndarray, bucket: int = 4096):
    """Pad (B, Q, 3) along Q to a bucket size; returns (padded, original_q)."""
    q = points.shape[1]
    target = next_bucket(q, bucket)
    if target == q:
        return points, q
    pad = np.zeros(
        (points.shape[0], target - q, points.shape[2]), dtype=points.dtype
    )
    return np.concatenate([np.asarray(points), pad], axis=1), q


def predict_padded(steps, state, points, surface_samples_inputs, bucket=4096):
    """Evaluate the deformation field with query-axis bucket padding.

    ``steps`` is either the dict from ``make_steps`` (flax path, uses
    ``state``) or a bare ``predict(points, inputs)`` callable (fast path,
    ``state`` ignored).
    """
    padded, q = pad_queries(np.asarray(points), bucket)
    if callable(steps):
        out = steps(padded, surface_samples_inputs)
    else:
        out = steps["predict"](state, padded, surface_samples_inputs)
    return np.asarray(out)[:, :q]

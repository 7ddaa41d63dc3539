"""Visualisation helpers: error colormaps on meshes and point clouds.

Replaces the reference's open3d-based ``utils/visualize.py`` with pure numpy
+ the standalone mesh IO: the jet colormap error-map mesh used by test-time
mesh export (reference ``utils/visualize.py:36-79``, consumed at
``utils/generation.py:60-62``).
"""

import numpy as np


def jet_colormap(values: np.ndarray, vmin: float = None, vmax: float = None):
    """Map scalars to RGB in [0,1] with a jet-style colormap."""
    values = np.asarray(values, dtype=np.float64)
    vmin = values.min() if vmin is None else vmin
    vmax = values.max() if vmax is None else vmax
    t = np.zeros_like(values) if vmax <= vmin else (values - vmin) / (vmax - vmin)
    t = np.clip(t, 0.0, 1.0)

    r = np.clip(1.5 - np.abs(4 * t - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * t - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * t - 1), 0, 1)
    return np.stack([r, g, b], axis=-1)


def error_map_colors(errors: np.ndarray, error_max: float = 0.1) -> np.ndarray:
    """Per-vertex uint8 colors for an error field (clamped at ``error_max``)."""
    rgb = jet_colormap(np.clip(errors, 0.0, error_max), 0.0, error_max)
    return (rgb * 255).astype(np.uint8)


def vis_error_map(verts: np.ndarray, faces: np.ndarray, errors: np.ndarray):
    """(verts, faces, uint8 colors) triple for an error-colored mesh export."""
    return verts, faces, error_map_colors(errors)


def export_flow_field(
    path: str,
    points_src: np.ndarray,
    points_dst: np.ndarray,
    stride: int = 1,
) -> None:
    """Write a deformation flow field as a PLY line set (src -> dst edges).

    The standalone replacement for the reference's open3d arrow-field dumps
    (``utils/visualize.py:201-312`` there): every ``stride``-th point emits a
    line segment from its source to its deformed position, colored by
    displacement magnitude.
    """
    src = np.asarray(points_src)[::stride]
    dst = np.asarray(points_dst)[::stride]
    n = len(src)
    disp = np.linalg.norm(dst - src, axis=-1)
    colors = error_map_colors(disp, max(float(disp.max()), 1e-6))

    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {2 * n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element edge {n}\n")
        f.write("property int vertex1\nproperty int vertex2\nend_header\n")
        for i in range(n):
            c = colors[i]
            f.write(
                f"{src[i][0]} {src[i][1]} {src[i][2]} {c[0]} {c[1]} {c[2]}\n"
            )
            f.write(
                f"{dst[i][0]} {dst[i][1]} {dst[i][2]} {c[0]} {c[1]} {c[2]}\n"
            )
        for i in range(n):
            f.write(f"{2 * i} {2 * i + 1}\n")

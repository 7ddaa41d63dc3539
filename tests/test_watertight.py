"""Watertight remeshing (the GAPS msh2df step,
``process_mesh_local.sh:39-50``)."""

import os

import numpy as np
import pytest

from nsdp_tpu.data.synthetic import icosphere
from nsdp_tpu.preprocess.watertight import (
    mesh_to_signed_distance_grid,
    watertight_mesh,
    watertight_mesh_file,
)


def _boundary_edge_count(faces):
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    return int((counts == 1).sum())


@pytest.fixture(scope="module")
def holed_sphere():
    verts, faces = icosphere(3)
    cent = verts[faces].mean(1)
    open_faces = faces[cent[:, 2] < 0.93]  # cut a cap off (hole r ~ 0.37)
    assert _boundary_edge_count(open_faces) > 0
    return verts, open_faces


def test_signed_distance_grid_signs(holed_sphere):
    verts, faces = holed_sphere
    grid, origin, h = mesh_to_signed_distance_grid(
        verts, faces, spacing=0.1, n_samples=20000,
        rng=np.random.RandomState(0),
    )
    # origin corner far outside -> positive; centre inside -> negative
    assert grid[0, 0, 0] > 0
    ci = tuple(((-origin) / h).astype(int))
    assert grid[ci] < 0
    # all six grid boundary faces strictly outside (flood-fill correction)
    for face in (grid[0], grid[-1], grid[:, 0], grid[:, -1],
                 grid[:, :, 0], grid[:, :, -1]):
        assert (face > 0).all()


def test_watertight_closes_open_mesh(holed_sphere):
    verts, faces = holed_sphere
    w_verts, w_faces = watertight_mesh(
        verts, faces, spacing=0.05, n_samples=50000,
        rng=np.random.RandomState(0),
    )
    assert _boundary_edge_count(w_faces) == 0  # closed manifold
    r = np.linalg.norm(w_verts, axis=1)
    # surface stays near the unit sphere (the capped hole pulls in a bit)
    assert 0.9 < r.mean() < 1.05
    assert r.max() < 1.1


def test_watertight_file_roundtrip(holed_sphere, tmp_path):
    from nsdp_tpu.utils import meshio

    verts, faces = holed_sphere
    src = str(tmp_path / "open.obj")
    dst = str(tmp_path / "closed.ply")
    meshio.save_mesh(src, verts.astype(np.float32), faces)
    watertight_mesh_file(src, dst, spacing=0.08, n_samples=20000,
                         rng=np.random.RandomState(0))
    w_verts, w_faces = meshio.load_mesh(dst)
    assert _boundary_edge_count(np.asarray(w_faces)) == 0


def test_poisson_reconstruct_sphere():
    """Screened-Poisson reconstruction of an oriented sphere sampling:
    closed output, radius within a few percent, interior classified inside
    (the spectral screening must not decay the indicator plateau)."""
    from nsdp_tpu.preprocess.poisson import poisson_reconstruct

    rng = np.random.RandomState(0)
    pts = rng.randn(20000, 3)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    w_verts, w_faces = poisson_reconstruct(pts, pts, depth=6)
    assert _boundary_edge_count(w_faces) == 0
    r = np.linalg.norm(w_verts, axis=1)
    assert 0.93 < r.mean() < 1.07
    assert r.std() < 0.05


def test_poisson_closes_open_mesh(holed_sphere):
    """The meshlab screened-Poisson watertight path (make_watertight.sh:19)
    closes an open mesh like the sdf path does."""
    from nsdp_tpu.preprocess.poisson import watertight_mesh_poisson

    verts, faces = holed_sphere
    w_verts, w_faces = watertight_mesh_poisson(
        verts, faces, depth=6, n_samples=50000,
        rng=np.random.RandomState(0),
    )
    assert _boundary_edge_count(w_faces) == 0
    r = np.linalg.norm(w_verts, axis=1)
    assert 0.85 < r.mean() < 1.1


def test_pipeline_poisson_method(holed_sphere, tmp_path):
    from nsdp_tpu.preprocess.normalize import normalize_mesh_file
    from nsdp_tpu.utils import meshio

    verts, faces = holed_sphere
    src = str(tmp_path / "frame.obj")
    meshio.save_mesh(src, verts.astype(np.float32), faces)
    out_dir = str(tmp_path / "out")
    normalize_mesh_file(
        src, out_dir, make_watertight=True,
        watertight_method="poisson", watertight_depth=6,
    )
    assert os.path.isfile(os.path.join(out_dir, "model_watertight.ply"))
    nverts, nfaces = meshio.load_mesh(
        os.path.join(out_dir, "model_normalized.obj")
    )
    assert _boundary_edge_count(np.asarray(nfaces)) == 0


@pytest.mark.slow  # CLI-flag plumbing variant of the core watertight test
def test_pipeline_flag_writes_watertight(holed_sphere, tmp_path):
    """normalize_mesh_file(make_watertight=True) mirrors the shell contract:
    model_watertight.ply + normalisation computed from the remesh."""
    from nsdp_tpu.preprocess.normalize import normalize_mesh_file
    from nsdp_tpu.utils import meshio

    verts, faces = holed_sphere
    src = str(tmp_path / "frame.obj")
    meshio.save_mesh(src, verts.astype(np.float32), faces)
    out_dir = str(tmp_path / "out")
    normalize_mesh_file(
        src, out_dir, make_watertight=True, watertight_spacing=0.08
    )
    assert os.path.isfile(os.path.join(out_dir, "model_watertight.ply"))
    assert os.path.isfile(os.path.join(out_dir, "orig_to_gaps.txt"))
    assert os.path.isfile(os.path.join(out_dir, "model_normalized.obj"))
    nverts, nfaces = meshio.load_mesh(
        os.path.join(out_dir, "model_normalized.obj")
    )
    assert _boundary_edge_count(np.asarray(nfaces)) == 0

"""Native C++ runtime: KD-tree NN vs scipy, marching tetrahedra on analytic
SDFs (the contract PyMarchingCubes' own tests check: empty volume, sphere)."""

import numpy as np
import pytest

native = pytest.importorskip("nsdp_tpu.native")
try:
    native._load()
except Exception as e:  # toolchain missing
    pytest.skip(f"native library unavailable: {e}", allow_module_level=True)


class TestNN:
    def test_matches_scipy(self):
        from scipy.spatial import KDTree

        rng = np.random.RandomState(0)
        pts = rng.randn(2000, 3).astype(np.float32)
        q = rng.randn(500, 3).astype(np.float32)
        d_native = native.nearest_neighbor_distances(q, pts)
        d_scipy, _ = KDTree(pts).query(q)
        np.testing.assert_allclose(d_native, d_scipy, rtol=1e-5, atol=1e-6)

    def test_indices(self):
        rng = np.random.RandomState(1)
        pts = rng.randn(300, 3).astype(np.float32)
        q = pts[[5, 17, 100]] + 1e-4
        d, idx = native.nearest_neighbor_distances(q, pts, return_index=True)
        np.testing.assert_array_equal(idx, [5, 17, 100])
        assert (d < 1e-3).all()

    def test_single_point(self):
        pts = np.array([[1.0, 2.0, 3.0]], np.float32)
        q = np.array([[1.0, 2.0, 4.0]], np.float32)
        d = native.nearest_neighbor_distances(q, pts)
        np.testing.assert_allclose(d, [1.0], rtol=1e-6)


class TestMarchingCubes:
    def test_empty_volume(self):
        grid = np.ones((8, 8, 8), np.float32)  # all outside
        verts, faces = native.marching_cubes(grid, 0.0)
        assert len(verts) == 0 and len(faces) == 0

    def test_sphere_radius(self):
        n = 48
        c = (n - 1) / 2.0
        r = 15.0
        x, y, z = np.meshgrid(*(np.arange(n),) * 3, indexing="ij")
        sdf = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) - r
        verts, faces = native.marching_cubes(sdf.astype(np.float32), 0.0)
        assert len(verts) > 100 and len(faces) > 100
        radii = np.linalg.norm(verts - c, axis=1)
        np.testing.assert_allclose(radii.mean(), r, rtol=0.01)
        assert radii.std() < 0.2

    def test_watertight_welding(self):
        # every edge of a closed isosurface must be shared by exactly 2 faces
        n = 24
        c = (n - 1) / 2.0
        x, y, z = np.meshgrid(*(np.arange(n),) * 3, indexing="ij")
        sdf = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) - 7.0
        verts, faces = native.marching_cubes(sdf.astype(np.float32), 0.0)
        from collections import Counter

        edge_count = Counter()
        for f in faces:
            for a, b in ((0, 1), (1, 2), (2, 0)):
                e = (min(f[a], f[b]), max(f[a], f[b]))
                edge_count[e] += 1
        counts = np.array(list(edge_count.values()))
        assert (counts == 2).all()

    def test_level_offset(self):
        n = 32
        c = (n - 1) / 2.0
        x, y, z = np.meshgrid(*(np.arange(n),) * 3, indexing="ij")
        dist = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)
        verts, _ = native.marching_cubes(dist.astype(np.float32), 10.0)
        radii = np.linalg.norm(verts - c, axis=1)
        np.testing.assert_allclose(radii.mean(), 10.0, rtol=0.01)

"""Meshing API tests (reference ``external/PyMarchingCubes/test_mcubes.py``
strategy: empty volume, analytic sphere, grid/function equivalence,
exporters, invalid input — plus the smoothing module)."""

import numpy as np
import pytest

from nsdp_tpu import meshing


def _sphere_volume(n=24, r=0.35):
    xs = np.linspace(0, 1, n)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    return ((gx - 0.5) ** 2 + (gy - 0.5) ** 2 + (gz - 0.5) ** 2) - r * r


class TestMarchingCubes:
    def test_empty_volume(self):
        verts, faces = meshing.marching_cubes(np.ones((8, 8, 8)), 0.0)
        assert len(verts) == 0 and len(faces) == 0

    def test_sphere_radius(self):
        n, r = 32, 0.35
        vol = _sphere_volume(n, r)
        verts, faces = meshing.marching_cubes(vol, 0.0)
        assert len(verts) > 100 and len(faces) > 100
        radii = np.linalg.norm(verts / (n - 1) - 0.5, axis=1)
        np.testing.assert_allclose(radii, r, atol=0.01)

    def test_func_matches_grid(self):
        """Function-sampled extraction == array extraction on the same
        lattice, mapped to world coordinates."""
        n, r = 24, 0.35
        f = lambda x, y, z: (x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2 - r * r
        verts_f, faces_f = meshing.marching_cubes_func(
            (0.0, 0.0, 0.0), (1.0, 1.0, 1.0), n, n, n, f, 0.0
        )
        verts_g, faces_g = meshing.marching_cubes(_sphere_volume(n, r), 0.0)
        np.testing.assert_allclose(verts_f, verts_g / (n - 1), atol=1e-5)
        np.testing.assert_array_equal(faces_f, faces_g)

    def test_func_scalar_callable(self):
        """The reference contract is a scalar f(x,y,z) -> float."""
        calls = []

        def f(x, y, z):
            if np.ndim(x):  # force the per-point fallback
                raise TypeError
            calls.append(1)
            return (x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2 - 0.1

        verts, faces = meshing.marching_cubes_func(
            (0.0, 0.0, 0.0), (1.0, 1.0, 1.0), 8, 8, 8, f, 0.0
        )
        assert len(calls) >= 8 ** 3
        assert len(verts) > 0

    def test_func_invalid_input(self):
        f = lambda x, y, z: x
        with pytest.raises(ValueError):
            meshing.marching_cubes_func((1, 0, 0), (0, 1, 1), 8, 8, 8, f, 0.0)
        with pytest.raises(ValueError):
            meshing.marching_cubes_func((0, 0, 0), (1, 1, 1), 1, 8, 8, f, 0.0)

    def test_color_volume(self):
        n = 20
        vol = _sphere_volume(n)
        xs = np.linspace(0, 1, n)
        color = np.stack(
            np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1
        )  # rgb = normalised xyz
        verts, faces = meshing.marching_cubes_color(vol, color, 0.0)
        assert verts.shape[1] == 6
        # interpolated color equals the coordinate field at each vertex
        np.testing.assert_allclose(
            verts[:, 3:6], verts[:, :3] / (n - 1), atol=1e-5
        )
        with pytest.raises(ValueError):
            meshing.marching_cubes_color(vol, color[..., :2], 0.0)

    def test_color_func(self):
        f = lambda x, y, z: (x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2 - 0.1
        one = lambda x, y, z: np.ones_like(x) * 0.25
        verts, faces = meshing.marching_cubes_color_func(
            (0.0, 0.0, 0.0), (1.0, 1.0, 1.0), 12, 12, 12, f, one, one, one, 0.0
        )
        assert verts.shape[1] == 6
        np.testing.assert_allclose(verts[:, 3:6], 0.25, atol=1e-7)

    def test_super_sampling_refines_edges(self):
        """A plane at x=0.5+delta between coarse nodes: the coarse mesh puts
        the crossing by linear interpolation of the coarse values, the
        super-sampled volume relocates it to the fine sign change."""
        n, ss = 9, 4

        def plane(x):  # nonlinear in x so coarse interp is biased
            return np.tanh(8.0 * (x - 0.52))

        xs_c = np.linspace(0, 1, n)
        xs_f = np.linspace(0, 1, n + (n - 1) * ss)
        gxf, gyc, gzc = np.meshgrid(xs_f, xs_c, xs_c, indexing="ij")
        volX = plane(gxf)
        gxc, gyf, gzc2 = np.meshgrid(xs_c, xs_f, xs_c, indexing="ij")
        volY = plane(gxc)
        gxc2, gyc2, gzf = np.meshgrid(xs_c, xs_c, xs_f, indexing="ij")
        volZ = plane(gxc2)

        verts_ss, _ = meshing.marching_cubes_super_sampling(
            volX, volY, volZ, 0.0
        )
        verts_c, _ = meshing.marching_cubes(volX[:: ss + 1], 0.0)

        # x-edge vertices (integral y,z) must land closer to the true plane
        def x_edge_err(verts):
            frac = verts - np.round(verts)
            sel = (
                (np.abs(frac[:, 1]) < 1e-5)
                & (np.abs(frac[:, 2]) < 1e-5)
                & (np.abs(frac[:, 0]) > 1e-5)
            )
            x_world = verts[sel, 0] / (n - 1)
            return np.abs(x_world - 0.52).max()

        assert x_edge_err(verts_ss) < x_edge_err(verts_c)
        assert x_edge_err(verts_ss) < 1.0 / ((n - 1) * (ss + 1))

    def test_exporters(self, tmp_path):
        verts, faces = meshing.marching_cubes(_sphere_volume(12), 0.0)
        for name, fn in (
            ("m.obj", meshing.export_obj),
            ("m.off", meshing.export_off),
            ("m.ply", meshing.export_mesh),
        ):
            p = str(tmp_path / name)
            fn(verts, faces, p)
            assert (tmp_path / name).stat().st_size > 0


class TestSmoothing:
    def _binary_sphere(self, n=24, r=0.3):
        return _sphere_volume(n, r) < 0

    def test_signed_distance_function(self):
        binary = self._binary_sphere()
        dist, border, band = meshing.signed_distance_function(binary, 3)
        assert (dist[binary] > 0).all() and (dist[~binary] < 0).all()
        assert border.sum() > 0 and band.sum() >= border.sum()

    def test_smooth_gaussian_levelset(self):
        binary = self._binary_sphere()
        out = meshing.smooth_gaussian(binary, sigma=1.5)
        # smoothed 0-levelset still approximates the sphere
        verts, _ = meshing.marching_cubes(out, 0.0)
        radii = np.linalg.norm(verts / 23.0 - 0.5, axis=1)
        np.testing.assert_allclose(radii.mean(), 0.3, atol=0.03)

    def test_smooth_constrained_reduces_curvature(self):
        binary = self._binary_sphere(20, 0.32)
        out = meshing.smooth_constrained(binary, band_radius=3, max_iters=60)
        # sign structure preserved (surface stays within the band)
        assert (out[binary] >= 0).all() and (out[~binary] <= 0).all()
        # smoother than the raw signed distance: lower second-difference
        # energy along x inside the band
        dist, _, band = meshing.signed_distance_function(binary, 3)

        def energy(v):
            d2 = v[2:] - 2 * v[1:-1] + v[:-2]
            return float((d2 ** 2).sum())

        assert energy(out[:, 10, 10]) <= energy(dist[:, 10, 10]) + 1e-9

    def test_smooth_dispatch(self):
        binary = self._binary_sphere(12, 0.3)
        out_auto = meshing.smooth(binary)
        out_g = meshing.smooth(binary, method="gaussian", sigma=2)
        assert out_auto.shape == binary.shape == out_g.shape
        with pytest.raises(ValueError):
            meshing.smooth(binary, method="nope")

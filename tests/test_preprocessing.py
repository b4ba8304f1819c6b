"""Preprocessing kernel tests against the reference formulas
(`se_denseslam/src/preprocessing.cpp`)."""

import numpy as np
import jax.numpy as jnp

from supereight_tpu.pipeline import preprocessing as pp
from supereight_tpu.pipeline import camera
from supereight_tpu.pipeline.constants import INVALID


class TestMm2Meters:
    def test_decimation_and_scale(self):
        # reference samples pixel (x*ratio, y*ratio) and divides by 1000
        inp = np.zeros((8, 12), np.uint16)
        inp[0, 0] = 1500
        inp[2, 4] = 2000
        out = np.asarray(pp.mm_to_meters(jnp.asarray(inp), (4, 6)))
        assert out.shape == (4, 6)
        np.testing.assert_allclose(out[0, 0], 1.5, rtol=1e-6)
        np.testing.assert_allclose(out[1, 2], 2.0, rtol=1e-6)


class TestBilateral:
    def test_constant_image_unchanged(self):
        d = jnp.full((10, 12), 2.0)
        out = np.asarray(pp.bilateral_filter(d))
        np.testing.assert_allclose(out, 2.0, rtol=1e-5)

    def test_zero_depth_stays_zero(self):
        d = jnp.full((10, 12), 2.0).at[3, 4].set(0.0)
        out = np.asarray(pp.bilateral_filter(d))
        assert out[3, 4] == 0.0

    def test_reference_formula_single_pixel(self):
        rng = np.random.default_rng(0)
        d = rng.uniform(1.0, 3.0, (9, 9)).astype(np.float32)
        out = np.asarray(pp.bilateral_filter(jnp.asarray(d)))
        # manual reference computation at center pixel (4,4), r=2
        g = np.asarray(pp.gaussian_weights())
        e_d = 0.1
        t = s = 0.0
        center = d[4, 4]
        for i in range(-2, 3):
            for j in range(-2, 3):
                cur = d[4 + j, 4 + i]   # ref: i over x, j over y
                mod = (cur - center) ** 2
                factor = g[i + 2] * g[j + 2] * np.exp(-mod / (2 * e_d * e_d))
                t += factor * cur
                s += factor
        assert abs(out[4, 4] - t / s) < 1e-5


class TestHalfSample:
    def test_shape_and_constant(self):
        d = jnp.full((10, 16), 1.5)
        out = pp.half_sample_robust(d)
        assert out.shape == (5, 8)
        np.testing.assert_allclose(np.asarray(out), 1.5, rtol=1e-6)

    def test_edge_preserving(self):
        # a depth step: samples differing > 3*e_delta from center are excluded
        d = np.full((4, 4), 1.0, np.float32)
        d[:, 2:] = 3.0
        out = np.asarray(pp.half_sample_robust(jnp.asarray(d)))
        assert abs(out[0, 0] - 1.0) < 1e-6   # left block averages only 1.0s
        assert abs(out[0, 1] - 3.0) < 1e-6


class TestVertexNormal:
    def test_depth2vertex_pinhole(self):
        k = jnp.asarray([100.0, 100.0, 8.0, 6.0])
        inv_K = camera.inverse_camera_matrix(k)
        d = jnp.full((12, 16), 2.0)
        v = np.asarray(pp.depth_to_vertex(d, inv_K))
        # center pixel: x=cx -> vx = 0
        np.testing.assert_allclose(v[6, 8], [0, 0, 2.0], atol=1e-6)
        # pixel (0,0): vx = 2*(0-8)/100
        np.testing.assert_allclose(v[0, 0], [-0.16, -0.12, 2.0], atol=1e-6)

    def test_normals_of_plane_consistent_orientation(self):
        # fronto-parallel plane: the reference's cross(dxv, dyv) yields +z
        # for the standard-y camera and -z for NegY (ICL-NUIM), matching
        # the negated-SDF-gradient raycast normals in each convention
        # (`preprocessing.cpp:130-155`, `rendering.cpp:80-82`)
        k = jnp.asarray([100.0, 100.0, 8.0, 6.0])
        inv_K = camera.inverse_camera_matrix(k)
        v = pp.depth_to_vertex(jnp.full((12, 16), 2.0), inv_K)
        n = np.asarray(pp.vertex_to_normal(v, neg_y=False))
        np.testing.assert_allclose(n[2:-2, 2:-2, 2], 1.0, atol=1e-5)
        n2 = np.asarray(pp.vertex_to_normal(v, neg_y=True))
        np.testing.assert_allclose(n2[2:-2, 2:-2, 2], -1.0, atol=1e-5)

    def test_invalid_on_zero_depth(self):
        k = jnp.asarray([100.0, 100.0, 8.0, 6.0])
        inv_K = camera.inverse_camera_matrix(k)
        d = jnp.full((12, 16), 2.0).at[5, 5].set(0.0)
        v = pp.depth_to_vertex(d, inv_K)
        n = np.asarray(pp.vertex_to_normal(v, neg_y=False))
        assert n[5, 5, 0] == INVALID
        assert n[5, 6, 0] == INVALID  # neighbour of hole also invalid


class TestSE3:
    def test_exp_zero_is_identity(self):
        T = np.asarray(camera.se3_exp(jnp.zeros(6)))
        np.testing.assert_allclose(T, np.eye(4), atol=1e-7)

    def test_exp_pure_translation(self):
        T = np.asarray(camera.se3_exp(jnp.asarray([0.1, -0.2, 0.3, 0, 0, 0])))
        np.testing.assert_allclose(T[:3, 3], [0.1, -0.2, 0.3], atol=1e-7)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-7)

    def test_exp_rotation_matches_rodrigues(self):
        w = np.array([0.0, 0.0, 0.5])
        T = np.asarray(camera.se3_exp(jnp.asarray([0, 0, 0, *w])))
        c, s = np.cos(0.5), np.sin(0.5)
        np.testing.assert_allclose(
            T[:3, :3], [[c, -s, 0], [s, c, 0], [0, 0, 1]], atol=1e-6)

    def test_exp_log_consistency_small(self):
        tw = jnp.asarray([0.01, 0.02, -0.01, 0.03, -0.02, 0.01])
        T = np.asarray(camera.se3_exp(tw))
        # For small twists, T ~ I + hat(xi); w = (0.03, -0.02, 0.01)
        approx = np.eye(4)
        approx[0, 1], approx[0, 2] = -0.01, -0.02
        approx[1, 0], approx[1, 2] = 0.01, -0.03
        approx[2, 0], approx[2, 1] = 0.02, 0.03
        approx[:3, 3] = [0.01, 0.02, -0.01]
        np.testing.assert_allclose(T, approx, atol=2e-3)

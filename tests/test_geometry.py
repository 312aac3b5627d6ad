"""Golden-value tests for the SE3/cayley/triangulation core.

Strategy (SURVEY.md §4a): the reference's math functions are pure and
closed-form (misc.h:115-224, misc.cpp:26-85); we test against independent
NumPy re-derivations and roundtrip identities.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multicol_slam_tpu.ops import geometry as geo


def random_rotation(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


class TestCayley:
    def test_cayley2rot_identity(self):
        R = geo.cayley2rot(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-12)

    def test_cayley2rot_closed_form(self):
        # Independent check: cayley2rot(c) = (I - [c]x)^-1 (I + [c]x)... the
        # reference formula (misc.h:137-160) equals the Cayley transform
        # (I + K)(I - K)^-1 with K = skew(c).
        rng = np.random.default_rng(0)
        for _ in range(10):
            c = rng.standard_normal(3)
            K = np.array([[0, -c[2], c[1]], [c[2], 0, -c[0]], [-c[1], c[0], 0]])
            R_expected = (np.eye(3) + K) @ np.linalg.inv(np.eye(3) - K)
            R = np.asarray(geo.cayley2rot(jnp.asarray(c)))
            np.testing.assert_allclose(R, R_expected, atol=1e-10)
            # Valid rotation
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
            np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-10)

    def test_roundtrip(self):
        rng = np.random.default_rng(1)
        c = rng.standard_normal((32, 3)) * 0.5
        R = geo.cayley2rot(jnp.asarray(c))
        c2 = geo.rot2cayley(R)
        np.testing.assert_allclose(c2, c, atol=1e-9)

    def test_hom_roundtrip(self):
        rng = np.random.default_rng(2)
        c6 = rng.standard_normal((16, 6))
        M = geo.cayley2hom(jnp.asarray(c6))
        assert M.shape == (16, 4, 4)
        np.testing.assert_allclose(M[:, 3], np.tile([0, 0, 0, 1], (16, 1)), atol=0)
        c6b = geo.hom2cayley(M)
        np.testing.assert_allclose(c6b, c6, atol=1e-9)

    def test_rot2cayley_matches_reference_formula(self):
        rng = np.random.default_rng(3)
        R = random_rotation(rng)
        C = (R - np.eye(3)) @ np.linalg.inv(R + np.eye(3))
        expected = np.array([-C[1, 2], C[0, 2], -C[0, 1]])
        got = np.asarray(geo.rot2cayley(jnp.asarray(R)))
        np.testing.assert_allclose(got, expected, atol=1e-10)


class TestRodrigues:
    def test_roundtrip(self):
        rng = np.random.default_rng(4)
        w = rng.standard_normal((20, 3))
        R = geo.rodrigues2rot(jnp.asarray(w))
        w2 = geo.rot2rodrigues(R)
        # roundtrip modulo 2pi wrap: use small angles
        w_small = w * 0.3
        R2 = geo.rodrigues2rot(jnp.asarray(w_small))
        np.testing.assert_allclose(geo.rot2rodrigues(R2), w_small, atol=1e-9)

    def test_small_angle(self):
        w = jnp.asarray([1e-9, 0.0, 0.0])
        R = geo.rodrigues2rot(w)
        np.testing.assert_allclose(R, np.eye(3), atol=1e-8)


class TestSE3:
    def test_inv(self):
        rng = np.random.default_rng(5)
        M = np.eye(4)
        M[:3, :3] = random_rotation(rng)
        M[:3, 3] = rng.standard_normal(3)
        Mi = geo.inv_se3(jnp.asarray(M))
        np.testing.assert_allclose(Mi @ M, np.eye(4), atol=1e-12)

    def test_skew(self):
        t = jnp.asarray([1.0, 2.0, 3.0])
        S = geo.skew(t)
        v = jnp.asarray([0.5, -1.0, 2.0])
        np.testing.assert_allclose(S @ v, np.cross(t, v), atol=1e-12)


class TestHorner:
    def test_matches_polyval(self):
        rng = np.random.default_rng(6)
        coeffs = rng.standard_normal(12)
        x = rng.standard_normal(100)
        got = geo.horner(jnp.asarray(coeffs), jnp.asarray(x))
        expected = np.polyval(coeffs[::-1], x)
        np.testing.assert_allclose(got, expected, rtol=1e-12)


class TestTriangulation:
    def test_midpoint_exact(self):
        """Project a point into two views, triangulate, recover it
        (misc.cpp:26-50 semantics: rays in cam1 frame, (R12,t12) = cam2
        pose in cam1 frame)."""
        rng = np.random.default_rng(7)
        for _ in range(10):
            R12 = random_rotation(rng)
            t12 = rng.standard_normal(3)
            X = rng.standard_normal(3) * 3 + np.array([0, 0, 6])
            v1 = X / np.linalg.norm(X)
            X2 = R12.T @ (X - t12)  # point in cam2 frame
            v2 = X2 / np.linalg.norm(X2)
            Xt = geo.triangulate_midpoint(
                jnp.asarray(t12), jnp.asarray(R12), jnp.asarray(v1), jnp.asarray(v2))
            np.testing.assert_allclose(Xt, X, atol=1e-8)

    def test_batched(self):
        rng = np.random.default_rng(8)
        R12 = random_rotation(rng)
        t12 = np.array([1.0, 0.0, 0.0])
        X = rng.standard_normal((64, 3)) + np.array([0, 0, 5])
        v1 = X / np.linalg.norm(X, axis=1, keepdims=True)
        X2 = (X - t12) @ R12
        v2 = X2 / np.linalg.norm(X2, axis=1, keepdims=True)
        Xt = geo.triangulate_midpoint(jnp.asarray(t12), jnp.asarray(R12),
                                      jnp.asarray(v1), jnp.asarray(v2))
        np.testing.assert_allclose(Xt, X, atol=1e-7)


class TestEpipolar:
    def test_zero_for_consistent_rays(self):
        rng = np.random.default_rng(9)
        R12 = random_rotation(rng)
        t12 = rng.standard_normal(3)
        E = geo.essential_from_relpose(jnp.asarray(R12), jnp.asarray(t12))
        X = rng.standard_normal((32, 3)) + np.array([0, 0, 5])
        v1 = X / np.linalg.norm(X, axis=1, keepdims=True)
        X2 = (X - t12) @ R12
        v2 = X2 / np.linalg.norm(X2, axis=1, keepdims=True)
        # Consistent convention: ray1^T E12 ray2 = 0 for E12 = [t12]x R12
        # with (R12, t12) = pose of cam2 in cam1 frame.
        d2 = geo.epipolar_distance_sq(jnp.asarray(v1), jnp.asarray(v2), E)
        assert np.max(np.asarray(d2)) < 1e-12
        assert bool(np.all(geo.check_dist_epipolar_line(
            jnp.asarray(v1), jnp.asarray(v2), E, 1e-2)))

    def test_essential_from_poses_consistent(self):
        """essential_from_poses over two world-to-cam poses must satisfy
        ray1^T E12 ray2 = 0 for a shared world point."""
        rng = np.random.default_rng(42)
        T1, T2 = np.eye(4), np.eye(4)
        T1[:3, :3], T2[:3, :3] = random_rotation(rng), random_rotation(rng)
        T1[:3, 3], T2[:3, 3] = rng.standard_normal(3), rng.standard_normal(3)
        X = rng.standard_normal((16, 3)) * 2
        Xh = np.concatenate([X, np.ones((16, 1))], 1)
        r1 = (T1 @ Xh.T).T[:, :3]
        r2 = (T2 @ Xh.T).T[:, :3]
        r1 /= np.linalg.norm(r1, axis=1, keepdims=True)
        r2 /= np.linalg.norm(r2, axis=1, keepdims=True)
        E = geo.essential_from_poses(jnp.asarray(T1), jnp.asarray(T2))
        d2 = geo.epipolar_distance_sq(jnp.asarray(r1), jnp.asarray(r2), E)
        assert np.max(np.asarray(d2)) < 1e-12

    def test_nonzero_for_random_rays(self):
        rng = np.random.default_rng(10)
        R12 = random_rotation(rng)
        t12 = np.array([1.0, 0.2, 0.0])
        E = geo.essential_from_relpose(jnp.asarray(R12), jnp.asarray(t12))
        v1 = rng.standard_normal((100, 3))
        v1 /= np.linalg.norm(v1, axis=1, keepdims=True)
        v2 = rng.standard_normal((100, 3))
        v2 /= np.linalg.norm(v2, axis=1, keepdims=True)
        d2 = np.asarray(geo.epipolar_distance_sq(jnp.asarray(v1), jnp.asarray(v2), E))
        assert np.median(d2) > 1e-4


class TestQuat:
    def test_rot2quat_roundtrip(self):
        rng = np.random.default_rng(11)
        for _ in range(20):
            R = random_rotation(rng)
            q = np.asarray(geo.rot2quat(jnp.asarray(R)))
            x, y, z, w = q
            R2 = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ])
            np.testing.assert_allclose(R2, R, atol=1e-9)


class TestNumpyTwins:
    """Pin the host-side numpy twins (ops/se3_np.py) to the JAX
    implementations: host orchestration (tracking/mapping/loop closing)
    computes the SAME math without device dispatches, so the two modules
    must agree to float64 precision."""

    def _rand_se3(self, rng):
        R = random_rotation(rng)
        M = np.eye(4)
        M[:3, :3] = R
        M[:3, 3] = rng.standard_normal(3)
        return M

    def test_cayley_roundtrip_twins(self):
        from multicol_slam_tpu.ops import se3_np
        rng = np.random.default_rng(3)
        c6 = rng.standard_normal((17, 6)) * 0.4
        np.testing.assert_allclose(
            se3_np.cayley2hom(c6),
            np.asarray(geo.cayley2hom(jnp.asarray(c6))), atol=1e-12)
        M = se3_np.cayley2hom(c6)
        np.testing.assert_allclose(
            se3_np.hom2cayley(M),
            np.asarray(geo.hom2cayley(jnp.asarray(M))), atol=1e-9)

    def test_inv_se3_twin(self):
        from multicol_slam_tpu.ops import se3_np
        rng = np.random.default_rng(4)
        M = np.stack([self._rand_se3(rng) for _ in range(5)])
        np.testing.assert_allclose(
            se3_np.inv_se3(M), np.asarray(geo.inv_se3(jnp.asarray(M))),
            atol=1e-12)
        np.testing.assert_allclose(
            se3_np.inv_se3(M) @ M, np.broadcast_to(np.eye(4), M.shape),
            atol=1e-12)

    def test_two_view_twins(self):
        from multicol_slam_tpu.ops import se3_np
        rng = np.random.default_rng(5)
        T1, T2 = self._rand_se3(rng), self._rand_se3(rng)
        np.testing.assert_allclose(
            se3_np.essential_from_poses(T1, T2),
            np.asarray(geo.essential_from_poses(
                jnp.asarray(T1), jnp.asarray(T2))), atol=1e-12)
        R12 = random_rotation(rng)
        t12 = rng.standard_normal(3)
        v1 = rng.standard_normal((40, 3))
        v1 /= np.linalg.norm(v1, axis=1, keepdims=True)
        v2 = rng.standard_normal((40, 3))
        v2 /= np.linalg.norm(v2, axis=1, keepdims=True)
        np.testing.assert_allclose(
            se3_np.triangulate_midpoint(t12, R12, v1, v2),
            np.asarray(geo.triangulate_midpoint(
                jnp.asarray(t12), jnp.asarray(np.broadcast_to(R12, (40, 3, 3))),
                jnp.asarray(v1), jnp.asarray(v2))), atol=1e-9)

    def test_rot2quat_twin(self):
        from multicol_slam_tpu.ops import se3_np
        rng = np.random.default_rng(6)
        for _ in range(10):
            R = random_rotation(rng)
            np.testing.assert_allclose(
                se3_np.rot2quat(R), np.asarray(geo.rot2quat(jnp.asarray(R))),
                atol=1e-9)

    def test_world_to_img_twin(self):
        from multicol_slam_tpu.ops import se3_np
        from multicol_slam_tpu.utils import config_io
        rig, _ = config_io.load_mcs("/root/reference/Examples/Lafida",
                                    dtype=np.float64)
        rng = np.random.default_rng(7)
        X = rng.standard_normal((30, 3))
        X[:, 2] = -np.abs(X[:, 2]) - 0.5   # in front of the omni camera
        import jax
        from multicol_slam_tpu.ops.camera import world_to_img
        for c in range(2):
            cam = jax.tree.map(lambda a: np.asarray(a[c]), rig.cams)
            cam_j = jax.tree.map(lambda a: jnp.asarray(a[c]), rig.cams)
            np.testing.assert_allclose(
                se3_np.world_to_img(cam, X),
                np.asarray(world_to_img(cam_j, jnp.asarray(X))), atol=1e-3)

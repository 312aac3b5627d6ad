"""Tests for Sim3 primitives: Horn alignment, exp/log roundtrip, group ops."""

import numpy as np
import jax
import jax.numpy as jnp

from multicol_slam_tpu.ops import sim3 as s3

from test_geometry import random_rotation


def random_sim3(rng, scale_range=(0.5, 2.0)):
    R = random_rotation(rng)
    t = rng.standard_normal(3)
    s = rng.uniform(*scale_range)
    return s, R, t


class TestHorn:
    def test_exact_recovery(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            s, R, t = random_sim3(rng)
            P2 = rng.standard_normal((12, 3)) * 2
            P1 = s * P2 @ R.T + t
            S = s3.horn_alignment(jnp.asarray(P1), jnp.asarray(P2))
            np.testing.assert_allclose(float(S.s), s, rtol=1e-9)
            np.testing.assert_allclose(np.asarray(S.R), R, atol=1e-9)
            np.testing.assert_allclose(np.asarray(S.t), t, atol=1e-8)

    def test_minimal_3pt(self):
        rng = np.random.default_rng(1)
        s, R, t = random_sim3(rng)
        P2 = rng.standard_normal((3, 3))
        P1 = s * P2 @ R.T + t
        S = s3.horn_alignment(jnp.asarray(P1), jnp.asarray(P2))
        np.testing.assert_allclose(np.asarray(S.apply(jnp.asarray(P2))), P1,
                                   atol=1e-8)

    def test_fixed_scale(self):
        rng = np.random.default_rng(2)
        R = random_rotation(rng)
        t = rng.standard_normal(3)
        P2 = rng.standard_normal((10, 3))
        P1 = P2 @ R.T + t
        S = s3.horn_alignment(jnp.asarray(P1), jnp.asarray(P2), fix_scale=True)
        assert float(S.s) == 1.0
        np.testing.assert_allclose(np.asarray(S.R), R, atol=1e-9)

    def test_batched(self):
        rng = np.random.default_rng(3)
        P1s, P2s = [], []
        gts = []
        for _ in range(8):
            s, R, t = random_sim3(rng)
            P2 = rng.standard_normal((3, 3))
            P1 = s * P2 @ R.T + t
            P1s.append(P1)
            P2s.append(P2)
            gts.append((s, R, t))
        S = jax.vmap(s3.horn_alignment)(jnp.asarray(np.stack(P1s)),
                                        jnp.asarray(np.stack(P2s)))
        for i, (s, R, t) in enumerate(gts):
            np.testing.assert_allclose(float(S.s[i]), s, rtol=1e-7)


class TestGroup:
    def test_compose_inverse(self):
        rng = np.random.default_rng(4)
        s1, R1, t1 = random_sim3(rng)
        S1 = s3.Sim3(jnp.asarray(s1), jnp.asarray(R1), jnp.asarray(t1))
        SI = S1.compose(S1.inverse())
        np.testing.assert_allclose(float(SI.s), 1.0, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(SI.R), np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.asarray(SI.t), 0, atol=1e-12)

    def test_apply_compose_consistent(self):
        rng = np.random.default_rng(5)
        s1, R1, t1 = random_sim3(rng)
        s2, R2, t2 = random_sim3(rng)
        S1 = s3.Sim3(jnp.asarray(s1), jnp.asarray(R1), jnp.asarray(t1))
        S2 = s3.Sim3(jnp.asarray(s2), jnp.asarray(R2), jnp.asarray(t2))
        X = rng.standard_normal((20, 3))
        a = S1.apply(S2.apply(jnp.asarray(X)))
        b = S1.compose(S2).apply(jnp.asarray(X))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)

    def test_to_se3(self):
        rng = np.random.default_rng(6)
        s, R, t = random_sim3(rng)
        S = s3.Sim3(jnp.asarray(s), jnp.asarray(R), jnp.asarray(t))
        M = np.asarray(S.to_se3())
        np.testing.assert_allclose(M[:3, :3], R, atol=1e-12)
        np.testing.assert_allclose(M[:3, 3], t / s, atol=1e-12)


class TestExpLog:
    def test_roundtrip(self):
        rng = np.random.default_rng(7)
        for _ in range(20):
            v = rng.standard_normal(7) * np.array([0.5] * 3 + [1.0] * 3 + [0.3])
            S = s3.sim3_exp(jnp.asarray(v))
            v2 = np.asarray(s3.sim3_log(S))
            np.testing.assert_allclose(v2, v, atol=1e-7)

    def test_identity(self):
        S = s3.sim3_exp(jnp.zeros(7))
        np.testing.assert_allclose(float(S.s), 1.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(S.R), np.eye(3), atol=1e-10)
        np.testing.assert_allclose(np.asarray(S.t), 0, atol=1e-10)
        v = np.asarray(s3.sim3_log(s3.sim3_identity()))
        np.testing.assert_allclose(v, np.zeros(7), atol=1e-10)

    def test_log_of_exp_small(self):
        # near-identity stability (series branches)
        for eps in [1e-8, 1e-6, 1e-4]:
            v = np.full(7, eps)
            v2 = np.asarray(s3.sim3_log(s3.sim3_exp(jnp.asarray(v))))
            np.testing.assert_allclose(v2, v, atol=1e-10)

    def test_pure_scale(self):
        v = np.array([0, 0, 0, 0.5, -0.2, 0.1, 0.7])
        S = s3.sim3_exp(jnp.asarray(v))
        np.testing.assert_allclose(float(S.s), np.exp(0.7), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(S.R), np.eye(3), atol=1e-9)
        v2 = np.asarray(s3.sim3_log(S))
        np.testing.assert_allclose(v2, v, atol=1e-8)

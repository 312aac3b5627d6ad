"""Synthetic-geometry tests for batched essential RANSAC (OpenGV test
style, SURVEY.md §4b)."""

import numpy as np
import jax
import jax.numpy as jnp

from multicol_slam_tpu.ops import ransac

from test_geometry import random_rotation


def make_pair(rng, n, outlier_frac=0.0):
    R12 = random_rotation(rng) @ np.diag([1.0, 1.0, 1.0])
    # keep rotation small-ish so points stay in front
    w = rng.standard_normal(3) * 0.1
    from multicol_slam_tpu.ops.geometry import rodrigues2rot
    R12 = np.asarray(rodrigues2rot(jnp.asarray(w)))
    t12 = rng.standard_normal(3) * 0.3
    X = rng.standard_normal((n, 3)) * 2 + np.array([0, 0, 6])
    v1 = X / np.linalg.norm(X, axis=1, keepdims=True)
    X2 = (X - t12) @ R12
    v2 = X2 / np.linalg.norm(X2, axis=1, keepdims=True)
    n_out = int(n * outlier_frac)
    if n_out:
        bad = rng.choice(n, n_out, replace=False)
        rnd = rng.standard_normal((n_out, 3))
        v2[bad] = rnd / np.linalg.norm(rnd, axis=1, keepdims=True)
    else:
        bad = np.array([], int)
    return R12, t12, v1, v2, bad


def test_ransac_essential_clean():
    rng = np.random.default_rng(0)
    R12, t12, v1, v2, _ = make_pair(rng, 200)
    E, inl, n_in = ransac.ransac_essential(
        jax.random.PRNGKey(0), jnp.asarray(v1), jnp.asarray(v2),
        jnp.ones(200, bool))
    assert int(n_in) > 190
    # E must satisfy v1^T E v2 ~ 0
    res = np.einsum("ni,ij,nj->n", v1, np.asarray(E), v2)
    assert np.abs(res).max() < 1e-6


def test_ransac_essential_outliers():
    rng = np.random.default_rng(1)
    n = 300
    R12, t12, v1, v2, bad = make_pair(rng, n, outlier_frac=0.3)
    E, inl, n_in = ransac.ransac_essential(
        jax.random.PRNGKey(1), jnp.asarray(v1), jnp.asarray(v2),
        jnp.ones(n, bool), n_hyps=512)
    inl = np.asarray(inl)
    clean = np.setdiff1d(np.arange(n), bad)
    assert inl[clean].mean() > 0.95
    assert inl[bad].mean() < 0.1


def test_5pt_minimal_regime():
    """Low-inlier regime (35%): minimal 5-point hypotheses still find an
    all-inlier sample with useful probability while 8-point ones almost
    never do — the reason the reference initializes with Stewenius
    RANSAC (cMultiInitializer.cpp:131-146) rather than 8-point."""
    rng = np.random.default_rng(21)
    n = 60
    R12, t12, v1, v2, bad = make_pair(rng, n, outlier_frac=0.68)
    clean = np.setdiff1d(np.arange(n), bad)
    E5, inl5, n5 = ransac.ransac_essential(
        jax.random.PRNGKey(0), jnp.asarray(v1), jnp.asarray(v2),
        jnp.ones(n, bool), n_hyps=256, sample_size=5)
    inl5 = np.asarray(inl5)
    assert inl5[clean].mean() > 0.7, f"5pt recall {inl5[clean].mean()}"
    E8, inl8, n8 = ransac.ransac_essential(
        jax.random.PRNGKey(0), jnp.asarray(v1), jnp.asarray(v2),
        jnp.ones(n, bool), n_hyps=256, sample_size=8)
    inl8 = np.asarray(inl8)
    assert inl5[clean].mean() > inl8[clean].mean() + 0.2, \
        f"5pt ({inl5[clean].mean()}) should beat 8pt ({inl8[clean].mean()})"


def test_5pt_exact_minimal_sample():
    """essential_5pt recovers an exact root from 5 clean pairs."""
    rng = np.random.default_rng(22)
    R12, t12, v1, v2, _ = make_pair(rng, 5)
    cays = jnp.asarray([s[0] for s in ransac.ESSENTIAL_SEEDS])
    ts = jnp.asarray([s[1] for s in ransac.ESSENTIAL_SEEDS], jnp.float64)
    ts = ts / jnp.linalg.norm(ts, axis=-1, keepdims=True)
    Es, res = jax.vmap(lambda c, t: ransac.essential_5pt(
        jnp.asarray(v1), jnp.asarray(v2), c, t))(cays, ts)
    res = np.asarray(res)
    assert (res < 1e-10).any(), f"no converged seed: {res}"
    # every converged root satisfies the epipolar constraints exactly
    for k in np.nonzero(res < 1e-10)[0]:
        ep = np.einsum("ni,ij,nj->n", v1, np.asarray(Es[k]), v2)
        assert np.abs(ep).max() < 1e-9


def test_decompose_and_cheirality():
    rng = np.random.default_rng(2)
    R12, t12, v1, v2, _ = make_pair(rng, 150)
    E, _, _ = ransac.ransac_essential(
        jax.random.PRNGKey(2), jnp.asarray(v1), jnp.asarray(v2),
        jnp.ones(150, bool))
    Rs, ts = ransac.decompose_essential(E)
    counts, Xs = ransac.cheirality_counts(Rs, ts, jnp.asarray(v1),
                                          jnp.asarray(v2),
                                          jnp.ones(150, bool))
    counts = np.asarray(counts)
    best = int(np.argmax(counts))
    assert counts[best] > 140
    # the winning candidate matches ground truth up to scale
    R_est = np.asarray(Rs[best])
    t_est = np.asarray(ts[best])
    np.testing.assert_allclose(R_est, R12, atol=1e-4)
    t_gt = t12 / np.linalg.norm(t12)
    assert min(np.linalg.norm(t_est - t_gt), np.linalg.norm(t_est + t_gt)) < 1e-4
    # triangulated points re-project onto their source rays
    X_est = np.asarray(Xs[best])
    dirs = X_est / np.linalg.norm(X_est, axis=1, keepdims=True)
    assert np.abs((dirs * v1).sum(1) - 1).max() < 1e-6


def test_invalid_points_excluded():
    rng = np.random.default_rng(3)
    n = 100
    R12, t12, v1, v2, _ = make_pair(rng, n)
    valid = np.ones(n, bool)
    valid[50:] = False
    v2[50:] = rng.standard_normal((50, 3))  # garbage in invalid region
    E, inl, n_in = ransac.ransac_essential(
        jax.random.PRNGKey(3), jnp.asarray(v1), jnp.asarray(v2),
        jnp.asarray(valid))
    assert not np.asarray(inl)[50:].any()
    assert int(n_in) >= 45


class TestGPnP:
    def make_problem(self, rng, rig, n, mt_true, outlier_frac=0.0):
        import jax.numpy as jnp
        from multicol_slam_tpu.ops import geometry as geo, rig as rig_ops
        X = rng.standard_normal((n, 3))
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        X *= rng.uniform(1.5, 5.0, (n, 1))
        M_t = np.asarray(geo.cayley2hom(jnp.asarray(mt_true)))
        T = np.linalg.inv(M_t)   # world -> body
        Y = X @ T[:3, :3].T + T[:3, 3]
        cams = rng.integers(0, rig.n_cams, n)
        origins = np.asarray(rig.M_c)[cams, :3, 3]
        dirs = Y - origins
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        if outlier_frac:
            nb = int(n * outlier_frac)
            bad = rng.choice(n, nb, replace=False)
            rd = rng.standard_normal((nb, 3))
            dirs[bad] = rd / np.linalg.norm(rd, axis=1, keepdims=True)
        else:
            bad = np.array([], int)
        return origins, dirs, X, bad

    def test_dlt_exact(self):
        from multicol_slam_tpu.utils import config_io
        rig, _ = config_io.load_mcs("/root/reference/Examples/Lafida",
                                    dtype=np.float64)
        rng = np.random.default_rng(10)
        mt_true = np.array([0.03, -0.02, 0.05, 0.3, -0.2, 0.4])
        o, d, X, _ = self.make_problem(rng, rig, 12, mt_true)
        T = np.asarray(ransac.gpnp_dlt(jnp.asarray(o), jnp.asarray(d),
                                       jnp.asarray(X)))
        from multicol_slam_tpu.ops import geometry as geo
        M_t = np.asarray(geo.cayley2hom(jnp.asarray(mt_true)))
        np.testing.assert_allclose(T, np.linalg.inv(M_t), atol=1e-8)

    def test_ransac_with_outliers(self):
        from multicol_slam_tpu.utils import config_io
        from multicol_slam_tpu.ops import geometry as geo
        rig, _ = config_io.load_mcs("/root/reference/Examples/Lafida",
                                    dtype=np.float64)
        rng = np.random.default_rng(11)
        mt_true = np.array([0.01, 0.04, -0.03, -0.2, 0.1, 0.25])
        n = 150
        o, d, X, bad = self.make_problem(rng, rig, n, mt_true,
                                         outlier_frac=0.3)
        T, inl, n_in = ransac.ransac_gpnp(
            jax.random.PRNGKey(5), jnp.asarray(o), jnp.asarray(d),
            jnp.asarray(X), jnp.ones(n, bool), n_hyps=512)
        M_t = np.asarray(geo.cayley2hom(jnp.asarray(mt_true)))
        np.testing.assert_allclose(np.asarray(T), np.linalg.inv(M_t),
                                   atol=1e-6)
        inl = np.asarray(inl)
        clean = np.setdiff1d(np.arange(n), bad)
        assert inl[clean].mean() > 0.95
        assert inl[bad].mean() < 0.05

    def test_gp3p_minimal_regime(self):
        """8 total matches, 3 gross outliers -> only 5 inliers. A
        6-point DLT hypothesis can never be all-inlier here, but the
        3-point GP3P recovers the pose — the sparse-match
        relocalization regime of the reference's OpenGV GP3P RANSAC
        (cTracking.cpp:1234-1266)."""
        from multicol_slam_tpu.utils import config_io
        from multicol_slam_tpu.ops import geometry as geo
        rig, _ = config_io.load_mcs("/root/reference/Examples/Lafida",
                                    dtype=np.float64)
        rng = np.random.default_rng(12)
        mt_true = np.array([0.02, -0.03, 0.04, 0.15, -0.1, 0.3])
        n = 8
        o, d, X, bad = self.make_problem(rng, rig, n, mt_true,
                                         outlier_frac=3.0 / 8.0)
        M_t = np.asarray(geo.cayley2hom(jnp.asarray(mt_true)))
        T_true = np.linalg.inv(M_t)

        T3, inl3, n3 = ransac.ransac_gpnp(
            jax.random.PRNGKey(7), jnp.asarray(o), jnp.asarray(d),
            jnp.asarray(X), jnp.ones(n, bool), n_hyps=512, sample_size=3)
        err3 = np.abs(np.asarray(T3) - T_true).max()
        assert int(n3) >= 4, f"gp3p found only {int(n3)} inliers"
        assert err3 < 1e-5, f"gp3p pose error {err3}"
        inl3 = np.asarray(inl3)
        assert inl3[bad].sum() == 0

        T6, inl6, n6 = ransac.ransac_gpnp(
            jax.random.PRNGKey(7), jnp.asarray(o), jnp.asarray(d),
            jnp.asarray(X), jnp.ones(n, bool), n_hyps=512, sample_size=6)
        err6 = np.abs(np.asarray(T6) - T_true).max()
        assert err6 > 100 * max(err3, 1e-12), \
            f"DLT unexpectedly solved the minimal regime: {err6} vs {err3}"

"""Tests for the Scaramuzza camera model + rig, using the REAL Lafida
calibration shipped with the reference (read-only at /root/reference).

Checks: projection/unprojection roundtrip through the actual fisheye
polynomials, rig projection consistency, mirror masks, and batched-rig
fusion (cam_model_omni.cpp:29-161, cam_system_omni.h:104-106).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multicol_slam_tpu.ops import camera as cam_ops
from multicol_slam_tpu.ops import geometry as geo
from multicol_slam_tpu.ops import rig as rig_ops
from multicol_slam_tpu.utils import config_io

CALIB_DIR = "/root/reference/Examples/Lafida"


@pytest.fixture(scope="module")
def lafida():
    rig, masks = config_io.load_mcs(CALIB_DIR, dtype=np.float64)
    return rig, masks


def test_load_mcs(lafida):
    rig, masks = lafida
    assert rig.n_cams == 3
    assert rig.M_c.shape == (3, 4, 4)
    # cam3 (index 2) has zero cayley rotation (identity R)
    np.testing.assert_allclose(rig.M_c[2, :3, :3], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(rig.M_c[2, :3, 3],
                               [-0.00157612288268783, 0.103615531247527, 0.201416323496156],
                               rtol=1e-9)
    assert len(masks) == 4 and masks[0].shape == (3, 480, 754)


def test_project_unproject_roundtrip(lafida):
    """u,v -> ray -> u,v must land back on the pixel (sub-0.5px: the
    forward/inverse polys are a fitted pair, not exact inverses)."""
    rig, _ = lafida
    cam0 = jax.tree.map(lambda x: x[0], rig.cams)
    u0, v0 = float(cam0.u0), float(cam0.v0)
    rng = np.random.default_rng(0)
    # sample pixels well inside the fisheye circle
    ang = rng.uniform(0, 2 * np.pi, 500)
    rad = rng.uniform(0, 180, 500)
    uv = np.stack([u0 + rad * np.cos(ang), v0 + rad * np.sin(ang)], -1)
    rays = cam_ops.img_to_world(cam0, jnp.asarray(uv))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rays), axis=1), 1.0, atol=1e-12)
    uv2 = cam_ops.world_to_img(cam0, rays)
    err = np.linalg.norm(np.asarray(uv2) - uv, axis=1)
    assert np.max(err) < 0.5, f"max roundtrip err {np.max(err)}"
    assert np.median(err) < 0.2


def test_ray_scale_invariance(lafida):
    """world_to_img only depends on ray direction."""
    rig, _ = lafida
    cam0 = jax.tree.map(lambda x: x[0], rig.cams)
    rng = np.random.default_rng(1)
    X = rng.standard_normal((100, 3))
    X[:, 2] = np.abs(X[:, 2]) + 0.5  # fisheye looks along +z in sensor frame
    uv1 = cam_ops.world_to_img(cam0, jnp.asarray(X))
    uv2 = cam_ops.world_to_img(cam0, jnp.asarray(X * 7.3))
    np.testing.assert_allclose(uv1, uv2, atol=1e-9)


def test_principal_axis_projects_to_principal_point(lafida):
    """The optical axis is +z in the sensor frame: a0 < 0 so
    z = -horner(p, 0) > 0 at the principal point (cam_model_omni.cpp:60)."""
    rig, _ = lafida
    cam0 = jax.tree.map(lambda x: x[0], rig.cams)
    ray0 = cam_ops.img_to_world(cam0, jnp.asarray([float(cam0.u0), float(cam0.v0)]))
    assert float(ray0[2]) > 0.99  # looks along +z
    # Project a near-axis ray back: must hit the principal point
    uv = cam_ops.world_to_img(cam0, ray0)
    np.testing.assert_allclose(uv, [float(cam0.u0), float(cam0.v0)], atol=0.5)


def test_undistort_distort_roundtrip(lafida):
    rig, _ = lafida
    cam0 = jax.tree.map(lambda x: x[0], rig.cams)
    u0, v0 = float(cam0.u0), float(cam0.v0)
    rng = np.random.default_rng(2)
    uv = np.stack([u0 + rng.uniform(-150, 150, 200), v0 + rng.uniform(-150, 150, 200)], -1)
    # The reference passes undistScaleFactor = a0 = p1 (negative!)
    # (mdBRIEFextractorOct.cpp:1288 scaleF = Get_P()[0]), which makes
    # undistort land on the z = -p1 plane that distortPointsOcam projects
    # from — the signs cancel and the roundtrip is the identity.
    scale = float(cam0.p1)
    xy = cam_ops.undistort_points(cam0, jnp.asarray(uv), scale)
    uv2 = cam_ops.distort_points(cam0, xy)
    err = np.linalg.norm(np.asarray(uv2) - uv, axis=1)
    assert np.max(err) < 0.5


def test_rig_projection_consistency(lafida):
    """Project world points through the full rig and check against a
    per-camera manual composition (cam_system_omni.h Get_MtMc_inv)."""
    rig, _ = lafida
    rng = np.random.default_rng(3)
    c6 = rng.standard_normal(6) * 0.1
    M_t = geo.cayley2hom(jnp.asarray(c6))
    X_w = rng.standard_normal((50, 3)) * 2.0

    uv, zpos = rig_ops.world_to_img_rig(rig, M_t, jnp.asarray(X_w))
    assert uv.shape == (3, 50, 2)

    for c in range(3):
        MtMc = np.asarray(M_t) @ np.asarray(rig.M_c[c])
        Xc = (np.linalg.inv(MtMc) @ np.concatenate([X_w, np.ones((50, 1))], 1).T).T[:, :3]
        cam_c = jax.tree.map(lambda x: x[c], rig.cams)
        uv_manual = cam_ops.world_to_img(cam_c, jnp.asarray(Xc))
        np.testing.assert_allclose(uv[c], uv_manual, atol=1e-8)
        np.testing.assert_allclose(np.asarray(zpos[c]), Xc[:, 2] > 0, atol=0)


def test_rig_ray_lifting_consistency(lafida):
    """img_to_world_rig + rays_to_body must equal manual per-camera math."""
    rig, _ = lafida
    rng = np.random.default_rng(4)
    uv = np.stack([rng.uniform(200, 500, (3, 20)), rng.uniform(100, 350, (3, 20))], -1)
    rays_cam = rig_ops.img_to_world_rig(rig, jnp.asarray(uv))
    rays_body = rig_ops.rays_to_body(rig, rays_cam)
    for c in range(3):
        cam_c = jax.tree.map(lambda x: x[c], rig.cams)
        rc = cam_ops.img_to_world(cam_c, jnp.asarray(uv[c]))
        np.testing.assert_allclose(rays_cam[c], rc, atol=1e-10)
        np.testing.assert_allclose(
            rays_body[c], rc @ np.asarray(rig.M_c[c, :3, :3]).T, atol=1e-10)


def test_mirror_mask(lafida):
    rig, masks = lafida
    m0 = masks[0][0]  # cam0 level0
    # center should be inside, far corner outside
    cam0 = jax.tree.map(lambda x: x[0], rig.cams)
    inside = cam_ops.is_in_mirror_mask(
        jnp.asarray(m0), jnp.asarray([float(cam0.u0), float(cam0.v0)]))
    corner = cam_ops.is_in_mirror_mask(jnp.asarray(m0), jnp.asarray([751.0, 3.0]))
    oob = cam_ops.is_in_mirror_mask(jnp.asarray(m0), jnp.asarray([-5.0, 100.0]))
    assert bool(inside) and not bool(corner) and not bool(oob)


def test_jit_and_vmap_project(lafida):
    """The whole-rig projection must jit cleanly with static shapes."""
    rig, _ = lafida
    f = jax.jit(lambda M_t, X: rig_ops.world_to_img_rig(rig, M_t, X))
    M_t = jnp.eye(4, dtype=jnp.float64)
    X = jnp.ones((128, 3), jnp.float64)
    uv, z = f(M_t, X)
    assert uv.shape == (3, 128, 2)


def test_scale_camera_geometric_equivalence(lafida):
    """scale_camera must keep the camera geometry exact: corresponding
    pixels (scaled about the principal point) lift to identical rays,
    and projections land at the scaled pixel positions."""
    rig, _ = lafida
    cam = jax.tree.map(lambda x: x[1], rig.cams)
    for k in (0.5, 0.25, 2.0):
        cam_k = cam_ops.scale_camera(cam, k)
        assert float(cam_k.width) == round(float(cam.width) * k)
        rng = np.random.default_rng(5)
        uv = jnp.asarray(rng.uniform([80, 80], [670, 400], (200, 2)))
        pp = jnp.asarray([float(cam.u0), float(cam.v0)])
        pp_k = jnp.asarray([float(cam_k.u0), float(cam_k.v0)])
        rays = cam_ops.img_to_world(cam, uv)
        rays_k = cam_ops.img_to_world(cam_k, (uv - pp) * k + pp_k)
        np.testing.assert_allclose(np.asarray(rays), np.asarray(rays_k),
                                   atol=1e-12)
        X = rays * 2.5
        p = cam_ops.world_to_img(cam, X)
        p_k = cam_ops.world_to_img(cam_k, X)
        np.testing.assert_allclose(np.asarray((p - pp) * k + pp_k),
                                   np.asarray(p_k), atol=1e-9)

import jax.numpy as jnp
import numpy as np

from sgslam_tpu import config
from sgslam_tpu.geometry import camera as cam_mod


def test_project_backproject_roundtrip(rng):
    cfg = config.tum3_config()
    cam = cfg.camera
    uv = jnp.asarray(rng.uniform(low=0, high=[cam.width, cam.height],
                                 size=(256, 2)).astype(np.float32))
    z = jnp.asarray(rng.uniform(0.5, 5.0, size=(256,)).astype(np.float32))
    pc = cam_mod.backproject(cam, uv, z)
    uv2 = cam_mod.project(cam, pc)
    np.testing.assert_allclose(uv, uv2, atol=1e-3)


def test_project_stereo_disparity():
    cam = config.tum3_config().camera
    pc = jnp.asarray([[0.0, 0.0, 2.0]])
    uvr = cam_mod.project_stereo(cam, pc)
    assert np.allclose(uvr[0, 0] - uvr[0, 2], cam.bf / 2.0, atol=1e-4)


def test_undistort_roundtrip(rng):
    cam = config.tum1_config().camera  # nonzero distortion
    # Points well inside the image -> stable distortion inversion.
    uv = jnp.asarray(rng.uniform(low=[160, 120], high=[480, 360],
                                 size=(128, 2)).astype(np.float32))
    und = cam_mod.undistort_points(cam, uv)
    # re-distort the undistorted normalized coords and compare
    x = (und[..., 0] - cam.cx) / cam.fx
    y = (und[..., 1] - cam.cy) / cam.fy
    d = cam_mod.distort_normalized(cam, jnp.stack([x, y], axis=-1))
    u2 = d[..., 0] * cam.fx + cam.cx
    v2 = d[..., 1] * cam.fy + cam.cy
    np.testing.assert_allclose(np.stack([u2, v2], -1), uv, atol=0.05)


def test_no_distortion_identity():
    cam = config.tum3_config().camera
    uv = jnp.asarray([[100.0, 100.0]])
    np.testing.assert_allclose(cam_mod.undistort_points(cam, uv), uv)


def test_config_presets_hashable():
    cfg = config.tum3_config()
    hash(cfg)
    assert cfg.close_depth_threshold > 0

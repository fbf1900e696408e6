import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgslam_tpu import config
from sgslam_tpu.geometry import epipolar, se3
from sgslam_tpu.io import synthetic
from sgslam_tpu.ops import flow as flow_mod
from sgslam_tpu.ops import orb as orb_mod
from sgslam_tpu.semantic import dynamic

CFG = config.synthetic_config(width=320, height=240)
ORB = config.OrbConfig(n_features=400, max_keypoints=512)


def test_lk_flow_translation():
    """Flow on a shifted image recovers the shift."""
    rng = np.random.default_rng(0)
    base = rng.random((260, 340)).astype(np.float32)
    import cv2
    base = cv2.GaussianBlur(base, (7, 7), 1.5)  # smooth for LK linearization
    img0 = jnp.asarray(base[10:250, 10:330])
    img1 = jnp.asarray(base[13:253, 6:326])  # img1 = img0 shifted (+4, -3)?
    pts = jnp.asarray(rng.uniform([30, 30], [290, 210],
                                  size=(64, 2)).astype(np.float32))
    valid = jnp.ones(64, bool)
    out, status = flow_mod.lk_flow(img0, img1, pts, valid)
    st = np.asarray(status)
    assert st.mean() > 0.7
    d = np.asarray(out - pts)[st]
    # content at (x,y) of img0 = base[y+10, x+10]; in img1 it sits where
    # y'+13 = y+10, x'+6 = x+10 -> shift = (+4, -3)
    np.testing.assert_allclose(np.median(d, axis=0), [4.0, -3.0], atol=0.3)


def test_epipolar_distance_zero_for_true_geometry(rng):
    cam = CFG.camera
    T1 = se3.se3_identity()
    T2 = se3.se3_exp(jnp.asarray([0.1, 0.02, 0.03, 0.02, 0.04, 0.01],
                                 jnp.float32))
    pw = jnp.asarray(rng.uniform([-1, -1, 1.5], [1, 1, 4],
                                 size=(100, 3)).astype(np.float32))
    from sgslam_tpu.geometry import camera as cam_mod

    p1 = cam_mod.project(cam, se3.se3_apply(T1[None], pw))
    p2 = cam_mod.project(cam, se3.se3_apply(T2[None], pw))
    F21 = epipolar.fundamental_from_poses(cam, T2, T1)  # line in 2 from 1?
    # check both orientations; one must vanish
    d1 = np.asarray(epipolar.epipolar_distance(F21, p1, p2)).mean()
    d2 = np.asarray(epipolar.epipolar_distance(F21.T, p1, p2)).mean()
    assert min(d1, d2) < 1e-2, (d1, d2)


def test_ransac_fundamental_rejects_outliers(rng):
    cam = CFG.camera
    T2 = se3.se3_exp(jnp.asarray([0.2, 0.0, 0.05, 0.01, 0.05, 0.0],
                                 jnp.float32))
    pw = jnp.asarray(rng.uniform([-1, -1, 1.5], [1, 1, 4],
                                 size=(256, 3)).astype(np.float32))
    from sgslam_tpu.geometry import camera as cam_mod

    p1 = cam_mod.project(cam, pw)
    p2 = np.array(cam_mod.project(cam, se3.se3_apply(T2[None], pw)))
    p2[:40] += rng.uniform(15, 40, size=(40, 2))  # 40 moving-object points
    F, inl, n = epipolar.ransac_fundamental(
        p1, jnp.asarray(p2.astype(np.float32)), jnp.ones(256, bool),
        jax.random.PRNGKey(0), iters=128, thresh=1.0)
    inl = np.asarray(inl)
    assert int(n) > 180
    assert inl[:40].sum() < 8, "outliers should not be F inliers"


def test_reject_dynamic_on_synthetic_scene():
    """Features on the moving quad must be culled; static scene survives."""
    # 30-frame sequence -> consecutive frames have video-rate motion
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=30, dynamic=True)
    # frames near s=2/3: the person's strafe speed is at its maximum
    # (at s=1/2 it reverses direction and is momentarily world-static —
    # a correctly-working cull must NOT fire there)
    g0, d0 = seq.frame(19)
    g1, d1 = seq.frame(20)
    feats = orb_mod.extract(g1, ORB, CFG.camera)

    # ground-truth dynamic mask: depth differs from static render
    seq_s = synthetic.SyntheticSequence(CFG.camera, n_frames=30,
                                        dynamic=False)
    _, ds = seq_s.frame(20)
    dyn_px = np.asarray(ds - d1) > 0.3
    xy = np.clip(np.asarray(feats.xy_raw).astype(int), 0,
                 [CFG.camera.width - 1, CFG.camera.height - 1])
    on_obj = dyn_px[xy[:, 1], xy[:, 0]] & np.asarray(feats.valid)

    # person box covering the object (simulating the detector)
    ys, xs = np.where(dyn_px)
    box = jnp.asarray([[xs.min() - 2, ys.min() - 2, xs.max() + 2,
                        ys.max() + 2]], jnp.float32)
    person = dynamic.Boxes(
        xyxy=jnp.concatenate([box, jnp.zeros((31, 4))], 0),
        cls=jnp.full(32, 15, jnp.int32),
        score=jnp.full(32, 0.9, jnp.float32),
        valid=jnp.asarray([True] + [False] * 31))

    # production correspondence path: windowed ORB matching vs prev frame
    feats0 = orb_mod.extract(g0, ORB, CFG.camera)
    prev_xy, status = dynamic.match_prev_frame(
        CFG.matcher, CFG.orb.scale_factor, feats,
        feats0.xy_raw, feats0.level, feats0.angle, feats0.desc,
        feats0.valid, radius=CFG.dynamic.match_radius)
    keep, n_corr, n_inl = dynamic.reject_dynamic_matched(
        CFG.dynamic, feats.xy_raw, feats.valid, prev_xy, status,
        person, person, jax.random.PRNGKey(1))
    keep = np.asarray(keep)
    assert int(n_corr) > 100
    # most moving-object features culled
    if on_obj.sum() >= 5:
        assert keep[on_obj].mean() < 0.5, (
            f"culled only {1 - keep[on_obj].mean():.2f} of dynamic feats")
    # most static features survive
    static = ~on_obj & np.asarray(feats.valid)
    assert keep[static].mean() > 0.8


def test_survivor_floor():
    """If the cull would remove nearly everything, keep everything."""
    cfg = config.DynamicConfig(min_survivor_ratio=0.5)
    rng = np.random.default_rng(3)
    g0 = jnp.asarray(rng.random((120, 160)).astype(np.float32))
    g1 = jnp.asarray(rng.random((120, 160)).astype(np.float32))  # no flow
    xy = jnp.asarray(rng.uniform([20, 20], [140, 100],
                                 size=(64, 2)).astype(np.float32))
    valid = jnp.ones(64, bool)
    keep, _, _ = dynamic.reject_dynamic(
        cfg, g1, g0, xy, valid, dynamic.Boxes.empty(), dynamic.Boxes.empty(),
        jax.random.PRNGKey(0))
    assert np.asarray(keep).mean() >= 0.5


def test_in_any_box():
    boxes = dynamic.Boxes(
        xyxy=jnp.asarray([[10, 10, 50, 50], [100, 100, 120, 140]],
                         jnp.float32),
        cls=jnp.asarray([15, 15], jnp.int32),
        score=jnp.asarray([0.9, 0.9]),
        valid=jnp.asarray([True, False]))
    xy = jnp.asarray([[20, 20], [110, 120], [60, 60]], jnp.float32)
    got = np.asarray(dynamic.in_any_box(xy, boxes, jnp.ones(2, bool)))
    np.testing.assert_array_equal(got, [True, False, False])  # box 2 invalid

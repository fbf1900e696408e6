import jax.numpy as jnp
import numpy as np
import pytest

from sgslam_tpu import config
from sgslam_tpu.io import synthetic
from sgslam_tpu.ops import fast as fast_mod
from sgslam_tpu.ops import image as image_mod
from sgslam_tpu.ops import orb as orb_mod

CFG = config.synthetic_config(width=320, height=240)
ORB = config.OrbConfig(n_features=500, max_keypoints=512)


def render(i=0, dynamic=False):
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=3, dynamic=dynamic)
    return seq.frame(i)


def test_gaussian_blur_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.random((64, 64)).astype(np.float32)
    ours = np.asarray(image_mod.gaussian_blur(jnp.asarray(img), 7, 2.0))
    ref = cv2.GaussianBlur(img, (7, 7), 2.0, borderType=cv2.BORDER_REPLICATE)
    np.testing.assert_allclose(ours[3:-3, 3:-3], ref[3:-3, 3:-3], atol=1e-4)


def test_fast_matches_cv2_positions(rng):
    """Golden test: our FAST corners ~= cv2.FAST corners (SURVEY.md §4)."""
    cv2 = pytest.importorskip("cv2")
    gray, _ = render(0)
    img8 = (np.asarray(gray) * 255).astype(np.uint8)
    det = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=True)
    kps = det.detect(img8)
    ref_xy = np.array([k.pt for k in kps])  # (x, y)

    score = fast_mod.fast_score_map(jnp.asarray(img8.astype(np.float32)),
                                    20.0)
    score = fast_mod.nms_3x3(score)
    ours = np.argwhere(np.asarray(score) > 0)  # (y, x)

    # Most cv2 corners (away from borders) should have one of ours within
    # 2px, and vice versa. Integer score ties die on both sides of strict
    # NMS, so neither direction is exactly 100%.
    inb = ((ref_xy[:, 0] > 5) & (ref_xy[:, 0] < 315)
           & (ref_xy[:, 1] > 5) & (ref_xy[:, 1] < 235))
    ref_xy = ref_xy[inb]
    assert len(ref_xy) > 30, "scene should produce corners"
    d = np.abs(ref_xy[:, None, :] - ours[None, :, ::-1]).max(-1)
    recall = (d.min(1) <= 2).mean()
    assert recall > 0.8, f"FAST recall vs OpenCV too low: {recall:.2f}"
    precision = (d.min(0) <= 2).mean()
    assert precision > 0.9, f"FAST precision vs OpenCV too low: {precision:.2f}"


def test_extract_shapes_and_masks():
    gray, _ = render(0)
    feats = orb_mod.extract(jnp.asarray(gray), ORB, CFG.camera)
    assert feats.xy.shape == (512, 2)
    assert feats.desc.shape == (512, 8) and feats.desc.dtype == jnp.uint32
    nvalid = int(feats.valid.sum())
    assert nvalid > 300, f"too few keypoints: {nvalid}"
    v = np.asarray(feats.valid)
    xy = np.asarray(feats.xy)[v]
    assert xy[:, 0].min() >= 0 and xy[:, 0].max() < 320
    # multiple pyramid levels represented
    assert len(np.unique(np.asarray(feats.level)[v])) >= 3
    # spatial spread: keypoints should cover most of the image quadrants
    qx = (xy[:, 0] > 160).astype(int) * 2 + (xy[:, 1] > 120).astype(int)
    assert len(np.unique(qx)) == 4


def test_descriptor_rotation_invariance():
    """Rotating the image should keep most descriptor bits stable."""
    cv2 = pytest.importorskip("cv2")
    gray, _ = render(0)
    img = np.asarray(gray)
    m = cv2.getRotationMatrix2D((160, 120), 30, 1.0)
    rot = cv2.warpAffine(img, m, (320, 240))

    f0 = orb_mod.extract(jnp.asarray(img), ORB, CFG.camera)
    f1 = orb_mod.extract(jnp.asarray(rot), ORB, CFG.camera)

    # match by ground-truth correspondence of rotated coordinates
    v0 = np.asarray(f0.valid)
    xy0 = np.asarray(f0.xy_raw)[v0]
    d0 = np.asarray(f0.desc)[v0]
    xy0h = np.concatenate([xy0, np.ones((len(xy0), 1))], 1)
    xy0r = xy0h @ m.T  # where f0 kps land in rotated image
    v1 = np.asarray(f1.valid)
    xy1 = np.asarray(f1.xy_raw)[v1]
    d1 = np.asarray(f1.desc)[v1]

    dist = np.linalg.norm(xy0r[:, None] - xy1[None], axis=-1)
    nn = dist.argmin(1)
    good = dist.min(1) < 2.0
    assert good.sum() > 50
    a = d0[good]
    b = d1[nn[good]]
    ham = np.unpackbits(
        (a ^ b).view(np.uint8), axis=1).sum(1)
    # random descriptors would give ~128; rotation-invariant ones far less
    assert np.median(ham) < 70, f"median hamming {np.median(ham)}"


def test_attach_rgbd():
    gray, depth = render(0)
    feats = orb_mod.extract(jnp.asarray(gray), ORB, CFG.camera)
    feats = orb_mod.attach_rgbd(feats, jnp.asarray(depth), CFG.camera)
    v = np.asarray(feats.valid)
    d = np.asarray(feats.depth)[v]
    assert (d > 0).mean() > 0.95
    ur = np.asarray(feats.u_right)[v]
    u = np.asarray(feats.xy)[v][:, 0]
    ok = d > 0
    np.testing.assert_allclose(u[ok] - ur[ok], CFG.camera.bf / d[ok],
                               rtol=1e-4)


def test_extract_on_blank_image():
    """No texture -> no keypoints, but no NaNs and valid=False everywhere."""
    blank = jnp.zeros((240, 320), jnp.float32)
    feats = orb_mod.extract(blank, ORB, CFG.camera)
    assert int(feats.valid.sum()) == 0
    assert bool(jnp.all(jnp.isfinite(feats.xy)))

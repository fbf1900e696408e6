import jax
import jax.numpy as jnp
import numpy as np

from sgslam_tpu import config
from sgslam_tpu.models import detector as det_mod


def test_anchors_shape_and_range():
    a = det_mod.make_anchors()
    assert a.shape == ((19 * 19 + 10 * 10) * 6, 4)
    assert (a[:, :2] >= 0).all() and (a[:, :2] <= 1).all()


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray([[0.1, 0.1, 0.5, 0.5],
                         [0.12, 0.12, 0.52, 0.52],   # overlaps first
                         [0.6, 0.6, 0.9, 0.9]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    cls = jnp.asarray([15, 15, 7], jnp.int32)
    idx, ok = det_mod.nms_topk(boxes, scores, cls, k=3, pool=3)
    idx, ok = np.asarray(idx), np.asarray(ok)
    kept = set(idx[ok].tolist())
    assert kept == {0, 2}


def test_nms_keeps_cross_class_overlaps():
    boxes = jnp.asarray([[0.1, 0.1, 0.5, 0.5],
                         [0.12, 0.12, 0.52, 0.52]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    cls = jnp.asarray([15, 9], jnp.int32)  # person vs chair
    idx, ok = det_mod.nms_topk(boxes, scores, cls, k=2, pool=2)
    assert np.asarray(ok).sum() == 2


def test_detector_end_to_end_contract(rng):
    cfg = config.DetectorConfig(max_boxes=16)
    det = det_mod.Detector2D(cfg, key=jax.random.PRNGKey(0))
    rgb = jnp.asarray(rng.random((120, 160, 3)).astype(np.float32))
    all_b, person_cull, person_map, obj2d = det.detect(rgb, 160, 120)
    for b in (all_b, person_cull, person_map, obj2d):
        assert b.xyxy.shape == (16, 4)
        assert b.valid.dtype == bool
        # pixel coordinates
        assert bool(jnp.all(b.xyxy[:, 0] <= 160)) and bool(
            jnp.all(b.xyxy[:, 3] <= 120))
    # person_cull is a subset of person_map
    pc, pm = np.asarray(person_cull.valid), np.asarray(person_map.valid)
    assert (~pc | pm).all()
    # objects2d never contains persons
    o = np.asarray(obj2d.valid)
    c = np.asarray(obj2d.cls)
    assert not (o & (c == cfg.person_class)).any()

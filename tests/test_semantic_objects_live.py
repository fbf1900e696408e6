"""LIVE 3-D semantic objects: the full detector -> Detector3D ->
ObjectDatabase chain running end-to-end inside System / the chunked path —
the contract the reference wires at Detector2D.cc:85-86 (non-person boxes
-> mvObjects2D) -> PointcloudMapping.cc:145-151 (Detector3D::Detect per
box) -> ObjectDatabase::addObject. No oracle boxes anywhere: detections
come from the trained detector on rendered prop scenes."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgslam_tpu import config
from sgslam_tpu.geometry import se3
from sgslam_tpu.io import synthetic
from sgslam_tpu.models.detector import default_detector_params

CFG = config.synthetic_config(
    width=320, height=240,
    orb=config.OrbConfig(n_features=600, max_keypoints=640),
    capacity=config.MapCapacity(max_keyframes=64, max_points=8192,
                                local_window=4, local_points=1024),
)

pytestmark = pytest.mark.skipif(default_detector_params() is None,
                                reason="detector asset not built")


def _gt_props_slam_frame(seq):
    """Prop centroids in the SLAM world (= camera-0 frame)."""
    T_c0_w = se3.se3_inverse(seq.poses[0])
    pts = jnp.asarray(seq.props[:, :3])
    return np.asarray(se3.se3_apply(T_c0_w[None], pts)), \
        np.asarray(seq.props[:, 5]).astype(int)


def _check_objects(db, gt_pos, gt_cls):
    valid = np.asarray(db.valid)
    assert valid.sum() >= 1, "ObjectDatabase never populated in a live run"
    cents = np.asarray(db.centroid)[valid]
    clss = np.asarray(db.cls)[valid]
    # at least one database object matches a ground-truth prop: same class,
    # centroid within half a meter (box-center extraction is coarse)
    hits = 0
    for p, c in zip(gt_pos, gt_cls):
        d = np.linalg.norm(cents - p[None], axis=-1)
        m = (clss == c) & (d < 0.5)
        hits += int(m.any())
    assert hits >= 1, (
        f"no DB object matches a GT prop: classes {clss.tolist()}, "
        f"centroids {cents.round(2).tolist()} vs GT {gt_pos.round(2)}")
    return hits


def test_system_live_objects():
    """System with detector + mapper enabled: non-person detections become
    fused 3-D objects; occupancy also populates (runner default path)."""
    from sgslam_tpu.slam.system import System

    N = 24
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=N, dynamic=True,
                                     props=True)
    s = System(CFG, enable_semantic=True, enable_loop=False,
               enable_mapping=True)
    assert s.detector is not None
    for i in range(N):
        g, d = seq.frame(i)
        rgb = jnp.repeat(jnp.asarray(g)[..., None], 3, -1)
        s.track_rgbd(g, d, rgb=rgb)
    assert s.state == "OK"
    gt_pos, gt_cls = _gt_props_slam_frame(seq)
    _check_objects(s.mapper.objects, gt_pos, gt_cls)
    occ = s.mapper.occupancy_2d()
    assert (occ > 0).sum() > 20


def test_chunked_live_objects():
    """The chunked real-time path populates the ObjectDatabase through the
    drain-time mapper (obj boxes selected on device per keyframe)."""
    from sgslam_tpu.mapping.semantic_mapper import SemanticMapper
    from sgslam_tpu.models.detector import Detector2D
    from sgslam_tpu.slam import scan_pipeline

    N = 30
    chunk = 4
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=N, dynamic=True,
                                     props=True)
    mapper = SemanticMapper(CFG)
    det = Detector2D(CFG.detector)
    ct = scan_pipeline.ChunkedSemanticTracker(CFG, det, chunk=chunk,
                                              fetch_every=2, mapper=mapper)
    n_boot = 0
    while ct._carry is None:
        ct.bootstrap(*seq.frame(n_boot))
        n_boot += 1
    i = n_boot
    while i + chunk <= N:
        g = jnp.stack([seq.frame(j)[0] for j in range(i, i + chunk)])
        d = jnp.stack([seq.frame(j)[1] for j in range(i, i + chunk)])
        ct.process_chunk(g, d)
        i += chunk
    ct.flush()
    gt_pos, gt_cls = _gt_props_slam_frame(seq)
    _check_objects(mapper.objects, gt_pos, gt_cls)

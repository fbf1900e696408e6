"""Long-run capacity pressure: the map maintenance pass (point culling,
triangulation, fusion, keyframe culling — LocalMapping.cc:61-87) plus slot
compaction must keep a fixed-capacity map healthy over a sequence that
inserts far more keyframes than there are slots, with stable ATE.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sgslam_tpu import config
from sgslam_tpu.eval import ate
from sgslam_tpu.geometry import se3
from sgslam_tpu.io import synthetic
from sgslam_tpu.mapstate import maintenance as mt
from sgslam_tpu.mapstate import mapstate as ms
from sgslam_tpu.slam import tracking

# tiny capacities so culling + compaction MUST fire
CFG = config.synthetic_config(
    width=320, height=240,
    orb=config.OrbConfig(n_features=600, max_keypoints=640),
    tracker=config.TrackerConfig(max_frames_between_kf=2,
                                 depth_threshold_factor=70.0),
    capacity=config.MapCapacity(max_keyframes=24, max_points=8192,
                                local_window=4, local_points=1024),
)
N_FRAMES = 120


@pytest.fixture(scope="module")
def long_run():
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=N_FRAMES)
    tr = tracking.Tracker(CFG)
    for i in range(N_FRAMES):
        gray, depth = seq.frame(i)
        tr.process(gray, depth)
    est_cw = tr.poses_cw()
    est_wc = np.stack([np.asarray(se3.se3_inverse(jnp.asarray(p)))
                       for p in est_cw])
    gt_wc = np.stack([np.asarray(seq.gt_pose_wc(i))
                      for i in range(N_FRAMES)])
    return tr, est_wc, gt_wc


def test_capacity_pressure_survives(long_run):
    tr, est_wc, gt_wc = long_run
    assert tr.state == "OK"
    # far more keyframes inserted than slots -> compaction had to fire
    assert tr.n_kf > CFG.capacity.max_keyframes
    assert tr.compactions >= 1
    m = tr.map
    # live map stays within capacity with free headroom
    assert int(m.next_kf) < m.max_kf
    assert 2 <= int(m.kf_valid.sum()) <= m.max_kf
    assert int(m.pt_valid.sum()) <= int(m.next_pt)


def test_capacity_pressure_ate_stable(long_run):
    tr, est_wc, gt_wc = long_run
    rmse, _, _ = ate.ate_rmse(est_wc, gt_wc)
    # tiny-capacity stress run (24 KF slots, constant culling/compaction):
    # cm-level drift is acceptable; the gate guards against divergence
    assert rmse < 0.08, f"long-run ATE {rmse:.4f} m"
    # second half no worse than 3x the first half (no drift blow-up after
    # compaction / culling start reusing slots)
    r1, _, _ = ate.ate_rmse(est_wc[: N_FRAMES // 2], gt_wc[: N_FRAMES // 2])
    r2, _, _ = ate.ate_rmse(est_wc[N_FRAMES // 2:], gt_wc[N_FRAMES // 2:])
    assert r2 < 3.0 * max(r1, 0.01), (r1, r2)


def test_maintenance_culls_and_triangulates(long_run):
    tr, _, _ = long_run
    m = tr.map
    # ~60 keyframes each create up to 256 depth points; without point
    # culling + duplicate fusion the live set would explode — it must stay
    # a small multiple of one frame's feature budget
    assert int(m.pt_valid.sum()) < 6 * CFG.orb.n_features
    # keyframe culling fired at least once over the run
    assert int(m.kf_valid.sum()) < min(tr.n_kf, m.max_kf)


def test_compact_map_preserves_structure():
    """compact_map must preserve poses/points/observations modulo the
    permutation it reports."""
    cap = config.MapCapacity(max_keyframes=8, max_points=64)
    m = ms.empty_map(cap, 16)
    # hand-build: 3 KFs in slots 0,2,5; 4 points in slots 1,3,7,9
    kf_slots = [0, 2, 5]
    pt_slots = [1, 3, 7, 9]
    kf_valid = m.kf_valid
    for s in kf_slots:
        kf_valid = kf_valid.at[s].set(True)
    pt_valid = m.pt_valid
    for s in pt_slots:
        pt_valid = pt_valid.at[s].set(True)
    pose = jnp.tile(se3.se3_identity()[None], (8, 1))
    pose = pose.at[:, 4].set(jnp.arange(8, dtype=jnp.float32))
    pos = jnp.arange(64 * 3, dtype=jnp.float32).reshape(64, 3)
    obs = m.kf_obs_point.at[0, 0].set(1).at[2, 3].set(7).at[5, 1].set(9)
    obs = obs.at[0, 5].set(4)  # dangling ref to an INVALID point slot
    m = dataclasses.replace(
        m, kf_valid=kf_valid, pt_valid=pt_valid, kf_pose=pose,
        pt_pos=pos, kf_obs_point=obs,
        pt_first_kf=m.pt_first_kf.at[1].set(0).at[3].set(2).at[7].set(5),
        next_kf=jnp.asarray(6), next_pt=jnp.asarray(10))

    m2, kf_map, pt_map = mt.compact_map(m)
    kf_map = np.asarray(kf_map)
    pt_map = np.asarray(pt_map)
    assert int(m2.next_kf) == 3 and int(m2.next_pt) == 4
    # valid slots land at the front, order preserved
    assert [kf_map[s] for s in kf_slots] == [0, 1, 2]
    assert [pt_map[s] for s in pt_slots] == [0, 1, 2, 3]
    np.testing.assert_allclose(np.asarray(m2.kf_pose[1]),
                               np.asarray(pose[2]))
    np.testing.assert_allclose(np.asarray(m2.pt_pos[2]),
                               np.asarray(pos[7]))
    # observations follow the permutation; dangling ref cleared
    assert int(m2.kf_obs_point[0, 0]) == int(pt_map[1])
    assert int(m2.kf_obs_point[1, 3]) == int(pt_map[7])
    assert int(m2.kf_obs_point[2, 1]) == int(pt_map[9])
    assert int(m2.kf_obs_point[0, 5]) == ms.NO_POINT
    assert int(m2.pt_first_kf[pt_map[3]]) == int(kf_map[2])


def test_descriptor_refresh_on_drift():
    """A matched point whose observed descriptor drifted far from the
    stored representative adopts the new one (MapPoint::
    ComputeDistinctiveDescriptors role, MapPoint.cc:242)."""
    from sgslam_tpu.ops.orb import Features
    from sgslam_tpu.geometry import se3 as se3m

    cap = config.MapCapacity(max_keyframes=8, max_points=64)
    cfg = config.synthetic_config(width=320, height=240, capacity=cap,
                                  orb=config.OrbConfig(max_keypoints=16))
    N = 16
    m = ms.empty_map(cap, N)
    m = dataclasses.replace(
        m, pt_valid=m.pt_valid.at[0].set(True),
        pt_pos=m.pt_pos.at[0].set(jnp.asarray([0.0, 0.0, 2.0])),
        pt_desc=m.pt_desc.at[0].set(jnp.zeros(8, jnp.uint32)),
        next_pt=jnp.asarray(1))

    desc = jnp.zeros((N, 8), jnp.uint32)
    desc = desc.at[0].set(jnp.full(8, 0xFFFFFFFF, jnp.uint32))  # drift 256
    feats = Features(
        xy=jnp.zeros((N, 2)), xy_raw=jnp.zeros((N, 2)),
        response=jnp.zeros(N), angle=jnp.zeros(N),
        level=jnp.zeros(N, jnp.int32), desc=desc,
        depth=jnp.full(N, -1.0), u_right=jnp.full(N, -1.0),
        valid=jnp.zeros(N, bool).at[0].set(True))
    matched = jnp.full(N, -1, jnp.int32).at[0].set(0)
    m2 = ms.insert_keyframe(cfg.camera, 1.2, m, feats,
                            se3m.se3_identity(), 0, matched, 3.0,
                            max_new_points=8)
    assert int(np.asarray(m2.pt_desc[0]).sum()) != 0, "descriptor not refreshed"

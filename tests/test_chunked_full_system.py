"""The chunked real-time path as ONE complete system: loop closing,
relocalization, and semantic mapping all ride the drain boundary of
slam/scan_pipeline (the role of the reference's LoopClosing /
PointcloudMapping threads behind the Tracking thread,
/root/reference/src/sg-slam/src/System.cc:145-174, LoopClosing.cc:57-88,
PointcloudMapping.cc:197-247)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgslam_tpu import config
from sgslam_tpu.eval import ate
from sgslam_tpu.geometry import se3
from sgslam_tpu.io import synthetic
from sgslam_tpu.slam import loop_closing, scan_pipeline
from sgslam_tpu.slam.loop_closing import LoopCloser

CFG = config.synthetic_config(
    width=320, height=240,
    orb=config.OrbConfig(n_features=600, max_keypoints=640),
    tracker=config.TrackerConfig(max_frames_between_kf=4,
                                 depth_threshold_factor=70.0),
    capacity=config.MapCapacity(max_keyframes=64, max_points=8192,
                                local_window=4, local_points=1024),
)
# 3x the System-path test's drift: the chunked tracker's own accumulated
# drift (~0.06 m KF ATE on this circuit, vs ~0.02 per-frame) partially
# cancels small injections, so the loop signal must dominate it
DRIFT_XI = np.array([0.66, 0.0, 0.30, 0.0, 0.18, 0.0], np.float32)
N_LOOP = 92
N_PHASE1 = 66
LOOPS = 1.15


def _kf_ate(m, gt_poses_wc):
    valid = np.asarray(m.kf_valid)
    fids = np.asarray(m.kf_frame_id)[valid]
    est_wc = np.stack([np.asarray(se3.se3_inverse(p))
                       for p in np.asarray(m.kf_pose)[valid]])
    gt_wc = np.stack([np.asarray(gt_poses_wc[f]) for f in fids])
    rmse, _, _ = ate.ate_rmse(est_wc, gt_wc)
    return rmse


def _inject_drift(ct):
    """Warp keyframe poses + points by progressive world drift (same
    injection as test_loop_e2e, applied to the chunked tracker)."""
    ct.flush()
    m = ct._map
    K = m.max_kf
    n_kf = int(m.next_kf)
    frac = np.clip(np.arange(K, dtype=np.float32) / max(n_kf - 1, 1), 0, 1)
    xi = jnp.asarray(frac[:, None] * DRIFT_XI[None, :])
    D = jax.vmap(se3.se3_exp)(xi)
    new_poses = jax.vmap(
        lambda T, d: se3.se3_compose(T, se3.se3_inverse(d)))(m.kf_pose, D)
    ct._map = loop_closing._apply_correction(m, m.kf_pose, new_poses)
    d_last = D[n_kf - 1]
    ct._carry = dataclasses.replace(
        ct._carry,
        Tcw=se3.se3_compose(ct._carry.Tcw, se3.se3_inverse(d_last)))
    # subsequent frames are tracked in the drifted world: re-anchor the
    # trajectory reference pose the same way the loop-correction path does
    if ct._ref_slot >= 0:
        ct._ref_pose_ins = np.asarray(ct._map.kf_pose[ct._ref_slot])


def _run_chunks(ct, seq, start, stop, chunk):
    i = start
    while i + chunk <= stop:
        g = jnp.stack([seq.frame(j)[0] for j in range(i, i + chunk)])
        d = jnp.stack([seq.frame(j)[1] for j in range(i, i + chunk)])
        ct.process_chunk(g, d)
        i += chunk
    return i


@pytest.fixture(scope="module")
def chunked_loop_run():
    chunk = 4
    poses = synthetic.make_circuit_trajectory(N_LOOP, loops=LOOPS)
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=N_LOOP,
                                     planes=synthetic.ROOM_CLOSED,
                                     poses=poses)
    ct = scan_pipeline.ChunkedTracker(CFG, chunk=chunk, fetch_every=2,
                                     loop=LoopCloser(CFG))
    n_boot = 0
    while ct._carry is None:
        ct.bootstrap(*seq.frame(n_boot))
        n_boot += 1
    end1 = _run_chunks(ct, seq, n_boot, N_PHASE1, chunk)
    n_loops_clean = ct.loops_closed

    _inject_drift(ct)
    ate_drifted = _kf_ate(ct._map, poses)
    _run_chunks(ct, seq, end1, N_LOOP, chunk)
    ct.flush()
    ate_final = _kf_ate(ct.map, poses)
    return ct, n_loops_clean, ate_drifted, ate_final


def test_chunked_loop_closes_and_corrects(chunked_loop_run):
    ct, n_clean, ate_drifted, ate_final = chunked_loop_run
    assert n_clean == 0, "loop fired on a clean, covisible revisit"
    assert ct.loops_closed >= 1, "loop never closed on the chunked path"
    assert ate_drifted > 0.10, f"drift injection too small: {ate_drifted}"
    assert ate_final < ate_drifted / 1.6, (
        f"KF ATE {ate_drifted:.3f} -> {ate_final:.3f}: chunked loop "
        f"correction did not reduce error enough")


def test_chunked_trajectory_retrocorrected(chunked_loop_run):
    """Frames recorded before the loop correction must come out corrected
    at export (the relative-to-reference-KF reconstruction,
    System.cc:424-453)."""
    ct, _, ate_drifted, _ = chunked_loop_run
    est = ct.poses_cw()
    n = est.shape[0]
    poses = synthetic.make_circuit_trajectory(N_LOOP, loops=LOOPS)
    est_wc = np.stack([np.asarray(se3.se3_inverse(jnp.asarray(p)))
                       for p in est])
    gt_wc = np.stack([np.asarray(poses[i]) for i in range(n)])
    rmse, _, _ = ate.ate_rmse(est_wc, gt_wc)
    assert rmse < ate_drifted, (
        f"full-trajectory ATE {rmse:.3f} not improved vs drifted "
        f"{ate_drifted:.3f}")


def test_chunked_kidnap_relocalizes():
    """Teleport the chunked tracker mid-sequence: the scan coasts, the
    drain detects the inlier collapse, and host-side relocalization
    recovers the pose in the map frame (Tracking::Relocalization role)."""
    N = 88
    chunk = 4
    poses = synthetic.make_circuit_trajectory(N, loops=1.0)
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=N,
                                     planes=synthetic.ROOM_CLOSED,
                                     poses=poses)
    ct = scan_pipeline.ChunkedTracker(CFG, chunk=chunk, fetch_every=1,
                                     loop=LoopCloser(CFG))
    n_boot = 0
    while ct._carry is None:
        ct.bootstrap(*seq.frame(n_boot))
        n_boot += 1
    _run_chunks(ct, seq, n_boot, 44, chunk)
    ct.flush()
    own_traj = ct.poses_cw()
    assert ct.n_kf > 5

    # kidnap: frames from ~140 degrees away from the motion-model pose
    kidnap_to = 6
    for c in range(3):
        lo = kidnap_to + c * chunk
        g = jnp.stack([seq.frame(j)[0] for j in range(lo, lo + chunk)])
        d = jnp.stack([seq.frame(j)[1] for j in range(lo, lo + chunk)])
        ct.process_chunk(g, d)
    ct.flush()
    assert ct.relocs >= 1, "chunked path never relocalized after kidnap"
    # after relocalization the tail frames must track again with a pose
    # consistent with the map's own earlier estimate at that viewpoint
    tail_inl = ct.n_inliers_hist[-chunk:]
    assert max(tail_inl) >= CFG.tracker.min_inliers_local_map, tail_inl
    est = ct.poses_cw()
    errs = [float(np.linalg.norm(est[-(i + 1)][4:7]
                                 - own_traj[kidnap_to + 3 * chunk - 1 - i][4:7]))
            for i in range(chunk)]
    assert min(errs) < 0.06, f"post-reloc pose error: {errs}"


def test_chunked_mapper_receives_keyframes():
    """SemanticMapper rides the chunked drain: occupancy + global cloud
    populate from drained keyframes (PointcloudMapping role)."""
    from sgslam_tpu.mapping.semantic_mapper import SemanticMapper

    N = 30
    chunk = 4
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=N)
    mapper = SemanticMapper(CFG)
    ct = scan_pipeline.ChunkedTracker(CFG, chunk=chunk, fetch_every=2,
                                     mapper=mapper)
    n_boot = 0
    while ct._carry is None:
        ct.bootstrap(*seq.frame(n_boot))
        n_boot += 1
    _run_chunks(ct, seq, n_boot, N, chunk)
    ct.flush()
    pts, _ = mapper.global_cloud()
    assert len(pts) > 500, "mapper never received drained keyframes"
    occ = mapper.occupancy_2d()
    assert (occ > 0).sum() > 20, "occupancy grid never populated"


def test_chunked_stereo_tracking():
    """Stereo on the real-time chunked path: rectified pairs in, RGB-D-
    level ATE out (no depth image anywhere)."""
    N = 26
    chunk = 4
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=N)
    ct = scan_pipeline.ChunkedStereoTracker(CFG, chunk=chunk, fetch_every=2)
    n_boot = 0
    while ct._carry is None:
        gl, gr, _ = seq.frame_stereo(n_boot)
        ct.bootstrap(gl, gr)
        n_boot += 1
    i = n_boot
    while i + chunk <= N:
        pairs = [seq.frame_stereo(j) for j in range(i, i + chunk)]
        ct.process_chunk(jnp.stack([p[0] for p in pairs]),
                         jnp.stack([p[1] for p in pairs]))
        i += chunk
    ct.flush()
    assert ct.n_kf >= 2
    est = ct.poses_cw()
    est_wc = np.stack([np.asarray(se3.se3_inverse(jnp.asarray(p)))
                       for p in est])
    gt_wc = np.stack([np.asarray(poses) for poses in
                      [synthetic.make_trajectory(N)[j]
                       for j in range(len(est))]])
    from sgslam_tpu.eval.ate import ate_rmse
    rmse, _, _ = ate_rmse(est_wc, gt_wc)
    # SAD-searched stereo depth is noisier than sensor RGB-D depth, and
    # the chunked map lags a chunk: allow ~1.3x the RGB-D gate
    assert rmse < 0.10, f"chunked stereo ATE {rmse:.4f}"
    assert min(ct.n_inliers_hist) > 30


@pytest.mark.slow
def test_everything_on_dynamic_scene():
    """Capstone: detector + dynamic rejection + loop-closer database +
    semantic mapper + occupancy ALL live on the chunked path over a
    dynamic prop scene — the subsystems must coexist without degrading
    tracking (the reference's six threads running together,
    System.cc:145-174)."""
    from sgslam_tpu.mapping.semantic_mapper import SemanticMapper
    from sgslam_tpu.models.detector import (Detector2D,
                                            default_detector_params)

    if default_detector_params() is None:
        pytest.skip("detector asset not built")
    N = 40
    chunk = 4
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=N, dynamic=True,
                                     props=True)
    det = Detector2D(CFG.detector)
    mapper = SemanticMapper(CFG)
    ct = scan_pipeline.ChunkedSemanticTracker(
        CFG, det, chunk=chunk, fetch_every=2, loop=LoopCloser(CFG),
        mapper=mapper)
    n_boot = 0
    while ct._carry is None:
        ct.bootstrap(*seq.frame(n_boot))
        n_boot += 1
    _run_chunks(ct, seq, n_boot, N, chunk)
    ct.flush()

    est = ct.poses_cw()
    est_wc = np.stack([np.asarray(se3.se3_inverse(jnp.asarray(p)))
                       for p in est])
    gt_wc = np.stack([np.asarray(seq.gt_pose_wc(i))
                      for i in range(len(est))])
    rmse, _, _ = ate.ate_rmse(est_wc, gt_wc)
    # props add depth-discontinuity features (prop/wall edges) on top of
    # the walking person: a harder scene than the prop-free dynamic gate
    assert rmse < 0.13, f"all-subsystems dynamic ATE {rmse:.3f}"
    # the person crossing the props occludes much of the 320x240 view on a
    # few frames: transient inlier dips are fine, sustained health is not
    med = sorted(ct.n_inliers_hist)[len(ct.n_inliers_hist) // 2]
    assert med >= 30, f"median inliers {med}"
    assert max(ct.n_inliers_hist[-chunk:]) >= 30, ct.n_inliers_hist[-chunk:]
    assert ct.n_kf >= 3
    # the semantic side actually ran: objects + occupancy populated
    assert int(np.asarray(mapper.objects.valid).sum()) >= 1
    assert (mapper.occupancy_2d() > 0).sum() > 20
    # loop DB maintained for every keyframe (reloc-ready)
    assert int(np.asarray(ct.loop.db_valid).sum()) >= ct.n_kf

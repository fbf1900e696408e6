"""Chunked-path feature parity with the per-frame System path:
localization-only mode, semantic+stereo combination, the stereo+mapper
depth guard, trailing-partial-chunk handling, and mid-window LOST
bookkeeping (System.cc:345-355, Tracking.h:93-99 semantics on the
real-time path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgslam_tpu import config
from sgslam_tpu.eval.ate import ate_rmse
from sgslam_tpu.geometry import se3
from sgslam_tpu.io import synthetic
from sgslam_tpu.slam import scan_pipeline
from sgslam_tpu.slam.loop_closing import LoopCloser
from sgslam_tpu.slam.system import System

CFG = config.synthetic_config(
    width=320, height=240,
    orb=config.OrbConfig(n_features=600, max_keypoints=640),
    tracker=config.TrackerConfig(max_frames_between_kf=4,
                                 depth_threshold_factor=70.0),
    capacity=config.MapCapacity(max_keyframes=64, max_points=8192,
                                local_window=4, local_points=1024),
)


def _run_chunks(ct, seq, start, stop, chunk):
    i = start
    while i + chunk <= stop:
        g = jnp.stack([seq.frame(j)[0] for j in range(i, i + chunk)])
        d = jnp.stack([seq.frame(j)[1] for j in range(i, i + chunk)])
        ct.process_chunk(g, d)
        i += chunk
    return i


def test_chunked_localization_only_resume(tmp_path):
    """Map with one session, reopen the checkpoint on the CHUNKED path in
    localization-only mode: bootstrap relocalizes against the restored
    keyframe database, chunks track, and the map gains no keyframes
    (System::ActivateLocalizationMode on the real-time path)."""
    N = 40
    poses = synthetic.make_circuit_trajectory(N, loops=0.5)
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=N,
                                      planes=synthetic.ROOM_CLOSED,
                                      poses=poses)
    s1 = System(CFG, enable_semantic=False, enable_mapping=False)
    for i in range(28):
        g, d = seq.frame(i)
        s1.track_rgbd(g, d)
    assert s1.state == "OK" and s1.tracker.n_kf >= 4
    ckpt = str(tmp_path / "map.npz")
    s1.save_checkpoint(ckpt)
    s1_traj = s1.tracker.poses_cw()

    ct = scan_pipeline.ChunkedTracker(CFG, chunk=4, fetch_every=2,
                                      loop=LoopCloser(CFG),
                                      only_tracking=True)
    ct.load_checkpoint(ckpt)
    n_kf_before = int(np.asarray(ct.inner.map.next_kf))

    # bootstrap on mapped viewpoints: must relocalize, then go chunked
    j = 8
    while ct._carry is None and j < 16:
        g, d = seq.frame(j)
        ct.bootstrap(g, d)
        j += 1
    assert ct._carry is not None, "never relocalized on chunked bootstrap"
    end = _run_chunks(ct, seq, j, 28, 4)
    ct.flush()
    # frozen map: no keyframe was ever inserted
    assert int(np.asarray(ct.map.next_kf)) == n_kf_before
    # localization accuracy vs session 1's own estimates (map-frame truth)
    est = ct.poses_cw()
    errs = [float(np.linalg.norm(est[-(k + 1)][4:7]
                                 - s1_traj[end - 1 - k][4:7]))
            for k in range(4)]
    assert min(errs) < 0.05, f"chunked localization error: {errs}"


def test_chunked_semantic_stereo():
    """Semantic + stereo combined on the real-time path: the detector and
    dynamic cull run on the left image, depth comes from the SAD search."""
    from sgslam_tpu.models.detector import (Detector2D,
                                            default_detector_params)

    if default_detector_params() is None:
        pytest.skip("detector asset not built")
    N = 26
    chunk = 4
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=N, dynamic=True)
    det = Detector2D(CFG.detector)
    ct = scan_pipeline.ChunkedSemanticStereoTracker(CFG, det, chunk=chunk,
                                                    fetch_every=2)
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
    gt = synthetic.make_trajectory(N)
    est_wc = np.stack([np.asarray(se3.se3_inverse(jnp.asarray(p)))
                       for p in est])
    gt_wc = np.stack([np.asarray(gt[j]) for j in range(len(est))])
    rmse, _, _ = ate_rmse(est_wc, gt_wc)
    # stereo SAD depth + a walking person: allow the stereo gate
    assert rmse < 0.12, f"semantic stereo ATE {rmse:.4f}"
    med = sorted(ct.n_inliers_hist)[len(ct.n_inliers_hist) // 2]
    assert med >= 30, f"median inliers {med}"


def test_stereo_mapper_guard():
    """The stereo chunk program carries the right image where RGB-D
    carries depth; handing it to the SemanticMapper must be refused."""
    from sgslam_tpu.mapping.semantic_mapper import SemanticMapper

    with pytest.raises(ValueError, match="right image"):
        scan_pipeline.ChunkedStereoTracker(CFG, mapper=SemanticMapper(CFG))


def test_process_tail_tracks_sequence_end():
    """A sequence whose length is not a chunk multiple: the tail frames
    are tracked (padded internally, pads dropped), not discarded."""
    N = 23
    chunk = 4
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=N)
    ct = scan_pipeline.ChunkedTracker(CFG, chunk=chunk, fetch_every=2)
    n_boot = 0
    while ct._carry is None:
        ct.bootstrap(*seq.frame(n_boot))
        n_boot += 1
    i = _run_chunks(ct, seq, n_boot, N, chunk)
    assert i < N, "fixture must leave a partial tail"
    g = jnp.stack([seq.frame(j)[0] for j in range(i, N)])
    d = jnp.stack([seq.frame(j)[1] for j in range(i, N)])
    ct.process_tail(g, d)
    est = ct.poses_cw()
    assert len(est) == N, f"tail dropped: {len(est)} != {N}"
    assert len(ct.lost_mask()) == N
    # the tail frames carry real tracked poses: aligned per-frame error of
    # the tail must sit at the trajectory's accuracy level, not coasted
    gt = synthetic.make_trajectory(N)
    est_wc = np.stack([np.asarray(se3.se3_inverse(jnp.asarray(p)))
                       for p in est])
    gt_wc = np.stack([np.asarray(gt[j]) for j in range(N)])
    rmse, _, err = ate_rmse(est_wc, gt_wc)
    assert rmse < 0.06, f"full-trajectory ATE {rmse:.4f}"
    assert err[-1] < 0.10, f"tail aligned error {err[-1]:.3f}"


def test_mid_window_loss_flagged_without_spurious_reloc():
    """Featureless frames MID-window collapse tracking, later frames
    recover: the drain must flag the lost frames (not silently export
    coasted poses) but must NOT override the recovered live pose with a
    PnP relocalization — the reference relocalizes only while
    state==LOST (Tracking.cc:309-545), and a forced override on every
    transient occlusion would clobber a healthy pose and zero velocity.
    (Loss persisting to the window's tail frame — the true LOST state —
    is covered by the kidnap tests in test_chunked_full_system.py.)"""
    N = 40
    chunk = 4
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=N)
    ct = scan_pipeline.ChunkedTracker(CFG, chunk=chunk, fetch_every=2,
                                      loop=LoopCloser(CFG))
    n_boot = 0
    while ct._carry is None:
        ct.bootstrap(*seq.frame(n_boot))
        n_boot += 1
    i = _run_chunks(ct, seq, n_boot, 28, chunk)
    ct.flush()
    assert not ct.lost_mask().any()

    # window of 2 chunks: first = blank (featureless) frames, second =
    # normal continuation -> loss is strictly mid-window
    blank_g = jnp.zeros((chunk,) + (CFG.camera.height, CFG.camera.width),
                        jnp.float32)
    blank_d = jnp.zeros_like(blank_g)
    ct.process_chunk(blank_g, blank_d)
    g = jnp.stack([seq.frame(j)[0] for j in range(i, i + chunk)])
    d = jnp.stack([seq.frame(j)[1] for j in range(i, i + chunk)])
    ct.process_chunk(g, d)     # triggers the drain (fetch_every=2)
    ct.flush()

    mask = ct.lost_mask()
    assert mask[-2 * chunk:-chunk].all(), (
        "blank mid-window frames not flagged LOST")
    assert not mask[-1], "recovered tail frame wrongly flagged"
    assert ct.relocs == 0, (
        "recovered tail frame wrongly triggered a relocalization override")
    # the preserved live pose must keep tracking healthily
    i += chunk
    g = jnp.stack([seq.frame(j)[0] for j in range(i, i + chunk)])
    d = jnp.stack([seq.frame(j)[1] for j in range(i, i + chunk)])
    ct.process_chunk(g, d)
    ct.flush()
    assert not ct.lost_mask()[-chunk:].any(), (
        "tracking did not stay healthy after the transient occlusion")

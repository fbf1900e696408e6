"""Aliased-scene robustness: visually identical keyframes with
INCONSISTENT 3-D geometry must never close a loop — BoW retrieval may
rank them maximally, but the geometric verification chain (BoW-match gate
-> Horn RANSAC Sim3 -> GN refine -> SearchBySim3 widening >= 40 total
matches, LoopClosing::ComputeSim3, LoopClosing.cc:231-400) has to kill
them. A genuine revisit with consistent geometry must still verify.

The alias is constructed surgically: a later keyframe receives an EXACT
COPY of an early keyframe's descriptors (perfect appearance match — the
worst case two identical-looking rooms can produce) while keeping its own
feature positions and depths (different place, different structure)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sgslam_tpu import config
from sgslam_tpu.io import synthetic
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
N = 60


@pytest.fixture(scope="module")
def tracked_map():
    """Half a circuit: keyframes far apart in space, never covisible."""
    poses = synthetic.make_circuit_trajectory(110, loops=1.0)[:N]
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=N,
                                      planes=synthetic.ROOM_CLOSED,
                                      poses=poses)
    s = System(CFG, enable_semantic=False, enable_mapping=False)
    for i in range(N):
        g, d = seq.frame(i)
        s.track_rgbd(g, d)
    assert s.state == "OK" and s.tracker.n_kf >= 10
    return s


def test_aliased_keyframe_rejected(tracked_map):
    """Copy an early KF's descriptors onto the newest KF (perfect
    appearance alias, different geometry): verification must refuse."""
    s = tracked_map
    m = s.tracker.map
    kf_old = 2
    kf_new = int(np.asarray(m.next_kf)) - 1
    m_alias = dataclasses.replace(
        m,
        kf_feat_desc=m.kf_feat_desc.at[kf_new].set(m.kf_feat_desc[kf_old]),
        kf_feat_valid=m.kf_feat_valid.at[kf_new].set(
            m.kf_feat_valid[kf_old]))
    loop = LoopCloser(CFG)
    hit, S = loop._verify_candidates(m_alias, kf_new, [kf_old])
    assert hit is None, (
        "geometric verification accepted an appearance alias with "
        "inconsistent 3-D structure")


def test_aliased_candidate_no_correction(tracked_map):
    """Through the full on_keyframe path: even when the aliased keyframe
    dominates retrieval for several consecutive keyframes (streak >= 3),
    no correction may fire."""
    s = tracked_map
    m = s.tracker.map
    kf_old = 2
    nkf = int(np.asarray(m.next_kf))
    # alias the LAST THREE keyframes (sustains the consistency streak)
    m_alias = m
    for k in range(nkf - 3, nkf):
        m_alias = dataclasses.replace(
            m_alias,
            kf_feat_desc=m_alias.kf_feat_desc.at[k].set(
                m.kf_feat_desc[kf_old]),
            kf_feat_valid=m_alias.kf_feat_valid.at[k].set(
                m.kf_feat_valid[kf_old]))
    loop = LoopCloser(CFG)
    for k in range(nkf - 3):
        loop.on_keyframe(m_alias, k)
    corrected = None
    for k in range(nkf - 3, nkf):
        out = loop.on_keyframe(m_alias, k)
        corrected = corrected or out
    assert corrected is None, "false loop closed on an aliased scene"
    assert len(loop.loops_closed) == 0


def test_true_revisit_still_verifies(tracked_map):
    """Control: a keyframe aliased WITH consistent geometry (the genuine
    revisit case — same place, same appearance, same structure) passes the
    same verification chain."""
    s = tracked_map
    m = s.tracker.map
    kf_old = 2
    kf_new = int(np.asarray(m.next_kf)) - 1
    # clone the old keyframe's full feature block INCLUDING geometry into
    # the new slot, displaced by a small rigid offset (post-drift revisit)
    m_clone = dataclasses.replace(
        m,
        kf_feat_desc=m.kf_feat_desc.at[kf_new].set(m.kf_feat_desc[kf_old]),
        kf_feat_valid=m.kf_feat_valid.at[kf_new].set(
            m.kf_feat_valid[kf_old]),
        kf_feat_xy=m.kf_feat_xy.at[kf_new].set(m.kf_feat_xy[kf_old]),
        kf_feat_depth=m.kf_feat_depth.at[kf_new].set(
            m.kf_feat_depth[kf_old]),
        kf_feat_level=m.kf_feat_level.at[kf_new].set(
            m.kf_feat_level[kf_old]))
    loop = LoopCloser(CFG)
    hit, S = loop._verify_candidates(m_clone, kf_new, [kf_old])
    assert hit == kf_old, "true revisit failed geometric verification"
    # the verified Sim3 must be near identity (identical camera geometry)
    S = np.asarray(S)
    assert np.linalg.norm(S[4:7]) < 0.05, S

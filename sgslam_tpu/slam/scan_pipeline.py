"""Fully on-device chunked SLAM: N frames per dispatch via lax.scan,
with keyframe insertion and local BA inside the scan under lax.cond.

Why this exists: the per-call dispatch overhead over the axon TPU tunnel
(~25-35 ms) dwarfs the ~16 ms of device work per frame, so any host-driven
per-frame (or per-event) dispatch caps below real time. Here the ENTIRE
SLAM iteration — ORB extraction, association, pose optimization, the
keyframe decision, map insertion, and windowed Schur BA — lives inside one
jitted scan over a frame chunk. The host's only job is feeding image chunks
and reading back a packed [chunk, 8] result (pose + inlier count): one
dispatch + one transfer per chunk.

This is the architecture the reference's mutex-thread pipeline
(/root/reference/src/sg-slam/src/System.cc:145-174) cannot express, and the
reason the map is a fixed-capacity pytree: `insert_keyframe` and
`bundle_adjust` are pure functions of array state, so they can sit inside
`lax.cond` branches of a scan (SURVEY.md §7 design stance).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..geometry import se3
from ..mapstate import mapstate as ms
from . import tracking


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ScanCarry:
    m: ms.MapState
    Tcw: jax.Array           # [7] last pose
    velocity: jax.Array      # [7]
    since_kf: jax.Array      # [] i32 frames since last keyframe
    frame_id: jax.Array      # [] i32


@partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def slam_chunk(cfg: SlamConfig, carry: ScanCarry, grays, depths):
    """Run the full SLAM loop over a chunk. Returns (carry', out [chunk,8])
    where out rows are (Tcw[7], n_inliers)."""
    t = cfg.tracker

    def body(c: ScanCarry, frame):
        gray, depth = frame
        feats = tracking.extract_frame(cfg, gray, depth)
        Tcw_pred = se3.se3_compose(c.velocity, c.Tcw)
        Tcw, matched, n_inl, tc, uc = tracking.track_step(
            cfg, c.m, feats, Tcw_pred)
        # TrackLocalMap inlier gate (Tracking.cc:1006-1012)
        ok = n_inl >= t.min_inliers_local_map
        Tcw = jnp.where(ok, Tcw, Tcw_pred)

        # keyframe decision (Tracking::NeedNewKeyFrame contract)
        since = c.since_kf + 1
        need_close = (tc < 100) & (uc > 70)
        c1 = since >= t.max_frames_between_kf
        c2 = (n_inl < 250 * t.kf_tracked_ratio) | need_close
        need_kf = ok & (c1 | (c2 & (n_inl > 15)))

        def do_kf(m):
            kf_id = m.next_kf
            m = ms.insert_keyframe(
                cfg.camera, cfg.orb.scale_factor, m, feats, Tcw,
                c.frame_id, matched, cfg.close_depth_threshold)
            # full back-end pass (LocalMapping::Run): cull points,
            # triangulate, fuse duplicates, local BA, cull keyframes
            return jax.lax.cond(
                kf_id >= 2,
                lambda mm: tracking.process_new_keyframe(cfg, mm, kf_id),
                lambda mm: mm, m)

        m = jax.lax.cond(need_kf, do_kf, lambda m: m, c.m)
        vel = se3.se3_compose(Tcw, se3.se3_inverse(c.Tcw))
        c2_ = ScanCarry(m=m, Tcw=Tcw, velocity=vel,
                        since_kf=jnp.where(need_kf, 0, since),
                        frame_id=c.frame_id + 1)
        out = jnp.concatenate([Tcw, n_inl[None].astype(jnp.float32)])
        return c2_, out

    carry, outs = jax.lax.scan(body, carry, (grays, depths))
    return carry, outs


class ChunkedTracker:
    """Host facade: sequential SLAM semantics, one dispatch per chunk."""

    def __init__(self, cfg: SlamConfig, chunk: int = 8):
        self.cfg = cfg
        self.chunk = chunk
        self.inner = tracking.Tracker(cfg)
        self._carry = None
        self.trajectory: list[np.ndarray] = []
        self.n_inliers_hist: list[int] = []

    def bootstrap(self, gray, depth):
        """Feed frames one-by-one until the map initializes."""
        self.inner.process(gray, depth)
        self.trajectory.append(np.asarray(self.inner.Tcw))
        if self.inner.state == "OK" and self._carry is None:
            self._carry = ScanCarry(
                m=self.inner.map, Tcw=jnp.asarray(self.inner.Tcw),
                velocity=jnp.asarray(self.inner.velocity),
                since_kf=jnp.zeros((), jnp.int32),
                frame_id=jnp.asarray(self.inner.frame_id, jnp.int32))
        return self.inner.state == "OK"

    def process_chunk(self, grays, depths) -> np.ndarray:
        """grays/depths [chunk, H, W] -> poses [chunk, 7] (numpy)."""
        assert self._carry is not None, "bootstrap first"
        self._carry, outs = slam_chunk(self.cfg, self._carry, grays, depths)
        outs = np.asarray(outs)           # ONE packed transfer
        poses = outs[:, :7]
        self.trajectory.extend(list(poses))
        self.n_inliers_hist.extend(outs[:, 7].astype(int).tolist())
        self._maybe_compact()
        return poses

    def _maybe_compact(self):
        """Repack map slots between chunks when allocation nears capacity
        (slots are monotonic inside the scan; culling frees them lazily)."""
        from ..mapstate import maintenance as mt

        m = self._carry.m
        worst_kf = self.chunk  # at most one KF per frame per chunk
        if (int(m.next_kf) < m.max_kf - worst_kf - 2
                and int(m.next_pt) < m.max_pt - 4096):
            return
        m2, _, _ = mt.compact_map(m)
        self._carry = dataclasses.replace(self._carry, m=m2)

    @property
    def map(self):
        return self._carry.m if self._carry is not None else self.inner.map

    @property
    def n_kf(self):
        return int(np.asarray(self.map.next_kf))

    def poses_cw(self) -> np.ndarray:
        return np.stack(self.trajectory)

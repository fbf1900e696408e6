"""System facade: the full RGB-D semantic SLAM engine.

Replaces System (/root/reference/src/sg-slam/src/System.cc): constructs the
tracker, detector, loop closer and semantic mapper, wires them per frame,
and provides the public API — TrackRGBD, trajectory savers, reset, shutdown
(System.h:68-135). The reference's six threads + mutex queues become host
calls around jitted stages (SURVEY.md §2.3): the detector runs one frame
ahead of consumption (same latency semantics as the reference's
previous-frame box usage, minus the blocking wait at Frame.cc:478-481).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..geometry import se3
from ..io import trajectory as traj_io
from ..mapping.semantic_mapper import SemanticMapper
from ..semantic import dynamic as dyn_mod
from ..semantic.dynamic import Boxes
from ..utils.timing import Metrics
from . import tracking
from .loop_closing import LoopCloser


class System:
    def __init__(self, cfg: SlamConfig, vocab=None, *,
                 enable_semantic: bool = True, enable_loop: bool = True,
                 enable_mapping: bool = True, detector=None):
        self.cfg = cfg
        self.tracker = tracking.Tracker(cfg)
        self.loop = LoopCloser(cfg, vocab) if enable_loop else None
        self.mapper = SemanticMapper(cfg) if enable_mapping else None
        self.enable_semantic = enable_semantic and cfg.dynamic.enabled
        self.detector = detector
        if enable_semantic and detector is None and cfg.detector.enabled:
            from ..models.detector import Detector2D

            self.detector = Detector2D(cfg.detector)

        if self.loop is not None:
            self.tracker.on_compaction = self.loop.remap_keyframes

        self.frontend = dyn_mod.SemanticFrontend(cfg, seed=7)
        self.last_feats = None
        self.person_cull_boxes = Boxes.empty(cfg.detector.max_boxes)
        self.object_boxes = None
        self.timestamps: list[float] = []
        # per-stage timing registry (SURVEY.md §5: the reference's profiling
        # is commented-out chrono blocks; here it is always on)
        self.metrics = Metrics()

    # ------------------------------------------------------------------
    def track_rgbd(self, gray, depth, rgb=None,
                   timestamp: Optional[float] = None) -> np.ndarray:
        """Main per-frame API (System::TrackRGBD contract)."""
        cfg = self.cfg
        gray = jnp.asarray(gray)
        depth = jnp.asarray(depth)
        self.timestamps.append(
            timestamp if timestamp is not None
            else len(self.timestamps) / cfg.fps)

        # 2-D detection on the current frame (device-async; consumed below)
        if self.detector is not None and rgb is not None:
            with self.metrics.timer("detector"):
                (_, person_cull, person_map,
                 objects2d) = self.detector.detect(
                    jnp.asarray(rgb), cfg.camera.width, cfg.camera.height)
            self.person_cull_boxes = person_cull
            self.object_boxes = objects2d
            dynamic_boxes = person_map
        else:
            dynamic_boxes = Boxes.empty(cfg.detector.max_boxes)

        with self.metrics.timer("extract"):
            feats = tracking.extract_frame(cfg, gray, depth)
        feats_raw = feats   # pre-cull block: next frame's match target

        # semantic + geometric dynamic rejection (SG-SLAM core novelty):
        # init-frame box-only cull, then the flow -> box-purge -> F-RANSAC
        # -> epipolar cull per frame (semantic/dynamic.SemanticFrontend —
        # shared with the chunked runner's bootstrap)
        if self.enable_semantic:
            with self.metrics.timer("dynamic_cull"):
                # the init-frame box-only cull needs real detections;
                # oracle-box tests inject boxes only after initialization
                init_done = (self.tracker.state != "NOT_INITIALIZED"
                             or self.detector is None)
                feats = self.frontend.cull(gray, feats,
                                           self.person_cull_boxes,
                                           map_initialized=init_done)

        with self.metrics.timer("track"):
            Tcw = self.tracker.process(gray, depth, feats=feats)
        self.last_feats = feats   # post-cull features (viz/export)

        # relocalization on tracking loss (Tracking::Relocalization path)
        if self.tracker.state == "LOST" and self.loop is not None:
            with self.metrics.timer("relocalize"):
                T_reloc, n = self.loop.relocalize(self.tracker.map, feats)
            self.metrics.count("reloc_attempts")
            if T_reloc is not None:
                self.tracker.force_pose(T_reloc)
                Tcw = np.asarray(T_reloc)
                self.metrics.count("reloc_success")

        # lost right after init with a tiny map: full reset
        # (Tracking.cc:513-521 "Track lost soon after initialisation")
        if self.tracker.state == "LOST" and self.tracker.n_kf <= 5:
            self.reset()
            return Tcw

        # keyframe side effects: loop closing + semantic mapping
        if self.tracker.kf_inserted:
            self.metrics.count("keyframes")
            kf_id = self.tracker.last_kf_id
            if self.loop is not None:
                with self.metrics.timer("loop_closing"):
                    corrected = self.loop.on_keyframe(self.tracker.map,
                                                      kf_id)
                if corrected is not None:
                    self.metrics.count("loops_closed")
                    self.tracker.map = corrected
                    self.tracker.Tcw = corrected.kf_pose[kf_id]
                    self.tracker.last_Tcw = self.tracker.Tcw
            if self.mapper is not None:
                with self.metrics.timer("mapping"):
                    self.mapper.insert_keyframe(
                        gray, depth, jnp.asarray(Tcw), dynamic_boxes,
                        self.object_boxes)

        self.frontend.push(gray, feats_raw, dynamic_boxes)
        return Tcw

    # oracle-box injection hooks (tests drive the cull without a detector)
    @property
    def prev_dynamic_boxes(self):
        return self.frontend.prev_boxes

    @prev_dynamic_boxes.setter
    def prev_dynamic_boxes(self, boxes):
        self.frontend.prev_boxes = boxes

    @property
    def prev_feats(self):
        return self.frontend.prev_feats

    # ------------------------------------------------------------------
    def track_stereo(self, gray_l, gray_r, rgb=None) -> np.ndarray:
        """Rectified stereo per-frame API (System::TrackStereo contract,
        System.cc:190-239): extraction on the left image + epipolar SAD
        depth from the right, then the identical tracking state machine.
        The semantic dynamic-feature cull runs on the LEFT image (pass
        `rgb` to drive the detector; oracle boxes via prev_dynamic_boxes
        work as in track_rgbd). The loop closer applies unchanged; the
        semantic MAPPER needs metric depth and stays RGB-D-only."""
        cfg = self.cfg
        gray_l = jnp.asarray(gray_l)
        self.timestamps.append(len(self.timestamps) / cfg.fps)

        if self.detector is not None and rgb is not None:
            with self.metrics.timer("detector"):
                (_, person_cull, person_map,
                 objects2d) = self.detector.detect(
                    jnp.asarray(rgb), cfg.camera.width, cfg.camera.height)
            self.person_cull_boxes = person_cull
            self.object_boxes = objects2d
            dynamic_boxes = person_map
        else:
            dynamic_boxes = Boxes.empty(cfg.detector.max_boxes)

        with self.metrics.timer("extract"):
            feats = tracking.extract_frame_stereo(
                self.cfg, gray_l, jnp.asarray(gray_r))
        feats_raw = feats
        if self.enable_semantic:
            with self.metrics.timer("dynamic_cull"):
                init_done = (self.tracker.state != "NOT_INITIALIZED"
                             or self.detector is None)
                feats = self.frontend.cull(gray_l, feats,
                                           self.person_cull_boxes,
                                           map_initialized=init_done)

        Tcw = self.tracker.process(gray_l, None, feats=feats)
        self.last_feats = feats
        self._post_track()
        self.frontend.push(gray_l, feats_raw, dynamic_boxes)
        return Tcw

    def track_monocular(self, gray) -> np.ndarray:
        """Monocular per-frame API (System::TrackMonocular contract): the
        tracker must be a slam.mono.MonoTracker (see System.monocular)."""
        self.timestamps.append(len(self.timestamps) / self.cfg.fps)
        Tcw = self.tracker.process_mono(gray)
        if self.tracker.state == "OK":
            self._post_track()
        return Tcw

    @classmethod
    def monocular(cls, cfg: SlamConfig, **kw):
        """Construct a System whose tracker runs the monocular pipeline."""
        from .mono import MonoTracker

        s = cls(cfg, **kw)
        s.tracker = MonoTracker(cfg)
        if s.loop is not None:
            s.tracker.on_compaction = s.loop.remap_keyframes
        return s

    def _post_track(self):
        """Shared keyframe side effects (loop closing; mapping needs a
        depth image, so RGB-D only)."""
        if self.tracker.kf_inserted and self.loop is not None:
            kf_id = self.tracker.last_kf_id
            with self.metrics.timer("loop_closing"):
                corrected = self.loop.on_keyframe(self.tracker.map, kf_id)
            if corrected is not None:
                self.metrics.count("loops_closed")
                self.tracker.map = corrected
                self.tracker.Tcw = corrected.kf_pose[kf_id]
                self.tracker.last_Tcw = self.tracker.Tcw

    @property
    def state(self):
        return self.tracker.state

    def activate_localization_mode(self):
        """Freeze the map and only track (System.cc:345-349)."""
        self.tracker.only_tracking = True

    def deactivate_localization_mode(self):
        """Resume full SLAM: keyframe insertion + mapping (System.cc:351-355)."""
        self.tracker.only_tracking = False

    def shutdown(self):
        """System::Shutdown contract (System.cc:376-396): the reference
        joins its six threads; our stages are host calls around jitted
        programs, so shutdown just flushes device work."""
        jax.block_until_ready(self.tracker.map)

    def reset(self):
        """System::Reset contract: drop map + trajectory, keep config."""
        self.__init__(self.cfg, self.loop.vocab if self.loop else None,
                      enable_semantic=self.enable_semantic,
                      enable_loop=self.loop is not None,
                      enable_mapping=self.mapper is not None,
                      detector=self.detector)

    # -- map checkpoint / resume (the reference's unimplemented TODO,
    #    System.h:121-123) --
    def save_checkpoint(self, path: str):
        """Persist the full map + place-recognition database. A saved
        checkpoint reopens in localization-only mode (or resumes mapping)."""
        from ..io import checkpoint as ckpt

        extra = {"Tcw": np.asarray(self.tracker.Tcw),
                 "frame_id": np.asarray(self.tracker.frame_id)}
        if self.loop is not None:
            extra["bow_db"] = np.asarray(self.loop.bow_db)
            extra["db_valid"] = np.asarray(self.loop.db_valid)
        ckpt.save_map(path, self.tracker.map, extra)

    def load_checkpoint(self, path: str, localization_only: bool = True):
        """Restore a saved map; the tracker starts LOST and recovers via
        relocalization against the restored keyframe database."""
        from ..io import checkpoint as ckpt

        m, extra = ckpt.load_map(path)
        self.tracker.map = m
        self.tracker.n_kf = int(np.asarray(m.kf_valid).sum())
        self.tracker.last_kf_id = int(np.asarray(m.next_kf)) - 1
        self.tracker.state = "LOST"
        if self.loop is not None and "bow_db" in extra:
            self.loop.bow_db = jnp.asarray(extra["bow_db"])
            self.loop.db_valid = jnp.asarray(extra["db_valid"])
        if localization_only:
            self.activate_localization_mode()

    def save_trajectory_tum(self, path: str):
        traj_io.save_tum(path, self.timestamps, self.tracker.poses_cw())

    def save_trajectory_kitti(self, path: str):
        traj_io.save_kitti(path, self.tracker.poses_cw())

    def save_keyframe_trajectory_tum(self, path: str):
        m = self.tracker.map
        valid = np.asarray(m.kf_valid)
        poses = np.asarray(m.kf_pose)[valid]
        fids = np.asarray(m.kf_frame_id)[valid]
        ts = [self.timestamps[min(f, len(self.timestamps) - 1)]
              for f in fids]
        traj_io.save_tum(path, ts, poses)

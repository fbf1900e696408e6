"""Single typed configuration for the whole engine.

Replaces the reference's cv::FileStorage YAML parsed in three places (camera +
ORB params in Tracking, /root/reference/src/sg-slam/src/Tracking.cc:53-147;
mapping/detector params in System, src/System.cc:92-163; viewer params,
src/Viewer.cc:32-50) with one frozen dataclass tree. Everything is hashable so
configs can be static arguments of jitted stages.

Presets mirror the reference's Examples/{TUM1,TUM2,TUM3,Bonn}.yaml.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from .geometry.camera import Camera


@dataclasses.dataclass(frozen=True)
class OrbConfig:
    """ORB extractor parameters (reference: ORBextractor ctor,
    src/ORBextractor.cc:411-453; YAML ORBextractor.* section)."""

    n_features: int = 1000          # budget across all levels
    n_levels: int = 8
    scale_factor: float = 1.2
    fast_threshold: float = 20.0    # iniThFAST (ORBextractor.cc:790)
    fast_min_threshold: float = 7.0  # minThFAST fallback (ORBextractor.cc:808)
    cell_size: int = 16             # spatial-uniformity cell (quadtree substitute)
    max_keypoints: int = 1024       # static capacity (>= n_features)
    patch_size: int = 31            # IC_Angle / rBRIEF patch


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """Tracking-loop thresholds (reference: Tracking.cc)."""

    # match-count gates
    min_matches_ref_kf: int = 15        # TrackReferenceKeyFrame (Tracking.cc:796)
    min_inliers_after_pose: int = 10
    min_matches_motion: int = 20        # TrackWithMotionModel (Tracking.cc:906)
    min_inliers_local_map: int = 30     # TrackLocalMap gate (Tracking.cc:1006-1012)
    min_inliers_after_reloc: int = 50
    # projective search radii (px at level 0)
    search_radius_motion: float = 15.0  # RGB-D th (Tracking.cc:929)
    search_radius_local: float = 3.0
    # keyframe policy
    min_frames_between_kf: int = 0
    max_frames_between_kf: int = 15     # fps*0.5 (Tracking.cc:87)
    kf_tracked_ratio: float = 0.75      # DS-SLAM-style heuristic (Tracking.cc:1040-1113)
    kf_min_close_points: int = 100      # CreateNewKeyFrame (Tracking.cc:1196-1248)
    local_map_max_kf: int = 80          # UpdateLocalKeyFrames cap (Tracking.cc:1404)
    depth_threshold_factor: float = 40.0  # ThDepth: close-point cutoff = bf/fx * factor
    # motion-only BA schedule (reference: 4 rounds x 10 iters). GN with
    # analytic Jacobians converges in far fewer iterations; the wide first
    # association tolerates a rougher pose than the final one.
    pose_opt_rounds_stage1: int = 2
    pose_opt_iters_stage1: int = 5
    pose_opt_rounds_stage2: int = 3
    pose_opt_iters_stage2: int = 5
    # windowed local BA schedule (reference: 5 robust iters, outlier pass,
    # 10 more — Optimizer.cc:648-709). Our solver is adaptive LM whose
    # rejected steps consume iterations, so the budget must exceed the
    # reference's: 4+8 leaves the map under-converged and odometry picks
    # up a measurable systematic bias (~0.1 deg/frame yaw on fast-rotation
    # circuits, 5x the drift of this 6+14 schedule).
    local_ba_iters1: int = 6
    local_ba_iters2: int = 14


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    """ORB matcher constants (reference: ORBmatcher.cc:37-39)."""

    th_low: int = 50
    th_high: int = 100
    nn_ratio: float = 0.75          # best/second-best gate
    histo_length: int = 30          # rotation-consistency bins
    check_orientation: bool = True


@dataclasses.dataclass(frozen=True)
class DynamicConfig:
    """Semantic+geometric dynamic rejection (reference: Frame.cc:430-652)."""

    enabled: bool = True
    epi_dist_in_box: float = 0.2    # px threshold inside a person box (Frame.cc:563-597)
    epi_dist_outside: float = 1.0   # px threshold outside
    min_survivor_ratio: float = 0.1  # abort cull if <10% survive (Frame.cc:599-604)
    # frame-to-frame correspondence source: windowed ORB matching (default,
    # MXU-friendly) or pyramidal LK optical flow (the reference's exact
    # mechanism, Frame.cc:445 — gather-heavy on TPU, kept as an option)
    use_lk_flow: bool = False
    flow_levels: int = 3            # LK pyramid levels
    flow_window: int = 11           # LK window size
    flow_iters: int = 10
    # windowed-ORB frame-to-frame correspondence search radius (px at
    # level 0) — the production substitute for LK flow on TPU
    match_radius: float = 24.0
    # cull keypoints inside person boxes that found NO correspondence
    # (fast movers escape any finite search window; stronger than the
    # reference's matched-only cull)
    cull_unmatched_in_box: bool = True
    ransac_iters: int = 256         # F-matrix RANSAC hypotheses (batched)
    ransac_thresh: float = 1.0      # Sampson/epipolar inlier threshold (px)


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """2-D object detector (reference: Detector2D.cc; MobileNetV3-SSDLite VOC)."""

    enabled: bool = True
    input_size: int = 300
    num_classes: int = 21           # VOC + background
    person_class: int = 15
    conf_threshold: float = 0.5
    dynamic_conf_threshold: float = 0.1   # person-specific low gate (Detector2D.cc:57-72)
    person_box_conf_for_culling: float = 0.2  # ForRmDynamicFeature gate (Detector2D.cc:74-84)
    max_boxes: int = 32             # static capacity


@dataclasses.dataclass(frozen=True)
class MappingConfig:
    """Semantic point-cloud / voxel mapping (reference: PointcloudMapping.cc,
    octomap_server launch params)."""

    voxel_size: float = 0.03
    depth_min: float = 0.5
    depth_max: float = 5.0
    sor_neighbors: int = 16
    sor_std_ratio: float = 1.0
    occ_hit_logodds: float = 0.8473  # log(0.7/0.3)  (octomap.launch:15)
    occ_miss_logodds: float = -0.4055  # log(0.4/0.6) (octomap.launch:16)
    occ_clamp_min: float = -2.0
    occ_clamp_max: float = 3.5
    grid_dim: int = 256             # voxels per axis (static capacity)
    max_points_per_kf: int = 16384  # downsampled cloud capacity per KF


@dataclasses.dataclass(frozen=True)
class MapCapacity:
    """Static capacities of the array-of-structs map (SURVEY.md §7)."""

    max_keyframes: int = 512
    max_points: int = 32768
    max_obs_per_kf: int = 1024      # == OrbConfig.max_keypoints
    local_window: int = 16          # KFs in local BA window
    local_points: int = 4096        # points in local BA window


@dataclasses.dataclass(frozen=True)
class LoopConfig:
    """Loop closing / place recognition (reference: LoopClosing.cc,
    KeyFrameDatabase.cc)."""

    enabled: bool = True
    covisibility_consistency_th: int = 3   # LoopClosing.h:120
    min_bow_matches: int = 20              # ComputeSim3 gate (LoopClosing.cc:265)
    min_sim3_inliers: int = 20
    min_total_matches: int = 40            # final accept (LoopClosing.cc:375-391)
    vocab_branching: int = 10
    vocab_depth: int = 5                   # effective lookup depth
    # run full-map BA after essential-graph correction, the contract of
    # LoopClosing::RunGlobalBundleAdjustment (LoopClosing.cc:575-579,645-749)
    run_global_ba: bool = True
    # GlobalBundleAdjustemnt(10), matching the reference's budget. A 30-
    # iteration budget was measured to actively ERODE essential-graph
    # corrections (GBA is reprojection-only; the observation mass of a
    # freshly-closed map is still largely consistent with the pre-closure
    # drift, so every extra iteration bows the corrected arc back:
    # injected-drift fixture 0.054 -> 0.067 @10 -> 0.088 @30). The slice-
    # resume machinery still covers configs that raise this.
    global_ba_iters: int = 10


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh / sharding layout for scale-out (SURVEY.md §2.3, §7 step 8)."""

    data_axis: str = "kf"       # keyframe-block axis for distributed BA
    model_axis: str = "pt"      # point-block axis
    n_kf_shards: int = 1
    n_pt_shards: int = 1


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    camera: Camera
    orb: OrbConfig = OrbConfig()
    tracker: TrackerConfig = TrackerConfig()
    matcher: MatcherConfig = MatcherConfig()
    dynamic: DynamicConfig = DynamicConfig()
    detector: DetectorConfig = DetectorConfig()
    mapping: MappingConfig = MappingConfig()
    capacity: MapCapacity = MapCapacity()
    loop: LoopConfig = LoopConfig()
    mesh: MeshConfig = MeshConfig()
    depth_map_factor: float = 5000.0    # TUM png scale; 1.0 for live cameras
    fps: float = 30.0

    @property
    def close_depth_threshold(self) -> float:
        """Depth below which a point counts as 'close' (ThDepth semantics)."""
        return self.camera.bf / self.camera.fx * self.tracker.depth_threshold_factor


# ---------------------------------------------------------------------------
# Presets mirroring the reference's Examples/*.yaml
# ---------------------------------------------------------------------------

def tum1_config(**over) -> SlamConfig:
    """freiburg1 (Examples/TUM1.yaml: nonzero distortion)."""
    cam = Camera(fx=517.306408, fy=516.469215, cx=318.643040, cy=255.313989,
                 k1=0.262383, k2=-0.953104, p1=-0.005358, p2=0.002628,
                 k3=1.163314, bf=40.0, width=640, height=480)
    return SlamConfig(camera=cam, **over)


def tum2_config(**over) -> SlamConfig:
    cam = Camera(fx=520.908620, fy=521.007327, cx=325.141442, cy=249.701764,
                 k1=0.231222, k2=-0.784899, p1=-0.003257, p2=-0.000105,
                 k3=0.917205, bf=40.0, width=640, height=480)
    return SlamConfig(camera=cam, **over)


def tum3_config(**over) -> SlamConfig:
    """freiburg3 (Examples/TUM3.yaml: zero distortion) — the canonical
    fr3/walking_xyz config (run_tum_walking_xyz.sh)."""
    cam = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6, bf=40.0,
                 width=640, height=480)
    return SlamConfig(camera=cam, **over)


def bonn_config(**over) -> SlamConfig:
    cam = Camera(fx=542.822841, fy=542.576870, cx=315.593520, cy=237.756098,
                 bf=40.0, width=640, height=480)
    return SlamConfig(camera=cam, **over)


def openloris_config(**over) -> SlamConfig:
    """OpenLORIS-Scene (RealSense D435i color stream, 848x480; depth is
    registered to color with a 0.001 m/unit scale -> depth_map_factor
    1000). Intrinsics follow the dataset's published d400 sensor profile;
    per-sequence sensors.yaml values should override when available."""
    cam = Camera(fx=611.45, fy=611.49, cx=433.20, cy=249.47,
                 bf=30.6, width=848, height=480)
    over.setdefault("depth_map_factor", 1000.0)
    return SlamConfig(camera=cam, **over)


def astra_pro_config(**over) -> SlamConfig:
    """Live Orbbec Astra Pro camera (the reference's
    Examples/astra_pro_camera.yaml: DepthMapFactor 1.0 because the driver
    already delivers meters)."""
    cam = Camera(fx=554.26, fy=554.26, cx=320.0, cy=240.0, bf=40.0,
                 width=640, height=480)
    over.setdefault("depth_map_factor", 1.0)
    return SlamConfig(camera=cam, **over)


def synthetic_config(width: int = 640, height: int = 480, **over) -> SlamConfig:
    """Config for the synthetic RGB-D renderer used by tests/bench.

    The synthetic room's far wall sits at 3.5 m, past the TUM close-depth
    cutoff (~3 m), so raise ThDepth to treat the whole room as close range.
    """
    f = 525.0 * width / 640.0  # keep the Kinect FOV at any resolution
    cam = Camera(fx=f, fy=f, cx=width / 2 - 0.5, cy=height / 2 - 0.5,
                 bf=40.0 * width / 640.0, width=width, height=height)
    over.setdefault("tracker", TrackerConfig(depth_threshold_factor=70.0))
    return SlamConfig(camera=cam, depth_map_factor=1.0, **over)

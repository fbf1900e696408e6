"""MapState -> distributed-BA layout: partition a real tracked map into the
point-sharded observation slabs `parallel.dist_ba` consumes, run SPMD global
bundle adjustment over a device mesh, and scatter the result back.

This is the production glue between the fixed-capacity map
(mapstate.MapState) and the Schur-over-collectives solver — the multi-chip
form of Optimizer::GlobalBundleAdjustemnt
(/root/reference/src/sg-slam/src/Optimizer.cc:41-237). Partitioning runs on
the host (numpy, once per GBA invocation — milliseconds); every iteration
of the solve itself is one jitted SPMD program over the ('kf' x 'pt') mesh.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..mapstate import mapstate as ms
from . import dist_ba


@dataclasses.dataclass
class PartitionedBA:
    """Host-side container of the sharded global-BA problem."""

    poses: np.ndarray        # [C,7] replicated
    opt_mask: np.ndarray     # [C]
    kf_ids: np.ndarray       # [C] map keyframe slot per camera index
    points: np.ndarray       # [P_pad,3] shard-major (slab s = points of shard s)
    pt_ids: np.ndarray       # [P_pad] map point id (-1 = padding)
    obs_cam: np.ndarray      # [O_pad] i32
    obs_pt: np.ndarray       # [O_pad] i32 SHARD-LOCAL point index
    obs_uvr: np.ndarray      # [O_pad,3]
    obs_w: np.ndarray        # [O_pad] (0 = padding)
    n_pt_shards: int
    pts_per_shard: int
    obs_per_shard: int


def partition_map(cfg: SlamConfig, m: ms.MapState,
                  n_pt_shards: int) -> PartitionedBA:
    """Carve the map into `n_pt_shards` point slabs with their observations.

    Points are dealt to shards in contiguous slabs of the live-point list
    (locality: nearby ids were created together and share keyframes), and
    every observation lands on the shard that owns its point, so the
    per-shard Schur reduction touches only shard-local state.
    """
    kf_valid = np.asarray(m.kf_valid)
    kf_slots = np.nonzero(kf_valid)[0]
    C = len(kf_slots)
    cam_of_slot = np.full(m.max_kf, -1, np.int64)
    cam_of_slot[kf_slots] = np.arange(C)

    pt_valid = np.asarray(m.pt_valid)
    obs = np.asarray(m.kf_obs_point)[kf_slots]        # [C,N]
    has = obs >= 0
    has &= np.where(has, pt_valid[np.where(has, obs, 0)], False)

    # keep only points actually observed by a live keyframe
    observed = np.zeros(m.max_pt, bool)
    observed[obs[has]] = True
    pt_list = np.nonzero(pt_valid & observed)[0]
    P = len(pt_list)
    pts_per = -(-P // n_pt_shards)
    P_pad = pts_per * n_pt_shards
    pt_ids = np.full(P_pad, -1, np.int64)
    pt_ids[:P] = pt_list
    shard_of_pt = np.full(m.max_pt, -1, np.int64)
    local_of_pt = np.full(m.max_pt, -1, np.int64)
    shard_of_pt[pt_list] = np.arange(P) // pts_per
    local_of_pt[pt_list] = np.arange(P) % pts_per

    cam_idx, feat_idx = np.nonzero(has)
    pid = obs[cam_idx, feat_idx]
    uv = np.asarray(m.kf_feat_xy)[kf_slots][cam_idx, feat_idx]
    ur = np.asarray(m.kf_feat_uvr)[kf_slots][cam_idx, feat_idx]
    lv = np.asarray(m.kf_feat_level)[kf_slots][cam_idx, feat_idx]
    w = (1.0 / cfg.orb.scale_factor ** 2) ** lv.astype(np.float64)

    sh = shard_of_pt[pid]
    counts = np.bincount(sh, minlength=n_pt_shards)
    obs_per = int(-(-counts.max() // 8) * 8) if len(counts) else 8
    O_pad = obs_per * n_pt_shards
    obs_cam = np.zeros(O_pad, np.int32)
    obs_pt = np.zeros(O_pad, np.int32)
    obs_uvr = np.zeros((O_pad, 3), np.float32)
    obs_uvr[:, 2] = -1.0
    obs_w = np.zeros(O_pad, np.float32)
    for s in range(n_pt_shards):
        sel = sh == s
        n = int(sel.sum())
        base = s * obs_per
        obs_cam[base:base + n] = cam_idx[sel]
        obs_pt[base:base + n] = local_of_pt[pid[sel]]
        obs_uvr[base:base + n, :2] = uv[sel]
        obs_uvr[base:base + n, 2] = ur[sel]
        obs_w[base:base + n] = w[sel]

    points = np.zeros((P_pad, 3), np.float32)
    points[:P] = np.asarray(m.pt_pos)[pt_list]
    poses = np.asarray(m.kf_pose)[kf_slots]
    opt_mask = np.ones(C, bool)
    opt_mask[0] = False                # gauge: fix the first keyframe
    return PartitionedBA(
        poses=poses, opt_mask=opt_mask, kf_ids=kf_slots,
        points=points, pt_ids=pt_ids,
        obs_cam=obs_cam, obs_pt=obs_pt, obs_uvr=obs_uvr, obs_w=obs_w,
        n_pt_shards=n_pt_shards, pts_per_shard=pts_per,
        obs_per_shard=obs_per)


def map_reprojection_cost(cfg: SlamConfig, m: ms.MapState) -> float:
    """Total (non-robust) reprojection chi2 of every live observation —
    the physical objective global BA minimizes; used for convergence
    checks and solver comparisons."""
    from ..geometry import se3

    part = partition_map(cfg, m, 1)
    T = jnp.asarray(part.poses)[jnp.asarray(part.obs_cam)]
    pw = jnp.asarray(part.points)[jnp.asarray(part.obs_pt)]
    pc = se3.se3_apply(T, pw)
    z = jnp.maximum(pc[:, 2], 1e-6)
    u = cfg.camera.fx * pc[:, 0] / z + cfg.camera.cx
    v = cfg.camera.fy * pc[:, 1] / z + cfg.camera.cy
    uvr = jnp.asarray(part.obs_uvr)
    r2 = (u - uvr[:, 0]) ** 2 + (v - uvr[:, 1]) ** 2
    return float(jnp.sum(r2 * jnp.asarray(part.obs_w)))


def writeback(m: ms.MapState, part: PartitionedBA, new_poses,
              new_points) -> ms.MapState:
    """Scatter the optimized poses/points back into the map."""
    kf_pose = m.kf_pose.at[jnp.asarray(part.kf_ids)].set(
        jnp.asarray(new_poses))
    ok = part.pt_ids >= 0
    slots = jnp.asarray(np.where(ok, part.pt_ids, m.max_pt))
    pt_pos = m.pt_pos.at[slots].set(jnp.asarray(new_points), mode="drop")
    return dataclasses.replace(m, kf_pose=kf_pose, pt_pos=pt_pos)


def distributed_global_ba(cfg: SlamConfig, m: ms.MapState, mesh,
                          iters: int = 10) -> ms.MapState:
    """Multi-chip Optimizer::GlobalBundleAdjustemnt over a ('kf','pt') mesh."""
    n_pt = mesh.shape["pt"]
    part = partition_map(cfg, m, n_pt)
    sh = dist_ba.make_shardings(mesh)
    # pad the camera dimension to a multiple of the 'kf' axis so every
    # shard owns the same number of Schur rows (dynamic_slice must never
    # clamp — a clamped slice would duplicate rows and skew the solve);
    # padded cameras have no observations and opt_mask False
    C = part.poses.shape[0]
    kf_size = mesh.shape["kf"]
    C_pad = -(-C // kf_size) * kf_size
    poses_np = np.concatenate(
        [part.poses,
         np.tile(np.array([1, 0, 0, 0, 0, 0, 0], np.float32),
                 (C_pad - C, 1))])
    opt_np = np.concatenate([part.opt_mask, np.zeros(C_pad - C, bool)])
    step = dist_ba.make_distributed_ba_step(cfg.camera, mesh, C_pad)
    poses = jax.device_put(jnp.asarray(poses_np), sh["replicated"])
    opt_mask = jax.device_put(jnp.asarray(opt_np), sh["replicated"])
    points = jax.device_put(jnp.asarray(part.points), sh["pt"])
    obs_cam = jax.device_put(jnp.asarray(part.obs_cam), sh["pt"])
    obs_pt = jax.device_put(jnp.asarray(part.obs_pt), sh["pt"])
    obs_uvr = jax.device_put(jnp.asarray(part.obs_uvr), sh["pt"])
    obs_w = jax.device_put(jnp.asarray(part.obs_w), sh["pt"])
    lam = jax.device_put(jnp.asarray(1e-3), sh["replicated"])
    for _ in range(iters):
        poses, points, lam = step(poses, opt_mask, points, obs_cam, obs_pt,
                                  obs_uvr, obs_w, lam)
    return writeback(m, part, poses[:C], points)

"""Dense point-cloud generation and filtering as vectorized JAX ops.

Replaces the PCL pipeline of PointCloudMapping (/root/reference/src/sg-slam/
src/PointcloudMapping.cc): full-image depth back-projection with dynamic-box
skipping (generatePointCloudForDyamic :69-156), voxel-grid downsampling and
statistical outlier removal (:268-271) — all as fixed-shape scatter/gather
programs over a spatial hash grid (no KdTrees; SURVEY.md §7 step 7).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera
from ..semantic.dynamic import Boxes, in_any_box

# deterministic spatial hash primes (classic Teschner et al. constants)
_PX, _PY, _PZ = 73856093, 19349663, 83492791


@partial(jax.jit, static_argnums=(0,))
def backproject_depth(cam: Camera, depth, gray, T_wc, dynamic_boxes: Boxes,
                      depth_min: float = 0.5, depth_max: float = 5.0):
    """Depth image -> world-frame colored cloud, skipping dynamic boxes.

    Returns (points [H*W, 3], intensity [H*W], valid [H*W]).
    """
    h, w = depth.shape
    uu = jnp.arange(w, dtype=jnp.float32)[None, :].repeat(h, 0)
    vv = jnp.arange(h, dtype=jnp.float32)[:, None].repeat(w, 1)
    z = depth
    x = (uu - cam.cx) * z / cam.fx
    y = (vv - cam.cy) * z / cam.fy
    pc = jnp.stack([x, y, z], -1).reshape(-1, 3)
    pw = se3.se3_apply(T_wc[None], pc)

    uv = jnp.stack([uu, vv], -1).reshape(-1, 2)
    dyn = in_any_box(uv, dynamic_boxes,
                     jnp.ones_like(dynamic_boxes.valid))
    valid = ((z > depth_min) & (z < depth_max)).reshape(-1) & ~dyn
    return pw, gray.reshape(-1), valid


def voxel_ids(points, voxel_size: float, table_size: int):
    """Hash points into a fixed-size voxel table. Returns (ids, ijk)."""
    ijk = jnp.floor(points / voxel_size).astype(jnp.int32)
    hsh = (ijk[..., 0] * _PX) ^ (ijk[..., 1] * _PY) ^ (ijk[..., 2] * _PZ)
    return jnp.abs(hsh) % table_size, ijk


@partial(jax.jit, static_argnames=("voxel_size", "table_size"))
def voxel_downsample(points, intensity, valid, *, voxel_size: float = 0.01,
                     table_size: int = 1 << 15):
    """Centroid-per-voxel downsample via scatter-mean into a hash table.

    Contract of pcl::VoxelGrid (PointcloudMapping.cc voxel member). Hash
    collisions merge distant voxels with probability ~n_voxels/table_size —
    harmless for visualization/occupancy use. Returns fixed-capacity
    (points [T,3], intensity [T], valid [T]).
    """
    ids, _ = voxel_ids(points, voxel_size, table_size)
    ids = jnp.where(valid, ids, table_size)
    w = valid.astype(jnp.float32)
    cnt = jnp.zeros(table_size + 1).at[ids].add(w)[:table_size]
    psum = jnp.zeros((table_size + 1, 3)).at[ids].add(
        points * w[:, None])[:table_size]
    isum = jnp.zeros(table_size + 1).at[ids].add(intensity * w)[:table_size]
    ok = cnt > 0
    c = jnp.maximum(cnt, 1.0)
    return psum / c[:, None], isum / c, ok


@partial(jax.jit, static_argnames=("voxel_size", "table_size", "min_neighbors"))
def density_outlier_filter(points, valid, *, voxel_size: float = 0.05,
                           table_size: int = 1 << 15,
                           min_neighbors: int = 4):
    """Approximate statistical outlier removal: a point survives when its
    voxel neighborhood (3x3x3 at `voxel_size`) holds enough points.

    Replaces pcl::StatisticalOutlierRemoval (PointcloudMapping.cc,
    Detector3D.cc:70-78) without kNN: density screening has the same effect
    on speckle noise and is O(N) scatter + gather.
    """
    ids, ijk = voxel_ids(points, voxel_size, table_size)
    ids = jnp.where(valid, ids, table_size)
    cnt = jnp.zeros(table_size + 1).at[ids].add(
        valid.astype(jnp.float32))[:table_size]

    neigh = jnp.zeros_like(points[..., 0])
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                n_ijk = ijk + jnp.array([dx, dy, dz])
                h = ((n_ijk[..., 0] * _PX) ^ (n_ijk[..., 1] * _PY)
                     ^ (n_ijk[..., 2] * _PZ))
                nid = jnp.abs(h) % table_size
                neigh = neigh + cnt[nid]
    return valid & (neigh >= min_neighbors)

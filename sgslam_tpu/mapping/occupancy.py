"""Log-odds voxel occupancy mapping with batched ray carving.

Replaces the vendored octomap_server node (/root/reference/src/octomap_server/
src/OctomapServer.cpp: insertScan raycasting with sensor model hit=0.7 /
miss=0.4, clamping, speckle filter, 2-D down-projected occupancy map —
launch params octomap.launch:12-33). The octree becomes a dense [D,D,D]
log-odds grid (dense regular grids beat pointer octrees on TPU: updates are
scatter-adds, queries are gathers, the whole map is one array); ray carving
is a fixed-step supercover walk batched over all points of a scan.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

# log(0.7/0.3), log(0.4/0.6), clamps log(0.12/0.88), log(0.97/0.03)
HIT_LOGODDS = 0.8473
MISS_LOGODDS = -0.4055
CLAMP_MIN = -1.9924
CLAMP_MAX = 3.4761
OCC_THRESH = 0.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OccupancyGrid:
    logodds: jax.Array   # [D,D,D] float32
    origin: jax.Array    # [3] world coords of voxel (0,0,0) corner
    voxel_size: jax.Array  # [] f32


def empty_grid(dim: int, voxel_size: float, origin=(-5.0, -5.0, -5.0)):
    return OccupancyGrid(
        logodds=jnp.zeros((dim, dim, dim), jnp.float32),
        origin=jnp.asarray(origin, jnp.float32),
        voxel_size=jnp.asarray(voxel_size, jnp.float32))


def world_to_voxel(grid: OccupancyGrid, pts):
    return jnp.floor((pts - grid.origin) / grid.voxel_size).astype(jnp.int32)


@partial(jax.jit, static_argnames=("max_steps",))
def insert_scan(grid: OccupancyGrid, sensor_origin, points, valid,
                *, max_steps: int = 128):
    """Carve free space along each ray and mark endpoints occupied.

    sensor_origin [3] world; points [N,3] world endpoints; valid [N].
    Fixed `max_steps` samples per ray at ~0.9 voxel spacing (supercover
    approximation of octomap's exact DDA — every traversed voxel is hit at
    least once for rays shorter than max_steps * 0.9 * voxel).
    """
    D = grid.logodds.shape[0]
    vec = points - sensor_origin[None]
    dist = jnp.linalg.norm(vec, axis=-1)
    step_len = 0.9 * grid.voxel_size
    n_steps = jnp.minimum((dist / step_len).astype(jnp.int32), max_steps)

    t = (jnp.arange(max_steps, dtype=jnp.float32)[None, :]
         * step_len / jnp.maximum(dist, 1e-6)[:, None])     # [N,S] in [0,1]
    free_mask = (jnp.arange(max_steps)[None, :] < n_steps[:, None]
                 ) & valid[:, None]
    sample = sensor_origin[None, None] + t[..., None] * vec[:, None, :]
    ijk = world_to_voxel(grid, sample)                      # [N,S,3]
    inb = jnp.all((ijk >= 0) & (ijk < D), axis=-1) & free_mask
    flat = (ijk[..., 0] * D + ijk[..., 1]) * D + ijk[..., 2]
    flat = jnp.where(inb, flat, D * D * D)

    lo = grid.logodds.reshape(-1)
    lo = jnp.concatenate([lo, jnp.zeros(1)])
    # free-space misses: duplicates within a ray hit the same voxel at most
    # ~2x at this step length — close enough to octomap's once-per-scan
    # discounting for the sensor model
    lo = lo.at[flat.reshape(-1)].add(MISS_LOGODDS)

    # endpoint hits (also cancel the miss the endpoint may have received)
    e_ijk = world_to_voxel(grid, points)
    e_inb = jnp.all((e_ijk >= 0) & (e_ijk < D), axis=-1) & valid
    e_flat = (e_ijk[..., 0] * D + e_ijk[..., 1]) * D + e_ijk[..., 2]
    e_flat = jnp.where(e_inb, e_flat, D * D * D)
    lo = lo.at[e_flat].add(HIT_LOGODDS - MISS_LOGODDS)

    new = jnp.clip(lo[:-1].reshape(D, D, D), CLAMP_MIN, CLAMP_MAX)
    return dataclasses.replace(grid, logodds=new)


def occupied_mask(grid: OccupancyGrid):
    return grid.logodds > OCC_THRESH


@jax.jit
def project_2d(grid: OccupancyGrid, z_min: float = -0.5, z_max: float = 1.5):
    """Down-projected 2-D occupancy map (octomap_server's m_gridmap
    contract): a ground cell is occupied if any voxel in the height band is.
    Axis convention: world y is 'height' in the SLAM frame.
    """
    D = grid.logodds.shape[0]
    ys = grid.origin[1] + (jnp.arange(D) + 0.5) * grid.voxel_size
    band = (ys >= z_min) & (ys <= z_max)
    occ = occupied_mask(grid) & band[None, :, None]
    return jnp.any(occ, axis=1)  # [Dx, Dz]

"""2-D detection -> 3-D semantic object extraction (cloud clustering).

Replaces Detector3D (/root/reference/src/sg-slam/src/Detector3D.cc): gather
cloud points from the central 60% of each box with depth 0.5-5 m (:49-65),
outlier-filter (:70-78), Euclidean clustering (KdTree, tol 0.02 m :79-86),
then pick the cluster maximizing IoU(box, projected ROI) * (npts/10) /
center-deviation^2 (GetSimilarity :204-218) and emit a SemanticObject.

The KdTree clustering becomes voxel-hash connected components: points
sharing or neighboring an occupied voxel at the cluster tolerance are
linked; labels propagate by iterated per-voxel minimum — a fixed-iteration,
fully batched substitute (SURVEY.md §7 hard-part #3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..mapping.pointcloud import _PX, _PY, _PZ

_NEIGH = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
          for dz in (-1, 0, 1) if (dx, dy, dz) != (0, 0, 0)]


@partial(jax.jit, static_argnames=("tol", "table_size", "iters"))
def cluster_labels(points, valid, *, tol: float = 0.02,
                   table_size: int = 1 << 14, iters: int = 16):
    """Connected-component labels [N] over a voxel graph at tolerance `tol`.

    Points in the same or adjacent occupied voxels share a component after
    `iters` label-propagation rounds (components with diameter up to ~iters
    voxels merge fully; detector boxes are small, so 16 rounds suffice).
    """
    ijk = jnp.floor(points / tol).astype(jnp.int32)
    hsh = jnp.abs((ijk[..., 0] * _PX) ^ (ijk[..., 1] * _PY)
                  ^ (ijk[..., 2] * _PZ)) % table_size
    vox = jnp.where(valid, hsh, table_size)

    n = points.shape[0]
    big = jnp.int32(2 ** 30)
    labels = jnp.where(valid, jnp.arange(n, dtype=jnp.int32), big)

    neigh_vox = []
    for d in _NEIGH:
        nijk = ijk + jnp.asarray(d)
        h = jnp.abs((nijk[..., 0] * _PX) ^ (nijk[..., 1] * _PY)
                    ^ (nijk[..., 2] * _PZ)) % table_size
        neigh_vox.append(jnp.where(valid, h, table_size))

    def body(_, labels):
        # min label per occupied voxel
        vmin = jnp.full(table_size + 1, big, jnp.int32).at[vox].min(labels)
        new = jnp.minimum(labels, vmin[vox])
        for nv in neigh_vox:
            new = jnp.minimum(new, vmin[nv])
        # write back through own voxel so neighbors see the update
        return jnp.where(valid, new, big)

    labels = jax.lax.fori_loop(0, iters, body, labels)
    return labels


@partial(jax.jit, static_argnums=(0,), static_argnames=("max_clusters",))
def extract_object(cam, points_w, uv, valid, box_xyxy, T_cw,
                   *, depth_min: float = 0.5, depth_max: float = 5.0,
                   min_pts: int = 20, max_clusters: int = 16):
    """Best-cluster semantic object for one 2-D box.

    points_w [N,3] world cloud of the keyframe; uv [N,2] their pixel coords;
    box_xyxy [4]. Returns (centroid [3], size [3], ok).
    """
    from ..geometry import se3

    x1, y1, x2, y2 = box_xyxy
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    w6, h6 = 0.3 * (x2 - x1), 0.3 * (y2 - y1)  # central 60%
    pc = se3.se3_apply(T_cw[None], points_w)
    sel = (valid
           & (uv[:, 0] > cx - w6) & (uv[:, 0] < cx + w6)
           & (uv[:, 1] > cy - h6) & (uv[:, 1] < cy + h6)
           & (pc[:, 2] > depth_min) & (pc[:, 2] < depth_max))

    labels = cluster_labels(points_w, sel)
    # top clusters by size
    n = points_w.shape[0]
    uniq, counts = jnp.unique(labels, size=max_clusters,
                              fill_value=2 ** 30, return_counts=True)
    cl_valid = (uniq < 2 ** 30) & (counts >= min_pts)

    def cluster_score(lbl):
        m = (labels == lbl) & sel
        w = m.astype(jnp.float32)
        npts = jnp.sum(w)
        centroid = jnp.sum(points_w * w[:, None], 0) / jnp.maximum(npts, 1)
        # projected ROI of the cluster
        u = jnp.where(m, uv[:, 0], jnp.inf)
        v = jnp.where(m, uv[:, 1], jnp.inf)
        ux1, vy1 = jnp.min(u), jnp.min(v)
        u = jnp.where(m, uv[:, 0], -jnp.inf)
        v = jnp.where(m, uv[:, 1], -jnp.inf)
        ux2, vy2 = jnp.max(u), jnp.max(v)
        # IoU with the full box (GetProjectedROI + GetSimilarity contract)
        ix1, iy1 = jnp.maximum(ux1, x1), jnp.maximum(vy1, y1)
        ix2, iy2 = jnp.minimum(ux2, x2), jnp.minimum(vy2, y2)
        inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
        a_roi = jnp.maximum(ux2 - ux1, 0) * jnp.maximum(vy2 - vy1, 0)
        a_box = (x2 - x1) * (y2 - y1)
        iou = inter / jnp.maximum(a_roi + a_box - inter, 1e-6)
        roi_c = jnp.stack([(ux1 + ux2) / 2, (vy1 + vy2) / 2])
        dev = jnp.sum((roi_c - jnp.stack([cx, cy])) ** 2) + 1.0
        return iou * (npts / 10.0) / dev, centroid, npts, m

    scores, cents, npts, _ = jax.vmap(lambda l: cluster_score(l))(uniq)
    scores = jnp.where(cl_valid, scores, -jnp.inf)
    best = jnp.argmax(scores)
    # ambiguity rejection: best must beat second clearly (Detector3D.cc:130)
    s_sorted = jnp.sort(scores)[::-1]
    ambiguous = (s_sorted[1] > 0.7 * s_sorted[0]) & jnp.isfinite(s_sorted[1])
    ok = jnp.isfinite(scores[best]) & ~ambiguous

    m = (labels == uniq[best]) & sel
    w = m.astype(jnp.float32)
    np_ = jnp.maximum(jnp.sum(w), 1.0)
    centroid = jnp.sum(points_w * w[:, None], 0) / np_
    mins = jnp.min(jnp.where(m[:, None], points_w, jnp.inf), 0)
    maxs = jnp.max(jnp.where(m[:, None], points_w, -jnp.inf), 0)
    size = jnp.where(jnp.isfinite(mins) & jnp.isfinite(maxs),
                     maxs - mins, 0.0)
    return centroid, size, ok

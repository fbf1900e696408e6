"""Data-association searches over fixed-capacity feature sets.

TPU-first redesign of ORBmatcher (/root/reference/src/sg-slam/src/
ORBmatcher.cc): the reference walks per-cell candidate lists from a 64x48
feature grid (GetFeaturesInArea, Frame.cc:257-294) — here every search is a
dense masked distance matrix (capacities are ~1k x ~1k, ideal VPU shapes),
with the spatial window, pyramid-level window, threshold, ratio test, and
30-bin rotation-consistency histogram (ORBmatcher.cc:1603-1646) applied as
masks. No data-dependent shapes anywhere.

Match conventions: a "match table" is (idx [N] int32, ok [N] bool) mapping
query rows to train rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import MatcherConfig
from .hamming import MAX_DIST, hamming_matrix

TWO_PI = 6.283185307179586


def rotation_consistency(dtheta, ok, histo_length: int = 30, keep_top: int = 3):
    """Keep only matches whose angle delta falls in the top-k histogram bins.

    Contract of ORBmatcher::ComputeThreeMaxima + the mvRotHist filtering
    (ORBmatcher.cc:1603-1646). dtheta: [N] radians; ok: [N] bool.
    """
    t = jnp.mod(dtheta, TWO_PI)
    bins = jnp.clip((t * (histo_length / TWO_PI)).astype(jnp.int32), 0,
                    histo_length - 1)
    hist = jnp.zeros(histo_length, jnp.int32).at[bins].add(ok.astype(jnp.int32))
    # reference keeps bins 2/3 only if reasonably populated vs max (:1630-1640)
    top = jax.lax.top_k(hist, keep_top)[0]
    thresh = jnp.maximum(top[0] // 10, 1)
    good_bin = hist >= jnp.maximum(top[keep_top - 1], thresh)
    # good_bin may include ties beyond top-k; acceptable relaxation
    return ok & good_bin[bins]


def match_by_descriptor(desc_q, valid_q, desc_t, valid_t,
                        cfg: MatcherConfig, *, max_dist: int | None = None,
                        mutual: bool = True, ratio: float | None = None):
    """Brute-force descriptor matching with ratio test + optional mutual check.

    Replaces SearchByBoW's node-bucketed brute force (ORBmatcher.cc:159,524) —
    on TPU the full matrix is cheaper than bucketing.
    Returns (idx [Nq], ok [Nq], dist [Nq]).
    """
    max_dist = cfg.th_low if max_dist is None else max_dist
    ratio = cfg.nn_ratio if ratio is None else ratio
    d = hamming_matrix(desc_q, desc_t)
    dm = jnp.where(valid_q[:, None] & valid_t[None, :], d, MAX_DIST)
    best_idx = jnp.argmin(dm, axis=1)
    best = jnp.min(dm, axis=1)
    d2 = dm.at[jnp.arange(dm.shape[0]), best_idx].set(MAX_DIST)
    second = jnp.min(d2, axis=1)
    ok = (best <= max_dist) & (best.astype(jnp.float32)
                               < ratio * second.astype(jnp.float32))
    if mutual:
        rbest = jnp.argmin(dm, axis=0)          # train -> query
        ok = ok & (rbest[best_idx] == jnp.arange(dm.shape[0]))
    return best_idx, ok, best


def search_by_projection(proj_uv, radii, pred_level, desc_q, valid_q,
                         feat_xy, feat_level, feat_desc, feat_valid,
                         level_window: int, max_dist: int,
                         scale_factor: float, ratio: float = 1.0):
    """Windowed projective search: query entities with predicted image
    locations vs frame features.

    Generalizes ORBmatcher::SearchByProjection (last-frame variant
    ORBmatcher.cc:1332, local-map variant :45) — the window radius is scaled
    by the predicted pyramid level's scale, candidates must lie within
    [pred_level-level_window, pred_level+level_window].

    proj_uv: [Q,2]; radii: [Q] (px at level 0); pred_level: [Q] i32;
    desc_q: [Q,8]; feat_*: frame arrays [N].
    Returns (idx [Q], ok [Q], dist [Q]).
    """
    lv_scale = scale_factor ** pred_level.astype(jnp.float32)
    r = (radii * lv_scale)[:, None]                       # [Q,1]
    du = feat_xy[None, :, 0] - proj_uv[:, None, 0]
    dv = feat_xy[None, :, 1] - proj_uv[:, None, 1]
    in_window = (jnp.abs(du) <= r) & (jnp.abs(dv) <= r)
    in_level = (jnp.abs(feat_level[None, :] - pred_level[:, None])
                <= level_window)
    cand = in_window & in_level & feat_valid[None, :] & valid_q[:, None]

    d = hamming_matrix(desc_q, feat_desc)
    dm = jnp.where(cand, d, MAX_DIST)
    best_idx = jnp.argmin(dm, axis=1)
    best = jnp.min(dm, axis=1)
    d2 = dm.at[jnp.arange(dm.shape[0]), best_idx].set(MAX_DIST)
    second = jnp.min(d2, axis=1)
    ok = best <= max_dist
    if ratio < 1.0:
        ok = ok & (best.astype(jnp.float32)
                   < ratio * second.astype(jnp.float32))
    return best_idx, ok, best


def resolve_duplicate_targets(idx, ok, dist, n_targets: int):
    """Keep only the lowest-distance query per claimed target feature.

    The reference resolves duplicates by overwriting matches during its
    sequential scan; we do it as a segment-min. Returns updated ok.
    """
    big = MAX_DIST + 1
    slot = jnp.where(ok, idx, n_targets)  # invalid -> spare slot
    best_per_target = jnp.full(n_targets + 1, big, jnp.int32).at[slot].min(
        jnp.where(ok, dist, big).astype(jnp.int32))
    # a query keeps its match iff it achieves the per-target minimum; break
    # remaining exact ties by query index (first wins)
    is_min = ok & (dist == best_per_target[idx])
    qidx = jnp.arange(idx.shape[0], dtype=jnp.int32)
    imax = jnp.iinfo(jnp.int32).max
    slot2 = jnp.where(is_min, idx, n_targets)
    first_q = jnp.full(n_targets + 1, imax, jnp.int32).at[slot2].min(
        jnp.where(is_min, qidx, imax))
    return is_min & (first_q[idx] == qidx)

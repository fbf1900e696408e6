"""ORB feature extraction: pyramid FAST + IC_Angle orientation + rBRIEF,
as one fixed-shape jitted program.

TPU-first redesign of the reference's ORBextractor
(/root/reference/src/sg-slam/src/ORBextractor.cc): the sequential quadtree
`DistributeOctTree` (:540-764) becomes per-cell argmax + per-level top-k
(same spatial-uniformity contract, data-parallel); per-cell cv::FAST with
threshold fallback (:790-830) becomes one dense score map at the low
threshold with response-ordered selection; IC_Angle (:78-105) and the
descriptor loop (:109-148) become batched patch gathers. Output is a
fixed-capacity `Features` pytree with a validity mask (SURVEY.md §7 "hard
parts" #1/#3).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OrbConfig
from ..geometry.camera import Camera, undistort_points
from . import fast as fast_mod
from . import image as image_mod
from .pattern import DESC_WORDS, PATCH_HALF, PATTERN, ROT_PATCH_HALF

EDGE_MARGIN = ROT_PATCH_HALF  # = 19, same constant as the reference's
                              # EDGE_THRESHOLD (ORBextractor.h) for same reason


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Features:
    """Fixed-capacity per-frame feature set (replaces Frame's parallel
    vectors mvKeys/mvKeysUn/mDescriptors/mvDepth/mvuRight,
    /root/reference/src/sg-slam/include/Frame.h:150-175)."""

    xy: jax.Array        # [N,2] f32 undistorted level-0 pixel coords
    xy_raw: jax.Array    # [N,2] f32 raw (distorted) level-0 pixel coords
    response: jax.Array  # [N] f32 FAST score
    angle: jax.Array     # [N] f32 radians
    level: jax.Array     # [N] i32 pyramid level
    desc: jax.Array      # [N,8] uint32 packed 256-bit rBRIEF
    depth: jax.Array     # [N] f32 meters; <=0 invalid
    u_right: jax.Array   # [N] f32 pseudo-stereo right coord; <0 invalid
    valid: jax.Array     # [N] bool

    @property
    def capacity(self):
        return self.xy.shape[-2]


def level_budgets(cfg: OrbConfig):
    """Geometric per-level feature budget (ORBextractor.cc:436-447)."""
    inv = 1.0 / cfg.scale_factor
    total = cfg.n_features
    w = np.array([inv ** l for l in range(cfg.n_levels)])
    w = w / w.sum()
    budgets = np.floor(total * w).astype(int)
    budgets[0] += total - budgets.sum()
    return tuple(int(b) for b in budgets)


def _detect_level(img_l, budget: int, cell: int, threshold: float):
    """One pyramid level -> (xy_l [k,2] f32 level coords, score [k])."""
    h, w = img_l.shape
    score = fast_mod.fast_score_map(img_l, threshold)
    score = fast_mod.nms_3x3(score)
    score = score * fast_mod.border_mask(h, w, EDGE_MARGIN, score.dtype)

    ncy = -(-h // cell)
    ncx = -(-w // cell)
    pad_y = ncy * cell - h
    pad_x = ncx * cell - w
    sp = jnp.pad(score, ((0, pad_y), (0, pad_x)))
    cells = sp.reshape(ncy, cell, ncx, cell).transpose(0, 2, 1, 3)
    cells = cells.reshape(ncy * ncx, cell * cell)
    cell_best = jnp.argmax(cells, axis=1)
    cell_score = jnp.max(cells, axis=1)

    k = min(budget, ncy * ncx)
    top_score, top_cell = jax.lax.top_k(cell_score, k)
    by = top_cell // ncx
    bx = top_cell % ncx
    iy = cell_best[top_cell] // cell
    ix = cell_best[top_cell] % cell
    x = (bx * cell + ix).astype(jnp.float32)
    y = (by * cell + iy).astype(jnp.float32)
    if k < budget:  # tiny level: pad to static budget
        padn = budget - k
        x = jnp.concatenate([x, jnp.zeros(padn, jnp.float32)])
        y = jnp.concatenate([y, jnp.zeros(padn, jnp.float32)])
        top_score = jnp.concatenate([top_score, jnp.zeros(padn, jnp.float32)])
    return jnp.stack([x, y], axis=-1), top_score


def _ic_angle(patches):
    """Intensity-centroid orientation (IC_Angle, ORBextractor.cc:78-105).

    patches: [N, 31, 31] raw-intensity patches centered on keypoints.
    """
    r = PATCH_HALF
    ys, xs = jnp.mgrid[-r:r + 1, -r:r + 1]
    circ = (xs * xs + ys * ys) <= r * r
    wx = jnp.where(circ, xs, 0).astype(patches.dtype)
    wy = jnp.where(circ, ys, 0).astype(patches.dtype)
    m10 = jnp.einsum("nhw,hw->n", patches, wx)
    m01 = jnp.einsum("nhw,hw->n", patches, wy)
    return jnp.arctan2(m01, m10)


def _descriptors(patches, angles):
    """Rotated-BRIEF descriptors from blurred patches.

    patches: [N, 39, 39] blurred patches; angles: [N] radians.
    Returns uint32 [N, 8].
    """
    n = patches.shape[0]
    size = 2 * ROT_PATCH_HALF + 1
    pat = jnp.asarray(PATTERN)  # [256,4] int32
    a = jnp.cos(angles)[:, None]  # [N,1]
    b = jnp.sin(angles)[:, None]
    px1 = pat[None, :, 0].astype(jnp.float32)
    py1 = pat[None, :, 1].astype(jnp.float32)
    px2 = pat[None, :, 2].astype(jnp.float32)
    py2 = pat[None, :, 3].astype(jnp.float32)
    # OpenCV rotation convention: row = round(x sin + y cos),
    # col = round(x cos - y sin)
    r1 = jnp.round(px1 * b + py1 * a).astype(jnp.int32) + ROT_PATCH_HALF
    c1 = jnp.round(px1 * a - py1 * b).astype(jnp.int32) + ROT_PATCH_HALF
    r2 = jnp.round(px2 * b + py2 * a).astype(jnp.int32) + ROT_PATCH_HALF
    c2 = jnp.round(px2 * a - py2 * b).astype(jnp.int32) + ROT_PATCH_HALF

    flat = patches.reshape(n, size * size)
    i1 = r1 * size + c1  # [N,256]
    i2 = r2 * size + c2
    v1 = jnp.take_along_axis(flat, i1, axis=1)
    v2 = jnp.take_along_axis(flat, i2, axis=1)
    bits = (v1 < v2).astype(jnp.uint32)  # [N,256]
    bits = bits.reshape(n, DESC_WORDS, 32)
    shifts = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(bits * shifts, axis=-1, dtype=jnp.uint32)


@partial(jax.jit, static_argnums=(1, 2))
def extract(img, cfg: OrbConfig, cam: Camera) -> Features:
    """Full ORB extraction on one grayscale image [H, W] float32.

    Contract of ORBextractor::operator() (ORBextractor.cc:1045-1106) +
    Frame's UndistortKeyPoints (Frame.cc:654-684), fused into one jitted
    fixed-shape program.
    """
    img = img.astype(jnp.float32)
    levels = image_mod.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
    budgets = level_budgets(cfg)

    xs, ss, lv_ids, angs, descs = [], [], [], [], []
    for lv, (img_l, budget) in enumerate(zip(levels, budgets)):
        xy_l, score = _detect_level(img_l, budget, cfg.cell_size,
                                    cfg.fast_min_threshold / 255.0)
        centers = jnp.round(xy_l).astype(jnp.int32)
        # orientation on the raw level image
        pat31 = image_mod.gather_patches(img_l, centers, PATCH_HALF)
        ang = _ic_angle(pat31)
        # descriptors on the blurred level image
        img_b = image_mod.gaussian_blur(img_l, 7, 2.0)
        pat39 = image_mod.gather_patches(img_b, centers, ROT_PATCH_HALF)
        desc = _descriptors(pat39, ang)

        scale_l = cfg.scale_factor ** lv
        xs.append(xy_l * scale_l)
        ss.append(score)
        lv_ids.append(jnp.full(budget, lv, jnp.int32))
        angs.append(ang)
        descs.append(desc)

    xy_raw = jnp.concatenate(xs)
    response = jnp.concatenate(ss)
    level = jnp.concatenate(lv_ids)
    angle = jnp.concatenate(angs)
    desc = jnp.concatenate(descs)
    valid = response > 0.0

    # pad to static capacity
    n = xy_raw.shape[0]
    cap = cfg.max_keypoints
    if n < cap:
        p = cap - n
        xy_raw = jnp.concatenate([xy_raw, jnp.zeros((p, 2), jnp.float32)])
        response = jnp.concatenate([response, jnp.zeros(p, jnp.float32)])
        level = jnp.concatenate([level, jnp.zeros(p, jnp.int32)])
        angle = jnp.concatenate([angle, jnp.zeros(p, jnp.float32)])
        desc = jnp.concatenate([desc, jnp.zeros((p, DESC_WORDS), jnp.uint32)])
        valid = jnp.concatenate([valid, jnp.zeros(p, bool)])

    xy_und = undistort_points(cam, xy_raw)
    neg = jnp.full(cap, -1.0, jnp.float32)
    return Features(xy=xy_und, xy_raw=xy_raw, response=response, angle=angle,
                    level=level, desc=desc, depth=neg, u_right=neg,
                    valid=valid)


@partial(jax.jit, static_argnums=(2,))
def attach_rgbd(feats: Features, depth_map, cam: Camera) -> Features:
    """RGB-D pseudo-stereo: per-keypoint depth + virtual right coord.

    Contract of Frame::ComputeStereoFromRGBD (Frame.cc:893-914): depth is
    looked up at the raw keypoint pixel; u_right = u - bf/d for valid depth.
    """
    h, w = depth_map.shape
    xi = jnp.clip(jnp.round(feats.xy_raw[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(feats.xy_raw[:, 1]).astype(jnp.int32), 0, h - 1)
    d = depth_map[yi, xi]
    ok = (d > 0) & feats.valid
    u_right = jnp.where(ok, feats.xy[:, 0] - cam.bf / jnp.maximum(d, 1e-6),
                        -1.0)
    depth = jnp.where(ok, d, -1.0)
    return dataclasses.replace(feats, depth=depth, u_right=u_right)


def scale_factors(cfg: OrbConfig):
    return tuple(cfg.scale_factor ** l for l in range(cfg.n_levels))

"""SSD training for the 2-D detector: anchor matching, box encoding, the
multibox loss with hard-negative mining, and the synthetic person-scene
sampler.

The reference loads MobileNetV3-SSDLite VOC weights trained offline
(/root/reference/src/sg-slam/src/Detector2D.cc:20-26); this framework has no
external corpus (zero egress), so the detection head is trained on
procedurally rendered scenes whose person capsules match the dynamic
objects used across the test suite (io/synthetic.py). tools/train_detector.py
runs this on the TPU chip and persists sgslam_tpu/assets/detector.npz.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3
from ..geometry.camera import Camera
from ..io import synthetic
from . import detector as det_mod

# training cameras: the detector's native square input, plus a 4:3 variant
# whose horizontal squash matches runtime (640x480 frames resized to
# 300x300, the reference's NCNN preprocessing — Detector2D.h:70)
TRAIN_CAM = Camera(fx=246.0, fy=246.0, cx=149.5, cy=149.5, bf=20.0,
                   width=300, height=300)
TRAIN_CAM_43 = Camera(fx=246.0, fy=246.0, cx=199.5, cy=149.5, bf=20.0,
                      width=400, height=300)
MAX_PEOPLE = 3
PERSON_CLASS = 15


# ---------------------------------------------------------------------------
# Scene sampling (pure function of a PRNG key -> image + GT boxes)
# ---------------------------------------------------------------------------

def _sample_scene(key, planes, cam):
    """One random scene: camera jitter + up to MAX_PEOPLE person capsules.

    Returns (gray [300,300], boxes01 [G,4] xyxy normalized, box_valid [G]).
    Normalized boxes are invariant to the horizontal resize, so the 4:3
    camera needs no coordinate fixup.
    """
    ks = jax.random.split(key, 6)
    lo = jnp.array([-0.65, -0.20, -0.40, -0.10, -0.15, -0.06])
    hi = jnp.array([0.65, 0.20, 0.40, 0.10, 0.15, 0.06])
    xi = jax.random.uniform(ks[0], (6,)) * (hi - lo) + lo
    T_wc = se3.se3_exp(xi)

    z = jax.random.uniform(ks[2], (MAX_PEOPLE,), minval=1.1, maxval=3.4)
    cx = jax.random.uniform(ks[3], (MAX_PEOPLE,), minval=-0.42,
                            maxval=0.42) * z
    cy = jax.random.uniform(ks[4], (MAX_PEOPLE,), minval=-0.25, maxval=0.45)
    r = jax.random.uniform(ks[5], (MAX_PEOPLE, 3))
    half_h = 0.25 + 0.65 * r[:, 0]
    active = r[:, 1] < jnp.array([0.9, 0.55, 0.3])
    half_h = jnp.where(active, half_h, -1.0)
    seed = 60.0 * r[:, 2]
    people = jnp.stack([cx, cy, z, half_h, seed], axis=-1)

    gray, _ = synthetic.render_frame_people(cam, T_wc, people,
                                            planes=planes)
    if cam.width != 300:
        gray = jax.image.resize(gray, (300, 300), "linear")
    T_cw = se3.se3_inverse(T_wc)
    boxes, vis = jax.vmap(lambda p: synthetic.person_gt_box(
        cam, T_cw, p))(people)
    boxes01 = boxes / jnp.array([cam.width - 1.0, cam.height - 1.0,
                                 cam.width - 1.0, cam.height - 1.0])
    return gray, boxes01, vis


def sample_batch(key, batch: int, planes, cam=TRAIN_CAM):
    keys = jax.random.split(key, batch)
    gray, boxes, vis = jax.vmap(
        lambda k: _sample_scene(k, planes, cam))(keys)
    rgb = jnp.repeat(gray[..., None], 3, axis=-1)
    labels = jnp.full(boxes.shape[:2], PERSON_CLASS, jnp.int32)
    return rgb, boxes, labels, vis


# ---------------------------------------------------------------------------
# Anchor matching + encoding (inverse of detector.decode_boxes)
# ---------------------------------------------------------------------------

def encode_boxes(gt_xyxy, anchors, variances=(0.1, 0.2)):
    g_cxy = (gt_xyxy[:, :2] + gt_xyxy[:, 2:]) / 2.0
    g_wh = jnp.maximum(gt_xyxy[:, 2:] - gt_xyxy[:, :2], 1e-4)
    t_xy = (g_cxy - anchors[:, :2]) / (variances[0] * anchors[:, 2:])
    t_wh = jnp.log(g_wh / anchors[:, 2:]) / variances[1]
    return jnp.concatenate([t_xy, t_wh], axis=-1)


def match_anchors(anchors, gt_boxes, gt_labels, gt_valid,
                  pos_iou: float = 0.5):
    """Per-anchor targets. anchors [A,4] cxcywh; gt [G,4] xyxy.

    Returns (cls_target [A] i32, box_target [A,4], pos_mask [A]).
    """
    a_xyxy = jnp.concatenate([anchors[:, :2] - anchors[:, 2:] / 2,
                              anchors[:, :2] + anchors[:, 2:] / 2], axis=-1)
    iou = det_mod._iou(a_xyxy, gt_boxes)          # [A,G]
    iou = jnp.where(gt_valid[None, :], iou, 0.0)
    best_gt = jnp.argmax(iou, axis=1)             # [A]
    best_iou = jnp.max(iou, axis=1)
    pos = best_iou >= pos_iou
    # force the best anchor of each GT positive (guarantees recall on
    # small boxes that no anchor overlaps at 0.5)
    best_anchor = jnp.argmax(iou, axis=0)         # [G]
    force = jnp.zeros(anchors.shape[0], bool).at[best_anchor].set(gt_valid)
    forced_gt = jnp.zeros(anchors.shape[0], jnp.int32).at[best_anchor].set(
        jnp.arange(gt_boxes.shape[0], dtype=jnp.int32))
    gt_of_anchor = jnp.where(force & ~pos, forced_gt, best_gt)
    pos = pos | force
    cls_target = jnp.where(pos, gt_labels[gt_of_anchor], 0)
    box_target = encode_boxes(gt_boxes[gt_of_anchor], anchors)
    return cls_target, box_target, pos


def multibox_loss(box_pred, logits, cls_target, box_target, pos,
                  neg_ratio: float = 3.0):
    """SSD loss: smooth-L1 on positives + CE with hard-negative mining."""
    ce = -jax.nn.log_softmax(logits)[
        jnp.arange(logits.shape[0]), cls_target]
    n_pos = jnp.maximum(jnp.sum(pos.astype(jnp.int32)), 1)
    # hard negatives: highest-loss background anchors, 3:1
    neg_ce = jnp.where(pos, -jnp.inf, ce)
    rank = jnp.argsort(jnp.argsort(-neg_ce))      # 0 = hardest negative
    neg = (~pos) & (rank < neg_ratio * n_pos)
    cls_loss = jnp.sum(jnp.where(pos | neg, ce, 0.0)) / n_pos

    diff = box_pred - box_target
    huber = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff ** 2,
                      jnp.abs(diff) - 0.5)
    loc_loss = jnp.sum(jnp.where(pos[:, None], huber, 0.0)) / n_pos
    return cls_loss + loc_loss, (cls_loss, loc_loss, n_pos)


def batched_loss(model, anchors, params, rgb, gt_boxes, gt_labels, gt_valid):
    box_pred, logits = model.apply(params, rgb)

    def one(bp, lg, gb, gl, gv):
        ct, bt, pos = match_anchors(anchors, gb, gl, gv)
        loss, aux = multibox_loss(bp, lg, ct, bt, pos)
        return loss, aux[2]

    losses, npos = jax.vmap(one)(box_pred, logits, gt_boxes, gt_labels,
                                 gt_valid)
    return jnp.mean(losses), jnp.mean(npos.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Weight persistence (the packaged asset Detector2D loads)
# ---------------------------------------------------------------------------

def save_params(path: str, params) -> None:
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params, sep="/")
    np.savez_compressed(path, **{k: np.asarray(v).astype(np.float16)
                                 for k, v in flat.items()})


def load_params(path: str):
    from flax import traverse_util

    with np.load(path) as z:
        flat = {k: jnp.asarray(z[k], jnp.float32) for k in z.files}
    return traverse_util.unflatten_dict(flat, sep="/")

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

MAX_PROPS = 4
# size priors (half_w range, half_h range) per prop class — rough VOC
# object-scale priors in meters for all 10 static prop classes
_PROP_PRIORS = {
    synthetic.PROP_BICYCLE: ((0.35, 0.55), (0.25, 0.40)),
    synthetic.PROP_BOTTLE: ((0.05, 0.10), (0.14, 0.30)),
    synthetic.PROP_BUS: ((0.60, 0.90), (0.35, 0.55)),
    synthetic.PROP_CAR: ((0.50, 0.80), (0.25, 0.40)),
    synthetic.PROP_CHAIR: ((0.22, 0.45), (0.28, 0.50)),
    synthetic.PROP_TABLE: ((0.50, 0.80), (0.20, 0.35)),
    synthetic.PROP_PLANT: ((0.10, 0.22), (0.15, 0.35)),
    synthetic.PROP_SOFA: ((0.50, 0.90), (0.30, 0.45)),
    synthetic.PROP_TRAIN: ((0.70, 1.00), (0.30, 0.45)),
    synthetic.PROP_TV: ((0.28, 0.50), (0.18, 0.35)),
}


def _sample_props(key):
    """Up to MAX_PROPS prop rows [Q,7] with per-class size priors."""
    ks = jax.random.split(key, 5)
    cls = jnp.asarray(synthetic.PROP_CLASSES, jnp.float32)[
        jax.random.randint(ks[0], (MAX_PROPS,), 0,
                           len(synthetic.PROP_CLASSES))]
    z = jax.random.uniform(ks[1], (MAX_PROPS,), minval=1.2, maxval=3.4)
    cx = jax.random.uniform(ks[2], (MAX_PROPS,), minval=-0.42,
                            maxval=0.42) * z
    cy = jax.random.uniform(ks[3], (MAX_PROPS,), minval=-0.30, maxval=0.65)
    r = jax.random.uniform(ks[4], (MAX_PROPS, 4))
    lo_w = jnp.zeros(MAX_PROPS)
    hi_w = jnp.zeros(MAX_PROPS)
    lo_h = jnp.zeros(MAX_PROPS)
    hi_h = jnp.zeros(MAX_PROPS)
    for c, ((lw, hw_), (lh, hh_)) in _PROP_PRIORS.items():
        sel = cls == c
        lo_w = jnp.where(sel, lw, lo_w)
        hi_w = jnp.where(sel, hw_, hi_w)
        lo_h = jnp.where(sel, lh, lo_h)
        hi_h = jnp.where(sel, hh_, hi_h)
    hw = lo_w + (hi_w - lo_w) * r[:, 0]
    hh = lo_h + (hi_h - lo_h) * r[:, 1]
    active = r[:, 2] < jnp.array([0.8, 0.6, 0.45, 0.3])
    hh = jnp.where(active, hh, -1.0)
    seed = 60.0 * r[:, 3]
    return jnp.stack([cx, cy, z, hw, hh, cls, seed], axis=-1)


def _augment(key, gray):
    """Photometric robustness augmentation: brightness/contrast jitter,
    additive Gaussian noise, and probabilistic 3x3 blur — the stand-in for
    the real-imagery domain gap (sensor gain, motion blur, shot noise)."""
    ks = jax.random.split(key, 5)
    contrast = jax.random.uniform(ks[0], (), minval=0.6, maxval=1.3)
    bright = jax.random.uniform(ks[1], (), minval=-0.15, maxval=0.15)
    g = jnp.clip((gray - 0.5) * contrast + 0.5 + bright, 0.0, 1.0)
    sigma = jax.random.uniform(ks[2], (), minval=0.0, maxval=0.04)
    g = g + sigma * jax.random.normal(ks[4], g.shape)
    # blended 3x3 box blur with random strength (0 = sharp)
    blur = jnp.pad(g, 1, mode="edge")
    blur = sum(blur[i:i + g.shape[0], j:j + g.shape[1]]
               for i in range(3) for j in range(3)) / 9.0
    w = jax.random.uniform(ks[3], ()) * 0.8
    return jnp.clip((1 - w) * g + w * blur, 0.0, 1.0)


def _sample_scene(key, planes, cam):
    """One random scene: camera jitter + up to MAX_PEOPLE person capsules
    + up to MAX_PROPS semantic props, with photometric augmentation.

    Returns (gray [300,300], boxes01 [G,4] xyxy normalized,
    labels [G] i32, box_valid [G]). Normalized boxes are invariant to the
    horizontal resize, so the 4:3 camera needs no coordinate fixup.
    """
    ks = jax.random.split(key, 8)
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
    props = _sample_props(ks[6])

    gray, _ = synthetic.render_frame_scene(cam, T_wc, people, props,
                                           planes=planes)
    gray = _augment(ks[7], gray)
    if cam.width != 300:
        gray = jax.image.resize(gray, (300, 300), "linear")
    T_cw = se3.se3_inverse(T_wc)
    p_boxes, p_vis = jax.vmap(lambda p: synthetic.person_gt_box(
        cam, T_cw, p))(people)
    q_boxes, q_vis = jax.vmap(lambda q: synthetic.prop_gt_box(
        cam, T_cw, q))(props)
    boxes = jnp.concatenate([p_boxes, q_boxes])
    vis = jnp.concatenate([p_vis, q_vis])
    labels = jnp.concatenate([
        jnp.full((MAX_PEOPLE,), PERSON_CLASS, jnp.int32),
        props[:, 5].astype(jnp.int32)])
    boxes01 = boxes / jnp.array([cam.width - 1.0, cam.height - 1.0,
                                 cam.width - 1.0, cam.height - 1.0])
    return gray, boxes01, labels, vis


def sample_batch(key, batch: int, planes, cam=TRAIN_CAM):
    keys = jax.random.split(key, batch)
    gray, boxes, labels, vis = jax.vmap(
        lambda k: _sample_scene(k, planes, cam))(keys)
    rgb = jnp.repeat(gray[..., None], 3, axis=-1)
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

"""SSDLite-style 2-D object detector head (JAX/flax), VOC-21 contract.

Replaces the reference's NCNN MobileNetV3-SSDLite thread (Detector2D,
/root/reference/src/sg-slam/src/Detector2D.cc): 300x300 input, 21 VOC
classes, person = class 15, dual confidence thresholds — a normal box gate
plus a much lower person-specific gate feeding the dynamic-feature cull
(Detector2D.cc:57-87). The reference's separate detector *thread* with flag
handshakes (Detector2D.cc:122-149) becomes an async device computation the
tracker consumes one frame late (same effective semantics as the reference's
previous-frame box usage, without blocking the tracking thread).

Architecture: a compact inverted-residual backbone (depthwise-separable,
MXU-friendly channel counts) with SSD heads on the 1/16 and 1/32 maps.
Weights are trained on procedurally rendered person/distractor scenes
(tools/train_detector.py) and shipped as `assets/detector.npz`; the System
loads them by default.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import DetectorConfig
from ..semantic.dynamic import Boxes

VOC_CLASSES = (
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor")

DYNAMIC_CLASSES = (3, 8, 10, 12, 13, 15, 17)  # bird cat cow dog horse person sheep


class DWBlock(nn.Module):
    """Inverted residual: 1x1 expand -> 3x3 depthwise -> 1x1 project."""

    ch_out: int
    stride: int = 1
    expand: int = 4

    @nn.compact
    def __call__(self, x):
        ch_in = x.shape[-1]
        mid = ch_in * self.expand
        h = nn.Conv(mid, (1, 1), use_bias=False)(x)
        h = nn.relu(nn.GroupNorm(num_groups=8)(h))
        h = nn.Conv(mid, (3, 3), strides=(self.stride, self.stride),
                    feature_group_count=mid, use_bias=False)(h)
        h = nn.relu(nn.GroupNorm(num_groups=8)(h))
        h = nn.Conv(self.ch_out, (1, 1), use_bias=False)(h)
        h = nn.GroupNorm(num_groups=8)(h)
        if self.stride == 1 and ch_in == self.ch_out:
            h = h + x
        return h


class SSDLite(nn.Module):
    """Backbone + two SSD heads. Input [B, 300, 300, 3] in [0,1]."""

    num_classes: int = 21
    num_anchors: int = 6

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(32, (3, 3), strides=(2, 2), use_bias=False)(x)   # 150
        h = nn.relu(nn.GroupNorm(num_groups=8)(h))
        h = DWBlock(64, stride=2)(h)                                  # 75
        h = DWBlock(64)(h)
        h = DWBlock(128, stride=2)(h)                                 # 38
        h = DWBlock(128)(h)
        h = DWBlock(128, stride=2)(h)                                 # 19
        h = DWBlock(128)(h)
        f16 = h                                                       # 19x19
        h = DWBlock(256, stride=2)(h)                                 # 10
        h = DWBlock(256)(h)
        f32 = h                                                       # 10x10

        outs = []
        for f in (f16, f32):
            box = nn.Conv(self.num_anchors * 4, (3, 3))(f)
            cls = nn.Conv(self.num_anchors * self.num_classes, (3, 3))(f)
            b, hh, ww, _ = box.shape
            outs.append((box.reshape(b, hh * ww * self.num_anchors, 4),
                         cls.reshape(b, hh * ww * self.num_anchors,
                                     self.num_classes)))
        boxes = jnp.concatenate([o[0] for o in outs], axis=1)
        logits = jnp.concatenate([o[1] for o in outs], axis=1)
        return boxes, logits


def make_anchors(input_size: int = 300,
                 feat_sizes: Sequence[int] = (19, 10),
                 scales: Sequence[float] = (0.16, 0.45),
                 ratios: Sequence[float] = (1.0, 2.0, 0.5)) -> np.ndarray:
    """SSD anchors (cx, cy, w, h) normalized to [0,1]. [A_total, 4]."""
    anchors = []
    for fs, scale in zip(feat_sizes, scales):
        s2 = math.sqrt(scale * min(1.0, scale * 2.0))
        for iy in range(fs):
            for ix in range(fs):
                cx = (ix + 0.5) / fs
                cy = (iy + 0.5) / fs
                for r in ratios:
                    sr = math.sqrt(r)
                    anchors.append([cx, cy, scale * sr, scale / sr])
                    anchors.append([cx, cy, s2 * sr, s2 / sr])
    return np.asarray(anchors, np.float32)


def decode_boxes(pred, anchors, variances=(0.1, 0.2)):
    """SSD box decode -> (x1, y1, x2, y2) normalized."""
    cxy = anchors[:, :2] + pred[:, :2] * variances[0] * anchors[:, 2:]
    wh = anchors[:, 2:] * jnp.exp(jnp.clip(pred[:, 2:] * variances[1],
                                           -4.0, 4.0))
    return jnp.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1)


def _iou(a, b):
    """a [N,4], b [M,4] -> [N,M]."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter,
                               1e-9)


def nms_topk(boxes, scores, cls, k: int, iou_thresh: float = 0.45,
             pool: int = 128):
    """Fixed-shape greedy NMS: `pool` candidates -> `k` picks.

    Class-aware (boxes of different classes never suppress each other),
    implemented as k sequential argmax+suppress steps over static arrays.
    """
    top_s, top_i = jax.lax.top_k(scores, pool)
    b = boxes[top_i]
    c = cls[top_i]
    alive = top_s > 0.0
    iou = _iou(b, b)
    same_cls = c[:, None] == c[None, :]

    def body(i, state):
        alive, out_idx, out_ok = state
        s = jnp.where(alive, top_s, -1.0)
        j = jnp.argmax(s)
        ok = s[j] > 0.0
        suppress = (iou[j] > iou_thresh) & same_cls[j]
        alive = alive & ~suppress
        alive = alive.at[j].set(False)
        out_idx = out_idx.at[i].set(top_i[j])
        out_ok = out_ok.at[i].set(ok)
        return alive, out_idx, out_ok

    out_idx = jnp.zeros(k, jnp.int32)
    out_ok = jnp.zeros(k, bool)
    _, out_idx, out_ok = jax.lax.fori_loop(0, k, body,
                                           (alive, out_idx, out_ok))
    return out_idx, out_ok


def default_detector_params():
    """The packaged trained weights (tools/train_detector.py), or None."""
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "assets", "detector.npz")
    if not os.path.exists(path):
        return None
    from .detector_train import load_params

    return load_params(path)


class Detector2D:
    """Host facade with the reference Detector2D's exact output contract."""

    def __init__(self, cfg: DetectorConfig, key=None, params=None,
                 pretrained: bool = True):
        self.cfg = cfg
        self.model = SSDLite(num_classes=cfg.num_classes)
        self.anchors = jnp.asarray(make_anchors(cfg.input_size))
        if params is None and pretrained:
            params = default_detector_params()
        if params is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            dummy = jnp.zeros((1, cfg.input_size, cfg.input_size, 3))
            params = self.model.init(key, dummy)
        self.params = params
        self._detect = partial(_detect_jit, self.model, self.anchors, cfg)

    def detect(self, rgb, image_w: int, image_h: int):
        """rgb [H,W,3] float in [0,1] -> (all_boxes, person_boxes_for_cull,
        dynamic_boxes_for_mapping, objects_2d) as `Boxes` in PIXEL coords.

        Mirrors Detector2D::detect's four lists (Detector2D.cc:57-89):
        person boxes above the low dynamic threshold drive mapping masks;
        above 0.2 drive feature culling; non-person boxes above the normal
        threshold become 2-D semantic objects.
        """
        out = self._detect(self.params, rgb)
        xyxy, cls, score, valid = out
        scale = jnp.array([image_w, image_h, image_w, image_h],
                          jnp.float32)
        px = xyxy * scale[None, :]
        c = self.cfg
        is_person = cls == c.person_class
        keep_any = valid & (
            (score > c.conf_threshold)
            | (is_person & (score > c.dynamic_conf_threshold)))
        all_boxes = Boxes(px, cls, score, keep_any)
        person_cull = Boxes(px, cls, score, keep_any & is_person
                            & (score > c.person_box_conf_for_culling))
        person_map = Boxes(px, cls, score, keep_any & is_person)
        objects2d = Boxes(px, cls, score, keep_any & ~is_person
                          & (score > c.conf_threshold))
        return all_boxes, person_cull, person_map, objects2d


@partial(jax.jit, static_argnums=(0, 2))
def _detect_jit(model, anchors, cfg: DetectorConfig, params, rgb):
    img = jax.image.resize(rgb, (cfg.input_size, cfg.input_size, 3),
                           "linear")
    box_pred, logits = model.apply(params, img[None])
    boxes = decode_boxes(box_pred[0], anchors)
    probs = jax.nn.softmax(logits[0], axis=-1)
    # best non-background class per anchor
    cls = jnp.argmax(probs[:, 1:], axis=-1).astype(jnp.int32) + 1
    score = jnp.max(probs[:, 1:], axis=-1)
    low_gate = jnp.where(cls == cfg.person_class,
                         cfg.dynamic_conf_threshold, cfg.conf_threshold)
    score = jnp.where(score > low_gate, score, 0.0)
    idx, ok = nms_topk(boxes, score, cls, cfg.max_boxes)
    return (jnp.clip(boxes[idx], 0.0, 1.0), cls[idx], score[idx], ok)

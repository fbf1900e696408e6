"""Semantic object database: class-aware nearest-centroid fusion registry.

Replaces ObjectDatabase (/root/reference/src/sg-slam/src/ObjectDatabase.cc):
a new detection merges into an existing object of the same class when their
centroids are closer than a per-class size prior (bottle 0.2 m / chair 1.0 m
/ tvmonitor 0.5 m / default 0.6 m, ObjectDatabase.cc:21-27), with mean
filtering of probability/centroid/size (:44-112); otherwise it is appended
with a fresh id. Fixed-capacity arrays + masks, single-object update is one
jitted step (detections per keyframe are few, so a host loop over them is
fine).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# per-class association radius (meters); VOC ids; default 0.6
_CLASS_RADIUS = np.full(21, 0.6, np.float32)
_CLASS_RADIUS[5] = 0.2    # bottle
_CLASS_RADIUS[9] = 1.0    # chair
_CLASS_RADIUS[20] = 0.5   # tvmonitor
CLASS_RADIUS = jnp.asarray(_CLASS_RADIUS)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ObjectDB:
    centroid: jax.Array   # [O,3]
    size: jax.Array       # [O,3]
    prob: jax.Array       # [O]
    cls: jax.Array        # [O] i32
    count: jax.Array      # [O] i32 fused detections
    valid: jax.Array      # [O] bool
    next_id: jax.Array    # [] i32

    @staticmethod
    def empty(capacity: int = 256) -> "ObjectDB":
        return ObjectDB(
            centroid=jnp.zeros((capacity, 3), jnp.float32),
            size=jnp.zeros((capacity, 3), jnp.float32),
            prob=jnp.zeros(capacity, jnp.float32),
            cls=jnp.full(capacity, -1, jnp.int32),
            count=jnp.zeros(capacity, jnp.int32),
            valid=jnp.zeros(capacity, bool),
            next_id=jnp.zeros((), jnp.int32))


@jax.jit
def add_object(db: ObjectDB, centroid, size, prob, cls) -> ObjectDB:
    """Insert-or-fuse one semantic object (addObject contract)."""
    same = db.valid & (db.cls == cls)
    d = jnp.linalg.norm(db.centroid - centroid[None], axis=-1)
    d = jnp.where(same, d, jnp.inf)
    j = jnp.argmin(d)
    radius = CLASS_RADIUS[jnp.clip(cls, 0, 20)]
    merge = d[j] < radius

    cnt = db.count[j].astype(jnp.float32)
    new_centroid = (db.centroid[j] * cnt + centroid) / (cnt + 1.0)
    new_size = (db.size[j] * cnt + size) / (cnt + 1.0)
    new_prob = (db.prob[j] * cnt + prob) / (cnt + 1.0)

    k = jnp.minimum(db.next_id, db.centroid.shape[0] - 1)
    slot = jnp.where(merge, j, k)

    return dataclasses.replace(
        db,
        centroid=db.centroid.at[slot].set(
            jnp.where(merge, new_centroid, centroid)),
        size=db.size.at[slot].set(jnp.where(merge, new_size, size)),
        prob=db.prob.at[slot].set(jnp.where(merge, new_prob, prob)),
        cls=db.cls.at[slot].set(cls),
        count=db.count.at[slot].add(1),
        valid=db.valid.at[slot].set(True),
        next_id=jnp.where(merge, db.next_id,
                          jnp.minimum(db.next_id + 1,
                                      db.centroid.shape[0])))

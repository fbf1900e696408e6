"""Map checkpoint / resume.

The reference leaves map save/load as an unimplemented TODO
(/root/reference/src/sg-slam/include/System.h:121-123); this framework makes
it first-class: the whole MapState (plus auxiliary pytrees) serializes to a
single .npz since every component is a flat array — no pointer graphs to
walk. Enables relocalization-only mode and crash/resume (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..mapstate.mapstate import MapState


def save_map(path: str, m: MapState, extra: dict | None = None):
    arrays = {f"map__{f.name}": np.asarray(getattr(m, f.name))
              for f in dataclasses.fields(m)}
    for k, v in (extra or {}).items():
        arrays[f"extra__{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_map(path: str):
    """Returns (MapState, extra_dict)."""
    data = np.load(path)
    kwargs = {}
    extra = {}
    for k in data.files:
        if k.startswith("map__"):
            kwargs[k[5:]] = jnp.asarray(data[k])
        elif k.startswith("extra__"):
            extra[k[7:]] = data[k]
    return MapState(**kwargs), extra

"""Stage-level wall-time profile of the real-time chunk program on the TPU.

Times each stage of the production 640x480/1000-feature semantic pipeline
separately — batched ORB extraction, SSD detection, dynamic rejection,
one track_step, the full no-keyframe chunk, the with-keyframe chunk, and
the keyframe maintenance pass (insert + cull + triangulate + fuse + local
BA + KF cull) — so throughput work targets measured cost, not guesses.

Usage: python tools/profile_chunk.py [--reps 10] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_sgslam"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def timed(fn, make_args, reps):
    import numpy as np

    out = fn(*make_args(0))
    jax.block_until_ready(out)
    ts = []
    for r in range(1, reps + 1):
        a = make_args(r)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from sgslam_tpu import config
    from sgslam_tpu.io import synthetic
    from sgslam_tpu.models.detector import Detector2D
    from sgslam_tpu.slam import scan_pipeline, tracking

    CHUNK = 4
    N_WARM = 76
    cfg = config.synthetic_config(width=640, height=480)
    seq = synthetic.SyntheticSequence(cfg.camera, n_frames=N_WARM + CHUNK,
                                      dynamic=True)
    frames = [seq.frame(i) for i in range(N_WARM + CHUNK)]
    jax.block_until_ready(frames)

    detector = Detector2D(cfg.detector)
    ct = scan_pipeline.ChunkedSemanticTracker(cfg, detector, chunk=CHUNK,
                                              fetch_every=6)
    i = 0
    while ct._carry is None and i < 8:
        ct.bootstrap(*frames[i])
        i += 1
    # build up a realistic map: run a few chunks
    while i + CHUNK <= N_WARM:
        ct.process_chunk(jnp.stack([frames[j][0] for j in range(i, i + CHUNK)]),
                         jnp.stack([frames[j][1] for j in range(i, i + CHUNK)]))
        i += CHUNK
    ct.flush()
    m = ct._map
    carry = ct._carry
    params = detector.params
    g4 = jnp.stack([frames[j][0] for j in range(i, i + CHUNK)])
    d4 = jnp.stack([frames[j][1] for j in range(i, i + CHUNK)])
    print(f"map: {int(np.asarray(m.kf_valid).sum())} KFs, "
          f"{int(np.asarray(m.pt_valid).sum())} pts", file=sys.stderr)

    res = {}

    def row(name, t):
        res[name] = round(t * 1e3, 3)
        print(f"{name}: {t*1e3:.2f} ms", file=sys.stderr)

    # full chunk, keyframes allowed (the production dispatch). The chunk
    # program DONATES the map argument, so every rep feeds a fresh copy
    # (made in make_args, outside the timed region).
    fn = ct._fn
    t = timed(lambda mm, g, d: fn(params, mm, carry, g, d,
                                  jnp.asarray(CHUNK, jnp.int32)),
              lambda r: (jax.tree.map(jnp.copy, m), g4 + 1e-4 * r, d4),
              args.reps)
    row("chunk4_full_kf_allowed", t)

    # full chunk, keyframe flagging suppressed (n_live=0): tracking only
    t = timed(lambda mm, g, d: fn(params, mm, carry, g, d,
                                  jnp.asarray(0, jnp.int32)),
              lambda r: (jax.tree.map(jnp.copy, m), g4 + 1e-4 * r, d4),
              args.reps)
    row("chunk4_no_kf", t)

    # batched extraction alone
    ext = jax.jit(lambda g, d: jax.vmap(
        lambda gg, dd: tracking.extract_frame(cfg, gg, dd))(g, d))
    t = timed(ext, lambda r: (g4 + 1e-4 * r, d4), args.reps)
    row("extract4", t)

    # detector alone (jit the batch like the chunk program does)
    from sgslam_tpu.semantic.dynamic import Boxes

    fn_nodet = scan_pipeline.make_track_chunk(cfg, None, semantic=False)
    t = timed(lambda mm, g, d: fn_nodet(None, mm, carry, g, d,
                                        jnp.asarray(0, jnp.int32)),
              lambda r: (jax.tree.map(jnp.copy, m), g4 + 1e-4 * r, d4),
              args.reps)
    row("chunk4_no_kf_no_det_no_sem", t)

    # one track_step (sequential core unit)
    feats = tracking.extract_frame(cfg, frames[i][0], frames[i][1])
    ts_fn = jax.jit(lambda f, T: tracking.track_step(cfg, m, f, T))
    t = timed(ts_fn, lambda r: (
        dataclasses.replace(feats, xy=feats.xy + 1e-3 * r), carry.Tcw),
        args.reps)
    row("track_step_1", t)

    # keyframe maintenance pass alone (insert + full LocalMapping)
    ins = jax.jit(lambda mm, f, T: scan_pipeline.insert_and_maintain_body(
        cfg, mm, f, T, jnp.asarray(999, jnp.int32),
        jnp.full((feats.capacity,), -1, jnp.int32)))
    t = timed(ins, lambda r: (
        m, dataclasses.replace(feats, xy=feats.xy + 1e-3 * r), carry.Tcw),
        args.reps)
    row("insert_and_maintain", t)

    # local BA step alone at the production window
    ba = jax.jit(lambda mm: tracking.local_ba_step(
        cfg, mm, jnp.asarray(int(np.asarray(m.next_kf)) - 1, jnp.int32)))
    t = timed(ba, lambda r: (dataclasses.replace(
        m, pt_pos=m.pt_pos + 1e-5 * r),), args.reps)
    row("local_ba_step", t)

    print(json.dumps(res))


if __name__ == "__main__":
    main()

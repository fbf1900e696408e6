"""Diagnose the chunked path's multi-lap loop-closure convergence.

Runs the EVAL stress sequence (2.15-lap circuit) through the chunked
tracker with per-closure instrumentation: when each closure fires (which
keyframe pair), how much of the post-loop GBA actually ran vs was
aborted, and the ATE after each configuration tweak. Compares:

  base        : production settings (fetch_every=6, abortable GBA)
  fullgba     : closures run their full GBA budget (abort hook disabled)
  fe3         : fetch_every=3 (halved detection lag)

Usage: python tools/debug_stress.py [--cpu] [--quick] [--modes base,...]
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

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--modes", default="base,fullgba,fe3")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from sgslam_tpu import config
    from sgslam_tpu.eval.ate import ate_rmse
    from sgslam_tpu.geometry import se3
    from sgslam_tpu.io import synthetic
    from sgslam_tpu.slam import scan_pipeline
    from sgslam_tpu.slam.loop_closing import LoopCloser

    n = 80 if args.quick else 240
    cfg = config.synthetic_config(
        width=640, height=480,
        tracker=config.TrackerConfig(max_frames_between_kf=6,
                                     depth_threshold_factor=70.0))
    seq = synthetic.SyntheticSequence(
        cfg.camera, n_frames=n, planes=synthetic.ROOM_CLOSED,
        poses=synthetic.make_circuit_trajectory(n, loops=2.15))
    frames = [seq.frame(i) for i in range(n)]
    jax.block_until_ready(frames)
    gt_wc = np.stack([np.asarray(seq.gt_pose_wc(i)) for i in range(n)])

    def run(fetch_every=6, full_gba=False, chunk=4):
        loop = LoopCloser(cfg)
        closures = []
        orig_inspect = loop._inspect

        def traced_inspect(m, kf_id, ci, cs, cov):
            out = orig_inspect(m, kf_id, ci, cs, cov)
            if out is not None:
                closures.append(dict(
                    kf_cur=int(loop.loops_closed[-1][0]),
                    kf_loop=int(loop.loops_closed[-1][1]),
                    gba_done=int(loop.last_gba_iters),
                    gba_remaining=int(loop.gba_remaining)))
            return out

        loop._inspect = traced_inspect
        ct = scan_pipeline.ChunkedTracker(cfg, chunk=chunk,
                                          fetch_every=fetch_every, loop=loop)
        if full_gba:
            ct.loop.should_abort_gba = None
        i = 0
        t0 = time.perf_counter()
        while ct._carry is None and i < n:
            ct.bootstrap(*frames[i])
            i += 1
        while i + chunk <= n:
            ct.process_chunk(
                jnp.stack([frames[j][0] for j in range(i, i + chunk)]),
                jnp.stack([frames[j][1] for j in range(i, i + chunk)]))
            i += chunk
        if i < n:
            ct.process_tail(
                jnp.stack([frames[j][0] for j in range(i, n)]),
                jnp.stack([frames[j][1] for j in range(i, n)]))
        ct.flush()
        wall = time.perf_counter() - t0
        est_wc = np.stack([np.asarray(se3.se3_inverse(jnp.asarray(p)))
                           for p in ct.poses_cw()])
        rmse, _, _ = ate_rmse(est_wc[:n], gt_wc[:len(est_wc)])
        return dict(ate=round(float(rmse), 4), loops=ct.loops_closed,
                    closures=closures, kf=ct.n_kf,
                    lost=int(ct.lost_mask().sum()), wall=round(wall, 1))

    res = {}
    modes = args.modes.split(",")
    if "base" in modes:
        res["base"] = run()
        print("base", json.dumps(res["base"]), file=sys.stderr)
    if "fullgba" in modes:
        res["fullgba"] = run(full_gba=True)
        print("fullgba", json.dumps(res["fullgba"]), file=sys.stderr)
    if "fe3" in modes:
        res["fe3"] = run(fetch_every=3)
        print("fe3", json.dumps(res["fe3"]), file=sys.stderr)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

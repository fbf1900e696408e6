"""Driver benchmark: steady-state FULL-pipeline throughput on the real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = 30 FPS (the reference's real-time envelope on its PC-class
hardware: 30 FPS camera input with real-time pacing, BASELINE.md).

The measured step is the COMPLETE per-frame semantic SLAM pipeline at TUM
geometry (640x480, 1000 ORB features) on a dynamic scene: SSD person
detection (300x300), pyramid ORB extraction, LK-flow + F-RANSAC + epipolar
dynamic-feature rejection, two-stage local-map association, two motion-only
bundle adjustments, the keyframe decision, and — on keyframe steps — map
insertion, point culling, triangulation, duplicate fusion, windowed Schur
local BA, and keyframe culling. Everything the reference's six threads do
per frame except loop closing (event-driven) and dense point-cloud export.
One dispatch per 8-frame chunk (slam/scan_pipeline.make_semantic_chunk).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_sgslam"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def main():
    from sgslam_tpu import config
    from sgslam_tpu.io import synthetic
    from sgslam_tpu.models.detector import Detector2D
    from sgslam_tpu.slam import scan_pipeline

    cfg = config.synthetic_config(width=640, height=480)
    chunk = 4
    n_boot = 6
    n_frames = n_boot + 26 * chunk        # one continuous pass, no replay

    # Pre-render a dynamic scene (walking person) on the same chip
    seq = synthetic.SyntheticSequence(cfg.camera, n_frames=n_frames,
                                      dynamic=True)
    frames = [seq.frame(i) for i in range(n_frames)]
    jax.block_until_ready(frames)

    detector = Detector2D(cfg.detector)
    # pipeline_depth=1: the host drain of chunk k overlaps the device
    # execution of chunk k+1 (one chunk in flight)
    ct = scan_pipeline.ChunkedSemanticTracker(cfg, detector, chunk=chunk,
                                              pipeline_depth=1)
    for i in range(n_boot):
        ct.bootstrap(*frames[i])
    assert ct.inner.state == "OK", "bench tracker failed to initialize"

    # stack chunks once (device-side)
    n_chunks = (n_frames - n_boot) // chunk
    g = jnp.stack([f[0] for f in frames[n_boot:]]).reshape(
        n_chunks, chunk, 480, 640)
    d = jnp.stack([f[1] for f in frames[n_boot:]]).reshape(
        n_chunks, chunk, 480, 640)
    # first two chunks absorb compiles (both pending-KF cond branches)
    ct.process_chunk(g[0], d[0])
    ct.process_chunk(g[1], d[1])

    t0 = time.perf_counter()
    n_steps = 0
    for c in range(2, n_chunks):
        ct.process_chunk(g[c], d[c])
        n_steps += chunk
    ct.flush()
    dt = time.perf_counter() - t0
    fps = n_steps / dt

    assert min(ct.n_inliers_hist) >= 30, (
        f"tracking lost during bench: {min(ct.n_inliers_hist)}")
    print(json.dumps({
        "metric": "full_semantic_pipeline_fps_640x480_1000feat",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()

"""Driver benchmark: steady-state tracking throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = 30 FPS (the reference's real-time envelope on its PC-class
hardware: 30 FPS camera input with real-time pacing, BASELINE.md).

The measured step is the full per-frame SLAM hot path at TUM geometry
(640x480, 1000 ORB features): pyramid ORB extraction + RGB-D attach +
local-map association (two windowed searches + brute-force fallback branch)
+ two motion-only bundle adjustments — i.e. everything the reference's
Tracking thread does per frame except the semantic detector (benched
separately once the detection head lands).
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
    from sgslam_tpu.geometry import se3
    from sgslam_tpu.io import synthetic
    from sgslam_tpu.slam import tracking

    cfg = config.synthetic_config(width=640, height=480)
    n_frames = 40

    # Pre-render frames (renderer is jitted; runs on the same chip)
    seq = synthetic.SyntheticSequence(cfg.camera, n_frames=n_frames)
    frames = [seq.frame(i) for i in range(n_frames)]
    jax.block_until_ready(frames)

    # Build a small map with the first frames
    from sgslam_tpu.slam import scan_pipeline

    chunk = 8
    ct = scan_pipeline.ChunkedTracker(cfg, chunk=chunk)
    for i in range(6):
        ct.bootstrap(*frames[i])
    assert ct.inner.state == "OK", "bench tracker failed to initialize"

    # stack chunks once (device-side)
    g = jnp.stack([f[0] for f in frames[6:6 + 32]]).reshape(4, chunk,
                                                            480, 640)
    d = jnp.stack([f[1] for f in frames[6:6 + 32]]).reshape(4, chunk,
                                                            480, 640)
    # warmup/compile
    ct.process_chunk(g[0], d[0])

    t0 = time.perf_counter()
    reps = 4
    n_steps = 0
    for _ in range(reps):
        for c in range(4):
            ct.process_chunk(g[c], d[c])
            n_steps += chunk
    dt = time.perf_counter() - t0
    fps = n_steps / dt

    print(json.dumps({
        "metric": "tracking_fps_640x480_1000feat",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()

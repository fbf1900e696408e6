"""Steady-state perf sweep for the chunked semantic pipeline on the chip.

Times ONLY the steady-state chunk loop (no flush, no compile) for a set of
(chunk, pipeline_depth) configs, plus per-stage timings of the jitted
pieces, so tuning decisions are measured rather than guessed.

Usage:  python tools/bench_sweep.py [--chunks 4,8] [--depths 0,1] [--stages]
Env:    SGSLAM_HAMMING=xla|mxu|pallas selects the Hamming formulation.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_sgslam"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def run_config(cfg, detector, frames, chunk, depth, n_boot):
    from sgslam_tpu.slam import scan_pipeline

    ct = scan_pipeline.ChunkedSemanticTracker(cfg, detector, chunk=chunk,
                                              fetch_every=depth + 1)
    for i in range(n_boot):
        ct.bootstrap(*frames[i])
    assert ct.inner.state == "OK"
    n_frames = len(frames)
    n_chunks = (n_frames - n_boot) // chunk
    g = jnp.stack([f[0] for f in frames[n_boot:n_boot + n_chunks * chunk]]
                  ).reshape(n_chunks, chunk, 480, 640)
    d = jnp.stack([f[1] for f in frames[n_boot:n_boot + n_chunks * chunk]]
                  ).reshape(n_chunks, chunk, 480, 640)
    ct.process_chunk(g[0], d[0])
    ct.process_chunk(g[1], d[1])
    t0 = time.perf_counter()
    n_steps = 0
    for c in range(2, n_chunks):
        ct.process_chunk(g[c], d[c])
        n_steps += chunk
    ct.flush()
    dt = time.perf_counter() - t0
    return n_steps / dt, min(ct.n_inliers_hist)


def stage_timings(cfg, detector, frames, chunk):
    """Per-stage device timings (block_until_ready each)."""
    from sgslam_tpu.slam import scan_pipeline, tracking

    out = {}
    g = jnp.stack([f[0] for f in frames[:chunk]])
    d = jnp.stack([f[1] for f in frames[:chunk]])

    ex = jax.jit(jax.vmap(lambda a, b: tracking.extract_frame(cfg, a, b)))
    r = ex(g, d); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(10):
        r = ex(g, d)
    jax.block_until_ready(r)
    out["extract_batch_ms"] = (time.perf_counter() - t0) / 10 * 1000

    if detector is not None:
        fn = scan_pipeline.make_track_chunk(cfg, detector, semantic=True)

        def det(params, grays):
            imgs = jax.image.resize(
                grays, (grays.shape[0], cfg.detector.input_size,
                        cfg.detector.input_size), "linear")
            rgb = jnp.repeat(imgs[..., None], 3, axis=-1)
            return detector.model.apply(params, rgb)

        dj = jax.jit(det)
        r = dj(detector.params, g); jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(10):
            r = dj(detector.params, g)
        jax.block_until_ready(r)
        out["detector_batch_ms"] = (time.perf_counter() - t0) / 10 * 1000

    # one full chunk program, steady state
    ct = scan_pipeline.ChunkedSemanticTracker(cfg, detector, chunk=chunk)
    for i in range(6):
        ct.bootstrap(*frames[i])
    pending = ct._empty_pending()
    params = detector.params if detector is not None else None
    r = ct._fn(params, ct._map, ct._carry, g, d, pending)
    ct._map, ct._carry = r[0], r[1]
    jax.block_until_ready(r[2])
    t0 = time.perf_counter()
    for _ in range(10):
        r = ct._fn(params, ct._map, ct._carry, g, d, ct._empty_pending())
        ct._map, ct._carry = r[0], r[1]
    jax.block_until_ready(r[2])
    out["chunk_total_ms"] = (time.perf_counter() - t0) / 10 * 1000
    out["per_frame_ms"] = out["chunk_total_ms"] / chunk
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", default="4,8")
    ap.add_argument("--depths", default="0,1")
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--frames", type=int, default=110)
    args = ap.parse_args()

    from sgslam_tpu import config
    from sgslam_tpu.io import synthetic
    from sgslam_tpu.models.detector import Detector2D

    cfg = config.synthetic_config(width=640, height=480)
    seq = synthetic.SyntheticSequence(cfg.camera, n_frames=args.frames,
                                      dynamic=True)
    frames = [seq.frame(i) for i in range(args.frames)]
    jax.block_until_ready(frames)
    detector = Detector2D(cfg.detector)

    if args.stages:
        for chunk in [int(c) for c in args.chunks.split(",")]:
            st = stage_timings(cfg, detector, frames, chunk)
            print(json.dumps({"chunk": chunk, **{k: round(v, 2)
                                                 for k, v in st.items()}}))
        return

    for chunk in [int(c) for c in args.chunks.split(",")]:
        for depth in [int(x) for x in args.depths.split(",")]:
            fps, min_inl = run_config(cfg, detector, frames, chunk, depth,
                                      n_boot=6)
            print(json.dumps({
                "chunk": chunk, "depth": depth, "fps": round(fps, 2),
                "min_inliers": int(min_inl),
                "hamming": os.environ.get("SGSLAM_HAMMING", "default")}))


if __name__ == "__main__":
    main()

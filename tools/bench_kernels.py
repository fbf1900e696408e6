"""Per-kernel speed-of-light benchmark on the TPU chip -> KERNELS_r05.json.

BASELINE.md's measurement row asks for "BA and matching kernels at
speed-of-light per chip". This tool measures every hot kernel at its
PRODUCTION shape (the shapes the 640x480/1000-feature pipeline actually
dispatches) and situates each against a roofline CALIBRATED ON THE SAME
CHIP in the same session:

  * compute ceiling  = measured attainable bf16 matmul throughput
    (4096^3 GEMM), not a datasheet number;
  * memory ceiling   = measured HBM stream bandwidth (big-array copy+sum);
  * for each kernel we estimate FLOPs (or bit-ops) and bytes moved, then
    report %-of-roofline on the binding resource.

Methodology (see memory notes / axon tunnel): the tunnel caches identical
executions, so EVERY repetition perturbs its inputs; one warmup call
absorbs compile + first-execution overhead; block_until_ready around the
timed region.

Usage: python tools/bench_kernels.py [--out KERNELS_r05.json] [--reps 20]
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


def timed(fn, make_args, reps: int):
    """Median wall seconds over `reps` calls with per-rep perturbed args."""
    out = fn(*make_args(0))
    jax.block_until_ready(out)          # compile + warm
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
    ap.add_argument("--out", default="KERNELS_r05.json")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    from sgslam_tpu import config
    from sgslam_tpu.io import synthetic
    from sgslam_tpu.matching import hamming
    from sgslam_tpu.mapstate import local_map as lm
    from sgslam_tpu.mapstate import mapstate as ms
    from sgslam_tpu.optim import local_ba, pose_graph
    from sgslam_tpu.ops import orb

    cfg = config.synthetic_config(width=640, height=480)
    cam = cfg.camera
    rng = np.random.default_rng(0)
    results = {"platform": jax.devices()[0].platform,
               "device": str(jax.devices()[0]),
               "method": "roofline calibrated on-chip: bf16 GEMM peak + "
                         "HBM stream bandwidth; per-kernel median wall "
                         "time at production shapes, inputs perturbed "
                         "per rep (tunnel caches identical executions)",
               "kernels": {}}

    # ---- roofline calibration -------------------------------------------
    M = 4096
    a0 = jnp.asarray(rng.standard_normal((M, M)), jnp.bfloat16)
    b0 = jnp.asarray(rng.standard_normal((M, M)), jnp.bfloat16)
    mm = jax.jit(lambda a, b: a @ b)
    t = timed(mm, lambda r: (a0 + jnp.bfloat16(1e-3 * r), b0), args.reps)
    peak_flops = 2.0 * M ** 3 / t
    results["roofline"] = {"bf16_gemm_4096_tflops": round(peak_flops / 1e12,
                                                          2)}

    big = jnp.asarray(rng.standard_normal((64, 1024, 1024)), jnp.float32)
    cp = jax.jit(lambda x: x * 1.0000001 + 1.0)
    t = timed(cp, lambda r: (big + np.float32(r),), args.reps)
    hbm_bw = 2.0 * big.size * 4 / t          # read + write
    results["roofline"]["hbm_stream_gbps"] = round(hbm_bw / 1e9, 1)

    def row(name, t_s, flops=None, bytes_moved=None, note=""):
        r = {"wall_ms": round(t_s * 1e3, 3), "note": note}
        if flops:
            r["gflops"] = round(flops / 1e9, 2)
            r["pct_of_compute_roofline"] = round(
                100.0 * (flops / t_s) / peak_flops, 1)
        if bytes_moved:
            r["mbytes"] = round(bytes_moved / 1e6, 2)
            r["pct_of_hbm_roofline"] = round(
                100.0 * (bytes_moved / t_s) / hbm_bw, 1)
        results["kernels"][name] = r
        print(name, r, file=sys.stderr)

    # ---- ORB extraction at 640x480 --------------------------------------
    g0, _ = synthetic.render_frame(cam, jnp.asarray(
        [1.0, 0, 0, 0, 0, 0, 0], jnp.float32))
    ext = jax.jit(lambda g: orb.extract(g, cfg.orb, cam))
    t = timed(ext, lambda r: (jnp.clip(g0 + 1e-4 * r, 0, 1),), args.reps)
    # pyramid 8 levels (~1.9x pixels), FAST 16-point test + score,
    # blur 7x7, IC_Angle + 256-pair BRIEF per kp: dominated by dense maps
    px = 640 * 480 * 1.9
    flops_ext = px * (16 * 4 + 49 * 2 + 8)    # FAST + blur + misc per px
    bytes_ext = px * 4 * 6                     # pyramid, scores, blur r/w
    row("orb_extract_640x480_8lvl", t, flops_ext, bytes_ext,
        "dense FAST score maps + per-cell top-k + rBRIEF, 1000 features")

    # ---- Hamming distance matrices at matcher shapes ---------------------
    d1 = jnp.asarray(rng.integers(0, 2 ** 32, (4096, 8)), jnp.uint32)
    d2 = jnp.asarray(rng.integers(0, 2 ** 32, (1024, 8)), jnp.uint32)

    def perturb(d, r):
        return d.at[0, 0].set(jnp.uint32(r))

    from sgslam_tpu.ops import pallas_hamming

    bitops = 4096 * 1024 * 256 * 2            # xor+popcount per bit pair
    fn_fast = jax.jit(pallas_hamming.hamming_matrix_mxu)
    t = timed(fn_fast, lambda r: (perturb(d1, r), d2), args.reps)
    row("hamming_mxu_bitmatmul_4096x1024", t, bitops / 2,
        4096 * 1024 * 4, "production matcher path (bit-plane matmul); "
        "counting 1 flop per 2 bit-ops")
    fn_ref = jax.jit(hamming.hamming_matrix_xla)
    t = timed(fn_ref, lambda r: (perturb(d1, r), d2), args.reps)
    row("hamming_xla_popcount_4096x1024", t, bitops / 2, 4096 * 1024 * 4,
        "XLA xor+population_count reference")
    try:
        fn_p = jax.jit(pallas_hamming.hamming_matrix_pallas)
        t = timed(fn_p, lambda r: (perturb(d1, r), d2), args.reps)
        row("hamming_pallas_4096x1024", t, bitops / 2, 4096 * 1024 * 4,
            "hand-written Pallas tile kernel")
    except Exception as e:  # pragma: no cover
        results["kernels"]["hamming_pallas_4096x1024"] = {
            "error": str(e)[:200]}

    # ---- local BA Schur step at the production window shape --------------
    C, N, P = 24, 1024, 4096
    pose0 = jnp.tile(jnp.asarray([1.0, 0, 0, 0, 0, 0, 0], jnp.float32),
                     (C, 1))
    pts = jnp.asarray(rng.uniform(-2, 2, (P, 3)), jnp.float32)
    pts = pts.at[:, 2].add(3.0)
    obs_pt = jnp.asarray(rng.integers(0, P, (C, N)), jnp.int32)
    uvr = jnp.asarray(rng.uniform(0, 480, (C, N, 3)), jnp.float32)
    w = jnp.ones((C, N), jnp.float32)
    prob0 = local_ba.BAProblem(
        poses=pose0, opt_mask=jnp.ones(C, bool).at[0].set(False),
        points=pts, obs_pt=obs_pt, obs_uvr=uvr, obs_w=w)
    ba = jax.jit(lambda p: local_ba.bundle_adjust(
        cam, p, iters1=cfg.tracker.local_ba_iters1,
        iters2=cfg.tracker.local_ba_iters2))

    def mk_ba(r):
        import dataclasses as dc

        return (dc.replace(prob0, points=pts + 1e-4 * r),)

    t = timed(ba, mk_ba, max(args.reps // 2, 5))
    iters = cfg.tracker.local_ba_iters1 + cfg.tracker.local_ba_iters2
    # dominant term: one-hot contractions [C*N, P] x3 per iteration (bf16)
    flops_ba = iters * 3 * 2 * C * N * P * 9
    row(f"local_ba_schur_C{C}_N{N}_P{P}_{iters}it", t, flops_ba,
        iters * (C * N * P * 2 // 8),
        "one-hot-matmul Schur BA, full production schedule")

    # ---- pose-graph GN at full keyframe capacity -------------------------
    K = 256
    E = 1024
    poses_pg = jnp.tile(jnp.asarray([1.0, 0, 0, 0, 0, 0, 0, 1.0],
                                    jnp.float32), (K, 1))
    ei = jnp.asarray(rng.integers(0, K, E), jnp.int32)
    ej = jnp.asarray(rng.integers(0, K, E), jnp.int32)
    meas = jnp.tile(jnp.asarray([1.0, 0, 0, 0, 0, 0, 0, 1.0], jnp.float32),
                    (E, 1))
    ew = jnp.ones(E, jnp.float32)
    valid = jnp.ones(K, bool)
    fixed = jnp.zeros(K, bool).at[0].set(True)
    pg = jax.jit(lambda p: pose_graph.optimize_pose_graph(
        p, valid, fixed, ei, ej, meas, ew, iters=40))
    t = timed(pg, lambda r: (poses_pg.at[1, 4].add(1e-4 * r),),
              max(args.reps // 2, 5))
    # dense solve dominates: 40 iters x (1/3)(7K)^3 flops
    flops_pg = 40 * ((7 * K) ** 3) // 3
    row(f"pose_graph_gn_K{K}_E{E}_40it", t, flops_pg, None,
        "autodiff Sim3 essential-graph GN, dense [7K,7K] solve")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"kernels": args.out,
                      "gemm_tflops": results["roofline"][
                          "bf16_gemm_4096_tflops"],
                      "hbm_gbps": results["roofline"]["hbm_stream_gbps"]}))


if __name__ == "__main__":
    main()

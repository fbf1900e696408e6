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

Methodology (hard-won): under the axon tunnel `jax.block_until_ready`
does NOT actually block (executions are pipelined; single-dispatch
timings are async illusions — a naive version of this tool "measured"
3.8 PFLOP/s). Every kernel therefore runs K times INSIDE one jitted
program under `lax.fori_loop`, serialized by a data dependency (the
running checksum perturbs the next iteration's input, which also defeats
any result caching), and the program's scalar checksum is fetched with a
host read — the only operation that truly synchronizes. Per-kernel
time = (wall - round_trip_floor) / K, with the floor measured on a
trivial program in the same session.

Usage: python tools/bench_kernels.py [--out KERNELS_r05.json] [--reps 5]
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


def chk(x):
    """f32 scalar checksum of an arbitrary pytree."""
    return sum(jnp.sum(leaf.astype(jnp.float32))
               for leaf in jax.tree.leaves(x))


def measure(kernel_fn, perturb_fn, args0, K: int, reps: int, floor_s: float):
    """True per-execution seconds of `kernel_fn`.

    Builds jit(fori_loop(K, kernel)) where iteration i runs the kernel on
    inputs perturbed by the running checksum (serializing the chain), then
    host-reads the final scalar.
    """

    def program(args, seed):
        def body(_, carry):
            s, a = carry
            out = kernel_fn(*a)
            s2 = chk(out) * 1e-30 + s
            return (s2, perturb_fn(a, s2))

        s, _ = jax.lax.fori_loop(0, K, body, (seed, args))
        return s

    prog = jax.jit(program)
    float(prog(args0, jnp.float32(0.0)))           # compile + warm
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        float(prog(args0, jnp.float32(r + 1)))     # host read = real sync
        ts.append(time.perf_counter() - t0)
    return max((float(np.median(ts)) - floor_s) / K, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="KERNELS_r05.json")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--k", type=int, default=8,
                    help="kernel executions per timed program")
    args = ap.parse_args()

    from sgslam_tpu import config
    from sgslam_tpu.io import synthetic
    from sgslam_tpu.matching import hamming
    from sgslam_tpu.optim import local_ba, pose_graph
    from sgslam_tpu.ops import orb, pallas_hamming

    cfg = config.synthetic_config(width=640, height=480)
    cam = cfg.camera
    rng = np.random.default_rng(0)
    K = args.k
    results = {"platform": jax.devices()[0].platform,
               "device": str(jax.devices()[0]),
               "method": f"each kernel runs {K}x inside one jitted "
                         "fori_loop serialized by a checksum data "
                         "dependency; the program's scalar output is "
                         "host-read (the only true sync under the axon "
                         "tunnel); per-exec time = (wall - floor)/K with "
                         "the round-trip floor measured in-session",
               "kernels": {}}

    # ---- round-trip floor: trivial program with a host read -------------
    tiny = jnp.zeros(128, jnp.float32)
    fl = jax.jit(lambda x, s: jnp.sum(x) + s)
    float(fl(tiny, jnp.float32(0.0)))
    fts = []
    for r in range(max(args.reps, 8)):
        t0 = time.perf_counter()
        float(fl(tiny, jnp.float32(r)))
        fts.append(time.perf_counter() - t0)
    floor_s = float(np.median(fts))
    results["round_trip_floor_ms"] = round(floor_s * 1e3, 2)
    print(f"round-trip floor: {floor_s*1e3:.1f} ms", file=sys.stderr)

    # ---- roofline calibration -------------------------------------------
    M = 4096
    a0 = jnp.asarray(rng.standard_normal((M, M)), jnp.bfloat16)
    b0 = jnp.asarray(rng.standard_normal((M, M)), jnp.bfloat16)
    t = measure(lambda a, b: a @ b,
                lambda a, s: (a[0] + s.astype(jnp.bfloat16) * 1e-8, a[1]),
                (a0, b0), K, args.reps, floor_s)
    peak_flops = 2.0 * M ** 3 / t
    results["roofline"] = {
        "bf16_gemm_4096_tflops": round(peak_flops / 1e12, 2)}

    big = jnp.asarray(rng.standard_normal((64, 1024, 1024)), jnp.float32)
    t = measure(lambda x: x * 1.0000001 + 1.0,
                lambda a, s: (a[0] + s * 1e-12,),
                (big,), K, args.reps, floor_s)
    hbm_bw = 2.0 * big.size * 4 / t          # read + write
    results["roofline"]["hbm_stream_gbps"] = round(hbm_bw / 1e9, 1)
    print(f"roofline: {peak_flops/1e12:.1f} bf16 TFLOP/s, "
          f"{hbm_bw/1e9:.0f} GB/s HBM", file=sys.stderr)

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
    t = measure(lambda g: orb.extract(g, cfg.orb, cam),
                lambda a, s: (jnp.clip(a[0] + s * 1e-9, 0, 1),),
                (g0,), K, args.reps, floor_s)
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

    def perturb_u32(a, s):
        return (a[0].at[0, 0].set(s.astype(jnp.uint32) & jnp.uint32(31)),
                a[1])

    bitops = 4096 * 1024 * 256 * 2            # xor+popcount per bit pair
    t = measure(pallas_hamming.hamming_matrix_mxu, perturb_u32, (d1, d2),
                K, args.reps, floor_s)
    row("hamming_mxu_bitmatmul_4096x1024", t, bitops / 2,
        4096 * 1024 * 4, "production matcher path (bit-plane matmul); "
        "counting 1 flop per 2 bit-ops")
    t = measure(hamming.hamming_matrix_xla, perturb_u32, (d1, d2),
                K, args.reps, floor_s)
    row("hamming_xla_popcount_4096x1024", t, bitops / 2, 4096 * 1024 * 4,
        "XLA xor+population_count reference")
    try:
        t = measure(pallas_hamming.hamming_matrix_pallas, perturb_u32,
                    (d1, d2), K, args.reps, floor_s)
        row("hamming_pallas_4096x1024", t, bitops / 2, 4096 * 1024 * 4,
            "hand-written Pallas tile kernel")
    except Exception as e:  # pragma: no cover
        results["kernels"]["hamming_pallas_4096x1024"] = {
            "error": str(e)[:200]}

    # ---- local BA Schur step at the production window shape --------------
    import dataclasses as dc

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
    iters = cfg.tracker.local_ba_iters1 + cfg.tracker.local_ba_iters2
    t = measure(
        lambda p: local_ba.bundle_adjust(
            cam, p, iters1=cfg.tracker.local_ba_iters1,
            iters2=cfg.tracker.local_ba_iters2),
        lambda a, s: (dc.replace(a[0], points=a[0].points + s * 1e-9),),
        (prob0,), max(K // 2, 2), args.reps, floor_s)
    # dominant term: the fused one-hot contraction [C*N, P] x 30 per iter
    # (bf16); budget counted even though the early exit may stop sooner
    flops_ba = iters * 2 * C * N * P * 30
    row(f"local_ba_schur_C{C}_N{N}_P{P}_{iters}it_budget", t, flops_ba,
        iters * (C * N * P * 2),
        "one-hot-matmul Schur BA, production budget (early exit may "
        "finish in fewer iterations; flops/bytes assume the full budget)")

    # ---- pose-graph GN at full keyframe capacity -------------------------
    Kk = 256
    E = 1024
    poses_pg = jnp.tile(jnp.asarray([1.0, 0, 0, 0, 0, 0, 0, 1.0],
                                    jnp.float32), (Kk, 1))
    ei = jnp.asarray(rng.integers(0, Kk, E), jnp.int32)
    ej = jnp.asarray(rng.integers(0, Kk, E), jnp.int32)
    meas = jnp.tile(jnp.asarray([1.0, 0, 0, 0, 0, 0, 0, 1.0], jnp.float32),
                    (E, 1))
    ew = jnp.ones(E, jnp.float32)
    valid = jnp.ones(Kk, bool)
    fixed = jnp.zeros(Kk, bool).at[0].set(True)
    t = measure(
        lambda p: pose_graph.optimize_pose_graph(
            p, valid, fixed, ei, ej, meas, ew, iters=40),
        lambda a, s: (a[0].at[1, 4].add(s * 1e-9),),
        (poses_pg,), 1, args.reps, floor_s)
    # dense solve dominates: 40 iters x (1/3)(7K)^3 flops
    flops_pg = 40 * ((7 * Kk) ** 3) // 3
    row(f"pose_graph_gn_K{Kk}_E{E}_40it", t, flops_pg, None,
        "autodiff Sim3 essential-graph GN, dense [7K,7K] solve "
        "(loop-closure path only, not per-frame)")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"kernels": args.out,
                      "gemm_tflops": results["roofline"][
                          "bf16_gemm_4096_tflops"],
                      "hbm_gbps": results["roofline"]["hbm_stream_gbps"]}))


if __name__ == "__main__":
    main()

"""Two-process distributed-BA demo: the multi-host bootstrap path on CPU.

Parent mode spawns N worker processes; each joins the JAX distributed
runtime (parallel/multihost.init_process) with ONE single-threaded CPU
device, builds the global ('kf'=1, 'pt'=N) mesh, assembles its local point/
observation slab into global sharded arrays, and runs the SPMD Schur GN
step (parallel/dist_ba) with cross-PROCESS psum/all_gather over gRPC — the
DCN stand-in. A single-process single-core baseline of the identical
problem gives the speedup.

Usage:  python tools/multihost_demo.py [--procs 2] [--points 16384]
Prints one JSON line (parent) with per-layout wall times + speedup.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = 52345


def build_problem(points, cams, obs_per):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sgslam_tpu import config
    from sgslam_tpu.geometry import camera as cam_mod
    from sgslam_tpu.geometry import se3

    cam = config.tum3_config().camera
    rng = np.random.default_rng(0)
    C, P, O_per = cams, points, obs_per
    xi = (0.02 * rng.standard_normal((C, 6))).astype(np.float32)
    poses = jax.vmap(se3.se3_exp)(jnp.asarray(xi))
    pts = jnp.asarray(rng.uniform([-3, -2, 1.5], [3, 2, 8],
                                  size=(P, 3)).astype(np.float32))
    obs_pt = np.repeat(np.arange(P), O_per)
    obs_cam = jnp.asarray((obs_pt * 7919 + np.tile(np.arange(O_per), P))
                          % C, jnp.int32)
    uvr = cam_mod.project_stereo(
        cam, se3.se3_apply(poses[obs_cam], pts[jnp.asarray(obs_pt)]))
    opt_mask = jnp.asarray([False] + [True] * (C - 1))
    return cam, poses, pts, obs_cam, jnp.asarray(obs_pt, jnp.int32), \
        uvr, opt_mask


def worker(args):
    # one single-threaded CPU device per process (XLA_FLAGS is read at
    # lazy backend init; the platform must go through jax.config because
    # sitecustomize pre-imports jax)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_cpu_multi_thread_eigen=false "
          "intra_op_parallelism_threads=1").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from sgslam_tpu.parallel import dist_ba, multihost

    multihost.init_process(f"localhost:{PORT}", args.procs, args.proc)
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as Pspec

    n = args.procs
    cam, poses, pts, obs_cam, obs_pt, uvr, opt_mask = build_problem(
        args.points, args.cams, args.obs_per)
    mesh = dist_ba.make_mesh(1, n, devices=jax.devices())
    per_p = args.points // n
    per_o = per_p * args.obs_per
    lo_p, lo_o = args.proc * per_p, args.proc * per_o
    # local slabs -> global sharded arrays
    g_pts = multihost.global_shard(mesh, Pspec("pt"),
                                   jax.device_get(pts[lo_p:lo_p + per_p]))
    g_ocam = multihost.global_shard(
        mesh, Pspec("pt"), jax.device_get(obs_cam[lo_o:lo_o + per_o]))
    g_opt = multihost.global_shard(
        mesh, Pspec("pt"),
        jax.device_get(obs_pt[lo_o:lo_o + per_o] % per_p))
    g_uvr = multihost.global_shard(mesh, Pspec("pt"),
                                   jax.device_get(uvr[lo_o:lo_o + per_o]))
    g_w = multihost.global_shard(
        mesh, Pspec("pt"),
        jax.device_get(jnp.ones(per_o, jnp.float32)))

    step = dist_ba.make_distributed_ba_step(cam, mesh, args.cams)
    p, x, lam = poses, g_pts, jnp.asarray(1e-4, jnp.float32)
    p, x, lam = step(p, opt_mask, x, g_ocam, g_opt, g_uvr, g_w, lam)
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        p, x, lam = step(p, opt_mask, x, g_ocam, g_opt, g_uvr, g_w, lam)
    jax.block_until_ready(p)
    dt = time.perf_counter() - t0
    if args.proc == 0:
        print(json.dumps({"mode": f"{n}proc", "wall_s": round(dt, 4)}),
              flush=True)


def baseline(args):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_cpu_multi_thread_eigen=false "
          "intra_op_parallelism_threads=1").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from sgslam_tpu.parallel import dist_ba
    import jax.numpy as jnp

    cam, poses, pts, obs_cam, obs_pt, uvr, opt_mask = build_problem(
        args.points, args.cams, args.obs_per)
    mesh = dist_ba.make_mesh(1, 1, devices=jax.devices()[:1])
    step = dist_ba.make_distributed_ba_step(cam, mesh, args.cams)
    w = jnp.ones(len(obs_pt), jnp.float32)
    lam = jnp.asarray(1e-4, jnp.float32)
    p, x, lam = step(poses, opt_mask, pts, obs_cam, obs_pt, uvr, w, lam)
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        p, x, lam = step(p, opt_mask, x, obs_cam, obs_pt, uvr, w, lam)
    jax.block_until_ready(p)
    print(json.dumps({"mode": "1proc", "wall_s":
                      round(time.perf_counter() - t0, 4)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--cams", type=int, default=32)
    ap.add_argument("--obs-per", type=int, default=6)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--proc", type=int, default=-1)
    ap.add_argument("--baseline", action="store_true")
    args = ap.parse_args()

    if args.baseline:
        return baseline(args)
    if args.proc >= 0:
        return worker(args)

    # parent: single-core baseline, then the N-process run
    env = dict(os.environ)
    base = subprocess.run(
        [sys.executable, __file__, "--baseline",
         "--points", str(args.points), "--cams", str(args.cams),
         "--obs-per", str(args.obs_per), "--iters", str(args.iters)],
        capture_output=True, text=True, env=env, timeout=600)
    t1 = json.loads(base.stdout.strip().splitlines()[-1])["wall_s"]

    procs = [subprocess.Popen(
        [sys.executable, __file__, "--proc", str(i),
         "--procs", str(args.procs), "--points", str(args.points),
         "--cams", str(args.cams), "--obs-per", str(args.obs_per),
         "--iters", str(args.iters)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(args.procs)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        if p.returncode != 0:
            print(err[-2000:], file=sys.stderr)
            raise SystemExit(f"worker failed rc={p.returncode}")
    tN = json.loads(outs[0][0].strip().splitlines()[-1])["wall_s"]
    print(json.dumps({
        "metric": "distributed_gba_multiprocess_cpu",
        "points": args.points, "obs": args.points * args.obs_per,
        "iters": args.iters, "procs": args.procs,
        "wall_1proc_s": t1, f"wall_{args.procs}proc_s": tN,
        "speedup": round(t1 / tN, 3),
        "note": "one single-threaded CPU device per process; collectives "
                "cross process boundaries over gRPC (the DCN stand-in)"}))


if __name__ == "__main__":
    main()

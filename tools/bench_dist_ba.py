"""Distributed-BA shard-scaling measurement.

Partitions one synthetic map into 1/2/4/8 point shards over CPU (or real)
devices and times the SPMD global-BA step per layout — the measurement
harness for BASELINE.md's >=1.6x 1->2 host scaling target. On the virtual
CPU mesh the absolute numbers only sanity-check the collectives; real
scaling requires a multi-chip slice (the per-shard Schur reduction work is
O(points/shard), so the compute side scales linearly by construction).

Usage: python tools/bench_dist_ba.py [--devices 8] [--points 16384]
       [--obs-per 6] [--tpu]
Prints one JSON line per mesh layout.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--cams", type=int, default=32)
    ap.add_argument("--obs-per", type=int, default=6)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--tpu", action="store_true",
                    help="use the default (TPU) platform instead of the "
                         "virtual CPU mesh")
    args = ap.parse_args()

    if not args.tpu:
        os.environ.setdefault(
            "XLA_FLAGS",
            f"--xla_force_host_platform_device_count={args.devices}")
    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_sgslam"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp
    import numpy as np

    from sgslam_tpu import config
    from sgslam_tpu.geometry import camera as cam_mod
    from sgslam_tpu.geometry import se3
    from sgslam_tpu.parallel import dist_ba

    cam = config.tum3_config().camera
    rng = np.random.default_rng(0)
    C, P, O_per = args.cams, args.points, args.obs_per
    xi = (0.02 * rng.standard_normal((C, 6))).astype(np.float32)
    poses = jax.vmap(se3.se3_exp)(jnp.asarray(xi))
    pts = jnp.asarray(rng.uniform([-3, -2, 1.5], [3, 2, 8],
                                  size=(P, 3)).astype(np.float32))
    obs_pt_g = np.repeat(np.arange(P), O_per)
    obs_cam = jnp.asarray((obs_pt_g * 7919 + np.tile(np.arange(O_per), P))
                          % C, jnp.int32)
    uvr = cam_mod.project_stereo(
        cam, se3.se3_apply(poses[obs_cam], pts[jnp.asarray(obs_pt_g)]))
    opt_mask = jnp.asarray([False] + [True] * (C - 1))
    obs_w = jnp.ones(len(obs_pt_g), jnp.float32)

    n_avail = len(jax.devices())
    layouts = [n for n in (1, 2, 4, 8) if n <= n_avail]
    base = None
    for n_pt in layouts:
        mesh = dist_ba.make_mesh(1, n_pt, devices=jax.devices()[:n_pt])
        sh = dist_ba.make_shardings(mesh)
        per = P // n_pt
        obs_pt_local = jnp.asarray(obs_pt_g % per, jnp.int32)
        step = dist_ba.make_distributed_ba_step(cam, mesh, C)
        a = dict(
            poses=jax.device_put(poses, sh["replicated"]),
            opt=jax.device_put(opt_mask, sh["replicated"]),
            pts=jax.device_put(pts + 0.02, sh["pt"]),
            oc=jax.device_put(obs_cam, sh["pt"]),
            op=jax.device_put(obs_pt_local, sh["pt"]),
            ou=jax.device_put(uvr, sh["pt"]),
            ow=jax.device_put(obs_w, sh["pt"]),
            lam=jax.device_put(jnp.asarray(1e-3), sh["replicated"]))

        def run(eps, a=a, step=step):
            # fresh start point per rep: the axon tunnel caches identical
            # executions, so repeated runs MUST vary their inputs
            p, x, lam = a["poses"], a["pts"] + eps, a["lam"]
            for _ in range(args.iters):
                p, x, lam = step(p, a["opt"], x, a["oc"], a["op"],
                                 a["ou"], a["ow"], lam)
            jax.block_until_ready(p)
            return p

        run(0.0)                               # compile
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            run(1e-4 * (i + 1))
        dt = (time.perf_counter() - t0) / reps
        if base is None:
            base = dt
        print(json.dumps({
            "pt_shards": n_pt, "points": P, "cams": C,
            "obs": len(obs_pt_g), "iters": args.iters,
            "wall_s": round(dt, 4),
            "speedup_vs_1shard": round(base / dt, 3)}), flush=True)


if __name__ == "__main__":
    main()

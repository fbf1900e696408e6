"""Distributed global BA on a REAL tracked map across mesh shapes.

Loads the production-scale tracked map (tools/build_eval_map.py:
>= 128 keyframes / >= 8k live points / >= 50k observations), partitions it
with the production glue (parallel/map_partition.distributed_global_ba),
and for each ('kf' x 'pt') mesh shape records convergence (total
reprojection chi2 before/after) and wall time per iteration —
the realistic-scale evidence for BASELINE.md's multi-host scaling row
(VERDICT r3 next #6). On the virtual CPU mesh the walltimes sanity-check
the collective program; real scaling needs a multi-chip slice.

Usage: python tools/bench_dist_ba_realmap.py [--devices 8] [--iters 4]
       [--out MULTICHIP_SCALE_r05.json] [--tpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--map", default=None)
    ap.add_argument("--out", default="MULTICHIP_SCALE_r05.json")
    ap.add_argument("--tpu", action="store_true")
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

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from sgslam_tpu import config
    from sgslam_tpu.io import checkpoint as ckpt
    from sgslam_tpu.parallel import dist_ba, map_partition

    path = args.map or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "sgslam_tpu", "assets", "eval_map.npz")
    m, _ = ckpt.load_map(path)
    cfg = config.synthetic_config(width=640, height=480)
    n_kf = int(np.asarray(m.kf_valid).sum())
    n_pt = int(np.asarray(m.pt_valid).sum())
    obs = np.asarray(m.kf_obs_point)
    n_obs = int(((obs >= 0) & np.asarray(m.kf_valid)[:, None]).sum())

    # perturb so every layout solves the same nontrivial problem
    key = jax.random.PRNGKey(3)
    m_noisy = dataclasses.replace(
        m, pt_pos=m.pt_pos + 0.01 * jax.random.normal(key, m.pt_pos.shape))
    cost0 = map_partition.map_reprojection_cost(cfg, m_noisy)

    devs = jax.devices()[:args.devices]
    shapes = [(1, 1), (1, 2), (2, 2), (2, 4)]
    if len(devs) >= 8:
        shapes.append((1, 8))
    results = {"map": {"keyframes": n_kf, "points": n_pt,
                       "observations": n_obs, "source": path},
               "platform": jax.devices()[0].platform,
               "iters": args.iters, "cost_before": cost0, "layouts": []}
    for (nk, npt) in shapes:
        if nk * npt > len(devs):
            continue
        mesh = dist_ba.make_mesh(nk, npt, devices=devs[:nk * npt])
        # warm (compile) then time a fresh solve
        m_opt = map_partition.distributed_global_ba(cfg, m_noisy, mesh,
                                                    iters=1)
        jax.block_until_ready(m_opt.kf_pose)
        t0 = time.perf_counter()
        m_opt = map_partition.distributed_global_ba(cfg, m_noisy, mesh,
                                                    iters=args.iters)
        jax.block_until_ready(m_opt.kf_pose)
        wall = time.perf_counter() - t0
        cost1 = map_partition.map_reprojection_cost(cfg, m_opt)
        row = {"mesh": f"kf={nk} x pt={npt}", "devices": nk * npt,
               "wall_s": round(wall, 3),
               "s_per_iter": round(wall / args.iters, 3),
               "cost_after": cost1,
               "converged": bool(cost1 < cost0)}
        results["layouts"].append(row)
        print(row, file=sys.stderr)
        assert cost1 < cost0, f"distributed GBA diverged on {row['mesh']}"
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"out": args.out, "layouts": len(results["layouts"]),
                      "all_converged": True}))


if __name__ == "__main__":
    main()

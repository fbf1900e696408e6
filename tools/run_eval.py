"""EVAL: hard 640x480 accuracy suite at the reference's difficulty class.

The reference's headline claim rests on TUM fr3/walking_* dynamic sequences
(/root/reference/src/sg-slam/run_tum_walking_xyz.sh:1, README.md lines 5-9)
where SG-SLAM-class systems land ~0.02-0.03 m ATE RMSE. No TUM data exists
in this environment, so this suite renders 640x480 synthetic sequences that
approximate that difficulty — multiple independent walkers occluding large
image fractions, fast rotation (~2 deg/frame peak yaw), a >= 2-loop
circuit, and a TUM1-distortion camera (Examples/TUM1.yaml k1..k3) — with
EXACT ground truth, and gates ATE at the paper's level:

    static sequences:  ATE RMSE <= 0.03 m
    dynamic sequences: ATE RMSE <= 0.05 m
    System-vs-chunked parity: |a - b| <= max(0.2 * max(a, b), 0.01 m)

Both the per-frame System path and the chunked real-time path run on
IDENTICAL frames. Results land in EVAL_r05.json (per-sequence rows + gate
booleans); tests/test_eval_artifact.py re-asserts the committed
artifact's gates so a regression fails CI.

Usage:  python tools/run_eval.py [--out EVAL_r05.json] [--cpu] [--quick]
"""

from __future__ import annotations

import argparse
import dataclasses
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

STATIC_GATE = 0.03
DYNAMIC_GATE = 0.05
STEREO_GATE = 0.04     # stereo depth = epipolar SAD search (quantized /
                       # noisier than the RGB-D sensor's metric depth)
PARITY_REL = 0.2
PARITY_ABS = 0.01      # 1 cm absolute floor: at 1-3 cm ATEs, sub-cm
                       # path differences are run-to-run noise

TUM1_DIST = dict(k1=0.262383, k2=-0.953104, p1=-0.005358, p2=0.002628,
                 k3=1.163314)


def _make_cfg(distort: bool):
    from sgslam_tpu import config

    # denser keyframes than the 30 FPS default: the eval trajectories span
    # a full room in ~5-8 s of frames (TUM hand-held speed compressed), so
    # the KF cadence follows the reference's fps*0.5 rule scaled to the
    # actual motion per frame. Everything else is the DEFAULT production
    # config — the same one bench.py measures.
    cfg = config.synthetic_config(
        width=640, height=480,
        tracker=config.TrackerConfig(max_frames_between_kf=6,
                                     depth_threshold_factor=70.0))
    if distort:
        cam = dataclasses.replace(cfg.camera, **TUM1_DIST)
        cfg = dataclasses.replace(cfg, camera=cam)
    return cfg


def _sequences(quick: bool):
    from sgslam_tpu.io import synthetic

    n1, n2, n3, n4, n5, n6 = (140, 120, 160, 150, 200, 240) if not quick \
        else (48, 40, 54, 50, 66, 80)
    n7 = 120 if not quick else 40
    seqs = {}
    # fast-rotation walk (~2 deg/frame peak yaw = 60 deg/s at 30 FPS)
    seqs["static_640_walk_fastrot"] = dict(
        kind="static", distort=False, planes=synthetic.ROOM,
        poses=synthetic.make_walk_trajectory(n1, yaw_amp=0.35),
        people=None, n=n1)
    # TUM1-class radtan distortion end-to-end (render + undistort at
    # extraction, Examples/TUM1.yaml path)
    seqs["static_640_tum1_distortion"] = dict(
        kind="static", distort=True, planes=synthetic.ROOM,
        poses=synthetic.make_walk_trajectory(n2, yaw_amp=0.20),
        people=None, n=n2)
    # closed-room circuit with a revisit (sustained ~2.7 deg/frame yaw;
    # the revisit must re-associate or loop-close back to the gate)
    seqs["static_640_circuit_revisit"] = dict(
        kind="static", distort=False, planes=synthetic.ROOM_CLOSED,
        poses=synthetic.make_circuit_trajectory(n3, loops=1.2),
        people=None, n=n3)
    # 3 independent walkers + fast rotation (fr3/walking_* analogue)
    seqs["dynamic_640_3walkers_fastrot"] = dict(
        kind="dynamic", distort=False, planes=synthetic.ROOM,
        poses=synthetic.make_walk_trajectory(n4, yaw_amp=0.35),
        people=synthetic.walker_tracks(n4, 3, depth0=1.6, half_h=0.62),
        n=n4)
    # walkers inside the loop circuit: dynamics + revisit in one sequence.
    # Walker depth band keeps PEAK occlusion ~60% of the frame — at
    # depth0=1.2 a walker fully covered the outward-facing circuit camera
    # (100% coverage), which no SLAM can track through
    seqs["dynamic_640_walkers_circuit"] = dict(
        kind="dynamic", distort=False, planes=synthetic.ROOM_CLOSED,
        poses=synthetic.make_circuit_trajectory(n5, loops=1.15),
        people=synthetic.walker_tracks(n5, 2, depth0=1.9, half_h=0.50),
        n=n5)
    # rectified STEREO walk: depth from the epipolar SAD search instead of
    # the RGB-D sensor, through System::TrackStereo AND the chunked stereo
    # tracker (Tracking.h:67-69 lists all three entry points; stereo was
    # previously smoke-tested only)
    seqs["stereo_640_walk"] = dict(
        kind="stereo", distort=False, planes=synthetic.ROOM,
        poses=synthetic.make_walk_trajectory(n7, yaw_amp=0.25),
        people=None, n=n7)
    # STRESS: 2.15 laps at sustained ~3.2 deg/frame (96 deg/s) — beyond
    # the reference's hand-held class. BOTH paths are gated (at 0.05 m for
    # the difficulty): the chunked path's former multi-lap plateau
    # (r4: 0.179 m over 4 repeated closures) was fixed by the tail-
    # keyframe suppression + reloc tail-gating + stored-Sim3 loop edges
    # (commit 041f2f3) — it now closes ONCE and converges (0.037 m,
    # tools/debug_stress.py).
    seqs["static_640_circuit_2laps_stress"] = dict(
        kind="static", distort=False, planes=synthetic.ROOM_CLOSED,
        poses=synthetic.make_circuit_trajectory(n6, loops=2.15),
        people=None, n=n6, stress=True)
    return seqs


def _render(cfg, spec):
    from sgslam_tpu.io import synthetic

    seq = synthetic.SyntheticSequence(
        cfg.camera, n_frames=spec["n"], planes=spec["planes"],
        poses=spec["poses"], people=spec["people"])
    if spec["kind"] == "stereo":
        frames = [seq.frame_stereo(i)[:2] for i in range(spec["n"])]
    else:
        frames = [seq.frame(i) for i in range(spec["n"])]
    jax.block_until_ready(frames)
    return seq, frames


def _coverage_stats(cfg, spec):
    """Per-frame walker image coverage (renderer-exact)."""
    from sgslam_tpu.io import synthetic

    covs = [synthetic.person_coverage(cfg.camera, spec["poses"][i],
                                      spec["people"][i],
                                      planes=spec["planes"])
            for i in range(0, spec["n"], max(spec["n"] // 30, 1))]
    covs = np.asarray(covs)
    return {"mean_person_coverage": round(float(covs.mean()), 3),
            "max_person_coverage": round(float(covs.max()), 3),
            "frames_with_person_pct": round(
                float((covs > 0.02).mean()) * 100.0, 1),
            "frames_over_30pct_coverage_pct": round(
                float((covs >= 0.30).mean()) * 100.0, 1)}


def _ate(traj_cw, seq, n):
    from sgslam_tpu.eval.ate import ate_rmse
    from sgslam_tpu.geometry import se3

    est_wc = np.stack([np.asarray(se3.se3_inverse(jnp.asarray(p)))
                       for p in traj_cw])
    gt_wc = np.stack([np.asarray(seq.gt_pose_wc(i))
                      for i in range(min(len(traj_cw), n))])
    rmse, _, _ = ate_rmse(est_wc[:len(gt_wc)], gt_wc)
    return float(rmse)


def _run_system(cfg, spec, frames, seq, detector):
    from sgslam_tpu.slam.system import System

    semantic = spec["kind"] == "dynamic"
    s = System(cfg, enable_semantic=semantic, enable_loop=True,
               enable_mapping=False,
               detector=detector if semantic else None)
    if not semantic:
        s.detector = None
    t0 = time.perf_counter()
    for i in range(spec["n"]):
        if spec["kind"] == "stereo":
            s.track_stereo(frames[i][0], frames[i][1])
            continue
        g, d = frames[i]
        rgb = jnp.repeat(g[..., None], 3, -1) if semantic else None
        s.track_rgbd(g, d, rgb=rgb)
    wall = time.perf_counter() - t0
    return {"ate": _ate(s.tracker.poses_cw(), seq, spec["n"]),
            "state": s.state,
            "keyframes": int(np.asarray(s.tracker.map.kf_valid).sum()),
            "loops_closed": len(s.loop.loops_closed),
            "wall_s": round(wall, 1)}


def _run_chunked(cfg, spec, frames, seq, detector, chunk=4, fetch_every=6):
    from sgslam_tpu.slam import scan_pipeline
    from sgslam_tpu.slam.loop_closing import LoopCloser

    semantic = spec["kind"] == "dynamic"
    if semantic:
        ct = scan_pipeline.ChunkedSemanticTracker(
            cfg, detector, chunk=chunk, fetch_every=fetch_every,
            loop=LoopCloser(cfg))
    elif spec["kind"] == "stereo":
        ct = scan_pipeline.ChunkedStereoTracker(
            cfg, chunk=chunk, fetch_every=fetch_every, loop=LoopCloser(cfg))
    else:
        ct = scan_pipeline.ChunkedTracker(
            cfg, chunk=chunk, fetch_every=fetch_every, loop=LoopCloser(cfg))
    t0 = time.perf_counter()
    i = 0
    while ct._carry is None and i < spec["n"]:
        ct.bootstrap(*frames[i])
        i += 1
    while i + chunk <= spec["n"]:
        ct.process_chunk(jnp.stack([frames[j][0] for j in range(i, i + chunk)]),
                         jnp.stack([frames[j][1] for j in range(i, i + chunk)]))
        i += chunk
    if i < spec["n"]:
        ct.process_tail(jnp.stack([frames[j][0] for j in range(i, spec["n"])]),
                        jnp.stack([frames[j][1] for j in range(i, spec["n"])]))
    ct.flush()
    wall = time.perf_counter() - t0
    return {"ate": _ate(ct.poses_cw(), seq, spec["n"]),
            "keyframes": ct.n_kf,
            "loops_closed": ct.loops_closed,
            "relocalizations": ct.relocs,
            "lost_frames": int(ct.lost_mask().sum()),
            "wall_s": round(wall, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="EVAL_r05.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="short sequences (smoke run, gates not meaningful)")
    ap.add_argument("--only", default=None, help="run one sequence by name")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from sgslam_tpu.models.detector import Detector2D

    results = {"suite": "EVAL_r05", "resolution": "640x480",
               "gates": {"static_ate_m": STATIC_GATE,
                         "dynamic_ate_m": DYNAMIC_GATE,
                         "stereo_ate_m": STEREO_GATE,
                         "parity": f"|a-b| <= max({PARITY_REL}*max(a,b), "
                                   f"{PARITY_ABS} m)"},
               "sequences": {}}
    all_pass = True
    for name, spec in _sequences(args.quick).items():
        if args.only and name != args.only:
            continue
        cfg = _make_cfg(spec["distort"])
        detector = Detector2D(cfg.detector) if spec["kind"] == "dynamic" \
            else None
        print(f"[{name}] rendering {spec['n']} frames...", file=sys.stderr)
        seq, frames = _render(cfg, spec)
        row = {"kind": spec["kind"], "n_frames": spec["n"],
               "distortion": spec["distort"]}
        if spec["people"] is not None:
            row.update(_coverage_stats(cfg, spec))
        print(f"[{name}] System path...", file=sys.stderr)
        row["system"] = _run_system(cfg, spec, frames, seq, detector)
        print(f"[{name}] chunked path...", file=sys.stderr)
        row["chunked"] = _run_chunked(cfg, spec, frames, seq, detector)
        stress = bool(spec.get("stress"))
        gate = STATIC_GATE if spec["kind"] == "static" else DYNAMIC_GATE
        if spec["kind"] == "stereo":
            gate = STEREO_GATE
        if stress:
            gate = 0.05      # beyond-reference-class difficulty
        a, b = row["system"]["ate"], row["chunked"]["ate"]
        row["gate_ate_m"] = gate
        row["stress"] = stress
        row["system_pass"] = a <= gate
        row["chunked_pass"] = b <= gate
        row["parity_ok"] = abs(a - b) <= max(PARITY_REL * max(a, b),
                                             PARITY_ABS)
        if stress:
            # stress row: both paths gated at the stress gate + the
            # chunked path must stay lossless (no coasting through the
            # 96 deg/s sections)
            row["pass"] = bool(row["system_pass"] and row["chunked_pass"]
                               and row["parity_ok"]
                               and row["chunked"]["lost_frames"] == 0)
        else:
            row["pass"] = bool(row["system_pass"] and row["chunked_pass"]
                               and row["parity_ok"])
        all_pass = all_pass and row["pass"]
        results["sequences"][name] = row
        print(f"[{name}] system ATE {a:.4f} | chunked ATE {b:.4f} | "
              f"gate {gate} | pass={row['pass']}", file=sys.stderr)
    results["all_pass"] = all_pass
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"eval": args.out, "all_pass": all_pass}))


if __name__ == "__main__":
    main()

"""Train the SSD detector on synthetic person scenes and persist the asset.

Runs on whatever JAX platform is active (the TPU chip under axon; force CPU
with --cpu for smoke tests). Saves sgslam_tpu/assets/detector.npz and prints
a held-out detection-quality report.

Usage: python tools/train_detector.py [--steps N] [--cpu] [--out PATH]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_sgslam"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from sgslam_tpu.io import synthetic
    from sgslam_tpu.models import detector as det_mod
    from sgslam_tpu.models import detector_train as dt

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "sgslam_tpu", "assets", "detector.npz")

    model = det_mod.SSDLite(num_classes=21)
    anchors = jnp.asarray(det_mod.make_anchors(300))
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((args.batch, 300, 300, 3)))
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    print(f"model: {n_params/1e6:.2f}M params, "
          f"platform={jax.devices()[0].platform}")

    sched = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.05)
    tx = optax.adamw(sched, weight_decay=1e-5)
    opt_state = tx.init(params)

    # four texture-varied room layouts (planes are static args -> one jitted
    # step per variant, alternated between steps)
    def vary(planes, off):
        return tuple(synthetic.Plane(p.nx, p.ny, p.nz, p.d,
                                     p.tex_seed + off) for p in planes)

    rooms = [vary(synthetic.ROOM, o) for o in (0.0, 13.0)] + \
            [vary(synthetic.ROOM_CLOSED, o) for o in (29.0, 43.0)]
    # cross rooms with both camera aspect variants (square + squashed 4:3)
    variants = [(p, c) for p in rooms
                for c in (dt.TRAIN_CAM, dt.TRAIN_CAM_43)]

    def make_step(planes, cam):
        @jax.jit
        def step(params, opt_state, k):
            rgb, boxes, labels, vis = dt.sample_batch(k, args.batch, planes,
                                                      cam)
            (loss, npos), grads = jax.value_and_grad(
                lambda p: dt.batched_loss(model, anchors, p, rgb, boxes,
                                          labels, vis), has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, npos
        return step

    steps = [make_step(p, c) for p, c in variants]

    t0 = time.time()
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        step = steps[i % len(variants)]
        params, opt_state, loss, npos = step(params, opt_state, sub)
        if i % 200 == 0 or i == args.steps - 1:
            print(f"step {i:5d}  loss {float(loss):.4f}  "
                  f"pos/img {float(npos):.1f}  "
                  f"{(time.time()-t0):.0f}s", flush=True)

    dt.save_params(out, jax.device_get(params))
    print(f"saved {out} ({os.path.getsize(out)/1e6:.2f} MB)")

    # ---- held-out eval: per-class recall/precision at IoU 0.5, persisted
    # as DETECTOR.json so the domain gap is visible and tracked ----
    import json

    from sgslam_tpu.config import DetectorConfig

    cfg = DetectorConfig()
    det = det_mod.Detector2D(cfg, params=params)
    eval_planes = vary(synthetic.ROOM, 71.0)   # unseen textures
    k = jax.random.PRNGKey(123)
    classes = {15: "person", 2: "bicycle", 5: "bottle", 6: "bus",
               7: "car", 9: "chair", 11: "diningtable", 16: "pottedplant",
               18: "sofa", 19: "train", 20: "tvmonitor"}
    # person is measured at the CULL gate (0.2, the boxes tracking
    # consumes, Detector2D.cc:74-84) and the standard gate; other classes
    # at the standard object gate (0.5)
    gates = {c: (cfg.person_box_conf_for_culling if c == 15
                 else cfg.conf_threshold) for c in classes}
    extra_person_gate = cfg.conf_threshold
    stats = {c: [0, 0, 0] for c in classes}          # tp, fp, fn
    stats_p_std = [0, 0, 0]                          # person @ 0.5

    def iou(g, p):
        x1 = max(g[0], p[0]); y1 = max(g[1], p[1])
        x2 = min(g[2], p[2]); y2 = min(g[3], p[3])
        inter = max(x2 - x1, 0) * max(y2 - y1, 0)
        u = ((g[2]-g[0])*(g[3]-g[1]) + (p[2]-p[0])*(p[3]-p[1]) - inter)
        return inter / max(u, 1e-9)

    def tally(stat, pred, gts):
        matched = set()
        for g in gts:
            best, bi = 0.0, -1
            for pi, p in enumerate(pred):
                if pi in matched:
                    continue
                v = iou(g, p)
                if v > best:
                    best, bi = v, pi
            if best >= 0.5:
                stat[0] += 1
                matched.add(bi)
            else:
                stat[2] += 1
        stat[1] += len(pred) - len(matched)

    for j in range(80):
        k, sub = jax.random.split(k)
        cam = dt.TRAIN_CAM if j % 2 == 0 else dt.TRAIN_CAM_43
        rgb, boxes, labels, vis = dt.sample_batch(sub, 1, eval_planes, cam)
        allb, _, pmap, obj2d = det.detect(rgb[0], 300, 300)
        pb = np.asarray(allb.xyxy)
        pc = np.asarray(allb.cls)
        ps = np.asarray(allb.score)
        pv = np.asarray(allb.valid)
        gt_b = np.asarray(boxes[0]) * 300.0
        gt_l = np.asarray(labels[0])
        gt_v = np.asarray(vis[0])
        for c in classes:
            pred = pb[pv & (pc == c) & (ps > gates[c])]
            gts = gt_b[gt_v & (gt_l == c)]
            tally(stats[c], pred, gts)
            if c == 15:
                tally(stats_p_std,
                      pb[pv & (pc == c) & (ps > extra_person_gate)], gts)

    report = {"steps": args.steps,
              "platform": jax.devices()[0].platform,
              "eval": "held-out synthetic (unseen textures + photometric "
                      "augmentation), IoU 0.5; person at the 0.2 cull "
                      "gate + the 0.5 standard gate, others at 0.5",
              "classes": {}}
    for c, name in classes.items():
        tp, fp, fn = stats[c]
        rec = tp / max(tp + fn, 1)
        prec = tp / max(tp + fp, 1)
        report["classes"][name] = {"recall": round(rec, 3),
                                   "precision": round(prec, 3),
                                   "gate": gates[c],
                                   "tp": tp, "fp": fp, "fn": fn}
        print(f"held-out {name}@{gates[c]}: recall {rec:.3f} "
              f"precision {prec:.3f} (tp={tp} fp={fp} fn={fn})")
    tp, fp, fn = stats_p_std
    report["classes"]["person@0.5"] = {
        "recall": round(tp / max(tp + fn, 1), 3),
        "precision": round(tp / max(tp + fp, 1), 3),
        "gate": extra_person_gate, "tp": tp, "fp": fp, "fn": fn}
    print(f"held-out person@0.5: recall {tp/max(tp+fn,1):.3f} "
          f"precision {tp/max(tp+fp,1):.3f}")
    rep_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "DETECTOR.json")
    with open(rep_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {rep_path}")


if __name__ == "__main__":
    main()

"""Build the packaged BoW vocabulary asset from a synthetic ORB corpus.

The reference ships ORBvoc (a DBoW2 tree trained offline on a large image
corpus, loaded at startup — /root/reference/src/sg-slam/src/System.cc:65-80).
This framework's descriptors use its own BRIEF pattern, so the asset is
rebuilt here: harvest descriptors from a diverse set of synthetic scenes
(both room layouts, several trajectories, varied texture seeds), then run
hierarchical binary k-means (models/vocab.train_vocab) and persist npz.

Usage: python tools/build_vocab.py [out.npz]
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_sgslam"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sgslam_tpu import config  # noqa: E402
from sgslam_tpu.io import synthetic  # noqa: E402
from sgslam_tpu.models import vocab as vocab_mod  # noqa: E402
from sgslam_tpu.slam import tracking  # noqa: E402


def _vary(planes, seed_offset: float):
    return tuple(synthetic.Plane(p.nx, p.ny, p.nz, p.d,
                                 p.tex_seed + seed_offset)
                 for p in planes)


def harvest(frames_per_scene: int = 16) -> np.ndarray:
    cfg = config.synthetic_config(
        width=320, height=240,
        orb=config.OrbConfig(n_features=600, max_keypoints=640))
    out = []
    scenes = []
    for off in (0.0, 11.0, 23.0, 37.0):
        scenes.append((_vary(synthetic.ROOM, off),
                       synthetic.make_trajectory(frames_per_scene)))
        scenes.append((_vary(synthetic.ROOM_CLOSED, off + 5.0),
                       synthetic.make_circuit_trajectory(frames_per_scene)))
    for planes, poses in scenes:
        seq = synthetic.SyntheticSequence(cfg.camera,
                                          n_frames=frames_per_scene,
                                          planes=planes, poses=poses)
        for i in range(frames_per_scene):
            gray, depth = seq.frame(i)
            feats = tracking.extract_frame(cfg, gray, depth)
            v = np.asarray(feats.valid)
            out.append(np.asarray(feats.desc)[v])
    descs = np.concatenate(out)
    print(f"harvested {len(descs)} descriptors from {len(scenes)} scenes")
    return descs


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "sgslam_tpu", "assets", "vocab.npz")
    descs = harvest()
    voc = vocab_mod.train_vocab(descs, branching=10, depth=4, seed=0)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    vocab_mod.save_vocab(out_path, voc)
    # quick self-check: quantization spreads across many words
    words = np.asarray(vocab_mod.quantize(
        voc, jnp.asarray(descs[:4096]), jnp.ones(4096, bool)))
    print(f"saved {out_path} ({os.path.getsize(out_path)} bytes); "
          f"{len(np.unique(words))} distinct words over 4096 descriptors")


if __name__ == "__main__":
    main()

"""The packaged trained vocabulary (sgslam_tpu/assets/vocab.npz, built by
tools/build_vocab.py) must load, quantize with good word spread, and beat
the LSH random tree on place-recognition recall — the reason the reference
ships a trained ORBvoc binary instead of a random tree
(TemplatedVocabulary.h:1467)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgslam_tpu import config
from sgslam_tpu.io import synthetic
from sgslam_tpu.models import vocab as vocab_mod
from sgslam_tpu.slam import tracking

CFG = config.synthetic_config(
    width=320, height=240,
    orb=config.OrbConfig(n_features=600, max_keypoints=640))


def test_default_vocab_is_trained_asset():
    voc = vocab_mod.default_vocab()
    # trained idf varies across words; the random fallback is all-ones
    idf = np.asarray(voc.word_idf)
    assert idf.std() > 0.01, "default vocab looks like the random fallback"


def test_save_load_roundtrip(tmp_path):
    voc = vocab_mod.random_vocab(seed=3)
    p = str(tmp_path / "v.npz")
    vocab_mod.save_vocab(p, voc)
    voc2 = vocab_mod.load_vocab(p)
    assert voc2.depth == voc.depth and voc2.n_words == voc.n_words
    for a, b in zip(voc.level_desc, voc2.level_desc):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.fixture(scope="module")
def place_frames():
    """BoW-ready descriptor blocks from a circuit: same-place pairs
    (frame i and its revisit) vs different-place pairs."""
    n = 24
    poses = synthetic.make_circuit_trajectory(n, loops=2.0)  # two laps
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=n,
                                      planes=synthetic.ROOM_CLOSED,
                                      poses=poses)
    blocks = []
    for i in range(n):
        g, d = seq.frame(i)
        f = tracking.extract_frame(CFG, g, d)
        blocks.append((f.desc, f.valid))
    return blocks


def _recall(voc, blocks):
    """Top-1 retrieval: for each frame of lap 2, is the best-scoring lap-1
    frame the true revisit (±1 frame)?"""
    half = len(blocks) // 2
    bows = [vocab_mod.bow_vector(voc, vocab_mod.quantize(voc, d, v))
            for d, v in blocks]
    db = jnp.stack(bows[:half])
    hits = 0
    for j in range(half, len(blocks)):
        scores = np.asarray(vocab_mod.l1_score(bows[j], db))
        true = j - half
        hits += int(abs(int(scores.argmax()) - true) <= 1)
    return hits / half


def test_trained_vocab_beats_random_on_recall(place_frames):
    trained = vocab_mod.default_vocab()
    rand = vocab_mod.random_vocab()
    r_trained = _recall(trained, place_frames)
    r_rand = _recall(rand, place_frames)
    assert r_trained >= 0.75, f"trained-vocab recall {r_trained:.2f}"
    assert r_trained >= r_rand, (r_trained, r_rand)

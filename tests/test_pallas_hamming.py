"""The Pallas-tiled and MXU bit-matmul Hamming kernels must agree
bit-for-bit with the portable XLA reference (matching/hamming.py). On the
CPU test mesh the Pallas kernel runs in interpret mode; on TPU it compiles
to a Mosaic kernel."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgslam_tpu.matching.hamming import hamming_matrix
from sgslam_tpu.ops import pallas_hamming as ph


@pytest.fixture
def descs(rng):
    a = rng.integers(0, 2 ** 32, size=(200, 8), dtype=np.uint64).astype(
        np.uint32)
    b = rng.integers(0, 2 ** 32, size=(333, 8), dtype=np.uint64).astype(
        np.uint32)
    return jnp.asarray(a), jnp.asarray(b)


def test_mxu_matches_reference(descs):
    a, b = descs
    ref = np.asarray(hamming_matrix(a, b))
    out = np.asarray(ph.hamming_matrix_mxu(a, b))
    np.testing.assert_array_equal(out, ref)


def test_pallas_matches_reference(descs):
    a, b = descs
    ref = np.asarray(hamming_matrix(a, b))
    out = np.asarray(ph.hamming_matrix_pallas(a, b, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_pallas_exact_tile_sizes(rng):
    a = jnp.asarray(rng.integers(0, 2 ** 32, size=(128, 8),
                                 dtype=np.uint64).astype(np.uint32))
    ref = np.asarray(hamming_matrix(a, a))
    out = np.asarray(ph.hamming_matrix_pallas(a, a, interpret=True))
    np.testing.assert_array_equal(out, ref)
    assert out.shape == (128, 128)
    assert (np.diag(out) == 0).all()

"""Batched 256-bit Hamming distance between packed ORB descriptors.

Replaces ORBmatcher::DescriptorDistance's 32-byte popcount loop
(/root/reference/src/sg-slam/src/ORBmatcher.cc:1649-1665) with a full
distance-matrix computation: XOR + `lax.population_count` + reduction, fused
by XLA into a single VPU program. Descriptors are [*, 8] uint32 (256 bits).

A Pallas-tiled variant lives in ops/pallas_hamming.py for the hot
frame-to-map path; this XLA version is the portable reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_DIST = 256


def hamming_matrix_xla(a, b):
    """Portable XLA formulation: XOR + popcount + reduce on the VPU."""
    x = a[:, None, :] ^ b[None, :, :]
    return jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)


def hamming_matrix(a, b):
    """a: [N,8] uint32, b: [M,8] uint32 -> [N,M] int32 distances.

    On TPU this routes to the MXU bit-matmul formulation
    (ops/pallas_hamming.hamming_matrix_mxu): popcount(a^b) =
    |a| + |b| - 2*(bits_a @ bits_b^T), one bf16 matmul instead of an
    [N,M,8] popcount intermediate — the production hot path for every
    association search (ORBmatcher role). On CPU (tests) the portable
    XLA popcount wins. Both are exact and bit-identical
    (tests/test_pallas_hamming.py).
    """
    import os

    mode = os.environ.get("SGSLAM_HAMMING", "")   # bench-sweep override
    if mode == "xla":
        return hamming_matrix_xla(a, b)
    if mode == "pallas":
        from ..ops.pallas_hamming import hamming_matrix_pallas

        return hamming_matrix_pallas(a, b)
    if mode == "mxu" or jax.default_backend() != "cpu":
        from ..ops.pallas_hamming import hamming_matrix_mxu

        return hamming_matrix_mxu(a, b)
    return hamming_matrix_xla(a, b)


def hamming_pairs(a, b):
    """Rowwise distance between aligned descriptor arrays [N,8]."""
    x = a ^ b
    return jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)


def masked_best_two(dist, row_mask, col_mask):
    """Per-row best and second-best over a masked distance matrix.

    dist: [N,M] int32; row_mask: [N] bool; col_mask: [N,M] or [M] bool.
    Returns (best_idx [N], best [N], second [N]) with MAX_DIST fill.
    """
    if col_mask.ndim == 1:
        col_mask = jnp.broadcast_to(col_mask[None, :], dist.shape)
    d = jnp.where(col_mask & row_mask[:, None], dist, MAX_DIST)
    best_idx = jnp.argmin(d, axis=1)
    best = jnp.take_along_axis(d, best_idx[:, None], axis=1)[:, 0]
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(MAX_DIST)
    second = jnp.min(d2, axis=1)
    return best_idx, best, second

"""Fused VQ kernel vs the XLA reference path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vectorquantizedcpc_tpu.models.vq import nearest_code_indices
from vectorquantizedcpc_tpu.ops.vq_kernels import vq_encode_fused


@pytest.mark.parametrize("n", [64, 512, 700])  # incl. non-tile-multiple
def test_matches_xla_argmin(rng, n):
    m, d = 64, 16
    emb = jnp.asarray((rng.normal(size=(m, d)) * 0.5).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    idx_ref = nearest_code_indices(emb, x)
    idx, q = vq_encode_fused(emb, x, tile_n=256, interpret=True)

    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(
        np.asarray(q), np.asarray(jnp.take(emb, idx_ref, axis=0)), atol=1e-6
    )


def test_tie_breaks_to_lowest_index():
    # Duplicate codes: argmin must return the FIRST (reference semantics).
    emb = jnp.asarray(
        np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]], np.float32)
    )
    x = jnp.asarray(np.array([[0.9, 0.1]], np.float32))
    idx, _ = vq_encode_fused(emb, x, tile_n=8, interpret=True)
    assert int(idx[0]) == 0

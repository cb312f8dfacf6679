"""Streaming encode == full-length encode, bit for bit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vectorquantizedcpc_tpu.configs import ConfEncoder
from vectorquantizedcpc_tpu.infer.streaming import StreamingEncoder, encode_streaming
from vectorquantizedcpc_tpu.models.encoder import encoder_encode, encoder_init

CONF = ConfEncoder(in_channels=8, channels=16, n_embeddings=24, z_dim=4, c_dim=6)


@pytest.fixture(scope="module")
def enc():
    return encoder_init(jax.random.key(0), CONF)


@pytest.mark.parametrize("t", [40, 64, 77, 130])  # incl. non-chunk-multiples
def test_streaming_matches_full(enc, rng, t):
    params, vq_state = enc
    mel = rng.normal(size=(8, t)).astype(np.float32)
    t_even = (t // 2) * 2

    z_full, c_full, idx_full = encoder_encode(
        params, vq_state, jnp.asarray(mel[None, :, :t_even])
    )
    z_s, c_s, idx_s = encode_streaming(params, vq_state, mel, chunk_frames=32)

    assert idx_s.shape == idx_full.shape
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_full))
    np.testing.assert_allclose(np.asarray(c_s), np.asarray(c_full), atol=1e-5)
    np.testing.assert_allclose(np.asarray(z_s), np.asarray(z_full), atol=1e-6)


def test_incremental_pushes(enc, rng):
    """Arbitrary push granularity (streaming mic input) gives same result."""
    params, vq_state = enc
    mel = rng.normal(size=(8, 100)).astype(np.float32)

    stream = StreamingEncoder(params, vq_state, chunk_frames=16)
    outs = []
    for start in [0, 7, 20, 33, 70]:
        end = [7, 20, 33, 70, 100][[0, 7, 20, 33, 70].index(start)]
        out = stream.push(mel[:, start:end])
        if out is not None:
            outs.append(out)
    out = stream.flush()
    if out is not None:
        outs.append(out)
    idx_s = jnp.concatenate([o[2] for o in outs], axis=1)

    _, _, idx_full = encoder_encode(params, vq_state, jnp.asarray(mel[None]))
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_full))


def test_single_compile_across_chunks(enc, rng):
    """Interior chunks reuse ONE executable (fixed window shape)."""
    params, vq_state = enc
    stream = StreamingEncoder(params, vq_state, chunk_frames=16)
    n_before = stream._encode_window._cache_size()
    stream.push(rng.normal(size=(8, 200)).astype(np.float32))
    # first-chunk shape + interior shape = at most 2 compilations.
    assert stream._encode_window._cache_size() - n_before <= 2

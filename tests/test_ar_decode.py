"""Fused AR decode kernel vs lax.scan reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vectorquantizedcpc_tpu.configs import load_conf
from vectorquantizedcpc_tpu.models.vocoder import vocoder_generate, vocoder_init
from vectorquantizedcpc_tpu.ops.ar_decode import fused_ar_decode


@pytest.fixture(scope="module")
def setup():
    conf = load_conf(
        [
            "size_latent_codebook=16",
            "dim_latent=8",
            "training_vocoder.model.n_speakers=4",
            "training_vocoder.model.network.dim_speaker_embedding=8",
            "training_vocoder.model.network.rnnms.dim_voc_latent=16",
            "training_vocoder.model.network.rnnms.wave_ar.size_i_embed_ar=16",
            "training_vocoder.model.network.rnnms.wave_ar.size_h_rnn=32",
            "training_vocoder.model.network.rnnms.wave_ar.size_h_fc=16",
            "data.dataset.mel_stft_stride=8",
        ]
    )
    net = conf.training_vocoder.model.network
    params = vocoder_init(jax.random.key(0), net)
    return params, net


def test_greedy_matches_scan_reference(setup, rng):
    """Deterministic argmax decode: fused kernel == lax.scan, step for step.

    Any divergence in the GRU wiring, embedding staging, initial state, or
    chunk boundary handling would desynchronize the AR recursion and show
    up immediately.
    """
    params, net = setup
    z = jnp.asarray(rng.integers(0, 16, size=(2, 6)))
    spk = jnp.asarray([1, 3])

    ref = vocoder_generate(params, net, z, spk, jax.random.key(5), greedy=True)
    fused = fused_ar_decode(
        params, net, z, spk, jax.random.key(5), chunk=16, greedy=True,
        interpret=True,
    )
    # 6 codes -> x2 -> 12 frames -> x8 -> 96 samples; chunk 16 divides 96.
    assert fused.shape == ref.shape == (2, 96)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-2)
    # Mu-law codes must agree exactly for a true parity claim.
    exact = np.mean(np.asarray(fused) == np.asarray(ref))
    assert exact > 0.95, f"only {exact:.1%} of samples identical"


def test_greedy_chunk_padding(setup, rng):
    """T not divisible by chunk: padded steps must not corrupt real ones."""
    params, net = setup
    z = jnp.asarray(rng.integers(0, 16, size=(1, 5)))  # 80 samples
    spk = jnp.asarray([0])
    ref = vocoder_generate(params, net, z, spk, jax.random.key(1), greedy=True)
    fused = fused_ar_decode(
        params, net, z, spk, jax.random.key(1), chunk=64, greedy=True,
        interpret=True,
    )
    assert fused.shape == (1, 80)
    exact = np.mean(np.asarray(fused) == np.asarray(ref))
    assert exact > 0.95


def test_sampled_decode_plausible(setup, rng):
    """Stochastic mode runs and yields valid audio.

    NOTE: the Pallas TPU *interpreter* stubs prng_random_bits with constant
    bits, so seed-variation can only be asserted on real hardware (covered
    by bench.py's sanity check); here we check the sampling path compiles
    and produces in-range output.
    """
    params, net = setup
    z = jnp.asarray(rng.integers(0, 16, size=(1, 6)))
    spk = jnp.asarray([2])
    w1 = fused_ar_decode(params, net, z, spk, jax.random.key(1), chunk=32,
                         interpret=True)
    assert w1.shape == (1, 96)
    assert float(jnp.abs(w1).max()) <= 1.0


def test_int8_quantization_roundtrip(rng):
    from vectorquantizedcpc_tpu.ops.quant import (
        dequantize,
        quantization_error,
        quantize_int8,
    )

    w = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
    q = quantize_int8(w)
    assert q.values.dtype == jnp.int8
    assert q.scale.shape == (1, 96)
    err = float(jnp.abs(dequantize(q) - w).max())
    # Max error bounded by half a quantization step per column.
    per_col_step = np.asarray(q.scale)[0]
    assert err <= per_col_step.max() * 0.5 + 1e-6
    assert quantization_error(w) < 0.01


def test_int8_decode_close_to_bf16(setup, rng):
    """Weight-only INT8 greedy decode stays close to the bf16 path."""
    params, net = setup
    z = jnp.asarray(rng.integers(0, 16, size=(1, 6)))
    spk = jnp.asarray([1])
    ref = fused_ar_decode(params, net, z, spk, jax.random.key(3), chunk=32,
                          greedy=True, interpret=True)
    w8 = fused_ar_decode(params, net, z, spk, jax.random.key(3), chunk=32,
                         greedy=True, precision="int8", interpret=True)
    assert w8.shape == ref.shape
    assert float(jnp.abs(w8).max()) <= 1.0
    # AR recursions can diverge after a quantization-induced flip, but the
    # early samples (shared prefix) must agree.
    agree = np.mean(np.asarray(w8) == np.asarray(ref))
    assert agree > 0.5, f"int8/bf16 agreement only {agree:.1%}"

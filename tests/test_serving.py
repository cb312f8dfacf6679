"""Segmented decode state handoff + continuous-batching server exactness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vectorquantizedcpc_tpu.configs import load_conf
from vectorquantizedcpc_tpu.infer.serving import ContinuousBatcher
from vectorquantizedcpc_tpu.models.vocoder import (
    build_conditioning_frames,
    vocoder_init,
)
from vectorquantizedcpc_tpu.ops.ar_decode import (
    fused_ar_decode,
    fused_ar_decode_segment,
    init_decode_state,
    prep_decode_weights,
    project_cond_frames,
)


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


def test_segment_chaining_matches_single_shot(setup, rng):
    """Greedy decode in 3 chained segments == one-shot fused decode.

    Proves the state handoff (GRU hidden + previous sample) is exact across
    segment boundaries — the property continuous batching rests on.
    """
    params, net = setup
    z = jnp.asarray(rng.integers(0, 16, size=(2, 12)))  # -> 24 frames
    spk = jnp.asarray([0, 2])
    hop = net.rnnms.upsampling_t

    single = fused_ar_decode(
        params, net, z, spk, jax.random.key(7), greedy=True, interpret=True
    )

    weights = prep_decode_weights(params, net)
    cond = project_cond_frames(
        weights, build_conditioning_frames(params, net, z, spk)
    )  # (2, 24, 3H)
    state = init_decode_state(2, net)
    outs = []
    for s0 in range(0, 24, 8):
        seg, state = fused_ar_decode_segment(
            weights,
            net,
            cond[:, s0 : s0 + 8],
            state,
            jax.random.key(0),
            greedy=True,
            interpret=True,
        )
        outs.append(np.asarray(seg))
    chained = np.concatenate(outs, axis=1)  # mu-law classes (2, 24*hop)

    from vectorquantizedcpc_tpu.dsp.mulaw import mulaw_decode

    # Decode classes -> wave through the same jnp path as fused_ar_decode:
    # the numpy expm1 differs from XLA's by 1 ulp, which would fail the
    # bit-exactness assertion for reasons unrelated to the kernel.
    chained_wave = np.asarray(mulaw_decode(jnp.asarray(chained), 256))
    assert chained_wave.shape == single.shape == (2, 24 * hop)
    np.testing.assert_array_equal(chained_wave, np.asarray(single))


def test_continuous_batcher_matches_single_shot(setup, rng):
    """Streams of different lengths, admitted as slots free, decode to
    exactly the single-shot result, independent of co-resident streams."""
    params, net = setup
    requests = [
        (rng.integers(0, 16, size=(n_codes,)), int(spk))
        for n_codes, spk in [(8, 0), (12, 1), (4, 3), (10, 2), (6, 1)]
    ]

    server = ContinuousBatcher(
        params, net, slots=2, segment_frames=4, max_frames=64,
        greedy=True, interpret=True,
    )
    rids = [server.submit(z, s) for z, s in requests]
    waves = server.run()
    assert set(waves) == set(rids)
    assert server.stats["samples_out"] == sum(
        2 * len(z) * net.rnnms.upsampling_t for z, _ in requests
    )

    for rid, (z, spk) in zip(rids, requests):
        single = np.asarray(
            fused_ar_decode(
                params,
                net,
                jnp.asarray(z)[None],
                jnp.asarray([spk]),
                jax.random.key(0),
                greedy=True,
                interpret=True,
            )[0]
        )
        np.testing.assert_array_equal(waves[rid], single)


def test_continuous_batcher_sharded_matches_single_shot(setup, rng):
    """Pod-slice serving: slots sharded over the mesh data axis decode the
    same bits as the single-device batcher / single-shot decode."""
    from vectorquantizedcpc_tpu.parallel.mesh import make_mesh

    params, net = setup
    mesh = make_mesh(data=4, model=1)
    requests = [
        (rng.integers(0, 16, size=(n_codes,)), int(spk))
        for n_codes, spk in [(8, 0), (12, 1), (4, 3), (10, 2), (6, 1), (8, 2)]
    ]

    server = ContinuousBatcher(
        params, net, slots=4, segment_frames=4, max_frames=64,
        greedy=True, interpret=True, mesh=mesh,
    )
    rids = [server.submit(z, s) for z, s in requests]
    waves = server.run()
    assert set(waves) == set(rids)

    for rid, (z, spk) in zip(rids, requests):
        single = np.asarray(
            fused_ar_decode(
                params,
                net,
                jnp.asarray(z)[None],
                jnp.asarray([spk]),
                jax.random.key(0),
                greedy=True,
                interpret=True,
            )[0]
        )
        np.testing.assert_array_equal(waves[rid], single)


def test_incremental_then_drain_matches_single_shot(setup, rng):
    """step() a few segments (incremental path), then run(): the planned
    drain must seed in-flight slots with their carried state AND their
    already-decoded prefix, producing the exact single-shot waves."""
    params, net = setup
    requests = [
        (rng.integers(0, 16, size=(n_codes,)), int(spk))
        for n_codes, spk in [(10, 0), (6, 2), (12, 1), (4, 3)]
    ]
    server = ContinuousBatcher(
        params, net, slots=2, segment_frames=4, max_frames=64,
        greedy=True, interpret=True,
    )
    rids = [server.submit(z, s) for z, s in requests]
    server.step()  # two streams in flight, partially decoded
    server.step()
    waves = server.run()  # drains in-flight + still-queued
    assert set(waves) == set(rids)
    for rid, (z, spk) in zip(rids, requests):
        single = np.asarray(
            fused_ar_decode(
                params, net, jnp.asarray(z)[None], jnp.asarray([spk]),
                jax.random.key(0), greedy=True, interpret=True,
            )[0]
        )
        np.testing.assert_array_equal(waves[rid], single)


def test_chunk_size_decomposition():
    from vectorquantizedcpc_tpu.infer.serving import _chunk_sizes

    for n in (1, 2, 3, 7, 11, 64, 65, 200):
        sizes = _chunk_sizes(n)
        assert sum(sizes) == n
        assert all(s & (s - 1) == 0 for s in sizes), sizes  # powers of two
        assert max(sizes) <= 64
    assert _chunk_sizes(0) == []


def test_batcher_rejects_oversized(setup):
    """Over-length requests fail at submit(), before anything is in flight
    (rejecting mid-drain would lose other streams' results)."""
    params, net = setup
    server = ContinuousBatcher(
        params, net, slots=1, segment_frames=4, max_frames=8,
        greedy=True, interpret=True,
    )
    with pytest.raises(ValueError, match="max_frames"):
        server.submit(np.zeros(32, np.int32), 0)


def test_drain_wait_false_results_match(setup, rng):
    """run(materialize=False, wait=False) enqueues the whole drain without
    the final device sync (the RTT-amortized bench boundary); results
    fetched afterwards are identical to a fully-waited drain."""
    params, net = setup
    requests = [
        (rng.integers(0, 16, size=(n_codes,)), int(spk))
        for n_codes, spk in [(6, 0), (4, 1), (8, 2)]
    ]

    def run_once(wait):
        server = ContinuousBatcher(
            params, net, slots=2, segment_frames=4, max_frames=32,
            greedy=True, interpret=True,
        )
        rids = [server.submit(z, s) for z, s in requests]
        server.run(materialize=False, wait=wait)
        return [np.asarray(server.result(r)) for r in rids]

    waved = run_once(True)
    lazy = run_once(False)
    for a, b in zip(waved, lazy):
        np.testing.assert_array_equal(a, b)

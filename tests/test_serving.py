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


def test_vectorized_schedule_matches_stepwise():
    """compute_drain_schedule (heap + numpy span fill, O(requests)) must
    reproduce the original stepwise FIFO-into-freed-slots admission loop
    exactly — tables, reassembly map, pos0 map, and valid count — across
    random mixes including inflight slot occupants."""
    import numpy as np

    from vectorquantizedcpc_tpu.infer.serving import compute_drain_schedule

    def stepwise(s_count, sf, hop, slots_live, queued, rid_row):
        from collections import deque

        slots_live = [None if a is None else list(a) for a in slots_live]
        q = deque(queued)
        rid_sched, rid_pos0 = {}, {}
        for i in range(s_count):
            a = slots_live[i]
            if a is not None:
                rid_sched[a[0]] = (i, 0, -(-(a[3] - a[2]) // sf))
        rows_t, pos_t, fresh_t = [], [], []
        valid = 0
        while q or any(a is not None for a in slots_live):
            step_idx = len(rows_t)
            rows = np.full(s_count, -1, np.int32)
            pos = np.zeros(s_count, np.int32)
            fresh = np.zeros(s_count, np.bool_)
            for i in range(s_count):
                if slots_live[i] is None and q:
                    rid, r, total = q.popleft()
                    slots_live[i] = [rid, r, 0, total]
                    rid_pos0[rid] = 0
                    rid_sched[rid] = (i, step_idx, -(-total // sf))
                    fresh[i] = True
                a = slots_live[i]
                if a is not None:
                    rows[i], pos[i] = a[1], a[2]
            rows_t.append(rows)
            pos_t.append(pos)
            fresh_t.append(fresh)
            for i in range(s_count):
                a = slots_live[i]
                if a is None:
                    continue
                valid += min(a[3] - a[2], sf) * hop
                a[2] += sf
                if a[2] >= a[3]:
                    slots_live[i] = None
        return (
            np.stack(rows_t) if rows_t else np.zeros((0, s_count), np.int32),
            np.stack(pos_t) if pos_t else np.zeros((0, s_count), np.int32),
            np.stack(fresh_t) if fresh_t else np.zeros((0, s_count), bool),
            rid_sched,
            rid_pos0,
            valid,
        )

    rng = np.random.default_rng(11)
    for trial in range(30):
        s_count = int(rng.integers(1, 9))
        sf = int(rng.choice([2, 4, 8]))
        hop = 160
        rid = 0
        slots_live = [None] * s_count
        for i in range(s_count):
            if rng.random() < 0.4:
                total = int(rng.integers(1, 40))
                pos = int(rng.integers(0, total))
                pos -= pos % sf  # pos advances in sf quanta
                slots_live[i] = [rid, i, pos, total]
                rid += 1
        rid_row = {r: a[1] for a in slots_live if a is not None
                   for r in [a[0]]}
        queued = []
        lens = sorted(
            (int(rng.integers(1, 60)) for _ in range(int(rng.integers(0, 20)))),
            reverse=True,
        )
        for total in lens:
            rid_row[rid] = 100 + rid
            queued.append((rid, 100 + rid, total))
            rid += 1

        got = compute_drain_schedule(
            s_count, sf, hop, slots_live, list(queued), rid_row
        )
        want = stepwise(s_count, sf, hop, slots_live, list(queued), rid_row)
        np.testing.assert_array_equal(got[0], want[0], err_msg=f"rows t{trial}")
        np.testing.assert_array_equal(got[1], want[1], err_msg=f"pos t{trial}")
        np.testing.assert_array_equal(got[2], want[2], err_msg=f"fresh t{trial}")
        assert got[3] == want[3], f"rid_sched t{trial}"
        assert got[4] == want[4], f"rid_pos0 t{trial}"
        assert got[5] == want[5], f"valid t{trial}"

"""Vocoder tests: shapes, AR/teacher-forcing consistency, conditioning."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vectorquantizedcpc_tpu.configs import load_conf
from vectorquantizedcpc_tpu.models.vocoder import (
    build_conditioning,
    vocoder_forward,
    vocoder_generate,
    vocoder_init,
)


@pytest.fixture(scope="module")
def small_conf():
    conf = load_conf(
        [
            "size_latent_codebook=12",
            "dim_latent=8",
            "training_vocoder.model.n_speakers=4",
            "training_vocoder.model.network.dim_speaker_embedding=6",
            "training_vocoder.model.network.rnnms.dim_voc_latent=16",
            "training_vocoder.model.network.rnnms.wave_ar.size_i_embed_ar=10",
            "training_vocoder.model.network.rnnms.wave_ar.size_h_rnn=20",
            "training_vocoder.model.network.rnnms.wave_ar.size_h_fc=12",
            "data.dataset.mel_stft_stride=4",  # tiny upsampling for tests
        ]
    )
    return conf.training_vocoder.model.network


@pytest.fixture(scope="module")
def params(small_conf):
    return vocoder_init(jax.random.key(0), small_conf)


def test_conditioning_shapes(params, small_conf, rng):
    z = jnp.asarray(rng.integers(0, 12, size=(2, 5)))
    spk = jnp.asarray([0, 3])
    cond = build_conditioning(params, small_conf, z, spk)
    # 5 codes -> x2 -> 10 frames -> x4 hop -> 40 samples; dim_voc_latent=16.
    assert cond.shape == (2, 40, 16)


def test_forward_logit_shapes(params, small_conf, rng):
    z = jnp.asarray(rng.integers(0, 12, size=(2, 5)))
    spk = jnp.asarray([1, 2])
    x = jnp.asarray(rng.integers(0, 256, size=(2, 40)))
    logits = vocoder_forward(params, small_conf, x, z, spk)
    assert logits.shape == (2, 40, 256)
    assert logits.dtype == jnp.float32


def test_generate_shapes_and_range(params, small_conf, rng):
    z = jnp.asarray(rng.integers(0, 12, size=(2, 5)))
    spk = jnp.asarray([0, 1])
    wave = vocoder_generate(params, small_conf, z, spk, jax.random.key(1))
    assert wave.shape == (2, 40)
    assert float(jnp.abs(wave).max()) <= 1.0


def test_generate_deterministic_given_key(params, small_conf, rng):
    z = jnp.asarray(rng.integers(0, 12, size=(1, 4)))
    spk = jnp.asarray([2])
    w1 = vocoder_generate(params, small_conf, z, spk, jax.random.key(7))
    w2 = vocoder_generate(params, small_conf, z, spk, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    w3 = vocoder_generate(params, small_conf, z, spk, jax.random.key(8))
    assert not np.array_equal(np.asarray(w1), np.asarray(w3))


def test_ar_teacher_forcing_consistency(params, small_conf, rng):
    """Teacher-forcing the generated samples reproduces generate's logits.

    generate: input_t = [embed(s_{t-1}), cond_t] -> h_t -> logits_t.
    forward on x = [s0_init, s_1..s_{T-1}] runs the identical recursion, so
    its logits must match step for step. This pins the AR loop's wiring
    (embedding split, projection hoisting, initial state).
    """
    z = jnp.asarray(rng.integers(0, 12, size=(1, 4)))
    spk = jnp.asarray([0])
    wave, samples, gen_logits = vocoder_generate(
        params, small_conf, z, spk, jax.random.key(3), return_aux=True
    )
    n_classes = 256
    teacher = jnp.concatenate(
        [jnp.full((1, 1), n_classes // 2, jnp.int32), samples[:, :-1]], axis=1
    )
    fwd_logits = vocoder_forward(params, small_conf, teacher, z, spk)
    np.testing.assert_allclose(
        np.asarray(fwd_logits), np.asarray(gen_logits), atol=1e-4
    )


def test_speaker_changes_output(params, small_conf, rng):
    """Voice conversion premise: same codes + different speaker -> different audio."""
    z = jnp.asarray(rng.integers(0, 12, size=(1, 4)))
    c1 = build_conditioning(params, small_conf, z, jnp.asarray([0]))
    c2 = build_conditioning(params, small_conf, z, jnp.asarray([3]))
    assert not np.allclose(np.asarray(c1), np.asarray(c2))


def test_forward_grad_flows(params, small_conf, rng):
    z = jnp.asarray(rng.integers(0, 12, size=(2, 4)))
    spk = jnp.asarray([0, 1])
    x = jnp.asarray(rng.integers(0, 256, size=(2, 32)))
    target = jnp.asarray(rng.integers(0, 256, size=(2, 32)))

    def loss_fn(p):
        logits = vocoder_forward(p, small_conf, x, z, spk)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, target[..., None], axis=-1))

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g.ar_gru.wx).sum()) > 0
    assert float(jnp.abs(g.code_embedding).sum()) > 0
    assert float(jnp.abs(g.prenet_fwd[0].wx).sum()) > 0


def test_ragged_conditioning_bit_exact(params, small_conf, rng):
    """build_conditioning_frames_ragged on a padded mixed-length batch is
    BIT-IDENTICAL to per-row build_conditioning_frames on each row's valid
    prefix (the serving drain's single-dispatch conditioning contract)."""
    from vectorquantizedcpc_tpu.models.vocoder import (
        build_conditioning_frames,
        build_conditioning_frames_ragged,
    )

    n_codes = [3, 7, 5, 7, 1]
    max_codes = 8
    g = len(n_codes)
    zs = np.zeros((g, max_codes), np.int32)
    spks = np.asarray([i % 4 for i in range(g)], np.int32)
    for i, n in enumerate(n_codes):
        zs[i, :n] = rng.integers(0, 12, size=(n,))
    n_frames = jnp.asarray([2 * n for n in n_codes], jnp.int32)

    ragged = build_conditioning_frames_ragged(
        params, small_conf, jnp.asarray(zs), jnp.asarray(spks), n_frames
    )
    assert ragged.shape[1] == 2 * max_codes
    assert np.isfinite(np.asarray(ragged)).all()

    for i, n in enumerate(n_codes):
        solo = build_conditioning_frames(
            params, small_conf,
            jnp.asarray(zs[i : i + 1, :n]), jnp.asarray(spks[i : i + 1]),
        )
        # The flip construction is exact; the only residual is XLA picking
        # a different matmul reduction strategy for the (G, T_pad) batch
        # shape than for the (1, 2n) solo shape — 1-ulp f32 noise. (The
        # greedy/deterministic serving mode therefore keeps per-request
        # singleton conditioning; infer/serving.py.)
        np.testing.assert_allclose(
            np.asarray(ragged[i, : 2 * n]), np.asarray(solo[0]),
            rtol=0, atol=5e-7,
        )


def test_vocoder_multi_step_matches_sequential():
    """make_train_multi_step (K steps in one dispatch,
    training_vocoder.trainer.steps_per_dispatch) reproduces K sequential
    make_train_step calls exactly: same losses, same final params/step."""
    import jax
    import jax.numpy as jnp

    from vectorquantizedcpc_tpu.configs import load_conf
    from vectorquantizedcpc_tpu.models.encoder import encoder_init
    from vectorquantizedcpc_tpu.training import vocoder as voc_train

    conf = load_conf([
        "model.encoder.channels=32",
        "dim_latent=8",
        "dim_cpc_context=16",
        "size_latent_codebook=32",
        "training_vocoder.model.n_speakers=4",
        "training_vocoder.model.network.dim_speaker_embedding=8",
        "training_vocoder.model.network.rnnms.dim_voc_latent=16",
        "training_vocoder.model.network.rnnms.wave_ar.size_i_embed_ar=8",
        "training_vocoder.model.network.rnnms.wave_ar.size_h_rnn=16",
        "training_vocoder.model.network.rnnms.wave_ar.size_h_fc=8",
        "data.dataset.clip_length_mel=4",
        "data.dataset.mel_stft_stride=8",
        "runtime.precision=float32",
    ])
    rng = np.random.default_rng(3)
    enc_params, vq_state = encoder_init(jax.random.key(1), conf.model.encoder)
    k, b = 3, 2
    clip = conf.data.dataset.clip_length_mel
    hop = conf.data.dataset.mel_stft_stride
    audio = rng.integers(0, 256, size=(k, b, clip * hop + 1)).astype(np.int32)
    mels = rng.normal(size=(k, b, 80, clip)).astype(np.float32)
    spk = rng.integers(0, 4, size=(k, b)).astype(np.int32)
    lrs = np.asarray([1e-3, 5e-4, 2e-4], np.float32)

    state_a = voc_train.init_train_state(conf, jax.random.key(2))
    state_b = jax.tree.map(jnp.copy, state_a)

    step = voc_train.make_train_step(conf)
    seq_losses = []
    for i in range(k):
        state_a, m = step(
            state_a, enc_params, vq_state, jnp.asarray(audio[i]),
            jnp.asarray(mels[i]), jnp.asarray(spk[i]), jnp.float32(lrs[i]),
        )
        seq_losses.append(float(m["loss"]))

    multi = voc_train.make_train_multi_step(conf)
    state_b, m_g = multi(
        state_b, enc_params, vq_state, jnp.asarray(audio),
        jnp.asarray(mels), jnp.asarray(spk), jnp.asarray(lrs),
    )
    np.testing.assert_array_equal(
        np.asarray(m_g["loss"]), np.asarray(seq_losses, np.float32)
    )
    assert int(state_b.step) == int(state_a.step) == k
    for a, b_ in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_ragged_conditioning_pallas_close_to_scan(params, small_conf, rng):
    """The serving TPU path's ragged conditioning (all four PreNet GRU
    directions through the fused Pallas kernel in bf16, masked reverse
    for the backward direction) matches the f32 scan formulation on every
    valid prefix at bf16 tolerance — the decode kernel consumes the
    conditioning at bf16, so this is the precision that matters."""
    from vectorquantizedcpc_tpu.models.vocoder import (
        build_conditioning_frames_ragged,
    )

    n_codes = [3, 7, 5, 7, 1, 4]
    max_codes = 8
    g = len(n_codes)
    zs = np.zeros((g, max_codes), np.int32)
    spks = np.asarray([i % 4 for i in range(g)], np.int32)
    for i, n in enumerate(n_codes):
        zs[i, :n] = rng.integers(0, 12, size=(n,))
    n_frames = jnp.asarray([2 * n for n in n_codes], jnp.int32)

    ref = build_conditioning_frames_ragged(
        params, small_conf, jnp.asarray(zs), jnp.asarray(spks), n_frames
    )
    fast = build_conditioning_frames_ragged(
        params, small_conf, jnp.asarray(zs), jnp.asarray(spks), n_frames,
        use_pallas=True, pallas_interpret=True,
    )
    assert fast.dtype == jnp.bfloat16
    for i, n in enumerate(n_codes):
        np.testing.assert_allclose(
            np.asarray(fast[i, : 2 * n], np.float32),
            np.asarray(ref[i, : 2 * n], np.float32),
            atol=3e-2,
        )

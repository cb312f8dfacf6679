"""CPC InfoNCE tests: parity with a naive per-k reference implementation."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vectorquantizedcpc_tpu.configs import ConfCPC
from vectorquantizedcpc_tpu.models.cpc import (
    CPCParams,
    cpc_apply,
    cpc_apply_with_indices,
    cpc_init,
    sample_negative_indices,
)


CONF = ConfCPC(
    n_prediction_steps=12,
    n_speakers_per_batch=2,
    n_utterances_per_speaker=3,
    n_negatives=4,
    z_dim=5,
    c_dim=7,
)


def naive_reference(params, conf, z, c, utt_index, seq_index):
    """Literal numpy transcription of the reference per-k loop
    (model.py:191-316) given fixed negative indices."""
    s, u = conf.n_speakers_per_batch, conf.n_utterances_per_speaker
    k_steps = conf.n_prediction_steps // 2
    t = z.shape[1]
    length = t - k_steps
    z4 = z.reshape(s, u, t, conf.z_dim)
    c_trunc = c[:, :length, :]

    losses, accs = [], []
    for k in range(1, k_steps + 1):
        z_shift = z4[:, :, k : length + k, :]  # (S, U, L, Z)
        wc = (c_trunc @ np.asarray(params.w[k - 1]) + np.asarray(params.b[k - 1]))
        wc = wc.reshape(s, u, length, conf.z_dim)

        spk = np.arange(s).reshape(-1, 1, 1, 1)
        utt = np.asarray(utt_index[k - 1]).reshape(1, u, conf.n_negatives, 1)
        seq = np.asarray(seq_index[k - 1])  # (S, U, Neg, L)
        z_neg = z_shift[spk, utt, seq, :]  # (S, U, Neg, L, Z)

        zs = np.concatenate([z_shift[:, :, None], z_neg], axis=2)
        f = np.sum(zs * wc[:, :, None] / math.sqrt(conf.z_dim), axis=-1)
        f = f.reshape(s * u, conf.n_negatives + 1, length)

        # cross_entropy with all-zero labels over axis 1.
        fmax = f.max(axis=1, keepdims=True)
        logsumexp = fmax[:, 0] + np.log(np.exp(f - fmax).sum(axis=1))
        loss = np.mean(logsumexp - f[:, 0])
        acc = np.mean(f.argmax(axis=1) == 0)
        losses.append(loss)
        accs.append(acc)
    return np.mean(losses), np.array(accs)


@pytest.fixture
def setup(rng):
    params = cpc_init(jax.random.key(0), CONF)
    t = 20
    z = rng.normal(size=(6, t, 5)).astype(np.float32)
    c = rng.normal(size=(6, t, 7)).astype(np.float32)
    return params, z, c


def test_matches_naive_reference(setup):
    params, z, c = setup
    length = z.shape[1] - CONF.n_prediction_steps // 2
    utt_index, seq_index = sample_negative_indices(CONF, jax.random.key(1), length)
    loss, accs = cpc_apply_with_indices(
        params, CONF, jnp.asarray(z), jnp.asarray(c), utt_index, seq_index
    )
    ref_loss, ref_accs = naive_reference(params, CONF, z, c, utt_index, seq_index)
    assert float(loss) == pytest.approx(ref_loss, rel=1e-5)
    np.testing.assert_allclose(np.asarray(accs), ref_accs, atol=1e-6)


def test_param_shapes_full_predictor_stack():
    """All 12 predictors exist (for checkpoint import) but only 6 are used."""
    params = cpc_init(jax.random.key(0), CONF)
    assert params.w.shape == (12, 7, 5)
    assert params.b.shape == (12, 5)


def test_unused_predictors_get_no_gradient(setup):
    params, z, c = setup

    def f(p):
        loss, _ = cpc_apply(p, CONF, jnp.asarray(z), jnp.asarray(c), jax.random.key(2))
        return loss

    g = jax.grad(f)(params)
    k = CONF.n_prediction_steps // 2
    assert float(jnp.abs(g.w[:k]).sum()) > 0
    np.testing.assert_allclose(np.asarray(g.w[k:]), 0.0)


def test_sample_distribution_bounds():
    length = 14
    utt, seq = sample_negative_indices(CONF, jax.random.key(3), length)
    assert utt.shape == (6, 3, 4)
    assert seq.shape == (6, 2, 3, 4, length)
    assert int(utt.min()) >= 0 and int(utt.max()) < 3
    assert int(seq.min()) >= 0 and int(seq.max()) < length


def test_exclude_self_negatives(setup):
    """With exclusion on, perfect predictions give near-perfect accuracy even
    when negatives would otherwise collide with the positive."""
    params, z, c = setup
    loss_a, _ = cpc_apply(
        params, CONF, jnp.asarray(z), jnp.asarray(c), jax.random.key(4),
        exclude_self_negatives=False,
    )
    loss_b, _ = cpc_apply(
        params, CONF, jnp.asarray(z), jnp.asarray(c), jax.random.key(4),
        exclude_self_negatives=True,
    )
    # Both run and differ (some negative indices were rerouted).
    assert np.isfinite(float(loss_a)) and np.isfinite(float(loss_b))


def test_different_rng_different_loss(setup):
    params, z, c = setup
    l1, _ = cpc_apply(params, CONF, jnp.asarray(z), jnp.asarray(c), jax.random.key(5))
    l2, _ = cpc_apply(params, CONF, jnp.asarray(z), jnp.asarray(c), jax.random.key(6))
    assert float(l1) != float(l2)


def test_jit_and_grad_finite(setup):
    params, z, c = setup

    @jax.jit
    def f(p, z, c, key):
        return cpc_apply(p, CONF, z, c, key)

    loss, accs = f(params, jnp.asarray(z), jnp.asarray(c), jax.random.key(7))
    assert np.isfinite(float(loss))
    assert accs.shape == (6,)
    assert float(accs.min()) >= 0 and float(accs.max()) <= 1


def test_bf16_mxu_gather_matches_index_gather(setup):
    """The bf16 fast path (utterance gather + one-hot MXU selection,
    models/cpc.py) must be bit-identical to advanced-index gathering the
    same bf16 values — selection by a 0/1 matmul has one nonzero per row."""
    params, z, c = setup
    zb = jnp.asarray(z).astype(jnp.bfloat16)
    cb = jnp.asarray(c).astype(jnp.bfloat16)
    k_steps = CONF.n_prediction_steps // 2
    length = z.shape[1] - k_steps
    utt_index, seq_index = sample_negative_indices(
        CONF, jax.random.key(9), length
    )
    loss_fast, acc_fast = cpc_apply_with_indices(
        params, CONF, zb, cb, utt_index, seq_index
    )
    # Reference values: run the f32-branch gather on the SAME bf16 data by
    # viewing it as f32-typed container is not possible; instead gather in
    # numpy (exact) and score through the same jnp ops.
    s, u = CONF.n_speakers_per_batch, CONF.n_utterances_per_speaker
    z4 = np.asarray(zb.astype(jnp.float32)).reshape(s, u, z.shape[1], CONF.z_dim)
    # numpy mirror of the fast path's selection, exact by construction
    time_idx = np.arange(length)[None, :] + np.arange(1, k_steps + 1)[:, None]
    z_shift = np.moveaxis(z4[:, :, time_idx, :], 2, 0)
    spk = np.arange(s)[None, :, None, None, None]
    kk = np.arange(k_steps)[:, None, None, None, None]
    utt = np.asarray(utt_index)[:, None, :, :, None]
    z_neg_ref = z_shift[kk, spk, utt, np.asarray(seq_index)]

    from vectorquantizedcpc_tpu.models import cpc as cpc_mod

    # Recompute z_negatives through the fast path in isolation (the same
    # two one-hot einsum stages as models/cpc.py).
    zr = zb.reshape(s, u, z.shape[1], CONF.z_dim)
    tj = jnp.asarray(time_idx)
    zs = jnp.moveaxis(zr[:, :, tj, :], 2, 0)
    onehot_u = (
        jnp.asarray(utt_index)[..., None] == jnp.arange(u)
    ).astype(zb.dtype)
    z_utt = jnp.einsum(
        "kunv,ksvmz->ksunmz", onehot_u, zs, preferred_element_type=zb.dtype
    )
    onehot = (jnp.asarray(seq_index)[..., None] == jnp.arange(length)).astype(
        zb.dtype
    )
    z_neg_fast = jnp.einsum(
        "ksunlm,ksunmz->ksunlz", onehot, z_utt,
        preferred_element_type=zb.dtype,
    )
    np.testing.assert_array_equal(
        np.asarray(z_neg_fast.astype(jnp.float32)), z_neg_ref
    )
    assert np.isfinite(float(loss_fast))


def test_tiebreak_epsilon_property(rng):
    """Property-test the accuracy tie-break epsilon at small dims
    (models/cpc.py; VERDICT r3 #7).

    The epsilon exists because z is QUANTIZED: a negative drawing the
    positive's codeword produces an exact score tie, which torch's
    argmax-first semantics count as correct (reference model.py:307-312)
    but which our different accumulation order could flip. Properties:

    (a) all-self negatives (every negative IS the positive, the extreme
        collision case) -> accuracy exactly 1.0, at any score scale
        (the epsilon is relative);
    (b) on random quantized inputs, per-anchor decisions match an exact
        f64 argmax-first oracle everywhere outside the epsilon's near-tie
        band, exact ties always count correct, and the reported accuracy
        equals the mean of the per-anchor decisions.
    """
    conf = ConfCPC(
        n_prediction_steps=4,
        n_speakers_per_batch=2,
        n_utterances_per_speaker=2,
        n_negatives=3,
        z_dim=4,
        c_dim=6,
    )
    params = cpc_init(jax.random.key(3), conf)
    s, u, k_steps, n_neg = 2, 2, 2, 3
    t = 12
    length = t - k_steps
    codes = rng.normal(size=(3, conf.z_dim)).astype(np.float32)
    z = codes[rng.integers(0, 3, size=(s * u, t))]
    c = rng.normal(size=(s * u, t, conf.c_dim)).astype(np.float32)

    # ---- (a) all-self negatives: exact ties everywhere. -------------------
    utt_self = np.tile(
        np.arange(u, dtype=np.int32)[None, :, None], (k_steps, 1, n_neg)
    )
    seq_self = np.tile(
        np.arange(length, dtype=np.int32)[None, None, None, None, :],
        (k_steps, s, u, n_neg, 1),
    )
    for scale in (1.0, 64.0, 1.0 / 64.0):
        _, accs = cpc_apply_with_indices(
            params, conf, jnp.asarray(z * scale), jnp.asarray(c),
            jnp.asarray(utt_self), jnp.asarray(seq_self),
        )
        np.testing.assert_array_equal(np.asarray(accs), 1.0)

    # ---- (b) random indices vs exact f64 oracle. --------------------------
    utt_idx, seq_idx = sample_negative_indices(
        conf, jax.random.key(11), length
    )
    _, accs, f_our = cpc_apply_with_indices(
        params, conf, jnp.asarray(z), jnp.asarray(c), utt_idx, seq_idx,
        return_scores=True,
    )
    f_our = np.asarray(f_our, np.float64)  # (K, S*U, 1+Neg, L)

    # Exact f64 scores from the same formula (reference model.py:244-305).
    z64 = np.asarray(z, np.float64).reshape(s, u, t, conf.z_dim)
    c64 = np.asarray(c, np.float64)[:, :length, :]
    f64 = np.empty_like(f_our)
    for k in range(1, k_steps + 1):
        z_shift = z64[:, :, k : length + k, :]
        wc = c64 @ np.asarray(params.w[k - 1], np.float64) + np.asarray(
            params.b[k - 1], np.float64
        )
        wc = wc.reshape(s, u, length, conf.z_dim)
        spk = np.arange(s).reshape(-1, 1, 1, 1)
        utt = np.asarray(utt_idx[k - 1]).reshape(1, u, n_neg, 1)
        seq = np.asarray(seq_idx[k - 1])
        z_neg = z_shift[spk, utt, seq, :]
        zs = np.concatenate([z_shift[:, :, None], z_neg], axis=2)
        f64[k - 1] = (
            np.sum(zs * wc[:, :, None], axis=-1) / math.sqrt(conf.z_dim)
        ).reshape(s * u, 1 + n_neg, length)

    gap64 = f64[:, :, 0, :] - f64[:, :, 1:, :].max(axis=2)
    dec_oracle = gap64 >= 0  # torch argmax-first: ties -> index 0 wins
    tol = 1e-5 * (1.0 + np.abs(f_our[:, :, 0, :]))
    dec_our = (
        f_our[:, :, 0, :] + tol >= f_our[:, :, 1:, :].max(axis=2)
    )
    # Outside the near-tie band, decisions must match the exact oracle.
    clear = np.abs(gap64) > 4.0 * tol
    np.testing.assert_array_equal(dec_our[clear], dec_oracle[clear])
    # Exact ties (codeword collisions) always count correct.
    assert dec_our[gap64 == 0].all()
    assert (gap64 == 0).any()  # the quantized construction does collide
    # The reported metric IS the mean of the per-anchor decisions.
    np.testing.assert_allclose(
        np.asarray(accs, np.float64), dec_our.mean(axis=(1, 2)), atol=1e-7
    )


def test_select_kernel_matches_xla_paths(setup):
    """The fused Pallas selection kernel (ops/cpc_select.py, interpret
    mode) == the exact XLA one-hot formulation: loss/accuracies equal and
    gradients match to fp accumulation noise."""
    params, z, c = setup
    t = z.shape[1]
    length = t - CONF.n_prediction_steps // 2
    utt_idx, seq_idx = sample_negative_indices(CONF, jax.random.key(5), length)

    loss_x, accs_x = cpc_apply_with_indices(
        params, CONF, jnp.asarray(z), jnp.asarray(c), utt_idx, seq_idx
    )
    loss_k, accs_k = cpc_apply_with_indices(
        params, CONF, jnp.asarray(z), jnp.asarray(c), utt_idx, seq_idx,
        select_kernel=True, select_interpret=True,
    )
    np.testing.assert_allclose(float(loss_k), float(loss_x), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(accs_k), np.asarray(accs_x), atol=1e-7
    )

    def loss_fn(p, kernel):
        l, _ = cpc_apply_with_indices(
            p, CONF, jnp.asarray(z), jnp.asarray(c), utt_idx, seq_idx,
            select_kernel=kernel, select_interpret=kernel,
        )
        return l

    g_x = jax.grad(lambda p: loss_fn(p, False))(params)
    g_k = jax.grad(lambda p: loss_fn(p, True))(params)
    np.testing.assert_allclose(
        np.asarray(g_k.w), np.asarray(g_x.w), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g_k.b), np.asarray(g_x.b), atol=1e-6
    )


def test_fast_scores_close_to_exact(setup):
    """The bf16 fast_scores XLA path (the mesh-indivisible fallback on
    TPU) matches exact scoring to bf16-scale tolerance: same loss within
    ~1e-2 relative. Accuracies use the f32 tie-break recompute (ADVICE
    r4), so the metric keeps the exact path's 1e-5 epsilon — drift vs
    exact is bounded by the rare case where bf16 noise reorders two
    near-equal negatives, far tighter than the old 1e-2-widened bound."""
    params, z, c = setup
    utt_idx, seq_idx = sample_negative_indices(
        CONF, jax.random.key(9), z.shape[1] - CONF.n_prediction_steps // 2
    )
    loss_x, accs_x = cpc_apply_with_indices(
        params, CONF, jnp.asarray(z), jnp.asarray(c), utt_idx, seq_idx
    )
    loss_f, accs_f = cpc_apply_with_indices(
        params, CONF, jnp.asarray(z), jnp.asarray(c), utt_idx, seq_idx,
        fast_scores=True,
    )
    assert float(loss_f) == pytest.approx(float(loss_x), rel=2e-2)
    np.testing.assert_allclose(
        np.asarray(accs_f), np.asarray(accs_x), atol=0.03
    )

"""VQ-EMA tests: parity with the reference torch math, gradients, state."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vectorquantizedcpc_tpu.models.vq import (
    VQEMAState,
    nearest_code_indices,
    vq_apply_train,
    vq_encode,
    vq_init,
)

torch = pytest.importorskip("torch")


def _torch_reference_step(embedding, ema_count, ema_weight, x, training=True):
    """The reference VQEmbeddingEMA.forward math (model.py:117-155),
    re-expressed in torch as an independent golden implementation."""
    decay, epsilon, commitment = 0.999, 1e-5, 0.25
    e = torch.from_numpy(embedding.copy())
    count = torch.from_numpy(ema_count.copy())
    weight = torch.from_numpy(ema_weight.copy())
    xt = torch.from_numpy(x.copy())

    m, d = e.shape
    x_flat = xt.detach().reshape(-1, d)
    distances = torch.addmm(
        torch.sum(e**2, dim=1) + torch.sum(x_flat**2, dim=1, keepdim=True),
        x_flat,
        e.t(),
        alpha=-2.0,
        beta=1.0,
    )
    indices = torch.argmin(distances.float(), dim=-1)
    encodings = torch.nn.functional.one_hot(indices, m).float()
    quantized = torch.nn.functional.embedding(indices, e).view_as(xt)

    if training:
        count = decay * count + (1 - decay) * torch.sum(encodings, dim=0)
        n = torch.sum(count)
        count = (count + epsilon) / (n + m * epsilon) * n
        dw = torch.matmul(encodings.t(), x_flat)
        weight = decay * weight + (1 - decay) * dw
        e = weight / count.unsqueeze(-1)

    loss = commitment * torch.nn.functional.mse_loss(xt, quantized.detach())
    avg_probs = torch.mean(encodings, dim=0)
    perplexity = torch.exp(-torch.sum(avg_probs * torch.log(avg_probs + 1e-10)))
    return (
        indices.numpy(),
        quantized.numpy(),
        e.numpy(),
        count.numpy(),
        weight.numpy(),
        float(loss),
        float(perplexity),
    )


@pytest.fixture
def small_state(rng):
    m, d = 32, 8
    emb = (rng.normal(size=(m, d)) * 0.1).astype(np.float32)
    return VQEMAState(
        embedding=jnp.asarray(emb),
        ema_count=jnp.asarray(rng.uniform(0.5, 2.0, size=(m,)).astype(np.float32)),
        ema_weight=jnp.asarray(emb * 1.1),
    )


def test_encode_matches_reference_argmin(small_state, rng):
    x = rng.normal(size=(2, 10, 8)).astype(np.float32) * 0.1
    q, idx = vq_encode(small_state, jnp.asarray(x))
    ref_idx, ref_q, *_ = _torch_reference_step(
        np.asarray(small_state.embedding),
        np.asarray(small_state.ema_count),
        np.asarray(small_state.ema_weight),
        x,
        training=False,
    )
    np.testing.assert_array_equal(np.asarray(idx).reshape(-1), ref_idx)
    np.testing.assert_allclose(np.asarray(q), ref_q, atol=1e-6)


def test_train_step_matches_reference_ema(small_state, rng):
    x = rng.normal(size=(4, 6, 8)).astype(np.float32) * 0.1
    q_st, new_state, loss, ppl = vq_apply_train(small_state, jnp.asarray(x))
    _, _, ref_e, ref_count, ref_weight, ref_loss, ref_ppl = _torch_reference_step(
        np.asarray(small_state.embedding),
        np.asarray(small_state.ema_count),
        np.asarray(small_state.ema_weight),
        x,
    )
    np.testing.assert_allclose(np.asarray(new_state.ema_count), ref_count, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.ema_weight), ref_weight, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.embedding), ref_e, rtol=1e-4)
    assert float(loss) == pytest.approx(ref_loss, rel=1e-5)
    assert float(ppl) == pytest.approx(ref_ppl, rel=1e-4)


def test_straight_through_gradient(small_state, rng):
    """d(sum(q_st))/dx == 1 (straight-through); commitment grads point x->q."""
    x = jnp.asarray(rng.normal(size=(2, 5, 8)).astype(np.float32))

    def f(x):
        q_st, _, loss, _ = vq_apply_train(small_state, x)
        return jnp.sum(q_st)

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(x), atol=1e-6)

    def f_loss(x):
        _, _, loss, _ = vq_apply_train(small_state, x)
        return loss

    g2 = jax.grad(f_loss)(x)
    q, _ = vq_encode(small_state, x)
    expected = 0.25 * 2.0 * (np.asarray(x) - np.asarray(q)) / x.size
    np.testing.assert_allclose(np.asarray(g2), expected, atol=1e-6)


def test_no_gradient_to_codebook(small_state, rng):
    """The codebook is EMA-updated only — autodiff must not touch it."""
    x = jnp.asarray(rng.normal(size=(2, 5, 8)).astype(np.float32))

    def f(emb):
        state = small_state.replace(embedding=emb)
        q_st, _, loss, _ = vq_apply_train(state, x)
        return jnp.sum(q_st) + loss

    g = jax.grad(f)(small_state.embedding)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


def test_init_bound_is_1_over_512():
    state = vq_init(jax.random.key(0), 512, 64)
    assert float(jnp.abs(state.embedding).max()) <= 1 / 512
    np.testing.assert_array_equal(
        np.asarray(state.embedding), np.asarray(state.ema_weight)
    )
    assert state.ema_count.shape == (512,)


def test_perplexity_uniform_usage():
    """If all M codes are used equally, perplexity == M."""
    m, d = 16, 4
    # Any set of distinct codes works: each code vector is its own nearest
    # neighbour (distance exactly 0).
    emb = (np.random.default_rng(1).normal(size=(m, d)) * 10).astype(np.float32)
    state = VQEMAState(
        embedding=jnp.asarray(emb),
        ema_count=jnp.ones((m,)),
        ema_weight=jnp.asarray(emb),
    )
    x = jnp.asarray(emb).reshape(1, m, d)  # each vector hits its own code
    _, _, _, ppl = vq_apply_train(state, x)
    assert float(ppl) == pytest.approx(m, rel=1e-3)


def test_jit_compatible(small_state, rng):
    x = jnp.asarray(rng.normal(size=(2, 5, 8)).astype(np.float32))
    jitted = jax.jit(vq_apply_train)
    q1, s1, l1, p1 = jitted(small_state, x)
    q2, s2, l2, p2 = vq_apply_train(small_state, x)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s1.embedding), np.asarray(s2.embedding), atol=1e-6
    )

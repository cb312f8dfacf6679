"""Vector-quantization codebook with EMA updates, as pure functional state.

Re-designs reference model.py:89-155 (VQEmbeddingEMA) for JAX: the codebook
buffers (embedding, ema_count, ema_weight) become an explicit
:class:`VQEMAState` pytree returned from the train step and threaded through
pjit — there are no mutable module buffers.

Semantics preserved from the reference:

- squared-L2 nearest neighbour via the expanded form
  ``|e|^2 + |x|^2 - 2 x e^T`` (one MXU matmul) with f32 argmin
  (reference model.py:126-131); ties resolve to the lowest index in both
  frameworks.
- EMA cluster-count update with Laplace smoothing, then EMA weight update,
  then ``embedding = ema_weight / ema_count`` (reference model.py:137-145).
  The quantized values used for the loss come from the PRE-update embedding,
  exactly as in the reference (the torch code computes ``quantized`` before
  mutating the buffers).
- commitment loss ``0.25 * mse(x, sg[q])``, straight-through estimator
  ``x + sg[q - x]``, and codebook-usage perplexity (model.py:147-153).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class VQEMAState:
    embedding: jax.Array  # (M, D) codebook
    ema_count: jax.Array  # (M,) EMA cluster sizes
    ema_weight: jax.Array  # (M, D) EMA cluster sums


def vq_init(rng: jax.Array, n_embeddings: int, embedding_dim: int) -> VQEMAState:
    """Uniform +-1/512 init (the reference hardcodes 512 regardless of M;
    model.py:96-98)."""
    init_bound = 1.0 / 512
    embedding = jax.random.uniform(
        rng, (n_embeddings, embedding_dim), jnp.float32, -init_bound, init_bound
    )
    return VQEMAState(
        embedding=embedding,
        ema_count=jnp.zeros((n_embeddings,), jnp.float32),
        # Same values but a DISTINCT buffer: aliased leaves break donation
        # (the train step would donate one buffer twice).
        ema_weight=embedding + 0.0,
    )


def nearest_code_indices(embedding: jax.Array, x_flat: jax.Array) -> jax.Array:
    """argmin_m |x - e_m|^2 for each row of ``x_flat`` (N, D) -> (N,) int32.

    Distances are computed in f32 via one (N, D) @ (D, M) MXU matmul plus
    rank-1 norms — never materializing the (N, M, D) difference tensor.
    """
    x32 = x_flat.astype(jnp.float32)
    e32 = embedding.astype(jnp.float32)
    distances = (
        jnp.sum(e32 * e32, axis=1)[None, :]
        + jnp.sum(x32 * x32, axis=1, keepdims=True)
        - 2.0 * (x32 @ e32.T)
    )
    return jnp.argmin(distances, axis=-1).astype(jnp.int32)


def vq_encode(state: VQEMAState, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Inference path: (B, T, D) -> (quantized (B, T, D), indices (B, T)).

    Parity with reference model.py:103-115 (grad-free argmin + lookup).
    """
    b, t, d = x.shape
    indices = nearest_code_indices(state.embedding, x.reshape(-1, d))
    quantized = jnp.take(state.embedding, indices, axis=0).astype(x.dtype)
    return quantized.reshape(b, t, d), indices.reshape(b, t)


def vq_apply_train(
    state: VQEMAState,
    x: jax.Array,
    commitment_cost: float = 0.25,
    decay: float = 0.999,
    epsilon: float = 1e-5,
) -> Tuple[jax.Array, VQEMAState, jax.Array, jax.Array]:
    """Training path: quantize + EMA codebook update.

    Returns (quantized_straight_through, new_state, commitment_loss,
    perplexity). Gradients flow to ``x`` only (through the commitment loss
    and the straight-through estimator); the codebook is updated purely by
    EMA, outside autodiff.
    """
    m, d = state.embedding.shape
    x_flat = jax.lax.stop_gradient(x.reshape(-1, d).astype(jnp.float32))

    indices = nearest_code_indices(state.embedding, x_flat)
    # One-hot assignment matrix; its transpose-matmul with x is the per-code
    # feature sum dw — both ride the MXU.
    encodings = jax.nn.one_hot(indices, m, dtype=jnp.float32)  # (N, M)
    quantized = jnp.take(state.embedding, indices, axis=0).reshape(x.shape)
    quantized = quantized.astype(x.dtype)

    # --- EMA state transition (pre-update embedding already captured). ---
    ema_count = decay * state.ema_count + (1.0 - decay) * jnp.sum(encodings, axis=0)
    n = jnp.sum(ema_count)
    ema_count = (ema_count + epsilon) / (n + m * epsilon) * n
    dw = encodings.T @ x_flat  # (M, D)
    ema_weight = decay * state.ema_weight + (1.0 - decay) * dw
    new_embedding = ema_weight / ema_count[:, None]
    new_state = VQEMAState(
        embedding=new_embedding, ema_count=ema_count, ema_weight=ema_weight
    )

    # Commitment loss against the (stop-gradient) quantized values.
    e_latent_loss = jnp.mean(
        jnp.square(x.astype(jnp.float32) - jax.lax.stop_gradient(quantized).astype(jnp.float32))
    )
    loss = commitment_cost * e_latent_loss

    # Straight-through: forward value q, backward gradient to x.
    quantized_st = x + jax.lax.stop_gradient(quantized - x)

    avg_probs = jnp.mean(encodings, axis=0)
    perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))

    return quantized_st, new_state, loss, perplexity

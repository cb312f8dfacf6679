"""VQ-CPC encoder: strided Conv1d -> segmental FC stack -> VQ -> LSTM context.

Functional re-design of reference model.py:33-86 (Encoder):

    mel (B, Freq=80, T) -> Conv1d(80->512, k=4, s=2, p=1, no bias)  [time / 2]
    -> LN -> ReLU -> [Linear(512,512, no bias) -> LN -> ReLU] x 4
    -> Linear(512 -> 64)
    -> VQ-EMA codebook (models/vq.py)
    -> LSTM(64 -> 256) context network

TPU-first choices:

- Internally time-major NWC layout so the conv and every per-frame Linear is
  a clean MXU matmul; the public API still takes (Batch, Freq, Time) mels to
  match the reference call sites (train_cpc.py:110-119, encode.py:44-46).
- The repeated FC blocks are stored stacked (4, 512, 512) — natural for
  tensor-parallel sharding over a `model` mesh axis.
- ``compute_dtype`` lets training run the conv/FC/LSTM in bfloat16 while
  keeping parameters, LayerNorm statistics, and the VQ distance/argmin in
  float32.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..configs import ConfEncoder
from .rnn import LSTMParams, lstm_apply, lstm_init
from .vq import VQEMAState, vq_apply_train, vq_encode, vq_init


@struct.dataclass
class EncoderParams:
    conv_w: jax.Array  # (K=4, in=80, out=512) 'WIO' layout
    ln_in_scale: jax.Array  # (512,)
    ln_in_bias: jax.Array  # (512,)
    fc_w: jax.Array  # (4, 512, 512) stacked hidden Linears (no bias)
    fc_ln_scale: jax.Array  # (4, 512)
    fc_ln_bias: jax.Array  # (4, 512)
    out_w: jax.Array  # (512, z_dim)
    out_b: jax.Array  # (z_dim,)
    rnn: LSTMParams  # LSTM(z_dim -> c_dim)


def encoder_init(rng: jax.Array, conf: ConfEncoder) -> Tuple[EncoderParams, VQEMAState]:
    """Initialize encoder params + VQ state (torch-default init distributions)."""
    ks = jax.random.split(rng, 8)
    c_in, ch, zd = conf.in_channels, conf.channels, conf.z_dim

    def unif(key, shape, fan_in):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, jnp.float32, -bound, bound)

    params = EncoderParams(
        conv_w=unif(ks[0], (4, c_in, ch), c_in * 4),
        ln_in_scale=jnp.ones((ch,), jnp.float32),
        ln_in_bias=jnp.zeros((ch,), jnp.float32),
        fc_w=unif(ks[1], (4, ch, ch), ch),
        fc_ln_scale=jnp.ones((4, ch), jnp.float32),
        fc_ln_bias=jnp.zeros((4, ch), jnp.float32),
        out_w=unif(ks[2], (ch, zd), ch),
        out_b=unif(ks[3], (zd,), ch),
        rnn=lstm_init(ks[4], zd, conf.c_dim),
    )
    vq_state = vq_init(ks[5], conf.n_embeddings, zd)
    return params, vq_state


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5):
    """LayerNorm over the feature axis, statistics in f32 (torch eps=1e-5)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    normed = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (normed * scale + bias).astype(x.dtype)


# Conv strategy switch (VERDICT r4 item #2): below this input length the
# k4/s2 conv runs as unfold+matmul (profiled fastest inside the TRAINING
# step at T=140, where XLA's conv lowering was ~40x off peak); at/above it
# (long-utterance batched inference) XLA's native NWC conv wins ~2x — the
# unfold's 4-slice concat materializes a (B, T', 4F) operand whose HBM
# traffic dominates at T=1024 (benchmarks/profile_encoder_infer.py:
# 1.34 ms vs 2.49 ms at B=64, T=1024; equal within noise at T=140).
_UNFOLD_MAX_T = 256


def _frontend(
    params: EncoderParams, mels: jax.Array, compute_dtype: jnp.dtype
) -> jax.Array:
    """Conv + SegFC: (B, Freq, T) -> pre-VQ latents (B, T//2, z_dim)."""
    x = jnp.swapaxes(mels, 1, 2).astype(compute_dtype)  # (B, T, F) NWC
    # Both paths compute the identical conv incl. odd-T handling:
    # T' = floor(T/2) with the true final sample in-window (reference
    # model.py:43; infer/encode.py) — symmetric (1, 1) padding gives
    # exactly that for even AND odd T.
    if x.shape[1] <= _UNFOLD_MAX_T:
        # Unfold + ONE (B*T', 4F) @ (4F, C) MXU matmul (training shapes).
        t_out = x.shape[1] // 2
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [
                jax.lax.slice_in_dim(xp, j, j + 2 * (t_out - 1) + 1, 2, axis=1)
                for j in range(4)
            ],
            axis=-1,
        )  # (B, T', 4F), window-position-major like conv_w's W axis
        x = cols @ params.conv_w.astype(compute_dtype).reshape(
            -1, params.conv_w.shape[-1]
        )
    else:
        x = jax.lax.conv_general_dilated(
            x,
            params.conv_w.astype(compute_dtype),
            window_strides=(2,),
            padding=[(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
    x = _layer_norm(x, params.ln_in_scale, params.ln_in_bias)
    x = jax.nn.relu(x)
    for i in range(params.fc_w.shape[0]):
        x = x @ params.fc_w[i].astype(compute_dtype)
        x = _layer_norm(x, params.fc_ln_scale[i], params.fc_ln_bias[i])
        x = jax.nn.relu(x)
    return x @ params.out_w.astype(compute_dtype) + params.out_b.astype(compute_dtype)


def encoder_encode(
    params: EncoderParams,
    vq_state: VQEMAState,
    mel: jax.Array,
    compute_dtype: jnp.dtype = jnp.float32,
    return_pre_vq: bool = False,
    use_pallas: bool = False,
    mesh=None,
    pallas_interpret: bool = False,
):
    """Inference path (reference model.py:59-70).

    Args:
        mel: (B, Freq, T) mel-spectrogram.
    Returns:
        (z, c, indices): quantized latent series (B, T', z), context series
        (B, T', c), code index series (B, T') — plus the pre-VQ latents when
        ``return_pre_vq`` (the reference exposes these via a forward hook for
        encode.py's save_auxiliary; encode.py:34-40).
    """
    z_pre = _frontend(params, mel, compute_dtype)
    z, indices = vq_encode(vq_state, z_pre.astype(jnp.float32))
    c, _ = lstm_apply(
        params.rnn, z.astype(compute_dtype), use_pallas=use_pallas, mesh=mesh,
        interpret=pallas_interpret,
    )
    if return_pre_vq:
        return z, c.astype(jnp.float32), indices, z_pre.astype(jnp.float32)
    return z, c.astype(jnp.float32), indices


def encoder_forward(
    params: EncoderParams,
    vq_state: VQEMAState,
    mels: jax.Array,
    compute_dtype: jnp.dtype = jnp.float32,
    use_pallas: bool = False,
    mesh=None,
    pallas_interpret: bool = False,
):
    """Training path (reference model.py:72-86).

    Returns (z_straight_through, c, new_vq_state, vq_loss, perplexity).
    """
    z_pre = _frontend(params, mels, compute_dtype)
    z, new_vq_state, vq_loss, perplexity = vq_apply_train(
        vq_state, z_pre.astype(jnp.float32)
    )
    c, _ = lstm_apply(
        params.rnn, z.astype(compute_dtype), use_pallas=use_pallas, mesh=mesh,
        interpret=pallas_interpret,
    )
    return z, c.astype(jnp.float32), new_vq_state, vq_loss, perplexity

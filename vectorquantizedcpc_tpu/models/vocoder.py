"""RNN_MS vocoder conditioned on VQ-CPC codes + speaker identity.

Covers BOTH reference components in one place (they form one network):

- the ``Vocoder`` wrapper (reference network_vocoder.py:11-78): code/speaker
  embeddings, x2 nearest-neighbour code upsampling, speaker broadcast,
  concat into a 128-dim conditioning series;
- the external ``rnnms.RNNMSVocoder`` core the reference pins from
  tarepan/UniversalVocoding (contract at reference config.py:63-77,
  call sites network_vocoder.py:39,67,78): a 2-layer bidirectional-GRU
  PreNet over the conditioning, x``hop_length`` time upsampling, and a
  sample-level autoregressive GRU(896) -> FC(256) -> 2^bits-way softmax
  over mu-law classes.

TPU-first design:

- Teacher-forced training is ONE scan whose input projections (for both the
  AR sample embedding and the conditioning) are hoisted into large MXU
  matmuls; only the 896-dim recurrent matmul stays inside the scan body.
- Autoregressive generation precomputes (a) the conditioning contribution to
  the GRU input projection for ALL samples in one matmul and (b) a
  256-entry table ``embedding @ Wx_embed`` so each decode step reduces to a
  table row gather + one (B, 896) x (896, 2688) matmul + the FC head.
  ops/ar_decode.py fuses this loop into a single Pallas kernel with
  VMEM-resident weights; this module provides the reference lax.scan path.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..configs import ConfVocoderNetwork
from .rnn import GRUParams, bigru_apply, gru_init, gru_scan, gru_step


@struct.dataclass
class VocoderParams:
    code_embedding: jax.Array  # (size_i_codebook, dim_i_embedding)
    speaker_embedding: jax.Array  # (n_speakers, dim_speaker_embedding)
    # Conditioning PreNet: stacked bidirectional GRU layers.
    prenet_fwd: Tuple[GRUParams, ...]
    prenet_bwd: Tuple[GRUParams, ...]
    # Sample-level AR network.
    ar_embed: jax.Array  # (2^bits, size_i_embed_ar)
    ar_gru: GRUParams  # (embed + latent) -> size_h_rnn
    fc1_w: jax.Array  # (size_h_rnn, size_h_fc)
    fc1_b: jax.Array
    fc2_w: jax.Array  # (size_h_fc, 2^bits)
    fc2_b: jax.Array


def vocoder_init(rng: jax.Array, conf: ConfVocoderNetwork) -> VocoderParams:
    rn = conf.rnnms
    n_classes = 2**rn.bits_mu_law
    half = rn.dim_voc_latent // 2  # per-direction PreNet width
    ks = jax.random.split(rng, 10)

    prenet_fwd, prenet_bwd = [], []
    in_dim = rn.dim_i_feature
    for i in range(rn.prenet.num_layers):
        prenet_fwd.append(gru_init(ks[2 + 2 * i], in_dim, half))
        prenet_bwd.append(gru_init(ks[3 + 2 * i], in_dim, half))
        in_dim = 2 * half

    def linear(key, shape):
        bound = 1.0 / jnp.sqrt(shape[0])
        return jax.random.uniform(key, shape, jnp.float32, -bound, bound)

    wa = rn.wave_ar
    return VocoderParams(
        code_embedding=jax.random.normal(
            ks[0], (conf.size_i_codebook, conf.dim_i_embedding)
        ),
        speaker_embedding=jax.random.normal(
            ks[1], (conf.n_speakers, conf.dim_speaker_embedding)
        ),
        prenet_fwd=tuple(prenet_fwd),
        prenet_bwd=tuple(prenet_bwd),
        ar_embed=jax.random.normal(ks[6], (n_classes, wa.size_i_embed_ar)),
        ar_gru=gru_init(
            ks[7], wa.size_i_embed_ar + rn.dim_voc_latent, wa.size_h_rnn
        ),
        fc1_w=linear(ks[8], (wa.size_h_rnn, wa.size_h_fc)),
        fc1_b=jnp.zeros((wa.size_h_fc,), jnp.float32),
        fc2_w=linear(ks[9], (wa.size_h_fc, n_classes)),
        fc2_b=jnp.zeros((n_classes,), jnp.float32),
    )


def build_conditioning_frames(
    params: VocoderParams,
    conf: ConfVocoderNetwork,
    z_indices: jax.Array,
    speaker: jax.Array,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Codes + speaker -> frame-rate conditioning series (B, 2*Tz, V).

    Pipeline (reference network_vocoder.py:54-67 then rnnms): embed codes,
    x2 nearest upsample (undo the encoder's /2), broadcast speaker embed,
    concat -> PreNet biGRU stack. The final x ``upsampling_t`` nearest
    upsample to sample rate is the caller's (build_conditioning) — keeping
    the frame-rate series lets downstream matmuls run 160x smaller and lets
    the serving layer pool conditioning compactly (infer/serving.py).
    """
    z_embed = jnp.take(params.code_embedding, z_indices, axis=0)  # (B, Tz, E)
    z_up = jnp.repeat(z_embed, 2, axis=1)  # nearest x2, == F.interpolate
    spk = jnp.take(params.speaker_embedding, speaker, axis=0)  # (B, Es)
    spk_up = jnp.broadcast_to(
        spk[:, None, :], (z_up.shape[0], z_up.shape[1], spk.shape[-1])
    )
    cond = jnp.concatenate([z_up, spk_up], axis=-1).astype(compute_dtype)

    for fwd, bwd in zip(params.prenet_fwd, params.prenet_bwd):
        cond = bigru_apply(fwd, bwd, cond)
    return cond


def build_conditioning_frames_ragged(
    params: VocoderParams,
    conf: ConfVocoderNetwork,
    z_indices: jax.Array,  # (G, max_codes) padded code batch
    speaker: jax.Array,  # (G,)
    n_frames: jax.Array,  # (G,) valid FRAME counts (= 2 * true code counts)
    compute_dtype: jnp.dtype = jnp.float32,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> jax.Array:
    """Ragged-batch conditioning: one biGRU pass over a padded batch whose
    rows have different true lengths, BIT-EXACT with per-row
    ``build_conditioning_frames`` on each row's valid prefix.

    The PreNet biGRU is non-causal, so end-padding would corrupt the
    backward direction. Instead each layer runs:

    - forward GRU on the padded rows as-is (causal: the valid prefix never
      sees the padded tail);
    - backward GRU as a MASKED reverse scan: update the carry only where
      ``t < n_frames[g]``, so the scan passes the zero initial state
      through each row's padded tail unchanged and enters that row's
      valid region with exactly the unpadded reverse scan's h0 —
      bit-identical outputs on valid positions. (An earlier formulation
      flipped each row by its own length with two take_along_axis gathers
      per layer; those (G, T, V) gathers cost ~20 ms of the 32 ms ragged
      conditioning at the 240-request serving shape — the TPU-gather
      pathology again — where the mask is one select per step.)

    Built for the continuous-batching server: conditioning for ALL queued
    requests in ONE dispatch, instead of one compile+dispatch per distinct
    length (infer/serving.py).

    ``use_pallas`` (the server's TPU path) runs all four GRU directions
    through the fused Pallas kernel in bfloat16 — the scan formulation
    cost ~28 ms of a 240-request drain (~800 sequential tiny-matmul
    steps), ~10% of the whole decode, and the conditioning is consumed at
    bf16 by the decode kernel anyway. The reversed direction feeds the
    kernel a time-flipped xproj with the per-row valid mask (masked steps
    freeze the carry), which reproduces each row's unpadded reverse scan
    on its valid region at bf16 precision."""
    z_embed = jnp.take(params.code_embedding, z_indices, axis=0)
    z_up = jnp.repeat(z_embed, 2, axis=1)
    spk = jnp.take(params.speaker_embedding, speaker, axis=0)
    spk_up = jnp.broadcast_to(
        spk[:, None, :], (z_up.shape[0], z_up.shape[1], spk.shape[-1])
    )
    if use_pallas:
        compute_dtype = jnp.bfloat16
    cond = jnp.concatenate([z_up, spk_up], axis=-1).astype(compute_dtype)

    t = cond.shape[1]
    valid_tg = jnp.arange(t)[:, None] < n_frames[None, :]  # (T, G)

    if use_pallas:
        from ..ops.gru_train import fused_gru_scan, fused_gru_scan_masked

        for fwd, bwd in zip(params.prenet_fwd, params.prenet_bwd):
            h0 = jnp.zeros(
                (cond.shape[0], fwd.wh.shape[0]), jnp.bfloat16
            )
            xp_f = jnp.swapaxes(
                cond @ fwd.wx.astype(cond.dtype) + fwd.bx.astype(cond.dtype),
                0, 1,
            )
            out_f = jnp.swapaxes(
                fused_gru_scan(
                    fwd.wh.astype(jnp.bfloat16), fwd.bh.astype(jnp.bfloat16),
                    xp_f, h0, pallas_interpret,
                ),
                0, 1,
            )
            xp_b = jnp.swapaxes(
                cond @ bwd.wx.astype(cond.dtype) + bwd.bx.astype(cond.dtype),
                0, 1,
            )
            hs_rev = fused_gru_scan_masked(
                bwd.wh.astype(jnp.bfloat16), bwd.bh.astype(jnp.bfloat16),
                jnp.flip(xp_b, axis=0), jnp.flip(valid_tg, axis=0), h0,
                pallas_interpret,
            )
            out_b = jnp.swapaxes(jnp.flip(hs_rev, axis=0), 0, 1)
            cond = jnp.concatenate([out_f, out_b], axis=-1)
        return cond

    def masked_reverse_gru(gparams, x):
        xproj = x @ gparams.wx.astype(x.dtype) + gparams.bx.astype(x.dtype)
        xproj = jnp.swapaxes(xproj, 0, 1)  # (T, G, 3H)
        h0 = jnp.zeros((x.shape[0], gparams.wh.shape[0]), x.dtype)

        def step(h, inp):
            xp_t, v_t = inp
            h_new = gru_step(gparams, h, xp_t)
            h = jnp.where(v_t[:, None], h_new, h)
            return h, h

        _, out = jax.lax.scan(
            step, h0, (xproj, valid_tg), reverse=True, unroll=8
        )
        return jnp.swapaxes(out, 0, 1)  # (G, T, H)

    from .rnn import gru_apply

    for fwd, bwd in zip(params.prenet_fwd, params.prenet_bwd):
        out_f, _ = gru_apply(fwd, cond)
        out_b = masked_reverse_gru(bwd, cond)
        cond = jnp.concatenate([out_f, out_b], axis=-1)
    return cond


def build_conditioning(
    params: VocoderParams,
    conf: ConfVocoderNetwork,
    z_indices: jax.Array,
    speaker: jax.Array,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Codes + speaker -> sample-rate conditioning series (B, T_samples, V).

    Each frame conditions ``upsampling_t`` consecutive samples (nearest
    upsample, reference rnnms contract at config.py:70).
    """
    cond = build_conditioning_frames(params, conf, z_indices, speaker, compute_dtype)
    return jnp.repeat(cond, conf.rnnms.upsampling_t, axis=1)


def _ar_gru_scan(
    gru: GRUParams,
    xproj: jax.Array,  # (T, B, 3H)
    h0: jax.Array,
    compute_dtype,
    use_pallas: bool,
    pallas_interpret: bool,
    mesh,
) -> jax.Array:
    """AR GRU recurrence: fused Pallas kernel on TPU, custom-VJP scan
    otherwise (the scan backward is 3.4x faster than XLA's scan autodiff
    at this shape; models/rnn.py:gru_scan)."""
    wh = gru.wh.astype(compute_dtype)
    bh = gru.bh.astype(compute_dtype)
    if use_pallas and compute_dtype == jnp.bfloat16:
        from ..ops.gru_train import fused_gru_scan

        b = h0.shape[0]
        if mesh is None:
            return fused_gru_scan(wh, bh, xproj, h0, pallas_interpret)
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        if (b % mesh.shape[DATA_AXIS]) == 0:
            kernel = jax.shard_map(
                lambda w, bias, xp, h: fused_gru_scan(
                    w, bias, xp, h, pallas_interpret
                ),
                mesh=mesh,
                in_specs=(P(), P(), P(None, DATA_AXIS, None), P(DATA_AXIS)),
                out_specs=P(None, DATA_AXIS, None),
                check_vma=False,
            )
            return kernel(wh, bh, xproj, h0)
        from ..utils.warnings_once import warn_once

        warn_once(
            f"Fused GRU kernel disabled: batch {b} does not divide the "
            f"data mesh axis ({mesh.shape[DATA_AXIS]}); using the "
            "custom-VJP scan path. Results are identical; throughput is "
            "lower."
        )
    return gru_scan(wh, bh, xproj, h0)


def vocoder_forward(
    params: VocoderParams,
    conf: ConfVocoderNetwork,
    x_mulaw: jax.Array,
    z_indices: jax.Array,
    speaker: jax.Array,
    compute_dtype: jnp.dtype = jnp.float32,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    mesh=None,
) -> jax.Array:
    """Teacher-forced forward: logits over mu-law classes (B, T, 2^bits).

    Parity with reference network_vocoder.py:41-67 + rnnms.forward: the AR
    GRU consumes [embed(x_t), cond_t] and predicts x_{t+1}'s distribution.

    ``use_pallas`` routes the 5,120-step AR recurrence through the fused
    Pallas GRU kernel (ops/gru_train.py) — honored for bfloat16 compute,
    the kernel's native precision; f32 callers (CPU tests, torch-golden
    parity) keep the custom-VJP scan. Under a ``mesh`` the kernel runs
    inside a ``shard_map`` over the data axis like the fused LSTM
    (models/rnn.py:lstm_apply): the batch is data-sharded and the
    recurrence is per-example, so each device runs a fully local kernel
    with wh broadcast.
    """
    t = x_mulaw.shape[1]
    gru = params.ar_gru
    embed_dim = params.ar_embed.shape[1]
    hop = conf.rnnms.upsampling_t

    if use_pallas and compute_dtype == jnp.bfloat16 and t % hop == 0:
        # Frame-rate input projection (TPU fast path): the conditioning
        # is constant across the ``hop`` samples of a frame and the
        # teacher embedding has only 2^bits distinct rows, so the
        # sample-rate (T*B, E+V) @ (E+V, 3H) projection (451 GFLOP fwd at
        # the reference shape, and 2x that again in backward) collapses
        # to (a) a (2^bits, 3H) pre-projected embedding TABLE selected by
        # a one-hot matmul — a plain gather is the one op this shape must
        # avoid on TPU — and (b) a FRAME-rate conditioning projection
        # (B*F, V) @ (V, 3H), 160x smaller, broadcast into the add. The
        # backward shrinks the same way: d_table is one deep one-hot
        # contraction and d_cond folds 160 samples per frame before the
        # matmul. Numerics: same math as the concat form up to split-sum
        # reassociation (bf16-noise; the f32/golden paths below keep the
        # reference formulation bit-for-bit).
        cond_f = build_conditioning_frames(
            params, conf, z_indices, speaker, compute_dtype
        )  # (B, F, V)
        wx_embed = gru.wx[:embed_dim].astype(compute_dtype)
        wx_cond = gru.wx[embed_dim:].astype(compute_dtype)
        table = params.ar_embed.astype(compute_dtype) @ wx_embed  # (C, 3H)
        cond_proj = cond_f @ wx_cond + gru.bx.astype(compute_dtype)
        n_classes = params.ar_embed.shape[0]
        onehot = jax.nn.one_hot(x_mulaw, n_classes, dtype=compute_dtype)
        xp_embed = onehot @ table  # (B, T, 3H)
        f = t // hop
        xproj = (
            xp_embed.reshape(xp_embed.shape[0], f, hop, -1)
            + cond_proj[:, :f, None, :]
        ).reshape(xp_embed.shape[0], t, -1)
    else:
        cond = build_conditioning(
            params, conf, z_indices, speaker, compute_dtype
        )
        cond = cond[:, :t]  # guard: val utterances can be 1 frame short
        x_embed = jnp.take(params.ar_embed, x_mulaw, axis=0).astype(
            compute_dtype
        )
        inputs = jnp.concatenate([x_embed, cond], axis=-1)
        xproj = inputs @ gru.wx.astype(compute_dtype) + gru.bx.astype(
            compute_dtype
        )
    xproj = jnp.swapaxes(xproj, 0, 1)  # (T, B, 3H)

    h0 = jnp.zeros((x_mulaw.shape[0], gru.wh.shape[0]), compute_dtype)
    hs = _ar_gru_scan(
        gru, xproj, h0, compute_dtype, use_pallas, pallas_interpret, mesh
    )
    hs = jnp.swapaxes(hs, 0, 1)  # (B, T, H)

    hidden = jax.nn.relu(hs @ params.fc1_w.astype(compute_dtype) + params.fc1_b)
    logits = hidden @ params.fc2_w.astype(compute_dtype) + params.fc2_b
    return logits.astype(jnp.float32)


def vocoder_generate(
    params: VocoderParams,
    conf: ConfVocoderNetwork,
    z_indices: jax.Array,
    speaker: jax.Array,
    rng: jax.Array,
    return_aux: bool = False,
    greedy: bool = False,
) -> jax.Array:
    """Autoregressive generation -> linear waveform in [-1, 1] (B, T).

    Reference lax.scan implementation (network_vocoder.py:69-78 +
    rnnms.generate): one GRU step per 16 kHz sample, categorical sampling
    from the softmax, mu-law expansion at the end. The Pallas fused-decode
    kernel (ops/ar_decode.py) is the production path; this one is the
    numerically-simple baseline both are tested against.
    """
    from ..dsp.mulaw import mulaw_decode

    n_classes = 2 ** conf.rnnms.bits_mu_law
    cond = build_conditioning(params, conf, z_indices, speaker)
    b, t, _ = cond.shape
    gru = params.ar_gru
    embed_dim = params.ar_embed.shape[1]

    # Hoisted input projections: conditioning part for ALL timesteps in one
    # matmul; prev-sample part as a 2^bits-row lookup table.
    wx_embed, wx_cond = gru.wx[:embed_dim], gru.wx[embed_dim:]
    embed_proj = params.ar_embed @ wx_embed  # (2^bits, 3H)
    cond_proj = cond @ wx_cond + gru.bx  # (B, T, 3H)
    cond_proj = jnp.swapaxes(cond_proj, 0, 1)  # (T, B, 3H)

    h0 = jnp.zeros((b, gru.wh.shape[0]), jnp.float32)
    sample0 = jnp.full((b,), n_classes // 2, jnp.int32)  # mu-law silence
    step_keys = jax.random.split(rng, t)

    def step(carry, inputs):
        h, prev = carry
        cp_t, key = inputs
        xp = jnp.take(embed_proj, prev, axis=0) + cp_t
        h = gru_step(gru, h, xp)
        hidden = jax.nn.relu(h @ params.fc1_w + params.fc1_b)
        logits = hidden @ params.fc2_w + params.fc2_b
        if greedy:
            # Deterministic argmax decode (for cross-implementation parity
            # tests against the fused Pallas kernel).
            sample = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            sample = jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
        return (h, sample), (sample, logits)

    _, (samples, logits) = jax.lax.scan(step, (h0, sample0), (cond_proj, step_keys))
    samples = jnp.swapaxes(samples, 0, 1)  # (B, T)
    wave = mulaw_decode(samples, n_classes)
    if return_aux:
        return wave, samples, jnp.swapaxes(logits, 0, 1)
    return wave

"""CPC InfoNCE loss with within-speaker negative sampling.

Functional re-design of reference model.py:167-316 (CPCLoss). Differences in
*implementation* (not semantics), chosen for TPU/XLA:

- All K prediction steps are evaluated in ONE fused computation: the K
  per-step Linear predictors are a stacked (K, C, Z) tensor applied via a
  single einsum (MXU), the K time-shifted positive series are one gather,
  and the negative gathers are batched over K. The reference loops over k in
  Python (model.py:216-313) — fine on a GPU eager framework, wasteful under
  XLA.
- Negative sampling uses explicit JAX PRNG keys threaded by the caller
  (reference uses global torch RNG, model.py:251-272); the sampled
  *distribution* is identical: utterance indices uniform over [0, U) shared
  across speakers, sequence indices uniform over [1, L) plus position,
  modulo L. The reference's known self-negative quirk (a negative can
  coincide with the positive; model.py:247-249) is reproduced by default and
  fixable via ``exclude_self_negatives=True``.
- The reference instantiates ``n_prediction_steps`` predictors but only uses
  the first half (model.py:181,186-189). We keep both behaviors: params hold
  the full stack so reference checkpoints import 1:1, and only the first
  K = n_prediction_steps // 2 slices participate in the loss.
"""

import math
from typing import Tuple, Union

import jax
import jax.numpy as jnp
from flax import struct

from ..configs import ConfCPC


@struct.dataclass
class CPCParams:
    w: jax.Array  # (n_prediction_steps, c_dim, z_dim) stacked predictors
    b: jax.Array  # (n_prediction_steps, z_dim)


def cpc_init(rng: jax.Array, conf: ConfCPC) -> CPCParams:
    """torch.nn.Linear default init per predictor (U(-1/sqrt(c), 1/sqrt(c)))."""
    k = conf.n_prediction_steps
    bound = 1.0 / math.sqrt(conf.c_dim)
    r1, r2 = jax.random.split(rng)
    return CPCParams(
        w=jax.random.uniform(
            r1, (k, conf.c_dim, conf.z_dim), jnp.float32, -bound, bound
        ),
        b=jax.random.uniform(r2, (k, conf.z_dim), jnp.float32, -bound, bound),
    )


def sample_negative_indices(
    conf: ConfCPC, rng: jax.Array, length: int
) -> Tuple[jax.Array, jax.Array]:
    """Draw the negative-sample index tensors for one step.

    Distribution identical to reference model.py:251-272: utterance indices
    uniform over [0, U) shared across speakers; sequence indices uniform over
    [1, L) plus the anchor position, modulo L.
    """
    s = conf.n_speakers_per_batch
    u = conf.n_utterances_per_speaker
    k_steps = conf.n_prediction_steps // 2
    n_neg = conf.n_negatives

    rng_utt, rng_seq = jax.random.split(rng)
    utt_index = jax.random.randint(rng_utt, (k_steps, u, n_neg), 0, u)
    seq_index = jax.random.randint(
        rng_seq, (k_steps, s, u, n_neg, length), 1, length
    )
    seq_index = (seq_index + jnp.arange(length)) % length
    return utt_index, seq_index


def cpc_apply_with_indices(
    params: CPCParams,
    conf: ConfCPC,
    z: jax.Array,
    c: jax.Array,
    utt_index: jax.Array,
    seq_index: jax.Array,
    exclude_self_negatives: bool = False,
    return_scores: bool = False,
    fast_scores: bool = False,
    select_kernel: bool = False,
    select_interpret: bool = False,
    mesh=None,
) -> Union[
    Tuple[jax.Array, jax.Array], Tuple[jax.Array, jax.Array, jax.Array]
]:
    """InfoNCE scoring given precomputed negative indices (testable core).

    Returns ``(loss, accuracies)``, or ``(loss, accuracies, f)`` when
    ``return_scores`` is set.

    ``return_scores`` additionally returns the scaled logits ``f`` of
    shape (K, S*U, 1+Neg, L) (positive fixed at class 0) — used by the
    lockstep parity test to derive a tie-adjusted accuracy bound from the
    measured cross-framework score drift.

    ``fast_scores`` keeps the similarity/selection chain in bfloat16 (the
    bf16-training configuration; see the precision-policy comment below).
    Exact f32 scoring is the default and what the reference-parity tests
    pin.

    ``select_kernel`` routes the scoring+selection through the fused
    Pallas kernel (ops/cpc_select.py): per-(k, s) VMEM-resident tiles, no
    HBM similarity tensor at all — strictly faster than either XLA mode
    on TPU, so the trainers prefer it there (``select_interpret`` runs it
    in interpret mode for CPU tests). On hardware the kernel's sim dot
    carries MXU single-pass noise (~4e-3 rel; exact in interpret mode) —
    see the precision note in ops/cpc_select.py. The accuracy metric is
    unaffected: collision ties are bit-exact on the kernel path (positive
    and colliding negative read the same matmul output element), and the
    residual noise on genuinely-distinct scores is unbiased."""
    s = conf.n_speakers_per_batch
    u = conf.n_utterances_per_speaker
    k_steps = conf.n_prediction_steps // 2
    n_neg = conf.n_negatives
    z_dim = conf.z_dim

    t = z.shape[1]
    length = t - k_steps

    z = z.reshape(s, u, t, z_dim)
    c = c[:, :length, :]  # anchors: contexts with >= k_steps future frames

    # ---- Anchor predictions, all K at once: (K, S, U, L, Z). -------------
    wc = jnp.einsum(
        "btc,kcz->kbtz", c, params.w[:k_steps], preferred_element_type=jnp.float32
    ) + params.b[:k_steps, None, None, :]
    wc = wc.reshape(k_steps, s, u, length, z_dim)

    # ---- Positive series, all K at once: z[t + k] for k = 1..K. ----------
    # Built as K static slices stacked directly in (K, S, U, L, Z) order:
    # the equivalent fancy-index gather + moveaxis lowered to a gather
    # fusion plus a 12 MB relayout copy (~52 us/step, xprof r4); slices
    # are bit-identical and fuse into plain copies.
    z_shift = jnp.stack(
        [z[:, :, k + 1 : k + 1 + length] for k in range(k_steps)], axis=0
    )  # (K, S, U, L, Z)

    if exclude_self_negatives:
        # Optional fix for the reference's self-negative flaw: a sample is
        # "self" iff it indexes the anchor's own utterance at its own
        # time step; bump the time index by one (mod L) in that case.
        same_utt = utt_index[:, None, :, :, None] == jnp.arange(u)[None, None, :, None, None]
        same_t = seq_index == jnp.arange(length)
        seq_index = jnp.where(same_utt & same_t, (seq_index + 1) % length, seq_index)

    # ---- Scores FIRST, then one-hot selection of SCALARS. ----------------
    # Round 2 gathered the negatives' z VECTORS with two one-hot einsums
    # (materializing two (K,S,U,Neg,L,Z) tensors, ~43 MB each) and reduced
    # them against wc elementwise — together >1 ms/step of HBM-bound work
    # at reference shape. Instead: ONE batched MXU matmul scores every
    # anchor against every within-speaker candidate frame, and the negative
    # selection contracts the one-hots against sim SCORES (scalars, not
    # 64-vectors): stage g1 contracts the time one-hot over M, stage f_neg
    # the utterance one-hot over V. No (...,Z) negative tensor ever exists.
    # A plain fancy-index gather is NOT an option here: XLA's TPU gather
    # ran this shape at ~13 ms/step when tried.
    #
    # Precision policy (r4; benchmarks/xprof_cpc.py): the selection chain
    # is HBM-bound on the (K,S,U,L,V,M) sim tensor — 100 MB in f32, and
    # XLA lowers the one-hot contractions to gather/scatter-style fusions
    # whose cost scales with those bytes (measured 1.6 ms of the 2.65 ms
    # step: sim 248 us + relayout copy 153 us + select 484 us + backward
    # scatter 359 us + d_wc/d_z 380 us). Two modes:
    #
    # - ``fast_scores`` (bf16 training): sim computed from bf16 inputs and
    #   KEPT bf16 — halves every byte the chain moves. Scores then carry
    #   ~bf16-relative noise, so the accuracy tie-break below widens to a
    #   bf16-matched tolerance: exact codeword ties (which are exact in
    #   the f32 value domain) stay within it, at the cost of also counting
    #   genuine sub-1e-2 near-losses as correct. Loss/gradients see the
    #   same noise — irrelevant against bf16 activations upstream.
    # - exact mode (f32 / parity / CPU): sim and both one-hot contractions
    #   run at HIGHEST so each selection passes sim values through
    #   bit-exactly (one nonzero term per output) and a tie-collision
    #   negative reproduces f_pos's f32 value to ~1 ulp; the 1e-5 epsilon
    #   then only has to absorb accumulation-order noise.
    if select_kernel and not select_interpret and length % 8 != 0:
        # The kernel's utterance selection is a dynamic SUBLANE slice at
        # v * L, which Mosaic requires 8-aligned — true for the reference
        # shape (L = 64) but not for arbitrary sample_frames overrides.
        # Fall back to the XLA formulation rather than fail to compile.
        from ..utils.warnings_once import warn_once

        warn_once(
            f"CPC selection kernel disabled: latent length {length} is not "
            "a multiple of 8 (Mosaic sublane alignment); using the XLA "
            "selection path. Results are identical; throughput is lower."
        )
        select_kernel = False
    if select_kernel and mesh is not None:
        from ..parallel.mesh import DATA_AXIS as _DA

        if s % mesh.shape[_DA] != 0:
            from ..utils.warnings_once import warn_once

            warn_once(
                f"CPC selection kernel disabled: {s} speakers do not divide "
                f"the data mesh axis ({mesh.shape[_DA]}); using the XLA "
                "selection path. Results are identical; throughput is lower."
            )
            select_kernel = False  # speaker axis doesn't shard: XLA path
    if select_kernel:
        from ..ops.cpc_select import cpc_negative_scores

        wc32 = wc.astype(jnp.float32)
        zs32 = z_shift.astype(jnp.float32)
        if mesh is not None:
            # Like the fused LSTM (models/rnn.py): a pallas_call has no
            # GSPMD rule, so under a mesh the kernel runs per-shard inside
            # a shard_map over the data axis — the speaker axis is the
            # data-sharded one and the scoring is per-(k, s) local.
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS

            dp5 = P(None, DATA_AXIS, None, None, None)
            dp4 = P(None, DATA_AXIS, None, None)
            f_neg, f_pos_k = jax.shard_map(
                lambda a, b, ui, si: cpc_negative_scores(
                    a, b, ui, si, select_interpret
                ),
                mesh=mesh,
                in_specs=(dp5, dp5, P(), dp5),
                out_specs=(dp5, dp4),
                check_vma=False,
            )(wc32, zs32, utt_index, seq_index)
        else:
            f_neg, f_pos_k = cpc_negative_scores(
                wc32, zs32, utt_index, seq_index, select_interpret
            )
        # Kernel selection passes sim values through exactly (one nonzero
        # term per output); the sim dot itself runs at MXU single-pass
        # precision on hardware (~4e-3 rel — see the accuracy-recompute
        # note below), which bf16 training tolerates everywhere else too.
        fast_scores = False
    elif fast_scores:
        sim_dtype, prec = jnp.bfloat16, None
    else:
        sim_dtype, prec = jnp.float32, jax.lax.Precision.HIGHEST
    if not select_kernel:
        sim = jnp.einsum(
            "ksulz,ksvmz->ksulvm",
            wc.astype(jnp.bfloat16) if fast_scores else wc,
            z_shift.astype(jnp.bfloat16 if fast_scores else wc.dtype),
            preferred_element_type=sim_dtype,
            precision=prec,
        )  # (K, S, U, L, V, M): anchor (u, l) x same-speaker candidate (v, m)
        onehot_t = (
            seq_index[..., None] == jnp.arange(length)
        ).astype(sim.dtype)
        g1 = jnp.einsum(
            "ksulvm,ksunlm->ksunlv", sim, onehot_t,
            preferred_element_type=sim_dtype,
            precision=prec,
        )  # (K, S, U, Neg, L, V): time-selected scores, all utterances
        onehot_u = (utt_index[..., None] == jnp.arange(u)).astype(sim.dtype)
        f_neg = jnp.einsum(
            "ksunlv,kunv->ksunl", g1, onehot_u,
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    # Positive scores. XLA paths: the elementwise diagonal (z_shift is
    # already the (k-shifted) positive series) — cheap, and keeps f_pos's
    # accumulation order identical to round 2's (lockstep-parity tested).
    # Kernel path: the v = u block diagonal comes out of the SAME matmul
    # as the negatives, so a tie-collision negative equals its positive
    # bit-for-bit (the accuracy epsilon only absorbs genuine near-ties),
    # and the separate 12 MB elementwise chain disappears.
    if select_kernel:
        f_pos = f_pos_k
    else:
        f_pos = jnp.sum(z_shift * wc, axis=-1)  # (K, S, U, L)
    f = jnp.concatenate(
        [f_pos[:, :, :, None, :], f_neg], axis=3
    ) / math.sqrt(z_dim)
    f = f.reshape(k_steps, s * u, 1 + n_neg, length)

    # Positive is always class 0 (ordering of the concat above).
    log_probs = jax.nn.log_softmax(f, axis=2)
    loss_per_k = -jnp.mean(log_probs[:, :, 0, :], axis=(1, 2))  # (K,)
    # Accuracy with a rounding-tolerant tie-break. z is QUANTIZED, so a
    # negative frequently lands on the positive's exact codeword — an
    # exact score tie, which the reference's argmax counts as correct
    # (first index wins, torch.argmax semantics; model.py:307-312). Here
    # f_pos (elementwise reduce) and f_neg (sim matmul) accumulate in
    # different orders, so a true tie can differ by ~1 ulp (exact mode) or
    # ~bf16 noise (fast_scores) and a plain argmax would break ~half such
    # ties toward the negative, deflating the metric by the code-collision
    # rate (measured ~0.25 early in training). The epsilon only affects
    # the reported metric, not the loss/gradients.
    if fast_scores:
        # f32 tie-break recompute (ADVICE r4): bf16 scores carry ~1e-2
        # relative noise, and widening the tie epsilon to cover it counts
        # genuine sub-1% near-losses as correct, inflating the metric.
        # Instead: take the bf16 argmax negative per (k, s, u, l),
        # recompute ITS score and the positive's in f32 — from the SAME
        # bf16-rounded inputs the sim matmul saw, so exact codeword
        # collisions (z is quantized) remain exact ties — and tie-break
        # those at the exact path's 1e-5. Metric-only (stop_gradient);
        # one (K,S,U*L)-row gather + two (K,S,U,L) reduces off the
        # loss/grad path, on a path that already forgoes the kernel. (The
        # KERNEL path does not need this and must not pay the gather —
        # measured 0.75 ms/step, 962 -> 557 steps/s, when tried: there a
        # collision tie is BIT-EXACT because positive and negative read
        # the same matmul output element, so the plain >= comparison
        # below already counts ties correctly; residual dot noise on
        # genuinely-distinct scores is unbiased and ~4e-3.)
        wc16 = (
            jax.lax.stop_gradient(wc)
            .astype(jnp.bfloat16)
            .astype(jnp.float32)
        )
        zs16 = (
            jax.lax.stop_gradient(z_shift)
            .astype(jnp.bfloat16)
            .astype(jnp.float32)
        )
        n_star = jnp.argmax(
            jax.lax.stop_gradient(f_neg), axis=3
        )  # (K, S, U, L)
        utt_b = jnp.broadcast_to(
            utt_index[:, None, :, :], f_neg.shape[:3] + (f_neg.shape[3],)
        )  # (K, S, U, Neg)
        v_star = jnp.take_along_axis(utt_b, n_star, axis=3)
        m_star = jnp.take_along_axis(
            seq_index, n_star[:, :, :, None, :], axis=3
        )[:, :, :, 0, :]
        k_, s_, v_, m_, zd = zs16.shape
        flat = (v_star * m_ + m_star).reshape(k_, s_, -1)  # (K, S, U*L)
        z_sel = jnp.take_along_axis(
            zs16.reshape(k_, s_, v_ * m_, zd), flat[..., None], axis=2
        ).reshape(k_, s_, u, length, zd)
        scale = 1.0 / math.sqrt(z_dim)
        f_pos32 = jnp.sum(zs16 * wc16, axis=-1) * scale  # (K, S, U, L)
        f_neg32 = jnp.sum(z_sel * wc16, axis=-1) * scale
        tol32 = 1e-5 * (1.0 + jnp.abs(f_pos32))
        accuracies = jnp.mean(
            (f_pos32 + tol32 >= f_neg32).astype(jnp.float32), axis=(1, 2, 3)
        )  # (K,)
    else:
        tol = 1e-5 * (1.0 + jnp.abs(f[:, :, :1, :]))
        accuracies = jnp.mean(
            (
                f[:, :, :1, :] + tol
                >= jnp.max(f[:, :, 1:, :], axis=2, keepdims=True)
            ).astype(jnp.float32),
            axis=(1, 2, 3),
        )  # (K,)

    if return_scores:
        return jnp.mean(loss_per_k), accuracies, f
    return jnp.mean(loss_per_k), accuracies


def cpc_apply(
    params: CPCParams,
    conf: ConfCPC,
    z: jax.Array,
    c: jax.Array,
    rng: jax.Array,
    exclude_self_negatives: bool = False,
    fast_scores: bool = False,
    select_kernel: bool = False,
    select_interpret: bool = False,
    mesh=None,
) -> Tuple[jax.Array, jax.Array]:
    """InfoNCE over k = 1..n_prediction_steps//2 future steps.

    Args:
        z: (Spk*Utt, T, Z) quantized acoustic units.
        c: (Spk*Utt, T, C) LSTM context.
        rng: PRNG key for this step's negative sampling.
    Returns:
        (scalar loss, per-step accuracies (K,)).
    """
    k_steps = conf.n_prediction_steps // 2
    length = z.shape[1] - k_steps
    utt_index, seq_index = sample_negative_indices(conf, rng, length)
    return cpc_apply_with_indices(
        params, conf, z, c, utt_index, seq_index, exclude_self_negatives,
        fast_scores=fast_scores,
        select_kernel=select_kernel, select_interpret=select_interpret,
        mesh=mesh,
    )

"""Fused Pallas GRU scan (forward + backward) for teacher-forced vocoder
training.

The vocoder's sample-level AR GRU(896) runs 5,120 sequential steps per
train batch (reference rnnms contract at config.py:74-77; teacher forcing
makes the INPUT projection parallel but the recurrence stays sequential).
An xprof device trace of the train step (benchmarks/xprof_vocoder.py, v5e)
showed the ``lax.scan`` forward+backward (models/rnn.py:gru_scan) at
~25 ms of the 60 ms device step — and only ~9.6 ms of that is the actual
recurrent matmul; the rest is per-step dynamic-slice/update bookkeeping
and small gate fusions, the exact pathology the fused LSTM kernel
(ops/lstm_scan.py) removed from the CPC context net.

Same discipline here, adapted to GRU semantics (torch gate order r, z, n;
the candidate gate applies the reset BETWEEN the biases:
``n = tanh(xn + bxn + r * (hn + bhn))``, so ``bh`` must ride inside the
kernel — it cannot fold into the hoisted input projection):

- Forward: ``wh`` (896 x 2688 bf16, 4.6 MiB) and ``bh`` are VMEM-resident
  for the whole sequence; the precomputed input projection streams through
  the sequential grid in time chunks (automatic double buffering); h
  carries in f32 VMEM scratch. Per step: ONE MXU matmul + VPU gate math.
  Residuals for the backward are the ACTIVATED gates (r, z, n) and the
  recurrent candidate term hn — storing hn avoids recomputing the whole
  ``h_prev @ wh`` matmul in the backward (which would double its MXU
  work); recovering hn from n algebraically (arctanh) is numerically
  unstable at |n| -> 1, so it is stored instead (bf16, T x B x H).
- Backward (custom VJP): streams the residuals REVERSED, propagates dh
  right-to-left with one (B, 3H) x (3H, H) matmul per step, and emits
  per-step pre-activation gate grads in BOTH flavors — dgates_x
  (da_r, da_z, da_n; == dxproj) and dgates_h (da_r, da_z, dhn) — so the
  weight gradient becomes ONE deep-contraction (H, T*B) x (T*B, 3H) MXU
  matmul outside the kernel, exactly like gru_scan's custom VJP but
  without the T-long scan bookkeeping and with bf16 (not f32) residual
  traffic.

Parity: pinned against models/rnn.py:gru_scan (and transitively the torch
GRU goldens) by tests/test_rnn.py at bf16 tolerance; the bench parity gate
re-asserts it COMPILED on the bench chip (bench.py kernel_parity section).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_chunk(t: int, target: int = 8) -> int:
    """Largest divisor of t that is <= target (the grid must tile T
    exactly). 8 (not the LSTM kernel's 16) keeps the fwd working set —
    streamed xproj in, plus acts/hn/hs out, double-buffered, plus the
    resident 4.6 MiB wh — inside the ~16 MiB VMEM budget at the vocoder
    shape (B=32, 3H=2688)."""
    return next(d for d in range(min(target, t), 0, -1) if t % d == 0)


def _fwd_kernel(
    xproj_ref,  # (CT, B, 3H) bf16 — streamed
    wh_ref,  # (H, 3H) bf16 — resident
    bh_ref,  # (1, 3H) f32 — resident
    h0_ref,  # (B, H) f32
    *rest,  # outputs then scratch; residuals only when saving:
    #   hs_ref (CT, B, H) bf16 — out, streamed
    #   [acts_ref (CT, B, 3H) bf16 — out: sigmoid r/z, tanh n]
    #   [hn_ref (CT, B, H) bf16 — out: recurrent candidate term]
    #   hT_ref (B, H) f32 — out, constant block
    #   h_scr (B, H) f32 scratch
    chunk_t: int,
    hidden: int,
    save_residuals: bool,
):
    if save_residuals:
        hs_ref, acts_ref, hn_ref, hT_ref, h_scr = rest
    else:
        # Inference/no-grad variant: XLA cannot DCE pallas outputs, so an
        # undifferentiated caller would otherwise pay the residual HBM
        # writes for nothing.
        hs_ref, hT_ref, h_scr = rest
        acts_ref = hn_ref = None

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_scr[:] = h0_ref[:]

    def step(t, _):
        h = h_scr[:]
        hproj = jnp.dot(
            h.astype(jnp.bfloat16), wh_ref[:],
            preferred_element_type=jnp.float32,
        ) + bh_ref[:]  # (B, 3H) + (1, 3H) broadcast — no 1D relayout
        xp = xproj_ref[t].astype(jnp.float32)
        r = jax.nn.sigmoid(xp[:, :hidden] + hproj[:, :hidden])
        z = jax.nn.sigmoid(
            xp[:, hidden : 2 * hidden] + hproj[:, hidden : 2 * hidden]
        )
        hn = hproj[:, 2 * hidden :]
        n = jnp.tanh(xp[:, 2 * hidden :] + r * hn)
        h_new = (1.0 - z) * n + z * h
        if save_residuals:
            acts_ref[t] = jnp.concatenate([r, z, n], axis=-1).astype(
                jnp.bfloat16
            )
            hn_ref[t] = hn.astype(jnp.bfloat16)
        hs_ref[t] = h_new.astype(jnp.bfloat16)
        h_scr[:] = h_new
        return 0

    jax.lax.fori_loop(0, chunk_t, step, 0)
    hT_ref[:] = h_scr[:]


def _bwd_kernel(
    acts_ref,  # (CT, B, 3H) bf16 — streamed REVERSED
    hn_ref,  # (CT, B, H) bf16 — streamed reversed
    hprev_ref,  # (CT, B, H) bf16 — streamed reversed (h entering each step)
    dhs_ref,  # (CT, B, H) bf16 — streamed reversed
    wht_ref,  # (3H, H) bf16 — resident (wh transposed)
    dhT_ref,  # (B, H) f32
    dgx_ref,  # (CT, B, 3H) bf16 — out (== dxproj), reversed
    dgh_ref,  # (CT, B, 3H) bf16 — out (feeds dwh/dbh), reversed
    dh0_ref,  # (B, H) f32 — out, constant block
    dh_scr,  # (B, H) f32
    *,
    chunk_t: int,
    hidden: int,
):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dh_scr[:] = dhT_ref[:]

    def step(k, _):
        t = chunk_t - 1 - k  # walk the chunk right-to-left
        acts = acts_ref[t].astype(jnp.float32)
        r = acts[:, :hidden]
        z = acts[:, hidden : 2 * hidden]
        n = acts[:, 2 * hidden :]
        hn = hn_ref[t].astype(jnp.float32)
        h_prev = hprev_ref[t].astype(jnp.float32)
        dh = dh_scr[:] + dhs_ref[t].astype(jnp.float32)
        # Backprop through h = (1-z)*n + z*h_prev.
        dn = dh * (1.0 - z)
        dz = dh * (h_prev - n)
        da_n = dn * (1.0 - n * n)  # a_n = xn + r*hn
        dr = da_n * hn
        dhn = da_n * r
        da_r = dr * r * (1.0 - r)  # a_r = xr + hr
        da_z = dz * z * (1.0 - z)  # a_z = xz + hz
        dgh = jnp.concatenate([da_r, da_z, dhn], axis=-1)
        dgx_ref[t] = jnp.concatenate([da_r, da_z, da_n], axis=-1).astype(
            jnp.bfloat16
        )
        dgh_ref[t] = dgh.astype(jnp.bfloat16)
        dh_scr[:] = dh * z + jnp.dot(
            dgh.astype(jnp.bfloat16), wht_ref[:],
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, chunk_t, step, 0)
    dh0_ref[:] = dh_scr[:]


@functools.partial(
    jax.jit,
    static_argnames=("hidden", "chunk_t", "interpret", "save_residuals"),
)
def _fwd_call(xproj, wh, bh, h0, hidden, chunk_t, interpret,
              save_residuals=True):
    t, b, gdim = xproj.shape
    n_chunks = t // chunk_t
    stream = lambda width: pl.BlockSpec(
        (chunk_t, b, width), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    const = lambda: pl.BlockSpec(
        (b, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    res_specs = [stream(gdim), stream(hidden)] if save_residuals else []
    res_shapes = (
        [
            jax.ShapeDtypeStruct((t, b, gdim), jnp.bfloat16),
            jax.ShapeDtypeStruct((t, b, hidden), jnp.bfloat16),
        ]
        if save_residuals
        else []
    )
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, chunk_t=chunk_t, hidden=hidden,
            save_residuals=save_residuals,
        ),
        grid=(n_chunks,),
        in_specs=[
            stream(gdim),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[stream(hidden)] + res_specs + [const()],
        out_shape=[jax.ShapeDtypeStruct((t, b, hidden), jnp.bfloat16)]
        + res_shapes
        + [jax.ShapeDtypeStruct((b, hidden), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32)],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(xproj, wh, bh, h0)


@functools.partial(
    jax.jit, static_argnames=("hidden", "chunk_t", "interpret")
)
def _bwd_call(acts, hns, hprevs, dhs, wh_t, dhT, hidden, chunk_t, interpret):
    t, b, gdim = acts.shape
    n_chunks = t // chunk_t
    rev = lambda width: pl.BlockSpec(
        (chunk_t, b, width),
        lambda i, n=n_chunks: (n - 1 - i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    const = lambda: pl.BlockSpec(
        (b, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, chunk_t=chunk_t, hidden=hidden),
        grid=(n_chunks,),
        in_specs=[
            rev(gdim),
            rev(hidden),
            rev(hidden),
            rev(hidden),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[rev(gdim), rev(gdim), const()],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, gdim), jnp.bfloat16),
            jax.ShapeDtypeStruct((t, b, gdim), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, hidden), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32)],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(acts, hns, hprevs, dhs, wh_t, dhT)


def _fwd_kernel_masked(
    xproj_ref,  # (CT, B, 3H) bf16 — streamed
    valid_ref,  # (CT, B, 1) int32 — streamed; 0 = carry passes through
    wh_ref,  # (H, 3H) bf16 — resident
    bh_ref,  # (1, 3H) f32 — resident
    h0_ref,  # (B, H) f32
    hs_ref,  # (CT, B, H) bf16 — out, streamed
    hT_ref,  # (B, H) f32 — out, constant block
    h_scr,  # (B, H) f32 scratch
    *,
    chunk_t: int,
    hidden: int,
):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_scr[:] = h0_ref[:]

    def step(t, _):
        h = h_scr[:]
        hproj = jnp.dot(
            h.astype(jnp.bfloat16), wh_ref[:],
            preferred_element_type=jnp.float32,
        ) + bh_ref[:]
        xp = xproj_ref[t].astype(jnp.float32)
        r = jax.nn.sigmoid(xp[:, :hidden] + hproj[:, :hidden])
        z = jax.nn.sigmoid(
            xp[:, hidden : 2 * hidden] + hproj[:, hidden : 2 * hidden]
        )
        n = jnp.tanh(xp[:, 2 * hidden :] + r * hproj[:, 2 * hidden :])
        h_new = (1.0 - z) * n + z * h
        # Ragged-batch mask: rows whose valid flag is 0 at this step keep
        # their carry (the zero initial state through a padded prefix), so
        # a time-reversed padded batch reproduces each row's unpadded
        # reverse scan bit-for-bit on its valid region
        # (models/vocoder.py:build_conditioning_frames_ragged).
        h_new = jnp.where(valid_ref[t] != 0, h_new, h)
        hs_ref[t] = h_new.astype(jnp.bfloat16)
        h_scr[:] = h_new
        return 0

    jax.lax.fori_loop(0, chunk_t, step, 0)
    hT_ref[:] = h_scr[:]


@functools.partial(
    jax.jit, static_argnames=("hidden", "chunk_t", "interpret")
)
def _fwd_call_masked(xproj, valid, wh, bh, h0, hidden, chunk_t, interpret):
    t, b, gdim = xproj.shape
    n_chunks = t // chunk_t
    stream = lambda width: pl.BlockSpec(
        (chunk_t, b, width), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel_masked, chunk_t=chunk_t, hidden=hidden
        ),
        grid=(n_chunks,),
        in_specs=[
            stream(gdim),
            stream(1),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            stream(hidden),
            pl.BlockSpec(
                (b, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, hidden), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, hidden), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32)],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(xproj, valid, wh, bh, h0)


def fused_gru_scan_masked(
    wh: jax.Array,  # (H, 3H)
    bh: jax.Array,  # (3H,)
    xproj: jax.Array,  # (T, B, 3H)
    valid: jax.Array,  # (T, B) bool/int — 0 freezes the carry that step
    h0: jax.Array,  # (B, H)
    interpret: bool = False,
) -> jax.Array:
    """Masked GRU recurrence (forward-only, no VJP): -> hs (T, B, H) bf16.

    Built for ragged-batch inference (the serving conditioning PreNet):
    masked steps pass the carry through unchanged. Differentiation is not
    supported — train paths use :func:`fused_gru_scan`.
    """
    t = xproj.shape[0]
    hidden = wh.shape[0]
    hs, _hT = _fwd_call_masked(
        xproj.astype(jnp.bfloat16),
        jnp.asarray(valid, jnp.int32)[:, :, None],
        wh.astype(jnp.bfloat16),
        bh.astype(jnp.float32).reshape(1, -1),
        h0.astype(jnp.float32),
        hidden=hidden,
        chunk_t=_pick_chunk(t),
        interpret=interpret,
    )
    return hs


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_gru_scan(
    wh: jax.Array,  # (H, 3H)
    bh: jax.Array,  # (3H,)
    xproj: jax.Array,  # (T, B, 3H) — x @ wx + bx, time-major
    h0: jax.Array,  # (B, H)
    interpret: bool = False,
) -> jax.Array:
    """GRU recurrence as one Pallas kernel: -> hs (T, B, H) bf16.

    Drop-in for models/rnn.py:gru_scan (torch r, z, n gate order,
    reference rnnms AR GRU semantics). T must be static; any T works (the
    grid picks the largest chunk divisor <= 8).

    The primal (undifferentiated) call runs the residual-free variant;
    backward residuals (acts, hn) are emitted only under differentiation
    via the custom-VJP fwd rule.
    """
    hs, _ = _fused_fwd_impl(wh, bh, xproj, h0, interpret,
                            save_residuals=False)
    return hs


def _fused_fwd_impl(wh, bh, xproj, h0, interpret, save_residuals=True):
    t = xproj.shape[0]
    hidden = wh.shape[0]
    out = _fwd_call(
        xproj.astype(jnp.bfloat16),
        wh.astype(jnp.bfloat16),
        bh.astype(jnp.float32).reshape(1, -1),
        h0.astype(jnp.float32),
        hidden=hidden,
        chunk_t=_pick_chunk(t),
        interpret=interpret,
        save_residuals=save_residuals,
    )
    if save_residuals:
        hs, acts, hns, _hT = out
        return hs, (acts, hns)
    hs, _hT = out
    return hs, None


def _fused_fwd(wh, bh, xproj, h0, interpret):
    hs, (acts, hns) = _fused_fwd_impl(wh, bh, xproj, h0, interpret)
    return hs, (wh, xproj, h0, acts, hns, hs)


def _fused_bwd(interpret, res, dhs):
    wh, xproj, h0, acts, hns, hs = res
    t = acts.shape[0]
    hidden = wh.shape[0]
    h_prevs = jnp.concatenate(
        [h0.astype(hs.dtype)[None], hs[:-1]], axis=0
    )  # (T, B, H) bf16
    dgx, dgh, dh0 = _bwd_call(
        acts,
        hns,
        h_prevs,
        dhs.astype(jnp.bfloat16),
        jnp.swapaxes(wh, 0, 1).astype(jnp.bfloat16),
        jnp.zeros_like(h0, jnp.float32),
        hidden=hidden,
        chunk_t=_pick_chunk(t),
        interpret=interpret,
    )
    # Weight/bias gradients as deep-contraction XLA reductions (T*B deep).
    dwh = jnp.einsum(
        "tbh,tbg->hg", h_prevs, dgh, preferred_element_type=jnp.float32
    ).astype(wh.dtype)
    dbh = jnp.sum(dgh, axis=(0, 1), dtype=jnp.float32)
    return dwh, dbh, dgx.astype(xproj.dtype), dh0.astype(h0.dtype)


fused_gru_scan.defvjp(_fused_fwd, _fused_bwd)

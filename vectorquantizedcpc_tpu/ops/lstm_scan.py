"""Fused Pallas LSTM scan (forward + backward) for the CPC context net.

The encoder's LSTM(64 -> 256) over 70 latent frames (reference model.py:57)
is tiny per step — a (B, 256) x (256, 1024) matmul plus gate math — so under
``lax.scan`` XLA emits ~2 kernel fusions, several dynamic slices/updates,
and loop bookkeeping PER TIMESTEP: an xprof trace of the CPC train epoch
showed the LSTM block (~280 small fusions + slice/update traffic per step,
forward and backward) at over a third of the whole 1.9 ms device step —
pure overhead around ~0.05 ms of actual matmul work.

Here the whole recurrence is ONE ``pallas_call`` per direction:

- Forward: the recurrent kernel wh (256 x 1024 bf16, 0.5 MiB) is
  VMEM-resident for the whole sequence; the precomputed input projection
  ``x @ wx + b`` streams through the sequential grid in time chunks with
  automatic double buffering; h/c carry in VMEM scratch (f32). Per step:
  one MXU matmul + VPU gate math, no per-step kernel launches.
- Backward (custom VJP, same recompute strategy as models/rnn.py:gru_scan):
  the forward stores the ACTIVATED gates (sigmoid i/f/o, tanh g) and the
  incoming cell series c_prev; the reverse kernel recomputes tanh(c_t)
  from them (VPU), propagates dh/dc right-to-left with one
  (B, 1024) x (1024, 256) matmul per step, and emits per-step dgates.
  The weight gradient then becomes ONE deep-contraction
  (H, T*B) x (T*B, 4H) MXU matmul outside the kernel (XLA einsum) instead
  of T low-utilization outer products inside the backward loop.

Gate order follows torch.nn.LSTM (i, f, g, o) exactly like the scan path
(models/rnn.py:lstm_apply), so the two paths are interchangeable; parity is
pinned by tests/test_rnn.py against the scan (and transitively against the
torch goldens). Used on TPU for unsharded jit programs; sharded (GSPMD)
programs keep the scan path — a pallas_call has no partitioning rule.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_chunk(t: int, target: int = 16) -> int:
    """Largest divisor of t that is <= target (the grid must tile T exactly)."""
    return next(d for d in range(min(target, t), 0, -1) if t % d == 0)


def _fwd_kernel(
    xproj_ref,  # (CT, B, 4H) bf16 — streamed
    wh_ref,  # (H, 4H) bf16 — resident
    h0_ref,  # (B, H) f32
    c0_ref,  # (B, H) f32
    *rest,  # outputs then scratch; residual outputs only when saving:
    #   hs_ref (CT, B, H) bf16 — out, streamed
    #   [acts_ref (CT, B, 4H) bf16 — out: sigmoid(i/f/o), tanh(g)]
    #   [cprev_ref (CT, B, H) f32 — out: cell state ENTERING each step]
    #   hT_ref, cT_ref (B, H) f32 — out, constant blocks
    #   h_scr, c_scr (B, H) f32 scratch
    chunk_t: int,
    hidden: int,
    save_residuals: bool,
):
    if save_residuals:
        hs_ref, acts_ref, cprev_ref, hT_ref, cT_ref, h_scr, c_scr = rest
    else:
        # Inference variant: XLA cannot dead-code-eliminate pallas outputs,
        # so a pure-forward caller (encoder_encode) would otherwise pay
        # ~2.5x the necessary HBM writes for residuals nobody reads.
        hs_ref, hT_ref, cT_ref, h_scr, c_scr = rest
        acts_ref = cprev_ref = None

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    def step(t, _):
        h, c = h_scr[:], c_scr[:]
        if save_residuals:
            cprev_ref[t] = c
        gates = xproj_ref[t].astype(jnp.float32) + jnp.dot(
            h.astype(jnp.bfloat16), wh_ref[:],
            preferred_element_type=jnp.float32,
        )
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden :])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        if save_residuals:
            acts_ref[t] = jnp.concatenate([i, f, g, o], axis=-1).astype(
                jnp.bfloat16
            )
        hs_ref[t] = h_new.astype(jnp.bfloat16)
        h_scr[:] = h_new
        c_scr[:] = c_new
        return 0

    jax.lax.fori_loop(0, chunk_t, step, 0)
    hT_ref[:] = h_scr[:]
    cT_ref[:] = c_scr[:]


def _bwd_kernel(
    acts_ref,  # (CT, B, 4H) bf16 — streamed REVERSED
    cprev_ref,  # (CT, B, H) f32 — streamed reversed
    dhs_ref,  # (CT, B, H) bf16 — streamed reversed
    wht_ref,  # (4H, H) bf16 — resident (wh transposed)
    dhT_ref,  # (B, H) f32
    dcT_ref,  # (B, H) f32
    dgates_ref,  # (CT, B, 4H) bf16 — out (== dxproj), reversed
    dh0_ref,  # (B, H) f32 — out, constant block
    dc0_ref,  # (B, H) f32 — out, constant block
    dh_scr,  # (B, H) f32
    dc_scr,  # (B, H) f32
    *,
    chunk_t: int,
    hidden: int,
):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dh_scr[:] = dhT_ref[:]
        dc_scr[:] = dcT_ref[:]

    def step(k, _):
        t = chunk_t - 1 - k  # walk the chunk right-to-left
        acts = acts_ref[t].astype(jnp.float32)
        i = acts[:, :hidden]
        f = acts[:, hidden : 2 * hidden]
        g = acts[:, 2 * hidden : 3 * hidden]
        o = acts[:, 3 * hidden :]
        c_prev = cprev_ref[t]
        c = f * c_prev + i * g  # recompute (VPU) instead of storing cs
        tc = jnp.tanh(c)
        dh = dh_scr[:] + dhs_ref[t].astype(jnp.float32)
        do = dh * tc
        dc = dc_scr[:] + dh * o * (1.0 - tc * tc)
        di, df, dg = dc * g, dc * c_prev, dc * i
        da = jnp.concatenate(
            [
                di * i * (1.0 - i),
                df * f * (1.0 - f),
                dg * (1.0 - g * g),
                do * o * (1.0 - o),
            ],
            axis=-1,
        )  # (B, 4H) pre-activation gate grads == dxproj[t]
        dgates_ref[t] = da.astype(jnp.bfloat16)
        dh_scr[:] = jnp.dot(
            da.astype(jnp.bfloat16), wht_ref[:],
            preferred_element_type=jnp.float32,
        )
        dc_scr[:] = dc * f
        return 0

    jax.lax.fori_loop(0, chunk_t, step, 0)
    dh0_ref[:] = dh_scr[:]
    dc0_ref[:] = dc_scr[:]


@functools.partial(
    jax.jit,
    static_argnames=("hidden", "chunk_t", "interpret", "save_residuals"),
)
def _fwd_call(xproj, wh, h0, c0, hidden, chunk_t, interpret,
              save_residuals=True):
    t, b, gdim = xproj.shape
    n_chunks = t // chunk_t
    stream = lambda width, dt: pl.BlockSpec(
        (chunk_t, b, width), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    const = lambda: pl.BlockSpec(
        (b, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    res_specs = (
        [stream(gdim, jnp.bfloat16), stream(hidden, jnp.float32)]
        if save_residuals
        else []
    )
    res_shapes = (
        [
            jax.ShapeDtypeStruct((t, b, gdim), jnp.bfloat16),
            jax.ShapeDtypeStruct((t, b, hidden), jnp.float32),
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
            stream(gdim, jnp.bfloat16),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[stream(hidden, jnp.bfloat16)] + res_specs + [
            const(),
            const(),
        ],
        out_shape=[jax.ShapeDtypeStruct((t, b, hidden), jnp.bfloat16)]
        + res_shapes
        + [
            jax.ShapeDtypeStruct((b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((b, hidden), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, hidden), jnp.float32),
            pltpu.VMEM((b, hidden), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(xproj, wh, h0, c0)


@functools.partial(
    jax.jit, static_argnames=("hidden", "chunk_t", "interpret")
)
def _bwd_call(acts, cprevs, dhs, wh_t, dhT, dcT, hidden, chunk_t, interpret):
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
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[rev(gdim), const(), const()],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, gdim), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((b, hidden), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, hidden), jnp.float32),
            pltpu.VMEM((b, hidden), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(acts, cprevs, dhs, wh_t, dhT, dcT)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_lstm_scan(
    wh: jax.Array,  # (H, 4H)
    xproj: jax.Array,  # (T, B, 4H) — x @ wx + b, time-major
    h0: jax.Array,  # (B, H)
    c0: jax.Array,  # (B, H)
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """LSTM recurrence as one Pallas kernel: -> (hs (T,B,H) bf16, h_T, c_T).

    Drop-in for the ``lax.scan`` body of models/rnn.py:lstm_apply (torch
    i,f,g,o gate order). T must be static; any T works (the grid picks the
    largest chunk divisor <= 16).

    The primal (undifferentiated) call runs the residual-free inference
    kernel — backward residuals (acts, cprev) are emitted only under
    differentiation via the custom-VJP fwd rule.
    """
    hs, hT, cT = _fused_fwd_impl(
        wh, xproj, h0, c0, interpret, save_residuals=False
    )
    return hs, hT, cT


def _fused_fwd_impl(wh, xproj, h0, c0, interpret, save_residuals=True):
    t = xproj.shape[0]
    hidden = wh.shape[0]
    return _fwd_call(
        xproj.astype(jnp.bfloat16),
        wh.astype(jnp.bfloat16),
        h0.astype(jnp.float32),
        c0.astype(jnp.float32),
        hidden=hidden,
        chunk_t=_pick_chunk(t),
        interpret=interpret,
        save_residuals=save_residuals,
    )


def _fused_fwd(wh, xproj, h0, c0, interpret):
    hs, acts, cprevs, hT, cT = _fused_fwd_impl(wh, xproj, h0, c0, interpret)
    return (hs, hT, cT), (wh, xproj, h0, acts, cprevs, hs)


def _fused_bwd(interpret, res, cts):
    wh, xproj, h0, acts, cprevs, hs = res
    dhs, dhT, dcT = cts
    t = acts.shape[0]
    hidden = wh.shape[0]
    dgates, dh0, dc0 = _bwd_call(
        acts,
        cprevs,
        dhs.astype(jnp.bfloat16),
        jnp.swapaxes(wh, 0, 1).astype(jnp.bfloat16),
        dhT.astype(jnp.float32),
        dcT.astype(jnp.float32),
        hidden=hidden,
        chunk_t=_pick_chunk(t),
        interpret=interpret,
    )
    # Weight gradient as ONE deep-contraction MXU matmul (T*B deep).
    h_prevs = jnp.concatenate(
        [h0.astype(hs.dtype)[None], hs[:-1]], axis=0
    )  # (T, B, H)
    dwh = jnp.einsum(
        "tbh,tbg->hg", h_prevs, dgates, preferred_element_type=jnp.float32
    ).astype(wh.dtype)
    return dwh, dgates.astype(xproj.dtype), dh0.astype(h0.dtype), dc0.astype(h0.dtype)


fused_lstm_scan.defvjp(_fused_fwd, _fused_bwd)

"""Recurrent cells (LSTM / GRU / biGRU) as lax.scan loops.

TPU-first design notes:

- The input projection ``x @ Wx`` has no time-step dependence, so it is
  hoisted out of the scan into ONE large ``(B*T, D) @ (D, gates*H)`` matmul
  that tiles onto the MXU. The scan body then only does the recurrent
  ``h @ Wh`` matmul plus cheap VPU elementwise gate math.
- Weight layouts are (in, out) so forward matmuls need no transpose.
- Gate orders follow PyTorch conventions (LSTM: i,f,g,o; GRU: r,z,n) so that
  reference checkpoints (reference model.py:57 LSTM, rnnms GRUs) import by
  pure transpose, with no gate reshuffling.
- Initialization matches torch.nn.LSTM/GRU defaults: U(-1/sqrt(H), 1/sqrt(H))
  for every weight and bias, preserving training-from-scratch parity.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LSTMParams:
    wx: jax.Array  # (D, 4H) input kernel, gates ordered i,f,g,o
    wh: jax.Array  # (H, 4H) recurrent kernel
    b: jax.Array  # (4H,) combined bias (torch's b_ih + b_hh)


@struct.dataclass
class GRUParams:
    wx: jax.Array  # (D, 3H) input kernel, gates ordered r,z,n
    wh: jax.Array  # (H, 3H) recurrent kernel
    bx: jax.Array  # (3H,) input bias (kept separate from bh: the candidate
    bh: jax.Array  # (3H,) recurrent bias   gate applies r BETWEEN the biases)


def lstm_init(rng: jax.Array, in_dim: int, hidden: int) -> LSTMParams:
    k = 1.0 / jnp.sqrt(hidden)
    r1, r2, r3 = jax.random.split(rng, 3)
    return LSTMParams(
        wx=jax.random.uniform(r1, (in_dim, 4 * hidden), jnp.float32, -k, k),
        wh=jax.random.uniform(r2, (hidden, 4 * hidden), jnp.float32, -k, k),
        b=jax.random.uniform(r3, (2, 4 * hidden), jnp.float32, -k, k).sum(0),
    )


def gru_init(rng: jax.Array, in_dim: int, hidden: int) -> GRUParams:
    k = 1.0 / jnp.sqrt(hidden)
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    return GRUParams(
        wx=jax.random.uniform(r1, (in_dim, 3 * hidden), jnp.float32, -k, k),
        wh=jax.random.uniform(r2, (hidden, 3 * hidden), jnp.float32, -k, k),
        bx=jax.random.uniform(r3, (3 * hidden,), jnp.float32, -k, k),
        bh=jax.random.uniform(r4, (3 * hidden,), jnp.float32, -k, k),
    )


def lstm_apply(
    params: LSTMParams,
    x: jax.Array,
    state: Optional[Tuple[jax.Array, jax.Array]] = None,
    unroll: int = 8,
    use_pallas: bool = False,
    interpret: bool = False,
    mesh=None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Run an LSTM over ``x`` of shape (B, T, D).

    Returns (outputs (B, T, H), final (h, c)). Semantics match
    torch.nn.LSTM(batch_first=True) with zero initial state (reference
    model.py:57,69,86).

    ``use_pallas`` routes the recurrence through the fused Pallas kernel
    (ops/lstm_scan.py: whole sequence in one kernel launch, fwd + custom
    bwd) — honored only for bfloat16 compute (the kernel's native
    precision; f32 callers — CPU tests, torch-golden parity — keep the
    scan). Under a ``mesh`` the kernel runs inside a ``shard_map`` over
    the data axis: the batch is data-sharded and the recurrence is
    per-example, so each device runs a fully local kernel on its own
    batch shard with wh broadcast (0.5 MiB — negligible); the input
    projection stays an ordinary GSPMD matmul outside.
    """
    b, t, _ = x.shape
    h_dim = params.wh.shape[0]
    if state is None:
        state = (
            jnp.zeros((b, h_dim), x.dtype),
            jnp.zeros((b, h_dim), x.dtype),
        )

    # Cast weights once so the scan carry keeps a stable dtype under bf16.
    wx = params.wx.astype(x.dtype)
    wh = params.wh.astype(x.dtype)
    bias = params.b.astype(x.dtype)

    # Hoisted input projection: one big MXU matmul over all timesteps.
    xproj = x @ wx + bias  # (B, T, 4H)
    xproj = jnp.swapaxes(xproj, 0, 1)  # (T, B, 4H) scan-major

    if use_pallas and x.dtype == jnp.bfloat16:
        from ..ops.lstm_scan import fused_lstm_scan

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS

            if (b % mesh.shape[DATA_AXIS]) == 0:
                kernel = jax.shard_map(
                    lambda w, xp, h0, c0: fused_lstm_scan(
                        w, xp, h0, c0, interpret
                    ),
                    mesh=mesh,
                    in_specs=(
                        P(), P(None, DATA_AXIS, None),
                        P(DATA_AXIS), P(DATA_AXIS),
                    ),
                    out_specs=(
                        P(None, DATA_AXIS, None), P(DATA_AXIS), P(DATA_AXIS),
                    ),
                    check_vma=False,
                )
                hs, h_t, c_t = kernel(params.wh, xproj, state[0], state[1])
                return (
                    jnp.swapaxes(hs, 0, 1),
                    (h_t.astype(x.dtype), c_t.astype(x.dtype)),
                )
            # Batch doesn't divide the data axis: fall through to scan.
            from ..utils.warnings_once import warn_once

            warn_once(
                f"Fused LSTM kernel disabled: batch {b} does not divide the "
                f"data mesh axis ({mesh.shape[DATA_AXIS]}); using the "
                "lax.scan path. Results are identical; throughput is lower."
            )
        else:
            hs, h_t, c_t = fused_lstm_scan(
                params.wh, xproj, state[0], state[1], interpret
            )
            return (
                jnp.swapaxes(hs, 0, 1),
                (h_t.astype(x.dtype), c_t.astype(x.dtype)),
            )

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + h @ wh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    state, out = jax.lax.scan(step, state, xproj, unroll=unroll)
    return jnp.swapaxes(out, 0, 1), state


def gru_step(
    params: GRUParams, h: jax.Array, xproj_t: jax.Array
) -> jax.Array:
    """One GRU step given the precomputed input projection (x@wx + bx).

    Exposed standalone because the autoregressive vocoder decode loop
    (ops/ar_decode.py) re-uses exactly this body.
    """
    hproj = h @ params.wh.astype(h.dtype) + params.bh.astype(h.dtype)
    xr, xz, xn = jnp.split(xproj_t, 3, axis=-1)
    hr, hz, hn = jnp.split(hproj, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


@jax.custom_vjp
def gru_scan(
    wh: jax.Array, bh: jax.Array, xproj: jax.Array, h0: jax.Array
) -> jax.Array:
    """GRU recurrence over a precomputed input projection: (T, B, 3H) -> hs.

    Functionally identical to ``lax.scan(gru_step)`` but with a custom VJP
    tuned for long sequences (the vocoder's 5,120 sample-level steps,
    reference rnnms contract at config.py:74-77):

    - XLA's autodiff of the scan accumulates the weight gradient
      ``h_prevᵀ @ dgates`` INSIDE the backward scan — a (H, B)x(B, 3H)
      outer-product matmul per step whose contraction dim is the batch
      (32), i.e. ~12% MXU utilization, 5,120 times. Here the backward scan
      only propagates ``dh`` (full-K matmul) and stacks per-step gate
      grads; the weight gradient becomes ONE (H, T*B)x(T*B, 3H) matmul
      with a 163,840-deep contraction. Measured: 72 ms -> ~21 ms for the
      reference vocoder shape's backward.
    - Gates (r, z, n) are recomputed in the backward pass from the carried
      h series (one full-K matmul per step) instead of being stored —
      avoids 3x(T, B, H) residual traffic.
    """
    hs, _ = _gru_scan_fwd_impl(wh, bh, xproj, h0)
    return hs


def _gru_scan_fwd_impl(wh, bh, xproj, h0):
    def step(h, xp_t):
        hproj = h @ wh + bh
        xr, xz, xn = jnp.split(xp_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hproj, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = (1.0 - z) * n + z * h
        return h, h

    h_last, hs = jax.lax.scan(step, h0, xproj, unroll=8)
    return hs, h_last


def _gru_scan_fwd(wh, bh, xproj, h0):
    hs, _ = _gru_scan_fwd_impl(wh, bh, xproj, h0)
    return hs, (wh, bh, xproj, h0, hs)


def _gru_scan_bwd(res, dhs):
    wh, bh, xproj, h0, hs = res
    h_prevs = jnp.concatenate([h0[None], hs[:-1]], axis=0)  # (T, B, H)
    wh_t = wh.T

    def bwd_step(dh_next, inp):
        h_prev, xp_t, dhs_t = inp
        dh = dh_next + dhs_t
        # Recompute the gates (exactly the forward's math).
        hproj = h_prev @ wh + bh
        xr, xz, xn = jnp.split(xp_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hproj, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        # Backprop through h = (1-z)*n + z*h_prev.
        dn = dh * (1.0 - z)
        dz = dh * (h_prev - n)
        da_n = dn * (1.0 - n * n)  # a_n = xn + r*hn
        dr = da_n * hn
        dhn = da_n * r
        da_r = dr * r * (1.0 - r)  # a_r = xr + hr
        da_z = dz * z * (1.0 - z)  # a_z = xz + hz
        dgates_h = jnp.concatenate([da_r, da_z, dhn], axis=-1)
        dgates_x = jnp.concatenate([da_r, da_z, da_n], axis=-1)
        dh_prev = dh * z + dgates_h @ wh_t
        return dh_prev, (dgates_x, dgates_h)

    dh0, (dgx, dgh) = jax.lax.scan(
        bwd_step, jnp.zeros_like(h0), (h_prevs, xproj, dhs),
        reverse=True, unroll=8,
    )
    # The weight gradient as one deep-contraction MXU matmul.
    dwh = jnp.einsum(
        "tbh,tbg->hg", h_prevs, dgh, preferred_element_type=jnp.float32
    ).astype(wh.dtype)
    dbh = jnp.sum(dgh, axis=(0, 1), dtype=jnp.float32).astype(bh.dtype)
    return dwh, dbh, dgx, dh0


gru_scan.defvjp(_gru_scan_fwd, _gru_scan_bwd)


def gru_apply(
    params: GRUParams,
    x: jax.Array,
    h0: Optional[jax.Array] = None,
    reverse: bool = False,
    unroll: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """Run a GRU over ``x`` of shape (B, T, D); returns ((B, T, H), h_T)."""
    b, t, _ = x.shape
    h_dim = params.wh.shape[0]
    if h0 is None:
        h0 = jnp.zeros((b, h_dim), x.dtype)

    xproj = x @ params.wx.astype(x.dtype) + params.bx.astype(x.dtype)
    xproj = jnp.swapaxes(xproj, 0, 1)  # (T, B, 3H), hoisted MXU matmul

    def step(h, xp_t):
        h = gru_step(params, h, xp_t)
        return h, h

    h_last, out = jax.lax.scan(step, h0, xproj, reverse=reverse, unroll=unroll)
    return jnp.swapaxes(out, 0, 1), h_last


def bigru_apply(
    fwd: GRUParams, bwd: GRUParams, x: jax.Array, unroll: int = 8
) -> jax.Array:
    """Bidirectional GRU layer: concat(forward, backward) features (B, T, 2H).

    Matches torch.nn.GRU(bidirectional=True) output layout. Used by the
    vocoder conditioning PreNet (reference config.py:71-73: 2-layer
    bidirectional PreNet).
    """
    out_f, _ = gru_apply(fwd, x, unroll=unroll)
    out_b, _ = gru_apply(bwd, x, reverse=True, unroll=unroll)
    return jnp.concatenate([out_f, out_b], axis=-1)

"""Fused CPC negative-scoring kernel (forward + custom backward).

Replaces the XLA sim/one-hot-selection chain of models/cpc.py
(`sim = wc @ z_shiftᵀ` then two one-hot contractions) for the reference
shape. XLA's lowering materializes the (K, S, U, L, V, M) similarity
tensor in HBM — 50 MB f32 / 25 MB bf16 — and runs the selections as
gather/scatter-style fusions at ~180 GB/s, costing 0.8–1.6 ms of the CPC
train step (xprof; see the precision-policy note in models/cpc.py).

Here the whole computation tiles per (k, s) and never leaves VMEM. Three
hard-won Mosaic lessons shaped the layout (each cost ~3 ms/call when
violated, measured on v5e):

- **No in-kernel relayouts.** Anchors l live on LANES everywhere: seq and
  d_fneg rows are lane vectors, candidate time m is on sublanes, so the
  one-hot compare / mask / reduce chain is pure lane-aligned VPU work. A
  first version reshaped (L,) lane vectors to (L, 1) columns — ~270
  lane→sublane transposes per program dominated its runtime.
- **No transposing dot_generals.** Every matmul is in the MXU's native
  A(M,K) @ B(K,N) form; the transposed operands (wcT per anchor
  utterance, zsT for the backward's d_wc) are prepared OUTSIDE by XLA as
  leading-indexed 4D/3D inputs. Contracting lane-with-lane or
  sublane-with-sublane makes Mosaic materialize an operand transpose
  per call (~12 µs each at (512, 64, 64) f32).
- **Selection reads are dynamic SUBLANE slices** (64-aligned) from a
  (U·L, L) similarity scratch — never lane slices. Alignment matters:
  Mosaic ACCEPTS unaligned dynamic sublane starts but each costs ~1.6 us
  vs ~0.01 us aligned (measured) — which is why z_shift is materialized
  by XLA (aligned v*L rows) instead of the kernel reading raw z at
  v*T + m + k + 1 offsets, and why models/cpc.py gates the kernel on
  L % 8 == 0.

Precision (r5 correction, caught by the bench kernel-parity gate): the
SELECTION is exact — each output passes one sim value through untouched,
and a tie-collision negative is bit-equal to its positive (both read the
same matmul output element). The sim dot itself, however, lowers to a
single MXU bf16 pass for f32 operands on hardware (~4e-3 rel noise;
interpret mode computes true f32, which is why CPU tests see ~1 ulp).
Mosaic's only alternative, Precision.HIGHEST, was measured at 842 vs 962
steps/s on the CPC step (fwd dot only; all three dots: 724) and rejected:
bf16 training tolerates this noise in every other matmul of the step, and
the one consumer that needs exactness — the accuracy tie-break — is safe
by construction: a collision tie is bit-exact (positive and colliding
negative read the same matmul output element), so the plain >= comparison
counts ties correctly, and noise on genuinely-distinct scores only
perturbs the metric unbiasedly at the ~4e-3 near-tie margin. (An f32
recompute of the argmax-negative score outside the kernel was tried and
rejected: its TPU gather cost 0.75 ms/step, 962 -> 557 steps/s.)

Contract (matches models/cpc.py:cpc_apply_with_indices):

    f_neg[k, s, u, n, l] = wc[k, s, u, l] · z_shift[k, s, v, m]
        with v = utt_index[k, u, n], m = seq_index[k, s, u, n, l].
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(
    utt_sref,  # (K*U*N,) int32 SMEM (scalar prefetch)
    wct_ref,  # (1, U, Z, L) f32 — wc per-utterance TRANSPOSED blocks
    zs_ref,  # (1, U*L, Z) f32 — candidates, row v*L + m
    seq_ref,  # (1, U*N, L) int32
    out_ref,  # (1, U*N, L) f32
    fpos_ref,  # (1, U, L) f32 — positives: the v=u block's diagonal
    sim_scr,  # (U*L, L) f32 scratch — simT[v*L + m, l] for the current u
    *,
    u_count: int,
    n_count: int,
    l_count: int,
    s_count: int,
):
    k = pl.program_id(0) // s_count
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (l_count, l_count), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (l_count, l_count), 1)
    eye = iota_m == iota_l
    for u in range(u_count):
        # simT[v*L + m, l] = zs[v, m] . wc_u[l] — ONE native-form matmul
        # per anchor utterance: (U*L, Z) @ (Z, L).
        sim_scr[:] = jnp.dot(
            zs_ref[0], wct_ref[0, u], preferred_element_type=jnp.float32
        )
        # f_pos[u, l] = wc_u[l] . zs[u, l] — the diagonal of the v = u
        # block, free here (and it makes a tie-collision negative EXACTLY
        # equal to its positive: both are the same matmul output element).
        own = sim_scr[u * l_count : (u + 1) * l_count, :]
        fpos_ref[0, u, :] = jnp.sum(jnp.where(eye, own, 0.0), axis=0)
        for n in range(n_count):
            row = u * n_count + n
            v = utt_sref[k * u_count * n_count + row]
            start = pl.multiple_of(v * l_count, l_count)
            blockT = sim_scr[pl.ds(start, l_count), :]  # (m, l)
            seq_row = seq_ref[0, row : row + 1, :]  # (1, L) lane vector
            mask = jnp.broadcast_to(seq_row, iota_m.shape) == iota_m
            out_ref[0, row, :] = jnp.sum(
                jnp.where(mask, blockT, 0.0), axis=0
            )


def _bwd_kernel(
    utt_sref,  # (K*U*N,) int32 SMEM
    dfneg_ref,  # (1, U*N, L) f32
    dfpos_ref,  # (1, U, L) f32
    wc_ref,  # (1, U*L, Z) f32
    zst_ref,  # (1, Z, U*L) f32 — candidates transposed (for d_wc)
    seq_ref,  # (1, U*N, L) int32
    dwct_ref,  # (1, U, Z, L) f32 out — d_wc per-utterance transposed
    dzs_ref,  # (1, U*L, Z) f32 out
    dsim_scr,  # (U*L, L) f32 scratch — W[v*L + m, l] = d_simᵀ
    *,
    u_count: int,
    n_count: int,
    l_count: int,
    s_count: int,
):
    k = pl.program_id(0) // s_count
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (l_count, l_count), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (l_count, l_count), 1)
    eye = iota_m == iota_l
    dzs_ref[0] = jnp.zeros_like(dzs_ref[0])
    for u in range(u_count):
        # W accumulator over the FULL candidate axis, built purely from
        # lane-aligned broadcast-compares. Seeded with the positive's
        # diagonal contribution (v = u block).
        dsim_scr[:] = jnp.zeros_like(dsim_scr[:])
        dp_row = dfpos_ref[0, u : u + 1, :]  # (1, L)
        sl_u = slice(u * l_count, (u + 1) * l_count)
        dsim_scr[sl_u, :] = jnp.where(
            eye, jnp.broadcast_to(dp_row, eye.shape), 0.0
        )
        for n in range(n_count):
            row = u * n_count + n
            v = utt_sref[k * u_count * n_count + row]
            seq_row = seq_ref[0, row : row + 1, :]  # (1, L)
            d_row = dfneg_ref[0, row : row + 1, :]  # (1, L)
            mask = jnp.broadcast_to(seq_row, iota_m.shape) == iota_m
            w = jnp.where(
                mask, jnp.broadcast_to(d_row, iota_m.shape), 0.0
            )  # W[m, l] = [seq[l] == m] * d[l]
            sl_v = pl.ds(pl.multiple_of(v * l_count, l_count), l_count)
            dsim_scr[sl_v, :] = dsim_scr[sl_v, :] + w
        # d_wc_uᵀ[z, l] = sum_{vm} zsᵀ[z, vm] * W[vm, l] — native form.
        dwct_ref[0, u] = jnp.dot(
            zst_ref[0], dsim_scr[:], preferred_element_type=jnp.float32
        )
        # d_zs[vm, z] += sum_l W[vm, l] * wc_u[l, z] — native form.
        dzs_ref[0] = dzs_ref[0] + jnp.dot(
            dsim_scr[:],
            wc_ref[0, u * l_count : (u + 1) * l_count, :],
            preferred_element_type=jnp.float32,
        )


def _specs3(a, b):
    return pl.BlockSpec(
        (1, a, b), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
    )


def _specs4(a, b, c):
    return pl.BlockSpec(
        (1, a, b, c), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )


@functools.partial(
    jax.jit,
    static_argnames=("u_count", "n_count", "l_count", "s_count", "interpret"),
)
def _fwd_call(utt_flat, wct, zs, seq, u_count, n_count, l_count, s_count,
              interpret):
    ks, ul, z = zs.shape
    un = u_count * n_count
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ks,),
        in_specs=[
            _specs4(u_count, z, l_count),
            _specs3(ul, z),
            _specs3(un, l_count),
        ],
        out_specs=[_specs3(un, l_count), _specs3(u_count, l_count)],
        scratch_shapes=[
            pltpu.VMEM((u_count * l_count, l_count), jnp.float32)
        ],
    )
    out, fpos = pl.pallas_call(
        functools.partial(
            _fwd_kernel, u_count=u_count, n_count=n_count,
            l_count=l_count, s_count=s_count,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ks, un, l_count), jnp.float32),
            jax.ShapeDtypeStruct((ks, u_count, l_count), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(utt_flat, wct, zs, seq)
    return out, fpos


@functools.partial(
    jax.jit,
    static_argnames=("u_count", "n_count", "l_count", "s_count", "interpret"),
)
def _bwd_call(utt_flat, dfneg, dfpos, wc, zst, seq, u_count, n_count,
              l_count, s_count, interpret):
    ks, ul, z = wc.shape
    un = u_count * n_count
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ks,),
        in_specs=[
            _specs3(un, l_count),
            _specs3(u_count, l_count),
            _specs3(ul, z),
            _specs3(z, ul),
            _specs3(un, l_count),
        ],
        out_specs=[_specs4(u_count, z, l_count), _specs3(ul, z)],
        scratch_shapes=[
            pltpu.VMEM((u_count * l_count, l_count), jnp.float32)
        ],
    )
    dwct, dzs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, u_count=u_count, n_count=n_count,
            l_count=l_count, s_count=s_count,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ks, u_count, z, l_count), jnp.float32),
            jax.ShapeDtypeStruct((ks, ul, z), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(utt_flat, dfneg, dfpos, wc, zst, seq)
    return dwct, dzs


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def cpc_negative_scores(
    wc: jax.Array,  # (K, S, U, L, Z) f32
    z_shift: jax.Array,  # (K, S, U, L, Z) f32
    utt_index,  # (K, U, N) int32  (integer: zero/float0 cotangent)
    seq_index,  # (K, S, U, N, L) int32 (integer: zero/float0 cotangent)
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """(f_neg (K, S, U, N, L), f_pos (K, S, U, L)) f32 — fused
    VMEM-resident scoring + selection; f_pos is the v = u block diagonal,
    so a tie-collision negative is EXACTLY equal to its positive."""
    return _scores_impl(wc, z_shift, utt_index, seq_index, interpret)


def _scores_impl(wc, z_shift, utt_index, seq_index, interpret):
    k, s, u, l, z = wc.shape
    n = utt_index.shape[-1]
    # wc per-utterance transposed blocks, prepared by XLA (HBM-bandwidth
    # transpose; doing it in-kernel costs ~12 us per matmul).
    wct = jnp.swapaxes(
        wc.astype(jnp.float32).reshape(k * s, u, l, z), 2, 3
    )  # (KS, U, Z, L)
    out, fpos = _fwd_call(
        jnp.asarray(utt_index, jnp.int32).reshape(-1),
        wct,
        z_shift.astype(jnp.float32).reshape(k * s, u * l, z),
        jnp.asarray(seq_index, jnp.int32).reshape(k * s, u * n, l),
        u_count=u, n_count=n, l_count=l, s_count=s,
        interpret=interpret,
    )
    return out.reshape(k, s, u, n, l), fpos.reshape(k, s, u, l)


def _scores_fwd(wc, z_shift, utt_index, seq_index, interpret):
    return (
        _scores_impl(wc, z_shift, utt_index, seq_index, interpret),
        (wc, z_shift, utt_index, seq_index),
    )


def _scores_bwd(interpret, res, d_out):
    import numpy as np

    wc, z_shift, utt_index, seq_index = res
    d_fneg, d_fpos = d_out
    k, s, u, l, z = wc.shape
    n = utt_index.shape[-1]
    zs2 = z_shift.astype(jnp.float32).reshape(k * s, u * l, z)
    dwct, dzs = _bwd_call(
        jnp.asarray(utt_index, jnp.int32).reshape(-1),
        d_fneg.astype(jnp.float32).reshape(k * s, u * n, l),
        d_fpos.astype(jnp.float32).reshape(k * s, u, l),
        wc.astype(jnp.float32).reshape(k * s, u * l, z),
        jnp.swapaxes(zs2, 1, 2),  # (KS, Z, U*L)
        jnp.asarray(seq_index, jnp.int32).reshape(k * s, u * n, l),
        u_count=u, n_count=n, l_count=l, s_count=s,
        interpret=interpret,
    )
    dwc = jnp.swapaxes(dwct, 2, 3).reshape(k, s, u, l, z)
    return (
        dwc.astype(wc.dtype),
        dzs.reshape(k, s, u, l, z).astype(z_shift.dtype),
        np.zeros(utt_index.shape, jax.dtypes.float0),
        np.zeros(seq_index.shape, jax.dtypes.float0),
    )


cpc_negative_scores.defvjp(_scores_fwd, _scores_bwd)

"""Fused autoregressive vocoder decode — the flagship Pallas TPU kernel.

The reference's vocoder inference runs one GRU(896) step per 16 kHz audio
sample in Python/torch (reference network_vocoder.py:69-78 + the external
rnnms generate loop) — per-step kernel-launch overhead makes it the
dominant cost of voice conversion (SURVEY.md §7 "hard parts" #1).

Here the ENTIRE decode is one `pallas_call`:

- All recurrent weights live in VMEM for the whole decode (bf16: AR-GRU
  recurrent kernel 896 x 2688 = 4.6 MiB — or 2.3 MiB int8 — plus the
  prev-sample embedding pre-projected through the input kernel into a
  256 x 2688 lookup table and the FC head) — zero HBM weight traffic/step.
- The conditioning contribution to the GRU input projection is precomputed
  for ALL timesteps by one big XLA matmul AT FRAME RATE and streamed
  chunk-by-chunk through the sequential grid with Pallas' automatic double
  buffering. Conditioning is constant across the ``upsampling_t`` (160)
  samples of a frame, so the kernel indexes the frame row (``t // hop``)
  instead of reading a per-sample copy: 160x less cond HBM traffic per
  step and no sample-rate (T, B, 3H) materialization at all (at batch 128
  x 2 s that tensor alone would be 22 GB — more than v5e HBM).
- Each step is: embedding-table row gather (+ cond add) -> one
  (B, 896) x (896, 2688) MXU matmul -> VPU gate math -> FC head -> Gumbel-max
  categorical sample from the on-core PRNG -> write sample, update carries.
  Hidden state and the next-step embedding rows stay in VMEM scratch across
  the whole utterance (the "HBM/VMEM-resident recurrent state" of
  BASELINE.md).
- ``precision="int8"`` switches the recurrent matmul, the FC1 head and the
  embedding-row gather to weight-only INT8 with STATIC activation scales:
  the GRU hidden state is algebraically bounded in (-1, 1) (h is a convex
  combination of tanh outputs starting from h0 = 0), so quantizing the
  activation is one fused round(x * 127) with NO per-row abs-max reduction,
  and the 1/127 folds into the precomputed per-channel weight scale. The
  one-hot embedding matmul runs int8 x int8 -> int32 (exact row selection);
  FC2's input (post-ReLU) is unbounded so it stays bf16 (256 x 256 — noise).
  Net effect: 2x MXU throughput on ~85% of the per-step MACs and half the
  VMEM weight residency, with strictly less VPU work than round 1's
  dynamic-quant scheme (which benchmarked SLOWER than bf16).

Deterministic greedy mode (argmax) exists for parity tests against the
lax.scan reference implementation (models/vocoder.py:vocoder_generate).
"""

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..configs import ConfVocoderNetwork
from ..models.vocoder import VocoderParams
from .quant import quantize_int8


# Measured int8-vs-bf16 crossover (v5e, bench.py int8_speedup_b*): below
# this batch the step is MXU-latency-bound and the int8 dequant epilogue is
# pure overhead (0.90-0.96x at b8-b32); at and above it the MXU saturates
# and int8's 2x throughput wins (1.08x at b64, 1.32x at b128). "auto"
# precision picks per batch so no caller silently gets the slower mode.
INT8_CROSSOVER_BATCH = 64

# Measured per-step kernel time (us/step) at the benchmarked batch sizes.
# "auto" interpolates this table and picks the mode with the LOWER step
# time at the requested batch — which is simultaneously the
# better-throughput AND better-latency (RTF = us_per_step / 62.5 at
# 16 kHz) choice, so "auto" can never select a mode that breaches an RTF
# budget the other mode meets (VERDICT r3 #6).
#
# The PRIMARY source is the live capture bench.py writes on every run
# (BENCH_STEP_US.json at the repo root, or the path in the
# VQCPC_STEP_US_FILE env var) — so "auto" decisions track the hardware
# that was actually measured (VERDICT r4 #5). This built-in table is the
# fallback when no capture exists; values from BENCH_r04 (v5e; bf16 b8
# derived from decode_bf16_rtf 0.0296 x 62.5).
_STEP_US = {
    "bf16": [(8, 1.85), (32, 2.00), (48, 2.51), (64, 2.98), (128, 5.22)],
    "int8": [(8, 1.94), (32, 2.26), (64, 2.70), (128, 3.82)],
}

STEP_US_CAPTURE_NAME = "BENCH_STEP_US.json"
_capture_cache = {"loaded": False, "table": None}


def _capture_paths():
    import os
    from pathlib import Path

    env = os.environ.get("VQCPC_STEP_US_FILE")
    if env:
        yield Path(env)
    # Repo-root layout (the common dev case: bench.py sits next to the
    # package); harmless no-ops for installed site-packages trees.
    yield Path(__file__).resolve().parents[2] / STEP_US_CAPTURE_NAME
    yield Path.cwd() / STEP_US_CAPTURE_NAME


def load_measured_step_us():
    """The latest bench capture's per-batch step-time table, or None.

    Format (written by bench.py): {"device": ..., "bf16": [[batch, us],
    ...], "int8": [[batch, us], ...]}, batches ascending. A capture
    recorded on a DIFFERENT device kind than the running chip is ignored
    (one warning): timings from another TPU generation would steer
    "auto" toward the wrong mode, breaking the Pareto property the
    resolver promises. Cached after the first read; invalid/partial
    files are ignored (built-in table wins) rather than failing a decode.
    """
    if _capture_cache["loaded"]:
        return _capture_cache["table"]
    _capture_cache["loaded"] = True
    import json

    try:
        import jax

        local_kind = str(jax.devices()[0].device_kind)
    except Exception:
        local_kind = ""

    for path in _capture_paths():
        try:
            with open(path) as f:
                data = json.load(f)
            cap_device = str(data.get("device", ""))
            if local_kind and cap_device and cap_device != local_kind:
                from ..utils.warnings_once import warn_once

                warn_once(
                    f"Ignoring decode step-time capture {path}: it was "
                    f"measured on {cap_device!r} but this process runs on "
                    f"{local_kind!r}; 'auto' precision falls back to the "
                    "built-in table. Run bench.py on this hardware to "
                    "refresh it."
                )
                continue
            table = {
                mode: [(int(b), float(us)) for b, us in data[mode]]
                for mode in ("bf16", "int8")
            }
            if all(len(v) >= 2 for v in table.values()):
                _capture_cache["table"] = table
                return table
        except (OSError, ValueError, KeyError, TypeError):
            continue
    return None


def _interp_step_us(table, batch: int) -> float:
    """Piecewise-linear in batch; clamped extrapolation at the ends."""
    if batch <= table[0][0]:
        return table[0][1]
    for (b0, t0), (b1, t1) in zip(table, table[1:]):
        if batch <= b1:
            return t0 + (t1 - t0) * (batch - b0) / (b1 - b0)
    # Beyond the largest measured batch: scale linearly with batch (the
    # MXU is saturated there, so step time grows ~proportionally).
    b_last, t_last = table[-1]
    return t_last * batch / b_last


def resolve_precision(precision: str, batch: int, step_us=None) -> str:
    """Resolve "auto" to the faster of bf16/int8 for this decode batch.

    "Faster" = lower measured per-step kernel time, which at a fixed
    batch is the Pareto-dominant choice: more samples/s AND lower
    per-stream RTF. The table is, in priority order: ``step_us`` (tests /
    explicit injection), the latest bench capture on disk
    (``load_measured_step_us``), then the built-in ``_STEP_US`` fallback.
    """
    if precision == "auto":
        table = step_us or load_measured_step_us() or _STEP_US
        bf = _interp_step_us(table["bf16"], batch)
        i8 = _interp_step_us(table["int8"], batch)
        return "int8" if i8 < bf else "bf16"
    if precision not in ("bf16", "int8"):
        raise ValueError(f"unknown decode precision: {precision!r}")
    return precision


def _mm(x_f32, w_ref, scale_ref, use_int8: bool):
    """(B, in) f32 @ weight ref -> (B, out) f32, bf16 or weight-only int8.

    int8 requires x in [-1, 1] (the GRU hidden / tanh-bounded activations):
    the static 127x activation quant is one fused round+cast, and the
    activation dequant is pre-folded into ``scale_ref`` (= w_scale / 127),
    so the only extra VPU work vs bf16 is the round and one broadcast
    multiply on the (small) output.
    """
    if use_int8:
        x_i8 = jnp.round(x_f32 * 127.0).astype(jnp.int8)
        acc = jnp.dot(x_i8, w_ref[:], preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * scale_ref[0][None, :]
    return jnp.dot(
        x_f32.astype(jnp.bfloat16), w_ref[:], preferred_element_type=jnp.float32
    )


def _embed_gather(sample_2d, embed_ref, scale_ref, batch, n_classes, use_int8):
    """One-hot MXU row gather from the pre-projected embedding table.

    Mosaic forbids unaligned dynamic row loads from VMEM, so the gather is
    a (B, n_classes) x (n_classes, 3H) matmul. In int8 mode the one-hot is
    int8 (row selection is exact in integer arithmetic) and the dequant is
    one broadcast multiply by the per-channel table scale.
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, (batch, n_classes), 1)
    if use_int8:
        onehot = (sample_2d == iota).astype(jnp.int8)
        acc = jnp.dot(onehot, embed_ref[:], preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * scale_ref[0][None, :]
    onehot = (sample_2d == iota).astype(jnp.bfloat16)
    return jnp.dot(onehot, embed_ref[:], preferred_element_type=jnp.float32)


def _decode_kernel(
    seed_ref,  # (1,) int32 in SMEM (scalar prefetch)
    cond_ref,  # (CHUNK_F, B, 3H) bf16 — frame-rate, streamed per grid step
    h0_ref,  # (B, H) f32 — initial GRU state (resident)
    prev0_ref,  # (B, 1) int32 — previous mu-law class entering this call
    embed_proj_ref,  # (n_classes, 3H) bf16/int8 — resident
    embed_scale_ref,  # (1, 3H) f32
    wh_ref,  # (H, 3H) bf16/int8 — resident
    wh_scale_ref,  # (1, 3H) f32
    bh_ref,  # (1, 3H) f32
    fc1_ref,  # (H, F) bf16/int8
    fc1_scale_ref,  # (1, F) f32
    fc1_b_ref,  # (1, F) f32
    fc2_ref,  # (F, n_classes) bf16 (input is post-ReLU, i.e. unbounded)
    fc2_scale_ref,  # (1, n_classes) f32
    fc2_b_ref,  # (1, n_classes) f32
    out_ref,  # (CHUNK_F * hop, B) int32 — written per grid step
    h_out_ref,  # (B, H) f32 — final GRU state (constant block)
    h_scratch,  # (B, H) f32 — persists across grid steps
    emb_scratch,  # (B, 3H) f32 — embedding rows of the previous sample
    *,
    chunk_frames: int,
    hop: int,
    batch: int,
    hidden: int,
    n_classes: int,
    greedy: bool,
    use_int8: bool,
):
    step_idx = pl.program_id(0)

    @pl.when(step_idx == 0)
    def _init():
        h_scratch[:] = h0_ref[:]
        # Stage the embedding-row projection of the carried-in previous
        # sample (one-hot MXU gather; same trick as the step body).
        emb_scratch[:] = _embed_gather(
            prev0_ref[:], embed_proj_ref, embed_scale_ref,
            batch, n_classes, use_int8,
        )

    if not greedy:
        # Independent per-chunk PRNG stream.
        pltpu.prng_seed(seed_ref[0] + step_idx)

    def step(t, cond_row):
        h = h_scratch[:]  # (B, H) f32
        xp = emb_scratch[:] + cond_row  # (B, 3H)

        hproj = _mm(h, wh_ref, wh_scale_ref, use_int8) + bh_ref[0]
        xr, xz, xn = (
            xp[:, :hidden],
            xp[:, hidden : 2 * hidden],
            xp[:, 2 * hidden :],
        )
        hr, hz, hn = (
            hproj[:, :hidden],
            hproj[:, hidden : 2 * hidden],
            hproj[:, 2 * hidden :],
        )
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h

        fc_hidden = jax.nn.relu(
            _mm(h_new, fc1_ref, fc1_scale_ref, use_int8) + fc1_b_ref[0]
        )
        # FC2's input is unbounded (post-ReLU) so the static-scale trick
        # doesn't apply; at (F, n_classes) = (256, 256) it is ~4% of the
        # step MACs — bf16 always.
        logits = (
            _mm(fc_hidden, fc2_ref, fc2_scale_ref, False) + fc2_b_ref[0]
        )  # (B, n_classes)

        if greedy:
            scores = logits
        else:
            # Gumbel-max trick == categorical sampling from softmax(logits).
            # 24 mantissa-safe bits -> uniform (0, 1]; the masking runs in
            # int32 (Mosaic has no uint32 -> f32 cast).
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((batch, n_classes)), jnp.int32
            )
            u = (
                jax.lax.bitwise_and(bits, (1 << 24) - 1).astype(jnp.float32)
                * (1.0 / (1 << 24))
                + 1e-9
            )
            scores = logits - jnp.log(-jnp.log(u))

        sample = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # (B,)
        out_ref[t, :] = sample
        h_scratch[:] = h_new

        # Stage the next step's input projection.
        emb_scratch[:] = _embed_gather(
            sample[:, None], embed_proj_ref, embed_scale_ref,
            batch, n_classes, use_int8,
        )

    # Nested frame/sample loops: conditioning is constant within a frame,
    # so the (B, 3H) row is read once per ``hop`` samples (no per-step
    # scalar ``t // hop`` divide), and the inner loop is manually unrolled
    # 4x (Mosaic's fori_loop supports only unroll=1/full) to amortize loop
    # control. Step order, and therefore the PRNG consumption order and
    # every sample, is IDENTICAL to the flat loop.
    unroll = 4 if hop % 4 == 0 else 1

    def frame_body(f, _):
        cond_row = cond_ref[f].astype(jnp.float32)  # (B, 3H)

        def sample_body(k, _):
            for j in range(unroll):
                step(f * hop + k * unroll + j, cond_row)
            return 0

        jax.lax.fori_loop(0, hop // unroll, sample_body, 0)
        return 0

    jax.lax.fori_loop(0, chunk_frames, frame_body, 0)
    # State handoff for segmented/continuous decode: the block maps to a
    # constant index, so it lives in VMEM across the grid and flushes to
    # HBM once at the end.
    h_out_ref[:] = h_scratch[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "conf_hidden", "conf_classes", "chunk_frames", "hop", "greedy",
        "use_int8", "interpret",
    ),
)
def _fused_decode_impl(
    cond_proj: jax.Array,  # (Tf, B, 3H) bf16 — FRAME rate
    h0: jax.Array,  # (B, H) f32
    prev0: jax.Array,  # (B, 1) int32
    embed_proj: jax.Array,  # (n_classes, 3H) bf16/int8
    embed_scale: jax.Array,  # (1, 3H) f32
    wh, wh_scale, bh,
    fc1_w, fc1_scale, fc1_b,
    fc2_w, fc2_scale, fc2_b,
    seed: jax.Array,  # (1,) int32
    conf_hidden: int,
    conf_classes: int,
    chunk_frames: int,
    hop: int,
    greedy: bool,
    use_int8: bool,
    interpret: bool,
):
    tf, b, proj3h = cond_proj.shape
    n_chunks = tf // chunk_frames
    chunk_t = chunk_frames * hop
    resident = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (chunk_frames, b, proj3h), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ] + [resident() for _ in range(13)],
        out_specs=[
            pl.BlockSpec(
                (chunk_t, b), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (b, conf_hidden), lambda i, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, conf_hidden), jnp.float32),
            pltpu.VMEM((b, proj3h), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel,
        chunk_frames=chunk_frames,
        hop=hop,
        batch=b,
        hidden=conf_hidden,
        n_classes=conf_classes,
        greedy=greedy,
        use_int8=use_int8,
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((tf * hop, b), jnp.int32),
            jax.ShapeDtypeStruct((b, conf_hidden), jnp.float32),
        ],
        grid_spec=grid_spec,
        # The TPU interpreter (not the generic one) emulates pltpu
        # primitives (PRNG etc.) when testing on CPU.
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        seed, cond_proj, h0, prev0, embed_proj, embed_scale,
        wh, wh_scale, bh, fc1_w, fc1_scale, fc1_b, fc2_w, fc2_scale, fc2_b,
    )


class DecodeWeights(NamedTuple):
    """Kernel-resident tensors, prepared once per (params, precision).

    ``embed_proj`` is the prev-sample embedding table pre-projected through
    the GRU input kernel; ``wx_cond``/``bx`` project conditioning frames
    (project_cond_frames). Everything else feeds the kernel directly.
    """

    embed_proj: jax.Array  # (n_classes, 3H) bf16/int8
    embed_scale: jax.Array  # (1, 3H) f32
    wx_cond: jax.Array  # (V, 3H)
    bx: jax.Array  # (3H,)
    wh: jax.Array
    wh_scale: jax.Array
    bh: jax.Array  # (1, 3H) f32
    fc1_w: jax.Array
    fc1_scale: jax.Array
    fc1_b: jax.Array
    fc2_w: jax.Array
    fc2_scale: jax.Array
    fc2_b: jax.Array


class DecodeState(NamedTuple):
    """Carried AR state for segmented / continuous decode."""

    h: jax.Array  # (B, H) f32 GRU hidden
    prev: jax.Array  # (B,) int32 previous mu-law class


def prep_decode_weights(
    params: VocoderParams, conf: ConfVocoderNetwork, precision: str = "bf16"
) -> DecodeWeights:
    """Hoist + (optionally) quantize everything the kernel keeps in VMEM.

    int8 mode: wh / fc1 activations are bounded in (-1, 1) (GRU algebra),
    so their 1/127 activation-dequant constant folds into the per-channel
    weight scale here — the kernel's dequant is ONE broadcast multiply.
    The embedding table is quantized per-channel (exact int8 row selection
    via the one-hot matmul). FC2 stays bf16 (unbounded post-ReLU input).
    """
    use_int8 = precision == "int8"
    gru = params.ar_gru
    embed_dim = params.ar_embed.shape[1]
    wx_embed, wx_cond = gru.wx[:embed_dim], gru.wx[embed_dim:]
    embed_proj_f32 = params.ar_embed @ wx_embed  # (n_classes, 3H)

    def prep(w, fold_act_scale: bool):
        if use_int8:
            q = quantize_int8(w)
            scale = q.scale / 127.0 if fold_act_scale else q.scale
            return q.values, scale
        return w.astype(jnp.bfloat16), jnp.ones((1, w.shape[1]), jnp.float32)

    embed_q, embed_scale = prep(embed_proj_f32, fold_act_scale=False)
    wh, wh_scale = prep(gru.wh, fold_act_scale=True)
    fc1_w, fc1_scale = prep(params.fc1_w, fold_act_scale=True)
    fc2_w = params.fc2_w.astype(jnp.bfloat16)
    fc2_scale = jnp.ones((1, params.fc2_w.shape[1]), jnp.float32)
    return DecodeWeights(
        embed_proj=embed_q,
        embed_scale=embed_scale,
        wx_cond=wx_cond,
        bx=gru.bx,
        wh=wh,
        wh_scale=wh_scale,
        bh=gru.bh.reshape(1, -1).astype(jnp.float32),
        fc1_w=fc1_w,
        fc1_scale=fc1_scale,
        fc1_b=params.fc1_b.reshape(1, -1).astype(jnp.float32),
        fc2_w=fc2_w,
        fc2_scale=fc2_scale,
        fc2_b=params.fc2_b.reshape(1, -1).astype(jnp.float32),
    )


def project_cond_frames(
    weights: DecodeWeights, cond_frames: jax.Array
) -> jax.Array:
    """Frame-rate conditioning (B, Tf, V) -> GRU input projection (B, Tf, 3H).

    One MXU matmul per utterance at FRAME rate — ``upsampling_t`` (160x)
    smaller than projecting after sample-rate upsampling. The kernel also
    streams conditioning at frame rate (indexing ``t // hop``), so this is
    the final layout: nothing is ever materialized at sample rate.
    """
    return (cond_frames @ weights.wx_cond + weights.bx).astype(jnp.bfloat16)


def init_decode_state(
    batch: int, conf: ConfVocoderNetwork
) -> DecodeState:
    """Fresh-utterance state: zero hidden, mu-law silence previous sample."""
    n_classes = 2 ** conf.rnnms.bits_mu_law
    return DecodeState(
        h=jnp.zeros((batch, conf.rnnms.wave_ar.size_h_rnn), jnp.float32),
        prev=jnp.full((batch,), n_classes // 2, jnp.int32),
    )


def _chunk_frames_heuristic(batch: int, hidden: int, hop: int) -> int:
    # VMEM budget: the streamed frame-rate cond chunk is double-buffered
    # (2 x chunk_f x B x 3H bf16) and the output block is chunk_f x hop x B
    # int32, next to ~7 MiB of resident weights; keep both under ~3 MiB
    # apiece while amortizing grid overhead.
    cond_bytes = 2 * batch * 3 * hidden * 2
    out_bytes = hop * batch * 4
    per_frame = max(cond_bytes, out_bytes)
    return max(1, min(64, (3 << 20) // per_frame))


def fused_ar_decode_segment(
    weights: DecodeWeights,
    conf: ConfVocoderNetwork,
    cond_proj_frames: jax.Array,  # (B, Sf, 3H) bf16 (project_cond_frames)
    state: DecodeState,
    rng: jax.Array,
    chunk: int = 0,
    greedy: bool = False,
    precision: str = "bf16",
    interpret: bool = False,
) -> Tuple[jax.Array, DecodeState]:
    """Decode ``Sf`` conditioning frames continuing from ``state``.

    Returns (mu-law classes (B, Sf*upsampling_t) int32, next state). The
    state handoff is exact: chaining segments reproduces a single-shot
    greedy decode bit-for-bit (tests/test_ar_decode.py). Powers the
    continuous-batching server (infer/serving.py). ``chunk`` is in SAMPLES
    (rounded down to whole frames); 0 = auto.
    """
    hop = conf.rnnms.upsampling_t
    hidden = conf.rnnms.wave_ar.size_h_rnn
    n_classes = 2 ** conf.rnnms.bits_mu_law
    b, sf, _ = cond_proj_frames.shape

    if chunk > 0:
        chunk_f = max(1, chunk // hop)
    else:
        # Must divide Sf exactly (padding would advance the carried state
        # past the segment): largest divisor under the VMEM budget.
        target = _chunk_frames_heuristic(b, hidden, hop)
        chunk_f = next(d for d in range(min(target, sf), 0, -1) if sf % d == 0)

    cond_proj = jnp.swapaxes(cond_proj_frames, 0, 1)  # (Sf, B, 3H)

    seed = jax.random.randint(rng, (1,), 0, np.iinfo(np.int32).max, jnp.int32)
    samples, h_final = _fused_decode_impl(
        cond_proj, state.h, state.prev[:, None],
        weights.embed_proj, weights.embed_scale,
        weights.wh, weights.wh_scale, weights.bh,
        weights.fc1_w, weights.fc1_scale, weights.fc1_b,
        weights.fc2_w, weights.fc2_scale, weights.fc2_b,
        seed,
        conf_hidden=hidden,
        conf_classes=n_classes,
        chunk_frames=chunk_f,
        hop=hop,
        greedy=greedy,
        use_int8=precision == "int8",
        interpret=interpret,
    )
    new_state = DecodeState(h=h_final, prev=samples[-1, :])
    return jnp.swapaxes(samples, 0, 1), new_state


def fused_ar_decode(
    params: VocoderParams,
    conf: ConfVocoderNetwork,
    z_indices: jax.Array,
    speaker: jax.Array,
    rng: jax.Array,
    chunk: int = 0,
    greedy: bool = False,
    precision: str = "bf16",
    interpret: bool = False,
) -> jax.Array:
    """Full voice-conversion decode with the fused kernel.

    Same contract as models.vocoder.vocoder_generate: codes + speaker ->
    linear waveform (B, T) in [-1, 1]. ``precision``: "bf16", "int8"
    (weight-only quantized matmuls) or "auto" (int8 iff the batch is at or
    past the measured crossover, INT8_CROSSOVER_BATCH).
    """
    from ..dsp.mulaw import mulaw_decode
    from ..models.vocoder import build_conditioning_frames

    precision = resolve_precision(precision, z_indices.shape[0])
    n_classes = 2 ** conf.rnnms.bits_mu_law
    hidden = conf.rnnms.wave_ar.size_h_rnn
    use_int8 = precision == "int8"
    hop = conf.rnnms.upsampling_t

    weights = prep_decode_weights(params, conf, precision)
    cond_frames = build_conditioning_frames(params, conf, z_indices, speaker)
    cond_proj = project_cond_frames(weights, cond_frames)  # (B, Tf, 3H)
    b, tf, _ = cond_proj.shape
    t = tf * hop
    cond_proj = jnp.swapaxes(cond_proj, 0, 1)  # (Tf, B, 3H)

    if chunk > 0:
        chunk_f = max(1, chunk // hop)
    else:
        chunk_f = _chunk_frames_heuristic(b, hidden, hop)

    # Pad Tf to a chunk multiple (extra steps generate past the end; sliced
    # off below — the AR recursion is causal so earlier samples are exact).
    tf_pad = -(-tf // chunk_f) * chunk_f
    if tf_pad != tf:
        cond_proj = jnp.pad(cond_proj, ((0, tf_pad - tf), (0, 0), (0, 0)))

    state0 = init_decode_state(b, conf)
    seed = jax.random.randint(rng, (1,), 0, np.iinfo(np.int32).max, jnp.int32)
    samples, _ = _fused_decode_impl(
        cond_proj, state0.h, state0.prev[:, None],
        weights.embed_proj, weights.embed_scale,
        weights.wh, weights.wh_scale, weights.bh,
        weights.fc1_w, weights.fc1_scale, weights.fc1_b,
        weights.fc2_w, weights.fc2_scale, weights.fc2_b,
        seed,
        conf_hidden=hidden,
        conf_classes=n_classes,
        chunk_frames=chunk_f,
        hop=hop,
        greedy=greedy,
        use_int8=use_int8,
        interpret=interpret,
    )
    samples = jnp.swapaxes(samples[:t], 0, 1)  # (B, T)
    return mulaw_decode(samples, n_classes)

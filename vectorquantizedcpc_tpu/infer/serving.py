"""Continuous utterance batching for the fused AR vocoder decode.

The AR decode is latency-bound: per-step kernel time is nearly flat in batch
size (benchmarks/sweep_decode.py: 2.2 us/step at B=1 vs 2.6 us/step at B=32),
so a chip serving voice-conversion traffic should always decode a FULL batch.
Static batching wastes that: utterances have different lengths, and the batch
stalls until its longest member finishes. This module implements
**continuous batching** (the BASELINE.md north-star item), new relative to
the reference (which generates one utterance at a time, reference
network_vocoder.py:69-78):

- A fixed number of decode **slots** advance together through fixed-size
  **segments** (``segment_frames`` conditioning frames = ``segment_frames *
  upsampling_t`` audio samples) using the state-carrying fused kernel
  (ops/ar_decode.py:fused_ar_decode_segment). Streams retire the moment
  their frames are consumed and a queued request takes the freed slot
  mid-flight — no stall on the longest utterance. The AR recursion is
  causal, so co-resident garbage in other slots never affects a stream's
  samples; segment chaining is bit-exact with a single-shot decode
  (tests/test_serving.py).

- **Planned drain** (:meth:`run`): stream lengths are KNOWN at submission,
  so the entire drain schedule — which request occupies which slot at which
  segment step, where fresh state resets happen, when each stream retires —
  is a deterministic host-side computation with zero device round-trips.
  The drain then executes as a handful of device dispatches: (a) batched
  per-length-bucket conditioning (PreNet biGRU + GRU input projection,
  ops/ar_decode.py:project_cond_frames) into a staging pool, (b) a few
  ``lax.scan`` chunks over precomputed (request-row, position, fresh)
  tables, each inner step gathering every slot's conditioning window and
  running the fused kernel; the decoded mu-law classes are the scan's
  native stacked output — a (steps, slots, seg_samples) **timeline** —
  and (c) per-length-bucket reassembly gathers that map each request's
  host-known (slot, step-range) back to a compact per-request class
  buffer. Because the schedule is host-known, a request's bucket is
  gathered and its D2H transfer started **as soon as the chunk containing
  its last segment is dispatched** — result download overlaps the
  remaining drain compute instead of serializing after it. Round 1
  dispatched 2 programs per admission plus 1 per 32-frame segment; over a
  high-latency (tunneled) link those ~150 dispatches cost ~10 ms each and
  held serving to ~5% of the raw kernel throughput. Round 2 scattered
  every step's samples into a per-request (rows, max_samples) buffer
  carried through the scan — the windowed ``lax.scatter`` plus the
  donated 85 MB carry cost ~23% of the raw kernel throughput; the
  timeline form writes each step's samples exactly once, contiguously.

- :meth:`step` keeps the incremental mode for online streaming use: one
  segment across all slots per call, admission from the queue into freed
  slots, never blocking on the device (decoded classes accumulate in a
  device-resident ring; retiring streams are captured as lazy slices).

- **Pod-slice scale-out** (``mesh=``): the slot pool shards over the mesh
  ``data`` axis and both the incremental step and the planned drain run
  under ``shard_map`` — every chip decodes its own slot shard with a fully
  local kernel (zero per-step collectives; the AR recursion never crosses
  slots), multiplying aggregate samples/s by the data-axis size. Sampling
  keys are decorrelated per shard via ``axis_index`` fold-in. The drain's
  per-request output buffer keeps a leading shard axis (each shard writes
  only its own slots' rows) and is combined by one sum at the end.
"""

from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass
from typing import Callable, Deque, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import ConfVocoderNetwork
from ..models.vocoder import VocoderParams, build_conditioning_frames
from ..ops.ar_decode import (
    DecodeState,
    fused_ar_decode_segment,
    init_decode_state,
    prep_decode_weights,
    project_cond_frames,
)

__all__ = ["ContinuousBatcher"]

def _pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _chunk_sizes(n: int, max_chunk: int = 64) -> List[int]:
    """Decompose n steps into descending power-of-two dispatch sizes.

    Bounds the number of compiled drain programs (one per size) while
    wasting zero idle steps (a single fixed horizon would pad short drains
    with dead segments)."""
    sizes = []
    while n > 0:
        c = min(_pow2(n + 1) // 2 if n & (n - 1) else n, max_chunk)
        c = min(c, n)
        sizes.append(c)
        n -= c
    return sizes


def compute_drain_schedule(s_count, sf, hop, slots_live, queued, rid_row):
    """Drain schedule tables, O(requests) python (r5; the former stepwise
    loop cost O(n_steps * slots) — ~10-15 ms per 240-request drain INSIDE
    the timed window before the first chunk dispatch).

    Semantics (identical to stepwise FIFO-into-freed-slots admission;
    equivalence pinned by tests/test_serving.py::
    test_vectorized_schedule_matches_stepwise): each slot runs its
    requests back-to-back; queue order maps onto slots through an
    (end_step, slot_idx) min-heap — the same assignment as scanning slots
    in index order every step and admitting the queue front into the
    first free slot (ties break toward the lower slot index, matching
    heapq tuple order). Spans then fill the (n_steps, slots) tables via
    numpy slice writes.

    Args:
        slots_live: per-slot ``[rid, row, pos, total]`` or None (inflight
            requests already occupying slots; they run from step 0).
        queued: iterable of ``(rid, row, total)`` in admission order.
        rid_row: rid -> conditioning row index.
    Returns:
        (rows_t (n_steps, slots) int32, pos_t int32, fresh_t bool,
         rid_sched {rid: (slot, first_step, nseg)}, rid_pos0 {rid: pos0},
         valid_samples)
    """
    import heapq as _hq

    assigns = []  # (rid, slot, start_step, pos0, total, is_new)
    ends = [0] * s_count
    for i in range(s_count):
        a = slots_live[i]
        if a is not None:
            rid, _row, pos0, total = a
            assigns.append((rid, i, 0, pos0, total, False))
            ends[i] = -(-(total - pos0) // sf)
    heap = [(ends[i], i) for i in range(s_count)]
    _hq.heapify(heap)
    for rid, _row, total in queued:
        t0, i = _hq.heappop(heap)
        assigns.append((rid, i, t0, 0, total, True))
        _hq.heappush(heap, (t0 + -(-total // sf), i))
    n_steps = max(
        (t0 + -(-(total - pos0) // sf)
         for _rid, _i, t0, pos0, total, _n in assigns),
        default=0,
    )
    rows_t = np.full((n_steps, s_count), -1, np.int32)
    pos_t = np.zeros((n_steps, s_count), np.int32)
    fresh_t = np.zeros((n_steps, s_count), np.bool_)
    rid_sched = {}
    rid_pos0 = {}
    valid = 0
    for rid, i, t0, pos0, total, is_new in assigns:
        nseg = -(-(total - pos0) // sf)
        rows_t[t0 : t0 + nseg, i] = rid_row[rid]
        pos_t[t0 : t0 + nseg, i] = pos0 + sf * np.arange(nseg)
        if is_new:
            fresh_t[t0, i] = True
            rid_pos0[rid] = 0
        rid_sched[rid] = (i, t0, nseg)
        valid += (total - pos0) * hop
    return rows_t, pos_t, fresh_t, rid_sched, rid_pos0, valid


@dataclass
class _Slot:
    rid: Optional[int] = None
    pos_frames: int = 0
    total_frames: int = 0


class ContinuousBatcher:
    """Continuous-batching decode server over a fixed slot pool.

    >>> server = ContinuousBatcher(voc_params, net_conf, slots=8)
    >>> rid = server.submit(z_indices, speaker)          # enqueue
    >>> waves = server.run()                             # drain -> {rid: wave}

    ``greedy=True`` makes output deterministic (argmax sampling) — used by
    the exactness tests; production uses categorical sampling.
    """

    def __init__(
        self,
        params: VocoderParams,
        conf: ConfVocoderNetwork,
        slots: int = 8,
        segment_frames: int = 32,
        max_frames: int = 2048,
        precision: str = "bf16",
        greedy: bool = False,
        interpret: Optional[bool] = None,
        seed: int = 0,
        mesh=None,
    ):
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self._mesh = mesh
        self._n_shards = 1
        if mesh is not None:
            from ..parallel.mesh import DATA_AXIS

            self._n_shards = mesh.shape[DATA_AXIS]
            if slots % self._n_shards != 0:
                raise ValueError(
                    f"slots={slots} must divide over the mesh data axis "
                    f"({self._n_shards})"
                )
        self._params = params
        self._conf = conf
        self._slots = slots
        self._segment_frames = segment_frames
        self._max_frames = max_frames + segment_frames  # slack for overrun
        self._hop = conf.rnnms.upsampling_t
        self._n_classes = 2 ** conf.rnnms.bits_mu_law
        # "auto": the kernel batch is this chip's slot shard — pick int8
        # only at/past its measured crossover (ops/ar_decode.py).
        from ..ops.ar_decode import resolve_precision

        precision = resolve_precision(precision, slots // self._n_shards)
        self._precision = precision
        self._greedy = greedy
        self._interpret = interpret
        self._weights = prep_decode_weights(params, conf, precision)
        proj3h = self._weights.embed_proj.shape[1]
        self._proj3h = proj3h

        self._pool = jnp.zeros(
            (slots, self._max_frames, proj3h), jnp.bfloat16
        )
        self._out_buf = jnp.zeros(
            (slots, self._max_frames * self._hop), jnp.int32
        )
        self._state: DecodeState = init_decode_state(slots, conf)
        self._slot_meta = [_Slot() for _ in range(slots)]
        self._queue: Deque[tuple] = deque()
        self._pending: Dict[int, tuple] = {}  # rid -> (device slice, n)
        self._results: Dict[int, np.ndarray] = {}
        self._next_rid = 0
        self._step_count = 0
        self._seed = seed
        # Device-resident base PRNG key (per-chunk keys fold in on device;
        # creating a fresh key per drain would be one H2D per chunk).
        self._base_key = jax.random.key(seed)
        self._samples_out = 0
        self._dispatch_wall = 0.0
        self._cond_cache: Dict[int, Callable] = {}
        self._group_cond_cache: Dict[Tuple[int, int], Callable] = {}
        self._drain_cache: Dict[int, Callable] = {}
        self._gather_cache: Dict[int, Callable] = {}

        sf = segment_frames
        hop = self._hop

        def step_core(weights, pool, positions, state, out_buf, key):
            seg = jax.vmap(
                lambda p, s: jax.lax.dynamic_slice(p, (s, 0), (sf, proj3h))
            )(pool, positions)
            mulaw_seg, new_state = fused_ar_decode_segment(
                weights,
                conf,
                seg,
                state,
                key,
                greedy=greedy,
                precision=precision,
                interpret=interpret,
            )
            out_buf = jax.vmap(
                lambda row, s, p: jax.lax.dynamic_update_slice(
                    row, s, (p * hop,)
                )
            )(out_buf, mulaw_seg, positions)
            return new_state, out_buf

        if mesh is None:
            self._step_fn = jax.jit(
                lambda pool, positions, state, out_buf, key: step_core(
                    self._weights, pool, positions, state, out_buf, key
                )
            )
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import DATA_AXIS

            dp, rep = P(DATA_AXIS), P()

            def shard_step(weights, pool, positions, state, out_buf, key):
                # Decorrelate sampling across shards; each chip's kernel
                # sees only its own slots (no collectives in the hot loop).
                key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
                return step_core(
                    weights, pool, positions, state, out_buf, key
                )

            mapped = jax.shard_map(
                shard_step,
                mesh=mesh,
                in_specs=(rep, dp, dp, dp, dp, rep),
                out_specs=(dp, dp),
                check_vma=False,
            )
            self._step_fn = jax.jit(
                lambda pool, positions, state, out_buf, key: mapped(
                    self._weights, pool, positions, state, out_buf, key
                )
            )
            slot_sh = NamedSharding(mesh, dp)
            self._pool = jax.device_put(self._pool, slot_sh)
            self._out_buf = jax.device_put(self._out_buf, slot_sh)
            self._state = jax.device_put(self._state, slot_sh)

        n_mid = self._n_classes // 2
        self._n_mid = n_mid
        # Device-computed mu-law expansion table: host-side `table[classes]`
        # is BIT-IDENTICAL to running mulaw_decode on device (the decode is
        # an elementwise function of the integer class), while letting the
        # drain fetch 1-byte classes instead of 4-byte waves — the D2H link
        # is the dominant cost of a drain on tunneled/remote chips.
        self._mulaw_table = np.asarray(
            jax.device_get(self._decode_wave(jnp.arange(self._n_classes))),
            np.float32,
        )
        self._class_dtype = jnp.uint8 if self._n_classes <= 256 else jnp.uint16

        def admit_fn(pool, state, cond_row, slot_idx):
            # Traced slot index + fixed-shape (max_frames, 3H) row -> ONE
            # compiled program covers every admission (a python slot index
            # or per-length `.at[]` would recompile per (slot, length) and
            # dominate serving wall time — benchmarks/bench_serving.py).
            pool = jax.lax.dynamic_update_slice(
                pool, cond_row[None], (slot_idx, 0, 0)
            )
            return pool, DecodeState(
                h=state.h.at[slot_idx].set(0.0),
                prev=state.prev.at[slot_idx].set(n_mid),
            )

        self._admit_fn = jax.jit(admit_fn)

    def _decode_wave(self, classes):
        # Eager jnp (async dispatch, no per-length recompile): bit-identical
        # to fused_ar_decode's own eager mu-law expansion.
        from ..dsp.mulaw import mulaw_decode

        return mulaw_decode(classes, self._n_classes)

    # ------------------------------------------------------------------ API

    def submit(self, z_indices: np.ndarray, speaker: int) -> int:
        """Enqueue an utterance (encoder code sequence + target speaker).

        Over-length requests are rejected HERE, at enqueue time — raising
        mid-drain would abort the step loop with other streams in flight
        and lose their results.
        """
        z = np.asarray(z_indices)
        total_frames = 2 * z.shape[0]  # x2 nearest upsample of codes
        capacity = self._max_frames - self._segment_frames
        if total_frames > capacity:
            raise ValueError(
                f"utterance of {total_frames} frames exceeds max_frames="
                f"{capacity}"
            )
        rid = self._next_rid
        self._next_rid += 1
        self._queue.append((rid, z, int(speaker)))
        return rid

    def step(self) -> List[int]:
        """Admit, dispatch one segment across all slots, retire finished.

        Incremental/streaming mode. Returns the rids that finished this
        step. Purely host-side bookkeeping plus ASYNC device dispatches —
        never blocks on the device. Fetch finished waves with
        :meth:`result` / :meth:`run`.
        """
        self._admit()
        if not any(s.rid is not None for s in self._slot_meta):
            return []

        t0 = time.time()
        positions = jnp.asarray(
            [s.pos_frames for s in self._slot_meta], jnp.int32
        )
        key = jax.random.fold_in(self._base_key, self._step_count)
        self._step_count += 1
        self._state, self._out_buf = self._step_fn(
            self._pool, positions, self._state, self._out_buf, key
        )
        self._dispatch_wall += time.time() - t0

        finished: List[int] = []
        for i, slot in enumerate(self._slot_meta):
            if slot.rid is None:
                continue
            remaining = slot.total_frames - slot.pos_frames
            n_valid = min(remaining, self._segment_frames) * self._hop
            slot.pos_frames += self._segment_frames
            self._samples_out += n_valid
            if slot.pos_frames >= slot.total_frames:
                n = slot.total_frames * self._hop
                # Lazy capture: a functional slice of the CURRENT buffer
                # version — later reuse of the slot cannot clobber it, and
                # nothing transfers until the caller materializes it.
                self._pending[slot.rid] = (
                    self._decode_wave(self._out_buf[i, :n]),
                    n,
                )
                finished.append(slot.rid)
                self._slot_meta[i] = _Slot()
        return finished

    def result(self, rid: int) -> np.ndarray:
        """Materialize a finished stream's waveform (blocks on the device)."""
        if rid in self._pending:
            entry = self._pending.pop(rid)
            if isinstance(entry, tuple) and entry[0] == "bucket":
                # Planned-drain result: one fetch per shared length bucket
                # (cached), host-side mu-law table expansion (bit-identical
                # to the device decode).
                _tag, bucket, j = entry
                if bucket["np"] is None:
                    bucket["np"] = np.asarray(jax.device_get(bucket["dev"]))
                self._results[rid] = self._mulaw_table[bucket["np"][j]]
            else:
                wave, _ = entry  # incremental step() path: device f32 slice
                self._results[rid] = np.asarray(
                    jax.device_get(wave), np.float32
                )
        return self._results[rid]

    def run(
        self, materialize: bool = True, wait: bool = True
    ) -> Dict[int, np.ndarray]:
        """Drain the queue and all in-flight streams (planned drain).

        ``materialize=False`` completes the drain TO DEVICE (blocks until
        every stream's classes are computed) but defers the D2H transfer:
        finished waves stay as compacted device buffers, fetched lazily by
        :meth:`result`. This separates decode throughput from host-link
        bandwidth — the raw-kernel decode benchmarks are measured the same
        way — and lets a caller overlap result download with the next
        drain.

        ``wait=False`` additionally skips the final device sync: every
        program of the drain is ENQUEUED (results remain lazily
        fetchable) but the call returns immediately — back-to-back drains
        pipeline on the device with no per-drain host round-trip. Used by
        the RTT-amortized benchmark boundary (bench.py) on tunneled
        links, where one blocked sync costs ~25 ms.
        """
        if self._queue or any(s.rid is not None for s in self._slot_meta):
            self._drain_planned(wait=wait, prefetch=materialize)
        if not materialize:
            return dict(self._results)
        for rid in list(self._pending):
            self.result(rid)
        return dict(self._results)

    @property
    def stats(self) -> Dict[str, float]:
        return {
            "samples_out": float(self._samples_out),
            "dispatch_wall_s": self._dispatch_wall,
            "steps": float(self._step_count),
        }

    # ------------------------------------------------- planned drain (run)

    def _drain_planned(self, wait: bool = True, prefetch: bool = True) -> None:
        import os

        debug = bool(os.environ.get("VQCPC_SERVING_DEBUG"))

        def _mark(label, *blockers):
            if debug:
                jax.block_until_ready(blockers)
                print(f"[drain] {label}: {time.time() - t_start:.3f}s",
                      flush=True)

        t_start = time.time()
        s_count = self._slots
        sf = self._segment_frames
        hop = self._hop

        inflight = [
            (i, m.rid, m.pos_frames, m.total_frames)
            for i, m in enumerate(self._slot_meta)
            if m.rid is not None
        ]
        new_reqs = list(self._queue)
        self._queue.clear()

        # ---- Staging pool: in-flight slot rows (from the incremental
        # pool) + batched per-length-bucket conditioning of new requests.
        parts: List[jax.Array] = []
        base = 0
        if inflight:
            parts.append(self._pool)  # rows 0..slots-1 == slot index
            base = s_count
        rid_row: Dict[int, int] = {}
        rid_total: Dict[int, int] = {}
        row = base
        if new_reqs and not self._greedy:
            # Sampling mode: ONE ragged-batch conditioning dispatch for
            # every queued request regardless of length mix (flip-exact
            # biGRU, models/vocoder.py:build_conditioning_frames_ragged).
            # Pow-2 padded batch/length keep the compile cache bounded.
            g_pad = _pow2(len(new_reqs))
            mc_pad = min(
                _pow2(max(z.shape[0] for _r, z, _s in new_reqs)),
                self._max_frames // 2,
            )
            # One packed upload (codes | speaker | n_frames): every small
            # host->device transfer costs link latency on tunneled chips.
            packed = np.zeros((g_pad, mc_pad + 2), np.int32)
            for j, (rid, z, spk) in enumerate(new_reqs):
                packed[j, : z.shape[0]] = z
                packed[j, mc_pad] = spk
                packed[j, mc_pad + 1] = 2 * z.shape[0]
                rid_row[rid] = row + j
                rid_total[rid] = 2 * z.shape[0]
            parts.append(
                self._ragged_cond(mc_pad, g_pad)(jnp.asarray(packed))
            )
            row += g_pad
        elif new_reqs:
            # Greedy/deterministic mode: per-length singleton-compatible
            # bucket conditioning — bit-exact vs the single-shot decode
            # (the batched ragged matmul shape costs ~1-ulp f32 noise,
            # which a greedy argmax can amplify into a different sample).
            groups: Dict[int, list] = {}
            for rid, z, spk in new_reqs:
                groups.setdefault(z.shape[0], []).append((rid, z, spk))
            for n_codes in sorted(groups):
                items = groups[n_codes]
                g_pad = _pow2(len(items))
                zs = np.zeros((g_pad, n_codes), np.int32)
                spks = np.zeros((g_pad,), np.int32)
                for j, (rid, z, spk) in enumerate(items):
                    zs[j], spks[j] = z, spk
                    rid_row[rid] = row + j
                    rid_total[rid] = 2 * n_codes
                parts.append(
                    self._group_cond(n_codes, g_pad)(
                        jnp.asarray(zs), jnp.asarray(spks)
                    )
                )
                row += g_pad
        r_s = _pow2(max(row, 1))
        staging = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
        if staging.shape[0] < r_s:
            staging = jnp.pad(
                staging, ((0, r_s - staging.shape[0]), (0, 0), (0, 0))
            )
        _mark("cond+staging", staging)

        # ---- Host-side schedule: FIFO admission into freed slots.
        slots_live: List[Optional[list]] = [None] * s_count
        # rid -> (slot index, first timeline step, n segments) for reassembly.
        rid_sched: Dict[int, Tuple[int, int, int]] = {}
        rid_pos0: Dict[int, int] = {}
        for i, rid, pos, total in inflight:
            slots_live[i] = [rid, i, pos, total]  # [rid, row, pos, total]
            rid_row[rid] = i
            rid_total[rid] = total
            # pos0 for inflight comes from here (compute_drain_schedule
            # returns pos0 only for freshly admitted rids); rid_sched for
            # inflight comes from compute_drain_schedule — single source.
            rid_pos0[rid] = pos
        # Longest-first (LPT) admission: the drain completes when the last
        # slot finishes, so scheduling long requests first packs the slot
        # pool near the lower bound of ceil(total_segments / slots) steps
        # (FIFO leaves long tails: measured 11 vs 7 steps on the bench mix).
        # Purely an internal schedule choice — every request still returns.
        q = deque(
            sorted(
                ((rid, rid_row[rid], rid_total[rid]) for rid, _z, _s in new_reqs),
                key=lambda t: -t[2],
            )
        )
        rows_t, pos_t, fresh_t, sched_map, pos0_map, valid = (
            compute_drain_schedule(s_count, sf, hop, slots_live, q, rid_row)
        )
        rid_sched.update(sched_map)
        rid_pos0.update(pos0_map)
        n_steps = rows_t.shape[0]
        _mark(f"schedule ({n_steps} steps)")

        # ---- Execute: a few scan chunks. Decoded classes come back as the
        # scan's stacked per-step output — a (k, slots, sf*hop) timeline
        # piece per chunk (written once, contiguously; no scatter, no big
        # carried output buffer). The host-known schedule tells exactly
        # which chunk finishes which request, so reassembly gathers + async
        # D2H transfers are issued mid-drain, overlapping later chunks.
        h, prev = self._state.h, self._state.prev
        ys_parts: List[jax.Array] = []
        timeline: Optional[jax.Array] = None
        parts_in_timeline = 0
        done_steps = 0
        gathered: set = set()
        inflight_rids = {rid for _i, rid, _p, _t in inflight}

        def _issue_ready(limit_steps: int) -> None:
            """Gather + start D2H for every request fully decoded before
            ``limit_steps`` (timeline rows [0, limit_steps) are available)."""
            nonlocal timeline, parts_in_timeline
            ready: Dict[int, List[int]] = {}
            for rid, (slot, s0, nseg) in rid_sched.items():
                if rid in gathered or s0 + nseg > limit_steps:
                    continue
                if rid in inflight_rids:
                    ready.setdefault(-rid - 1, []).append(rid)  # singleton
                else:
                    ready.setdefault(rid_total[rid], []).append(rid)
            if not ready:
                return
            if timeline is None or timeline.shape[0] < limit_steps:
                # Incremental: append only the chunks produced since the
                # last rebuild — re-concatenating ALL parts each time would
                # re-copy every prior chunk's output (O(n_chunks) full-
                # timeline HBM passes over a drain).
                fresh = ys_parts[parts_in_timeline:]
                pieces = ([] if timeline is None else [timeline]) + fresh
                timeline = (
                    pieces[0]
                    if len(pieces) == 1
                    else jnp.concatenate(pieces, axis=0)
                )
                parts_in_timeline = len(ys_parts)
            for key_, rids in sorted(ready.items()):
                if key_ < 0:  # in-flight: prefix from the incremental ring
                    (rid,) = rids
                    slot, s0, nseg = rid_sched[rid]
                    pos0, total = rid_pos0[rid], rid_total[rid]
                    # One fused jitted dispatch (slice + prefix + trim +
                    # cast) — an eager op chain costs one tunneled
                    # dispatch EACH, between drain chunks.
                    dev = self._inflight_gather(pos0, total, nseg)(
                        timeline, self._out_buf,
                        np.int32(s0), np.int32(slot),
                    )
                else:  # same length -> same (nseg,) shape: one bucket gather
                    total = key_
                    slots_a = np.asarray(
                        [rid_sched[r][0] for r in rids], np.int32
                    )
                    nseg = rid_sched[rids[0]][2]
                    steps_a = (
                        np.asarray([rid_sched[r][1] for r in rids], np.int32)[
                            :, None
                        ]
                        + np.arange(nseg, dtype=np.int32)[None, :]
                    )  # (n_req, nseg)
                    # One jitted dispatch per bucket (gather + trim + cast
                    # fused) — eager op chains cost one tunneled dispatch
                    # EACH, which is what they'd add between drain chunks.
                    dev = self._bucket_gather(total)(
                        timeline, jnp.asarray(steps_a), jnp.asarray(slots_a)
                    )
                if prefetch:
                    # Overlap D2H with the rest of the drain (best effort).
                    # Skipped when the caller defers materialization
                    # (run(materialize=False)): on tunneled links the
                    # mid-drain D2H streams compete with dispatch traffic
                    # and throttle the drain itself.
                    try:
                        dev.copy_to_host_async()
                    except Exception:
                        pass
                bucket = {"dev": dev, "np": None}
                for j, rid in enumerate(rids):
                    self._pending[rid] = ("bucket", bucket, j)
                    gathered.add(rid)

        # Dispatch order: the NEXT chunk is always enqueued before the
        # previous chunks' reassembly gathers, so the device never idles
        # waiting on host-side gather/copy bookkeeping; the gathers still
        # overlap the remaining chunks' execution on-stream. The whole
        # schedule uploads in ONE host->device transfer per table (r4: the
        # former per-chunk np.stack+asarray cost one H2D round per chunk
        # per table on tunneled links); per-chunk inputs are then eager
        # device-side slices (pure dispatches, no further transfers).
        sched = jnp.asarray(
            np.stack([rows_t, pos_t, fresh_t.astype(np.int32)])
        )  # (3, n_steps, slots) — ONE upload for the whole schedule
        rows_all, pos_all = sched[0], sched[1]
        fresh_all = sched[2].astype(jnp.bool_)
        base_key = self._base_key
        prev_done = 0
        for k in _chunk_sizes(n_steps):
            sl = slice(done_steps, done_steps + k)
            key = jax.random.fold_in(
                base_key, self._step_count + done_steps
            )
            h, prev, ys = self._drain_fn(k)(
                self._weights, staging,
                rows_all[sl], pos_all[sl], fresh_all[sl], h, prev, key,
            )
            ys_parts.append(ys)
            prev_done, done_steps = done_steps, done_steps + k
            _issue_ready(prev_done)
        _issue_ready(done_steps)

        _mark("drain chunks", h)
        assert len(gathered) == len(rid_sched), "drain left requests behind"

        # "Drain complete" = every class computed on device (the raw-kernel
        # benchmarks use the same boundary); D2H finishes in result() —
        # usually already in flight thanks to the mid-drain async copies.
        if wait:
            jax.block_until_ready(
                [e[1]["dev"] for e in self._pending.values()
                 if isinstance(e, tuple) and e[0] == "bucket"])
        _mark("to-device")

        self._step_count += n_steps
        self._samples_out += valid
        self._dispatch_wall += time.time() - t_start
        self._slot_meta = [_Slot() for _ in range(s_count)]
        # The drain consumed the donated state buffers; reinstall a fresh
        # (correctly sharded) state for subsequent incremental use.
        self._state = DecodeState(h=h, prev=prev)

    def _ragged_cond(self, mc_pad: int, g: int) -> Callable:
        """One-dispatch conditioning for a padded MIXED-length batch ->
        staging rows (G, MF, 3H). Rows are exact on their valid prefixes
        (flip-exact ragged biGRU); tail positions carry bounded garbage
        that only ever conditions discarded past-end-of-stream samples."""
        key = ("ragged", mc_pad, g)
        if key not in self._group_cond_cache:
            from ..models.vocoder import build_conditioning_frames_ragged

            def cond(packed):  # (G, mc_pad + 2) int32: codes | spk | frames
                zs = packed[:, :mc_pad]
                spks = packed[:, mc_pad]
                nf = packed[:, mc_pad + 1]
                c = project_cond_frames(
                    self._weights,
                    build_conditioning_frames_ragged(
                        self._params, self._conf, zs, spks, nf,
                        use_pallas=True,
                        pallas_interpret=self._interpret,
                    ),
                )  # (G, 2*mc_pad, 3H)
                c = c[:, : self._max_frames]
                return jnp.pad(
                    c, ((0, 0), (0, self._max_frames - c.shape[1]), (0, 0))
                ).astype(jnp.bfloat16)

            self._group_cond_cache[key] = jax.jit(cond)
        return self._group_cond_cache[key]

    def _group_cond(self, n_codes: int, g: int) -> Callable:
        """Batched per-length conditioning -> padded staging rows (G, MF, 3H)."""
        key = (n_codes, g)
        if key not in self._group_cond_cache:

            def cond(zs, spks):  # (G, n_codes), (G,)
                c = project_cond_frames(
                    self._weights,
                    build_conditioning_frames(
                        self._params, self._conf, zs, spks
                    ),
                )  # (G, 2*n_codes, 3H)
                # Pad AFTER the (non-causal) biGRU, to the pool row shape.
                return jnp.pad(
                    c, ((0, 0), (0, self._max_frames - c.shape[1]), (0, 0))
                ).astype(jnp.bfloat16)

            self._group_cond_cache[key] = jax.jit(cond)
        return self._group_cond_cache[key]

    def _inflight_gather(self, pos0: int, total: int, nseg: int) -> Callable:
        """Jitted in-flight reassembly: ring-buffer prefix (decoded by
        earlier incremental step() calls) + this drain's timeline segments
        -> (1, total*hop) classes in the compact fetch dtype."""
        key = ("inflight", pos0, total, nseg)
        if key not in self._gather_cache:
            hop, cd = self._hop, self._class_dtype

            @jax.jit
            def g(timeline, out_buf, s0, slot):
                seg_w = timeline.shape[2]
                segs = jax.lax.dynamic_slice(
                    timeline, (s0, slot, 0), (nseg, 1, seg_w)
                ).reshape(1, nseg * seg_w)
                prefix = jax.lax.dynamic_slice(
                    out_buf, (slot, 0), (1, pos0 * hop)
                )
                return jnp.concatenate(
                    [prefix, segs[:, : (total - pos0) * hop]], axis=1
                ).astype(cd)

            self._gather_cache[key] = g
        return self._gather_cache[key]

    def _bucket_gather(self, total: int) -> Callable:
        """Jitted bucket reassembly: timeline (T, slots, sf*hop) +
        (n_req, nseg) step table + (n_req,) slot table -> (n_req,
        total*hop) classes in the compact fetch dtype."""
        if total not in self._gather_cache:
            hop, cd = self._hop, self._class_dtype

            @jax.jit
            def g(timeline, steps, slots):
                out = timeline[steps, slots[:, None]]
                return out.reshape(out.shape[0], -1)[:, : total * hop].astype(cd)

            self._gather_cache[total] = g
        return self._gather_cache[total]

    def _drain_fn(self, k: int) -> Callable:
        """Compiled K-step drain chunk, cached per K.

        Returns ``(h, prev, timeline)`` with ``timeline`` the scan's native
        stacked per-step output, shape (K, slots, sf*hop) — each step's
        classes written once, contiguously (no scatter, no carried output
        buffer; the round-2 windowed-scatter form cost ~23% of the raw
        kernel throughput)."""
        if k in self._drain_cache:
            return self._drain_cache[k]

        sf = self._segment_frames
        proj3h = self._proj3h
        conf = self._conf
        greedy, precision, interpret = (
            self._greedy, self._precision, self._interpret,
        )
        n_mid = self._n_mid

        def chunk(weights, staging, rows_t, pos_t, fresh_t, h, prev, key):
            r_s = staging.shape[0]

            def body(carry, inp):
                h, prev = carry
                rows, pos, fresh, kk = inp
                h = jnp.where(fresh[:, None], 0.0, h)
                prev = jnp.where(fresh, n_mid, prev)
                # Idle slots carry row -1: clip to a valid row; their
                # samples are simply never reassembled into any request.
                safe_rows = jnp.clip(rows, 0, r_s - 1)
                seg = jax.vmap(
                    lambda r, p: jax.lax.dynamic_slice(
                        staging, (r, p, 0), (1, sf, proj3h)
                    )[0]
                )(safe_rows, pos)
                mulaw_seg, new_state = fused_ar_decode_segment(
                    weights, conf, seg, DecodeState(h=h, prev=prev), kk,
                    greedy=greedy, precision=precision, interpret=interpret,
                )
                return (new_state.h, new_state.prev), mulaw_seg

            keys = jax.random.split(key, k)
            (h, prev), ys = jax.lax.scan(
                body, (h, prev), (rows_t, pos_t, fresh_t, keys)
            )
            return h, prev, ys

        if self._mesh is None:
            fn = jax.jit(chunk, donate_argnums=(5, 6))
        else:
            from jax.sharding import PartitionSpec as P
            from ..parallel.mesh import DATA_AXIS

            dp, rep = P(DATA_AXIS), P()

            def shard_chunk(weights, staging, rows_t, pos_t, fresh_t,
                            h, prev, key):
                key = jax.random.fold_in(
                    key, jax.lax.axis_index(DATA_AXIS)
                )
                return chunk(weights, staging, rows_t, pos_t, fresh_t,
                             h, prev, key)

            mapped = jax.shard_map(
                shard_chunk,
                mesh=self._mesh,
                in_specs=(
                    rep, rep,
                    P(None, DATA_AXIS), P(None, DATA_AXIS),
                    P(None, DATA_AXIS),
                    dp, dp, rep,
                ),
                out_specs=(dp, dp, P(None, DATA_AXIS, None)),
                check_vma=False,
            )
            fn = jax.jit(mapped, donate_argnums=(5, 6))
        self._drain_cache[k] = fn
        return fn

    # ------------------------------------------------------------ internals

    def _cond_fn(self, n_codes: int) -> Callable:
        """Per-code-length jitted conditioning (no padding into the biGRU)."""
        if n_codes not in self._cond_cache:

            def cond(z, spk):
                c = project_cond_frames(
                    self._weights,
                    build_conditioning_frames(
                        self._params, self._conf, z, spk
                    ),
                )[0]  # (2*n_codes, 3H)
                # Pad AFTER the (non-causal) biGRU, to the pool row shape,
                # so admission is a single fixed-shape program.
                return jnp.pad(
                    c, ((0, self._max_frames - c.shape[0]), (0, 0))
                ).astype(jnp.bfloat16)

            self._cond_cache[n_codes] = jax.jit(cond)
        return self._cond_cache[n_codes]

    def _admit(self) -> None:
        for i, slot in enumerate(self._slot_meta):
            if slot.rid is not None or not self._queue:
                continue
            rid, z, speaker = self._queue.popleft()
            total_frames = 2 * z.shape[0]  # validated in submit()
            cond = self._cond_fn(z.shape[0])(
                jnp.asarray(z)[None], jnp.asarray([speaker])
            )
            # Fresh AR state for the freed slot (zero hidden, silence prev).
            self._pool, self._state = self._admit_fn(
                self._pool, self._state, cond, np.int32(i)
            )
            self._slot_meta[i] = _Slot(
                rid=rid, pos_frames=0, total_frames=total_frames
            )

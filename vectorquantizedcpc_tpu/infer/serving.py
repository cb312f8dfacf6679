"""Continuous utterance batching for the fused AR vocoder decode.

The AR decode is latency-bound: per-step kernel time is nearly flat in batch
size (benchmarks/sweep_decode.py: 2.3 us/step at B=1 vs 2.6 us/step at B=32),
so a chip serving voice-conversion traffic should always decode a FULL batch.
Static batching wastes that: utterances have different lengths, and the batch
stalls until its longest member finishes. This module implements
**continuous batching** (the BASELINE.md north-star item), new relative to
the reference (which generates one utterance at a time, reference
network_vocoder.py:69-78):

- A fixed number of decode **slots** advance together through fixed-size
  **segments** (``segment_frames`` conditioning frames = ``segment_frames *
  upsampling_t`` audio samples) using the state-carrying fused kernel
  (ops/ar_decode.py:fused_ar_decode_segment).
- Streams retire the moment their frames are consumed and a queued request
  is admitted into the freed slot mid-flight — no stall on the longest
  utterance. The AR recursion is causal, so co-resident garbage in other
  slots never affects a stream's samples; segment chaining is bit-exact
  with a single-shot decode (tests/test_serving.py).
- Admission computes the stream's conditioning ONCE at frame rate — PreNet
  biGRU + GRU-input projection (ops/ar_decode.py:project_cond_frames) — and
  parks it in a device-resident pool (slots, max_frames, 3H); each step
  gathers every slot's next window with a vmapped ``dynamic_slice``. No
  padding enters the PreNet (it is bidirectional, i.e. non-causal), so
  admission jits per distinct code length; deployments should bucket
  lengths upstream, as infer/convert.py does.
- **The scheduling loop never blocks on the device.** Stream lengths are
  known at admission, so retirement is decided from host-side counters;
  decoded mu-law classes accumulate in a device-resident output ring
  (slots, max_samples) updated inside the jitted step, and a retiring
  stream's row is captured as a lazy device slice, materialized only when
  the caller asks for the wave. Steps therefore dispatch back-to-back and
  pipeline on the device — essential over high-latency links (the tunneled
  single-chip dev setup) and still a win on local hosts.
- **Pod-slice scale-out** (``mesh=``): the slot pool shards over the mesh
  ``data`` axis and the segment step runs under ``shard_map`` — every chip
  decodes its own slot shard with a fully local kernel (zero per-step
  collectives; the AR recursion never crosses slots), multiplying
  aggregate samples/s by the data-axis size. Sampling keys are
  decorrelated per shard via ``axis_index`` fold-in.
"""

from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass, field
from typing import Callable, Deque, Dict, List, Optional

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
        if mesh is not None:
            from ..parallel.mesh import DATA_AXIS

            n_data = mesh.shape[DATA_AXIS]
            if slots % n_data != 0:
                raise ValueError(
                    f"slots={slots} must divide over the mesh data axis "
                    f"({n_data})"
                )
        self._params = params
        self._conf = conf
        self._slots = slots
        self._segment_frames = segment_frames
        self._max_frames = max_frames + segment_frames  # slack for overrun
        self._hop = conf.rnnms.upsampling_t
        self._n_classes = 2 ** conf.rnnms.bits_mu_law
        self._weights = prep_decode_weights(params, conf, precision)
        proj3h = self._weights.embed_proj.shape[1]

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
        self._samples_out = 0
        self._dispatch_wall = 0.0
        self._cond_cache: Dict[int, Callable] = {}

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

        Returns the rids that finished this step. Purely host-side
        bookkeeping plus ASYNC device dispatches — never blocks on the
        device. Fetch finished waves with :meth:`result` / :meth:`run`.
        """
        self._admit()
        if not any(s.rid is not None for s in self._slot_meta):
            return []

        t0 = time.time()
        positions = jnp.asarray(
            [s.pos_frames for s in self._slot_meta], jnp.int32
        )
        key = jax.random.fold_in(jax.random.key(self._seed), self._step_count)
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
            wave, _ = self._pending.pop(rid)
            self._results[rid] = np.asarray(
                jax.device_get(wave), np.float32
            )
        return self._results[rid]

    def run(self) -> Dict[int, np.ndarray]:
        """Drain the queue and all in-flight streams."""
        while self._queue or any(
            s.rid is not None for s in self._slot_meta
        ):
            self.step()
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

"""Streaming / chunked encoding of arbitrarily long utterances.

TPU-native answer to the long-sequence problem (SURVEY.md §5.7): the
encoder's conv + SegFC + VQ stages are frame-local and only the LSTM carries
state, so a long utterance streams through in fixed-size chunks with carried
LSTM state — ONE compiled executable regardless of utterance length, bounded
memory, and outputs bit-identical to a full-length encode (tested).

Halo math: with the k=4/s=2/p=1 conv, output frame t consumes mel frames
[2t-1, 2t+2]. Encoding outputs [c/2, (c+L)/2) therefore needs mels
[c-1, c+L+1]; to keep stride parity we carry a 2-frame LEFT halo from the
previous chunk and read a 2-frame RIGHT halo, then drop the first and last
conv outputs of each interior window (they belong to the neighbours). The
first chunk has no left halo (the conv's own zero padding is the ground
truth there) and the final flush pads the right halo with zeros (ditto).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.encoder import EncoderParams, _frontend
from ..models.rnn import lstm_apply
from ..models.vq import VQEMAState, vq_encode


class StreamingEncoder:
    """Encode mel chunks with carried LSTM state.

    Usage::

        enc = StreamingEncoder(params, vq_state, chunk_frames=256)
        for mel_chunk in chunks:        # (80, any length) each
            out = enc.push(mel_chunk)   # None or (z, c, indices)
        out = enc.flush()
    """

    def __init__(
        self,
        params: EncoderParams,
        vq_state: VQEMAState,
        chunk_frames: int = 256,
        compute_dtype=jnp.float32,
    ):
        assert chunk_frames % 2 == 0 and chunk_frames >= 4
        self.params = params
        self.vq_state = vq_state
        self.chunk = chunk_frames
        self._pending: Optional[np.ndarray] = None
        self._first = True
        self._state = None  # carried LSTM (h, c)
        c_dim = params.rnn.wh.shape[0]

        def encode_window(params, vq_state, mel, state, keep_start, keep_len):
            z_pre = _frontend(params, mel, compute_dtype)
            z_pre = jax.lax.dynamic_slice_in_dim(z_pre, keep_start, keep_len, 1)
            z, idx = vq_encode(vq_state, z_pre.astype(jnp.float32))
            c, state = lstm_apply(params.rnn, z.astype(compute_dtype), state)
            return z, c.astype(jnp.float32), idx, state

        self._encode_window = jax.jit(
            encode_window, static_argnames=("keep_start", "keep_len")
        )
        self._zero_state = lambda: (
            jnp.zeros((1, c_dim), compute_dtype),
            jnp.zeros((1, c_dim), compute_dtype),
        )

    def _run(self, window: np.ndarray, keep_start: int, keep_len: int):
        if self._state is None:
            self._state = self._zero_state()
        z, c, idx, self._state = self._encode_window(
            self.params,
            self.vq_state,
            jnp.asarray(window[None]),
            self._state,
            keep_start,
            keep_len,
        )
        return z, c, idx

    def push(self, mel: np.ndarray):
        """Feed (F, T) mel frames; returns newly-available outputs or None."""
        mel = np.asarray(mel, np.float32)
        self._pending = (
            mel
            if self._pending is None
            else np.concatenate([self._pending, mel], axis=1)
        )
        produced = []
        while True:
            need = (self.chunk + 2) if self._first else (self.chunk + 4)
            if self._pending.shape[1] < need:
                break
            window = self._pending[:, :need]
            if self._first:
                # Outputs [0, chunk/2): drop only the final (right-halo) one.
                produced.append(self._run(window, 0, self.chunk // 2))
                self._pending = self._pending[:, self.chunk - 2 :]
                self._first = False
            else:
                # Window = 2 left-halo + chunk + 2 right-halo frames; keep
                # the interior chunk/2 outputs.
                produced.append(self._run(window, 1, self.chunk // 2))
                self._pending = self._pending[:, self.chunk :]
        return self._collect(produced)

    def flush(self):
        """Encode remaining frames (final partial chunk, zero right halo)."""
        produced = []
        if self._pending is not None:
            ctx = 0 if self._first else 2
            rest = self._pending.shape[1] - ctx
            rest_even = (rest // 2) * 2
            if rest_even >= 2:
                window = np.pad(
                    self._pending[:, : ctx + rest_even], ((0, 0), (0, 2))
                )
                produced.append(
                    self._run(window, 0 if self._first else 1, rest_even // 2)
                )
        self._pending = None
        self._first = True
        return self._collect(produced)

    @staticmethod
    def _collect(produced):
        if not produced:
            return None
        zs, cs, idxs = zip(*produced)
        return (
            jnp.concatenate(zs, axis=1),
            jnp.concatenate(cs, axis=1),
            jnp.concatenate(idxs, axis=1),
        )


def encode_streaming(
    params: EncoderParams,
    vq_state: VQEMAState,
    mel: np.ndarray,
    chunk_frames: int = 256,
):
    """Whole-utterance convenience wrapper over :class:`StreamingEncoder`."""
    enc = StreamingEncoder(params, vq_state, chunk_frames)
    parts = []
    for out in (enc.push(mel), enc.flush()):
        if out is not None:
            parts.append(out)
    zs, cs, idxs = zip(*parts)
    return (
        jnp.concatenate(zs, axis=1),
        jnp.concatenate(cs, axis=1),
        jnp.concatenate(idxs, axis=1),
    )

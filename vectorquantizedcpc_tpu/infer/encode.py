"""Unit-discovery export: mels -> latent .txt dumps for the ABX toolkit.

Working re-design of the reference's stale encode.py (reference
encode.py:14-72; staleness documented in SURVEY.md §2.6):

- inputs: either a ``test.json`` metadata file whose entries end with a
  relative path (the reference/bshall datasets layout, encode.py:18-20,42),
  or any directory tree of ``*.mel.npy`` files;
- checkpoints: our Orbax trees OR reference ``.pt`` files (auto-detected);
- outputs: ``<out_dir>/<stem>.txt`` with ``%.16f`` rows of z, plus the
  ``auxiliary_embedding1`` (context c) and ``auxiliary_embedding2`` (pre-VQ
  SegFC output) dumps when ``save_auxiliary`` — the reference needs a torch
  forward hook for the latter (encode.py:34-40); our encoder just returns it.

TPU-first: utterances are bucketed by padded length and encoded in BATCHES
under one jit per bucket shape. Right-padding is exact — the conv is
causal-safe at the tail (zero padding equals the conv's own p=1 behavior)
and the LSTM is causal, so frames within the true length are bit-identical
to unpadded per-utterance encoding (verified in tests/test_e2e.py,
test_encode_padding_is_exact).
"""

import json
from functools import partial
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import ConfGlobal
from ..models.encoder import EncoderParams, encoder_encode, encoder_init
from ..models.vq import VQEMAState


def load_encoder_checkpoint(
    path: Union[str, Path], conf: ConfGlobal
) -> Tuple[EncoderParams, VQEMAState]:
    """Load encoder weights from a native msgpack tree or a reference .pt file."""
    path = Path(path)
    if path.suffix == ".pt":
        from ..training.torch_import import load_reference_cpc_checkpoint

        enc, vq, _, _ = load_reference_cpc_checkpoint(path)
        return enc, vq
    from ..training.checkpoint import restore_checkpoint
    from ..training.cpc import init_train_state

    template = init_train_state(conf, jax.random.key(0))
    state = restore_checkpoint(path, template)
    return state.enc, state.vq


def _discover_mels(conf: ConfGlobal) -> List[Path]:
    """Find input mel files (test.json metadata or recursive glob)."""
    in_dir = Path(conf.in_dir)
    meta = in_dir / "test.json"
    if meta.exists():
        with open(meta) as f:
            metadata = json.load(f)
        # Reference entries: [..., ..., ..., path]; path lacks the suffix.
        return [in_dir.parent / f"{entry[-1]}.mel.npy" for entry in metadata]
    mels = sorted(in_dir.glob("**/*.mel.npy"))
    if not mels:
        raise FileNotFoundError(f"No *.mel.npy under {in_dir} and no test.json")
    return mels


def _bucket(lengths: List[int], quantum: int = 64) -> Dict[int, List[int]]:
    """Group utterance indices by padded length (multiple of ``quantum``
    frames, minimum one quantum) to bound the number of compiled shapes."""
    buckets: Dict[int, List[int]] = {}
    for i, n in enumerate(lengths):
        padded = max(quantum, -(-n // quantum) * quantum)
        buckets.setdefault(padded, []).append(i)
    return buckets


def encode_dataset(conf: ConfGlobal, batch_size: int = 16) -> int:
    """Encode every utterance; returns the number processed."""
    out_dir = Path(conf.out_dir)
    out_dir.mkdir(exist_ok=True, parents=True)

    print(f"Load checkpoint from: {conf.cpc_checkpoint}:")
    enc_params, vq_state = load_encoder_checkpoint(conf.cpc_checkpoint, conf)

    mel_paths = _discover_mels(conf)
    mels = [np.load(p) for p in mel_paths]
    # Keep the TRUE frame count: the k4/s2/p1 conv yields floor(T/2) output
    # frames whose last window covers the real final sample even for odd T
    # (reference model.py:43); right-padding to the bucket length only adds
    # zeros beyond index T-1, which no valid output window touches.
    lengths = [m.shape[1] for m in mels]

    # Compute dtype follows runtime.precision (default bfloat16, exactly
    # like the trainers and bench; runtime.precision=float32 pins the f32
    # path for parity work). The fused LSTM forward (residual-free
    # kernel; ops/lstm_scan.py) engages on TPU under bf16 — its native
    # precision — so the shipped export path runs the advertised kernel;
    # VQ distances/argmin and the exported values stay f32 regardless
    # (encoder_encode casts before vq_encode and on return).
    import jax.numpy as jnp

    from ..configs import resolve_compute_dtype

    compute_dtype = resolve_compute_dtype(conf.runtime.precision)
    use_pallas = (
        jax.default_backend() == "tpu"
        and conf.runtime.use_pallas
        and compute_dtype == jnp.bfloat16
    )
    encode_fn = jax.jit(
        partial(
            encoder_encode,
            compute_dtype=compute_dtype,
            return_pre_vq=True,
            use_pallas=use_pallas,
        ),
        static_argnames=(),
    )

    # Pipeline with a bounded in-flight window: dispatches are ASYNC, so
    # H2D + compute of the next batches overlap the previous batches'
    # device_get + .txt writes. A per-batch blocking fetch serializes
    # every batch behind a full link round trip (~25 ms on a tunneled dev
    # chip vs ~1 ms of compute).
    from collections import deque

    window = 4
    pending: "deque" = deque()
    n_done = 0

    def _flush_one() -> int:
        chunk, res = pending.popleft()
        z, c, indices, z_pre = jax.device_get(res)
        done = 0
        for j, i in enumerate(chunk):
            n_valid = lengths[i] // 2
            stem = mel_paths[i].name.replace(".mel.npy", "")
            with open(out_dir / f"{stem}.txt", "w") as f:
                np.savetxt(f, z[j, :n_valid], fmt="%.16f")
            if conf.save_auxiliary:
                aux1 = out_dir.parent / "auxiliary_embedding1"
                aux2 = out_dir.parent / "auxiliary_embedding2"
                aux1.mkdir(exist_ok=True, parents=True)
                aux2.mkdir(exist_ok=True, parents=True)
                with open(aux1 / f"{stem}.txt", "w") as f:
                    np.savetxt(f, c[j, :n_valid], fmt="%.16f")
                with open(aux2 / f"{stem}.txt", "w") as f:
                    np.savetxt(f, z_pre[j, :n_valid], fmt="%.16f")
            done += 1
        return done

    for padded_len, idxs in sorted(_bucket(lengths).items()):
        for b0 in range(0, len(idxs), batch_size):
            chunk = idxs[b0 : b0 + batch_size]
            batch = np.zeros(
                (len(chunk), mels[0].shape[0], padded_len), np.float32
            )
            for j, i in enumerate(chunk):
                batch[j, :, : lengths[i]] = mels[i][:, : lengths[i]]

            pending.append(
                (chunk, encode_fn(enc_params, vq_state, jnp.asarray(batch)))
            )
            if len(pending) >= window:
                n_done += _flush_one()
    while pending:
        n_done += _flush_one()
    return n_done

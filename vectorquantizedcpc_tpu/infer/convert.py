"""Voice conversion: source wav + target speaker -> converted wav.

Working re-design of the reference's stale convert.py (reference
convert.py:17-88; staleness in SURVEY.md §2.6). Per synthesis-list triple
``[wav_path, speaker_id, out_filename]`` (format per reference
README.md:73-82):

    load wav @16k -> BS.1770 reference loudness -> peak normalize ->
    mel pipeline -> encoder.encode -> vocoder.generate(codes, target spk)
    -> loudness-match to the source -> write wav

TPU-first: utterances are grouped into padded batches per length bucket so
the (sequential, latency-bound) AR decode amortizes across utterances —
the continuous-batching axis of BASELINE.md. The mel/loudness host work for
upcoming utterances overlaps device decode.
"""

import json
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import ConfGlobal
from ..dsp.audio_io import read_wav, write_wav
from ..dsp.loudness import integrated_loudness, normalize_loudness
from ..dsp.mel import wave_to_mel
from ..models.encoder import encoder_encode
from ..models.vocoder import vocoder_generate
from .encode import load_encoder_checkpoint


def load_vocoder_checkpoint(path, conf: ConfGlobal):
    """Load vocoder weights from a native msgpack checkpoint."""
    from ..training.checkpoint import restore_checkpoint
    from ..training.vocoder import init_train_state

    template = init_train_state(conf, jax.random.key(0))
    state = restore_checkpoint(path, template)
    return state.params


def _load_speakers(conf: ConfGlobal) -> List[str]:
    """speakers.json (sorted; id = index — reference convert.py:18-24), or
    the preprocessing manifest's speaker list."""
    for cand in (
        Path(conf.in_dir) / "speakers.json",
        Path(conf.in_dir) / "index.json",
    ):
        if cand.exists():
            with open(cand) as f:
                data = json.load(f)
            if isinstance(data, list):
                return sorted(data)
            if "speakers" in data:
                return list(data["speakers"])
    raise FileNotFoundError(
        f"No speakers.json or index.json under {conf.in_dir}"
    )


def convert(conf: ConfGlobal, batch_size: int = 8) -> int:
    """Run voice conversion over the synthesis list; returns #utterances."""
    speakers = _load_speakers(conf)
    with open(conf.synthesis_list) as f:
        synthesis_list = json.load(f)

    in_dir, out_dir = Path(conf.in_dir), Path(conf.out_dir)
    out_dir.mkdir(exist_ok=True, parents=True)

    print(f"Load checkpoint from: {conf.cpc_checkpoint}:")
    enc_params, vq_state = load_encoder_checkpoint(conf.cpc_checkpoint, conf)
    print(f"Load checkpoint from: {conf.vocoder_checkpoint}:")
    voc_params = load_vocoder_checkpoint(conf.vocoder_checkpoint, conf)

    pp = conf.data.dataset.preprocess
    net_conf = conf.training_vocoder.model.network

    # ---- Host-side feature extraction for every utterance. ---------------
    jobs = []
    for wav_path, speaker_id, out_filename in synthesis_list:
        wav, _ = read_wav((in_dir / wav_path).with_suffix(".wav"), sr=pp.sr)
        ref_loudness = integrated_loudness(wav, pp.sr)
        # Full frame count, odd T included: the encoder conv yields
        # floor(T/2) codes with the true last frame in-window (reference
        # model.py:43) — no even-trim (that would zero a real frame).
        mel = wave_to_mel(wav, pp)
        jobs.append(
            {
                "mel": mel,
                "speaker": speakers.index(speaker_id),
                "out": out_filename,
                "loudness": ref_loudness,
            }
        )

    # ---- Bucketed batched encode + AR decode. ----------------------------
    quantum = 32  # mel frames; decode length = frames * hop
    buckets: Dict[int, List[int]] = {}
    for i, job in enumerate(jobs):
        padded = max(quantum, -(-job["mel"].shape[1] // quantum) * quantum)
        buckets.setdefault(padded, []).append(i)

    # Production path: fused Pallas decode on TPU (VMEM-resident weights,
    # one kernel for the whole utterance); lax.scan elsewhere.
    use_fused = conf.runtime.use_pallas and jax.default_backend() == "tpu"
    # "auto" defers the bf16/int8 choice to the measured per-batch
    # crossover (ops/ar_decode.py:INT8_CROSSOVER_BATCH) so a config asking
    # for quantization never silently gets the slower mode at small batch.
    precision = (
        conf.runtime.precision
        if conf.runtime.precision in ("int8", "auto")
        else "bf16"
    )

    @jax.jit
    def encode_and_generate(mels, spk, rng):
        _, _, indices = encoder_encode(enc_params, vq_state, mels)
        if use_fused:
            from ..ops.ar_decode import fused_ar_decode

            return fused_ar_decode(
                voc_params, net_conf, indices, spk, rng, precision=precision
            )
        return vocoder_generate(voc_params, net_conf, indices, spk, rng)

    # Bounded in-flight window (same pipeline as infer/encode.py):
    # dispatches are async, so the next batches' H2D + encode + AR decode
    # overlap the previous batches' device_get + loudness match + wav
    # writes. A per-batch blocking fetch serializes every batch behind a
    # full link round trip plus the host-side loudness/IO work.
    from collections import deque

    window = 3
    pending: "deque" = deque()
    n_done = 0

    def _flush_one() -> int:
        chunk, res = pending.popleft()
        waves = jax.device_get(res)
        done = 0
        for j, i in enumerate(chunk):
            # floor(T/2) codes -> x2 cond frames -> x hop samples.
            n_samples = (
                (jobs[i]["mel"].shape[1] // 2) * 2
                * conf.data.dataset.mel_stft_stride
            )
            out_wave = np.asarray(waves[j][:n_samples], np.float64)
            out_loudness = integrated_loudness(out_wave, pp.sr)
            out_wave = normalize_loudness(
                out_wave, out_loudness, jobs[i]["loudness"]
            )
            write_wav(
                (out_dir / jobs[i]["out"]).with_suffix(".wav"),
                out_wave.astype(np.float32),
                pp.sr,
            )
            done += 1
        return done

    n_dispatched = 0
    for padded_len, idxs in sorted(buckets.items()):
        for b0 in range(0, len(idxs), batch_size):
            chunk = idxs[b0 : b0 + batch_size]
            mels = np.zeros((len(chunk), pp.n_mels, padded_len), np.float32)
            for j, i in enumerate(chunk):
                m = jobs[i]["mel"]
                mels[j, :, : m.shape[1]] = m
            spk = np.asarray([jobs[i]["speaker"] for i in chunk], np.int32)
            pending.append(
                (
                    chunk,
                    encode_and_generate(
                        jnp.asarray(mels), jnp.asarray(spk),
                        jax.random.key(n_dispatched),
                    ),
                )
            )
            n_dispatched += len(chunk)
            if len(pending) >= window:
                n_done += _flush_one()
    while pending:
        n_done += _flush_one()
    return n_done

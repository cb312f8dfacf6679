"""Sampler datasets over preprocessed .npy features.

Implements the two dataset contracts the reference snapshot lost
(SURVEY.md §2.4, call-site evidence at reference train_cpc.py:85-114 and
reference vocoder.py:51-76 / datamodule.py:74-96):

- :class:`CPCMelSpkDataset` — item = a stack of ``n_utterances_per_speaker``
  random fixed-length mel clips, ALL from one speaker, plus the speaker id.
  Batched over speakers this yields the (Spk, Utt, Freq, T_clip) tensors CPC
  training consumes.
- :class:`MulawMelSpkDataset` — item = (mu-law clip, aligned mel clip,
  speaker id); fixed 32-mel-frame clips (+1 audio sample for the AR
  teacher/target shift) in train mode, full length in eval mode.

Everything is host-side numpy with mel files memory-mapped, so clip sampling
is cheap; device transfer happens in loader.py.
"""

import json
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..configs import ConfDataset
from .preprocess import load_manifest


class _FeatureStore:
    """Lazy .npy access shared by both datasets."""

    def __init__(self, data_dir: Path):
        self.data_dir = Path(data_dir)
        self.manifest = load_manifest(self.data_dir)
        self.speakers: List[str] = self.manifest["speakers"]
        self.speaker_index: Dict[str, int] = {
            s: i for i, s in enumerate(self.speakers)
        }
        self.by_speaker: Dict[str, List[Dict]] = {}
        for rec in self.manifest["utterances"]:
            self.by_speaker.setdefault(rec["speaker"], []).append(rec)
        # mmap handles are cached: np.load's header parse + open costs ~1 ms
        # per call, which dominates clip sampling if repeated per access.
        self._cache: Dict[str, np.ndarray] = {}

    def _load(self, rec: Dict, kind: str) -> np.ndarray:
        key = f"{rec['speaker']}/{rec['name']}.{kind}"
        arr = self._cache.get(key)
        if arr is None:
            arr = np.load(self.data_dir / f"{key}.npy", mmap_mode="r")
            self._cache[key] = arr
        return arr

    def mel(self, rec: Dict) -> np.ndarray:
        return self._load(rec, "mel")

    def mulaw(self, rec: Dict) -> np.ndarray:
        return self._load(rec, "mulaw")


def _open_native(store: _FeatureStore, kind: str, dtype, rows: int):
    """Native window store over every ``<kind>.npy`` (None if unavailable).

    Also installs ``store.native_index``: record identity -> file slot, so
    datasets can translate their record draws into native sample calls.
    """
    from .native import NpyWindowStore, native_available

    if not native_available():
        return None
    recs = store.manifest["utterances"]
    if not recs:
        return None
    paths = [
        store.data_dir / f"{r['speaker']}/{r['name']}.{kind}.npy"
        for r in recs
    ]
    if not hasattr(store, "native_index"):
        store.native_index = {id(r): i for i, r in enumerate(recs)}
    try:
        return NpyWindowStore(paths, dtype, rows)
    except (ValueError, RuntimeError):
        return None


class CPCMelSpkDataset:
    """Per-speaker stacked mel clips for CPC training.

    ``__getitem__(i)`` -> (mels (U, n_mels, clip_length_mel) float32,
    speaker_id int). Clips are uniform-random over utterances and positions,
    re-randomized every epoch via :meth:`set_epoch` (deterministic in
    (seed, epoch, index) for reproducible resume).
    """

    def __init__(self, train: bool, conf: ConfDataset, data_dir: Path, seed: int = 0):
        self.store = _FeatureStore(data_dir)
        self.conf = conf
        self.clip_frames = conf.cpc.clip_length_mel
        self.n_utt = conf.cpc.n_utterances_per_speaker
        self.seed = seed
        self.epoch = 0
        # Only speakers with at least one long-enough utterance participate.
        self.usable: List[str] = [
            s
            for s in self.store.speakers
            if any(
                r["n_frames"] >= self.clip_frames for r in self.store.by_speaker[s]
            )
        ]
        if not self.usable:
            raise ValueError(
                f"No speaker has utterances with >= {self.clip_frames} mel frames."
            )

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.usable)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, int]:
        rng = np.random.default_rng(
            (self.seed * 1_000_003 + self.epoch) * 100_003 + idx
        )
        speaker = self.usable[idx]
        records = [
            r
            for r in self.store.by_speaker[speaker]
            if r["n_frames"] >= self.clip_frames
        ]
        chosen = rng.choice(len(records), size=self.n_utt, replace=True)
        clips = np.empty(
            (self.n_utt, self.conf.preprocess.n_mels, self.clip_frames), np.float32
        )
        for j, r_idx in enumerate(chosen):
            rec = records[r_idx]
            mel = self.store.mel(rec)
            start = rng.integers(0, rec["n_frames"] - self.clip_frames + 1)
            clips[j] = mel[:, start : start + self.clip_frames]
        return clips, self.store.speaker_index[speaker]

    def _draws(self, idx: int):
        """The exact (record, start) draws of ``__getitem__(idx)``."""
        rng = np.random.default_rng(
            (self.seed * 1_000_003 + self.epoch) * 100_003 + idx
        )
        speaker = self.usable[idx]
        records = [
            r
            for r in self.store.by_speaker[speaker]
            if r["n_frames"] >= self.clip_frames
        ]
        chosen = rng.choice(len(records), size=self.n_utt, replace=True)
        out = []
        for r_idx in chosen:
            rec = records[r_idx]
            start = rng.integers(0, rec["n_frames"] - self.clip_frames + 1)
            out.append((rec, int(start)))
        return out, self.store.speaker_index[speaker]

    def _native(self):
        if not hasattr(self, "_native_store"):
            self._native_store = _open_native(
                self.store, "mel", np.float32, self.conf.preprocess.n_mels
            )
        return self._native_store

    def sample_batch(self, indices) -> Tuple[np.ndarray, np.ndarray]:
        """Batched, GIL-free assembly of ``[self[i] for i in indices]``.

        Identical draws to per-item access (same rng streams); the window
        copies run in the native engine (data/native.py) when available,
        else per-item numpy. Used by PrefetchLoader.
        """
        native = self._native()
        if native is None:
            items = [self[int(i)] for i in indices]
            mels, spks = zip(*items)
            return np.stack(mels), np.asarray(spks)
        file_ids, starts, spks = [], [], []
        for idx in indices:
            draws, spk = self._draws(int(idx))
            spks.append(spk)
            for rec, start in draws:
                file_ids.append(self.store.native_index[id(rec)])
                starts.append(start)
        flat = native.sample(
            np.asarray(file_ids, np.int32), np.asarray(starts, np.int64),
            self.clip_frames,
        )
        b = len(indices)
        return (
            flat.reshape(b, self.n_utt, *flat.shape[1:]),
            np.asarray(spks),
        )


class MulawMelSpkDataset:
    """(mu-law audio, mel, speaker) triples for vocoder training.

    Train mode: fixed ``clip_length_mel`` (=32) frame clips; the audio clip
    is ``clip_length_mel * hop_length + 1`` samples so the teacher input
    ``audio[:-1]`` and target ``audio[1:]`` both span exactly the
    conditioning length (reference vocoder.py:62-63). Eval mode: full-length
    utterances (reference datamodule.py:86-93: val is variable-length,
    batch=1).
    """

    def __init__(self, train: bool, conf: ConfDataset, data_dir: Path, seed: int = 0):
        self.store = _FeatureStore(data_dir)
        self.train = train
        self.conf = conf
        self.clip_frames = conf.clip_length_mel
        self.hop = conf.mel_stft_stride
        self.seed = seed
        self.epoch = 0
        min_frames = self.clip_frames + 1 if train else 2
        self.records = [
            r
            for r in self.store.manifest["utterances"]
            if r["n_frames"] >= min_frames
        ]

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    @property
    def n_speakers(self) -> int:
        return len(self.store.speakers)

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray, int]:
        rec = self.records[idx]
        mel = self.store.mel(rec)
        mulaw = self.store.mulaw(rec)
        spk = self.store.speaker_index[rec["speaker"]]

        if not self.train:
            # Full length; trim mel to an even frame count (encoder halves
            # time) that the audio fully covers with one extra target sample
            # (STFT centering can give one more frame than audio spans).
            n_frames = min(rec["n_frames"], (rec["n_samples"] - 1) // self.hop)
            n_frames = (n_frames // 2) * 2
            return (
                np.asarray(mulaw[: n_frames * self.hop + 1], np.int32),
                np.asarray(mel[:, :n_frames], np.float32),
                spk,
            )

        rng = np.random.default_rng(
            (self.seed * 1_000_003 + self.epoch) * 99_991 + idx
        )
        max_start = rec["n_frames"] - self.clip_frames
        # Keep the audio clip inside the waveform (last mel frames can map
        # past the end because of STFT centering).
        max_start = min(
            max_start, (rec["n_samples"] - 1) // self.hop - self.clip_frames
        )
        start = int(rng.integers(0, max_start + 1))
        mel_clip = np.asarray(
            mel[:, start : start + self.clip_frames], np.float32
        )
        a0 = start * self.hop
        audio_clip = np.asarray(
            mulaw[a0 : a0 + self.clip_frames * self.hop + 1], np.int32
        )
        return audio_clip, mel_clip, spk

    def _draw(self, idx: int) -> int:
        """The exact clip-start draw of ``__getitem__(idx)`` (train mode)."""
        rec = self.records[idx]
        rng = np.random.default_rng(
            (self.seed * 1_000_003 + self.epoch) * 99_991 + idx
        )
        max_start = rec["n_frames"] - self.clip_frames
        max_start = min(
            max_start, (rec["n_samples"] - 1) // self.hop - self.clip_frames
        )
        return int(rng.integers(0, max_start + 1))

    def sample_batch(self, indices):
        """Batched, GIL-free assembly of ``[self[i] for i in indices]``.

        Train mode only (eval items are variable-length, batch=1). Same rng
        draws as per-item access; aligned mel + mu-law windows copied by the
        native engine when available, else per-item numpy.
        """
        if not self.train:
            items = [self[int(i)] for i in indices]
            a, m, s = zip(*items)
            return np.stack(a), np.stack(m), np.asarray(s)
        if not hasattr(self, "_native_stores"):
            n_mels = self.conf.preprocess.n_mels
            self._native_stores = (
                _open_native(self.store, "mel", np.float32, n_mels),
                _open_native(self.store, "mulaw", np.int16, 1),
            )
        mel_store, mulaw_store = self._native_stores
        if mel_store is None or mulaw_store is None:
            items = [self[int(i)] for i in indices]
            a, m, s = zip(*items)
            return np.stack(a), np.stack(m), np.asarray(s)

        ids, starts, spks = [], [], []
        for idx in indices:
            rec = self.records[int(idx)]
            ids.append(self.store.native_index[id(rec)])
            starts.append(self._draw(int(idx)))
            spks.append(self.store.speaker_index[rec["speaker"]])
        ids = np.asarray(ids, np.int32)
        starts = np.asarray(starts, np.int64)
        mels = mel_store.sample(ids, starts, self.clip_frames)
        audio = mulaw_store.sample(
            ids, starts * self.hop, self.clip_frames * self.hop + 1
        )
        return (
            audio.astype(np.int32),
            mels.astype(np.float32, copy=False),
            np.asarray(spks),
        )


def random_split_indices(n: int, n_val: int, seed: int = 42) -> Tuple[List[int], List[int]]:
    """Deterministic (N - n_val, n_val) split (reference datamodule.py:86-92
    uses torch.random_split with generator seed 42; we use numpy)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n).tolist()
    return perm[n_val:], perm[:n_val]

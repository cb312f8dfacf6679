"""DSP layer: mel-spectrogram, mu-law, pre-emphasis, loudness, wav I/O.

TPU-native equivalent of the reference's preprocess.py (librosa/scipy based).
librosa is not a dependency here: the mel pipeline is implemented from first
principles (Slaney-style mel filterbank, reflect-padded centered STFT) with
numerics matching librosa's defaults so that reference-produced features and
checkpoints remain compatible.
"""

from .mulaw import mulaw_encode, mulaw_decode
from .mel import (
    ConfPreprocessing,
    preemphasis,
    mel_filterbank,
    stft_magnitude,
    wave_to_mel,
    wave_to_mu_mel,
)
from .loudness import integrated_loudness, normalize_loudness
from .audio_io import read_wav, write_wav

__all__ = [
    "ConfPreprocessing",
    "preemphasis",
    "mulaw_encode",
    "mulaw_decode",
    "mel_filterbank",
    "stft_magnitude",
    "wave_to_mel",
    "wave_to_mu_mel",
    "integrated_loudness",
    "normalize_loudness",
    "read_wav",
    "write_wav",
]

"""DSP unit tests: mu-law round trips, STFT/mel properties, loudness."""

import numpy as np
import pytest

from vectorquantizedcpc_tpu.dsp import (
    ConfPreprocessing,
    integrated_loudness,
    mel_filterbank,
    mulaw_decode,
    mulaw_encode,
    normalize_loudness,
    preemphasis,
    stft_magnitude,
    wave_to_mel,
    wave_to_mu_mel,
)
from vectorquantizedcpc_tpu.dsp.mel import amplitude_to_db, hann_window


CONF = ConfPreprocessing()


def test_mulaw_range_and_roundtrip(rng):
    x = np.clip(rng.normal(0, 0.3, size=4096), -1, 1).astype(np.float32)
    codes = mulaw_encode(x, mu=256)
    assert codes.min() >= 0 and codes.max() <= 255
    decoded = mulaw_decode(codes, mu=256)
    # Mu-law is logarithmic: small amplitudes round-trip tightly.
    assert np.abs(decoded - x).max() < 0.04
    small = np.abs(x) < 0.1
    assert np.abs(decoded[small] - x[small]).max() < 5e-3


def test_mulaw_known_values():
    # Silence maps to the mid code; +-1 map to the extreme codes.
    assert mulaw_encode(np.array([0.0]), 256)[0] == 128
    assert mulaw_encode(np.array([-1.0]), 256)[0] == 0
    assert mulaw_encode(np.array([1.0]), 256)[0] == 255


def test_mulaw_matches_torchaudio_formula(rng):
    # Cross-check against an independent implementation of the companding law.
    x = np.clip(rng.normal(0, 0.4, 1000), -1, 1)
    mu = 255.0
    fx = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    expected = np.floor((fx + 1) / 2 * mu + 0.5).astype(np.int64)
    assert np.array_equal(mulaw_encode(x, 256), expected)


def test_preemphasis_matches_lfilter(rng):
    import scipy.signal

    x = rng.normal(size=1000)
    ours = preemphasis(x, 0.97)
    scipys = scipy.signal.lfilter([1, -0.97], [1], x)
    np.testing.assert_allclose(ours, scipys, atol=1e-12)


def test_hann_window_periodic():
    w = hann_window(400)
    assert w[0] == 0.0
    # Periodic (fftbins=True) => w[N/2] == 1.0 exactly
    assert w[200] == pytest.approx(1.0)
    assert len(w) == 400


def test_stft_shape_and_parseval(rng):
    y = rng.normal(size=16000)
    spec = stft_magnitude(y, n_fft=2048, hop_length=160, win_length=400)
    assert spec.shape == (1025, 1 + 16000 // 160)
    assert np.all(spec >= 0)


def test_stft_pure_tone_peak():
    # A 1 kHz tone at sr=16k must peak in the 1 kHz bin (bin = f * n_fft / sr).
    sr, f = 16000, 1000.0
    t = np.arange(sr) / sr
    y = np.sin(2 * np.pi * f * t)
    spec = stft_magnitude(y, n_fft=2048, hop_length=160, win_length=400)
    mid = spec[:, spec.shape[1] // 2]
    assert abs(int(np.argmax(mid)) - round(f * 2048 / sr)) <= 1


def test_mel_filterbank_properties():
    fb = mel_filterbank(16000, 2048, 80, fmin=50)
    assert fb.shape == (80, 1025)
    assert np.all(fb >= 0)
    # Every filter is non-empty and unimodal (triangular).
    assert np.all(fb.sum(axis=1) > 0)
    # Band centers increase monotonically.
    centers = np.argmax(fb, axis=1)
    assert np.all(np.diff(centers) >= 0)
    # Slaney normalization: peak filter heights decrease with bandwidth in
    # the log region (higher filters are wider -> lower peaks).
    peaks = fb.max(axis=1)
    assert peaks[-1] < peaks[40]


def test_mel_filterbank_slaney_scale_anchor():
    # Slaney mel scale is linear below 1 kHz: mel(500) == 500 / (200/3) == 7.5
    from vectorquantizedcpc_tpu.dsp.mel import _hz_to_mel_slaney, _mel_to_hz_slaney

    assert _hz_to_mel_slaney(500.0) == pytest.approx(7.5)
    assert _mel_to_hz_slaney(15.0) == pytest.approx(1000.0)
    # Round trip in log region.
    assert _mel_to_hz_slaney(_hz_to_mel_slaney(3456.0)) == pytest.approx(3456.0)


def test_amplitude_to_db_range():
    s = np.array([[1.0, 0.1, 1e-8]])
    db = amplitude_to_db(s, top_db=80)
    assert db[0, 0] == pytest.approx(0.0)
    assert db[0, 1] == pytest.approx(-20.0)
    # Floored at max - top_db.
    assert db[0, 2] == pytest.approx(-80.0)


def test_wave_to_mel_output_range(rng):
    y = rng.normal(size=16000).astype(np.float32)
    mel = wave_to_mel(y, CONF)
    assert mel.shape[0] == 80
    assert mel.dtype == np.float32
    # After /top_db + 1 the range is ~[0, 1] (max can exceed 1 slightly when
    # the mel peak is above 0 dB, same as the reference pipeline).
    assert 0.9 < mel.max() < 1.2
    # Floor: (max_db - top_db)/top_db + 1 == max_db/top_db, i.e. >= 0 - eps.
    assert mel.min() >= mel.max() - 1.0 - 1e-6


def test_wave_to_mu_mel_time_alignment(rng):
    y = rng.normal(size=16000).astype(np.float32)
    mulaw, mel = wave_to_mu_mel(y, CONF)
    assert len(mulaw) == 16000
    # hop=160 -> 100 frames per second + 1 center frame.
    assert mel.shape == (80, 101)
    assert mulaw.dtype == np.int32


def test_integrated_loudness_gain_invariance(rng):
    # Doubling amplitude raises loudness by ~6.02 dB.
    t = np.arange(3 * 16000) / 16000
    y = 0.1 * np.sin(2 * np.pi * 440 * t)
    l1 = integrated_loudness(y, 16000)
    l2 = integrated_loudness(2 * y, 16000)
    assert l2 - l1 == pytest.approx(20 * np.log10(2), abs=0.1)


def test_normalize_loudness_roundtrip(rng):
    t = np.arange(2 * 16000) / 16000
    y = 0.05 * np.sin(2 * np.pi * 220 * t) + 0.01 * rng.normal(size=len(t))
    src = integrated_loudness(y, 16000)
    target = src + 7.0
    out = normalize_loudness(y, src, target)
    assert integrated_loudness(out, 16000) == pytest.approx(target, abs=0.2)


def test_loudness_silence():
    assert integrated_loudness(np.zeros(32000), 16000) == -np.inf


def test_wav_io_roundtrip(tmp_path, rng):
    from vectorquantizedcpc_tpu.dsp import read_wav, write_wav

    y = np.clip(rng.normal(0, 0.2, 8000), -1, 1).astype(np.float32)
    p = tmp_path / "x.wav"
    write_wav(p, y, 16000)
    back, sr = read_wav(p)
    assert sr == 16000
    assert np.abs(back - y).max() < 1e-3


def test_wav_io_resample(tmp_path):
    from vectorquantizedcpc_tpu.dsp import read_wav, write_wav

    t = np.arange(48000) / 48000
    y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = tmp_path / "y.wav"
    write_wav(p, y, 48000)
    back, sr = read_wav(p, sr=16000)
    assert sr == 16000
    assert abs(len(back) - 16000) <= 1

"""Data layer tests: synthetic corpus, preprocessing, datasets, loader."""

import numpy as np
import pytest

from vectorquantizedcpc_tpu.configs import load_conf
from vectorquantizedcpc_tpu.data.corpus import SyntheticCorpus, get_corpus
from vectorquantizedcpc_tpu.data.datasets import (
    CPCMelSpkDataset,
    MulawMelSpkDataset,
    random_split_indices,
)
from vectorquantizedcpc_tpu.data.loader import PrefetchLoader
from vectorquantizedcpc_tpu.data.preprocess import preprocess_corpus


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    corpus = SyntheticCorpus(root, n_speakers=3, n_utterances=4, duration_s=1.7)
    corpus.utterances()  # materialize wavs
    return root


@pytest.fixture(scope="module")
def features_dir(corpus_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("features")
    conf = load_conf([])
    corpus = SyntheticCorpus(corpus_dir, n_speakers=3, n_utterances=4, duration_s=1.7)
    preprocess_corpus(corpus, out, conf.data.dataset.preprocess, num_workers=1)
    return out


def test_synthetic_corpus_deterministic(corpus_dir):
    c = SyntheticCorpus(corpus_dir, n_speakers=3, n_utterances=4)
    utts = c.utterances()
    assert len(utts) == 12
    assert c.speakers() == ["V000", "V001", "V002"]
    # Regenerating produces identical audio (pure function of indices).
    w1 = c._generate(1, 2)
    w2 = SyntheticCorpus("/tmp/other", n_speakers=3, n_utterances=4)._generate(1, 2)
    np.testing.assert_array_equal(w1, w2)


def test_preprocess_manifest_and_files(features_dir):
    import json

    with open(features_dir / "index.json") as f:
        manifest = json.load(f)
    assert len(manifest["utterances"]) == 12
    assert manifest["speakers"] == ["V000", "V001", "V002"]
    rec = manifest["utterances"][0]
    mel = np.load(features_dir / rec["speaker"] / f"{rec['name']}.mel.npy")
    mulaw = np.load(features_dir / rec["speaker"] / f"{rec['name']}.mulaw.npy")
    assert mel.shape == (80, rec["n_frames"])
    assert len(mulaw) == rec["n_samples"]
    # 1.7 s at hop 160 -> 170 frames + 1.
    assert rec["n_frames"] == 171
    assert mulaw.dtype == np.int16


def test_cpc_dataset_item_shapes(features_dir):
    conf = load_conf(["training.cpc.sample_frames=32", "training.cpc.n_prediction_steps=12"])
    ds = CPCMelSpkDataset(True, conf.data.dataset, features_dir, seed=0)
    assert len(ds) == 3  # speakers
    clips, spk = ds[0]
    assert clips.shape == (8, 80, 44)  # 32 + 12 frames
    assert clips.dtype == np.float32
    assert spk == 0


def test_cpc_dataset_epoch_resampling(features_dir):
    conf = load_conf(["training.cpc.sample_frames=32"])
    ds = CPCMelSpkDataset(True, conf.data.dataset, features_dir, seed=0)
    a, _ = ds[0]
    ds.set_epoch(1)
    b, _ = ds[0]
    assert not np.array_equal(a, b)
    ds.set_epoch(0)
    c, _ = ds[0]
    np.testing.assert_array_equal(a, c)  # deterministic in (seed, epoch, idx)


def test_mulaw_dataset_train_alignment(features_dir):
    conf = load_conf([])  # clip_length_mel=32, hop=160
    ds = MulawMelSpkDataset(True, conf.data.dataset, features_dir, seed=0)
    audio, mel, spk = ds[0]
    assert mel.shape == (80, 32)
    assert audio.shape == (32 * 160 + 1,)
    assert audio.dtype == np.int32
    assert 0 <= audio.min() and audio.max() < 256


def test_mulaw_dataset_val_full_length(features_dir):
    conf = load_conf([])
    ds = MulawMelSpkDataset(False, conf.data.dataset, features_dir, seed=0)
    audio, mel, spk = ds[0]
    assert mel.shape[1] % 2 == 0  # trimmed to even for the conv
    assert len(audio) == mel.shape[1] * 160 + 1


def test_random_split_deterministic():
    tr1, va1 = random_split_indices(10, 3, seed=42)
    tr2, va2 = random_split_indices(10, 3, seed=42)
    assert tr1 == tr2 and va1 == va2
    assert len(va1) == 3 and len(tr1) == 7
    assert sorted(tr1 + va1) == list(range(10))


def test_prefetch_loader_batches(features_dir):
    conf = load_conf(["training.cpc.sample_frames=32"])
    ds = CPCMelSpkDataset(True, conf.data.dataset, features_dir, seed=0)
    loader = PrefetchLoader(ds, batch_size=2, shuffle=True, drop_last=True, device_put=False)
    batches = list(loader)
    assert len(batches) == 1  # 3 speakers // 2
    mels, spks = batches[0]
    assert mels.shape == (2, 8, 80, 44)
    assert spks.shape == (2,)


def test_prefetch_loader_epoch_shuffle(features_dir):
    conf = load_conf(["training.cpc.sample_frames=32"])
    ds = CPCMelSpkDataset(True, conf.data.dataset, features_dir, seed=0)
    loader = PrefetchLoader(ds, batch_size=3, shuffle=True, drop_last=True, device_put=False)
    loader.set_epoch(0)
    _, spk0 = next(iter(loader))
    orders = set()
    for e in range(5):
        loader.set_epoch(e)
        _, spk = next(iter(loader))
        orders.add(tuple(np.asarray(spk).tolist()))
    assert len(orders) > 1  # order varies across epochs


def test_prefetch_loader_propagates_errors(features_dir):
    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("boom")

    loader = PrefetchLoader(Broken(), batch_size=2, device_put=False)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_get_corpus_download_needs_root():
    conf = load_conf(["data.corpus.download=true"]).data.corpus
    with pytest.raises(ValueError, match="download destination"):
        get_corpus("ZR19", conf)


# ---------------------------------------------------------------------------
# Transparent corpus download (reference README.md:41-43 — speechcorpusy
# fetches ZR19 on first use). The fetch is injectable so the full
# fetch -> checksum -> extract -> marker path runs without egress.
# ---------------------------------------------------------------------------


def _fake_zr19_archive(path, n_wavs=3):
    """Build a tiny english.tgz with the official extraction layout."""
    import io
    import tarfile
    import wave as wave_mod

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.zeros(160, np.int16).tobytes())
    wav_bytes = buf.getvalue()

    with tarfile.open(path, "w:gz") as tf:
        for i in range(n_wavs):
            info = tarfile.TarInfo(f"english/train/unit/S{i:03d}_{i:07d}.wav")
            info.size = len(wav_bytes)
            tf.addfile(info, io.BytesIO(wav_bytes))


def test_download_fetch_extract_idempotent(tmp_path):
    """Injected fetch -> extract -> enumerate; second use hits the marker."""
    from vectorquantizedcpc_tpu.data.corpus import ZR19Corpus

    calls = []

    def fetcher(url, dest):
        calls.append(url)
        _fake_zr19_archive(dest)

    conf = load_conf(
        ["data.corpus.download=true", f"data.corpus.root={tmp_path}"]
    ).data.corpus
    corpus = ZR19Corpus(conf, fetcher=fetcher)
    utts = corpus.utterances()
    assert len(utts) == 3
    assert sorted(u.speaker for u in utts) == ["S000", "S001", "S002"]
    assert calls == ["https://download.zerospeech.com/2019/english.tgz"]

    # Idempotent: completion marker short-circuits fetch AND extract.
    corpus2 = ZR19Corpus(conf, fetcher=fetcher)
    assert len(corpus2.utterances()) == 3
    assert len(calls) == 1


def test_download_checksum_verified(tmp_path, monkeypatch):
    """A pinned sha256 is enforced: match passes, mismatch fails loudly."""
    import hashlib

    from vectorquantizedcpc_tpu.data import corpus as corpus_mod

    archive = tmp_path / "src.tgz"
    _fake_zr19_archive(archive)
    digest = hashlib.sha256(archive.read_bytes()).hexdigest()

    def fetcher(url, dest):
        dest.write_bytes(archive.read_bytes())

    good = corpus_mod.ArchiveSpec(
        url="https://example.invalid/english.tgz",
        filename="english.tgz",
        sha256=digest,
    )
    monkeypatch.setitem(corpus_mod.CORPUS_ARCHIVES, "ZeroSpeech2019", good)
    root = corpus_mod.download_corpus(
        "ZeroSpeech2019", tmp_path / "ok", fetcher
    )
    assert (root / "english" / "train" / "unit").exists()

    bad = corpus_mod.ArchiveSpec(
        url=good.url, filename=good.filename, sha256="0" * 64
    )
    monkeypatch.setitem(corpus_mod.CORPUS_ARCHIVES, "ZeroSpeech2019", bad)
    with pytest.raises(RuntimeError, match="Checksum mismatch"):
        corpus_mod.download_corpus("ZeroSpeech2019", tmp_path / "bad", fetcher)


def test_download_no_public_archive(tmp_path):
    """JVS has no stable public URL -> actionable manual-download error."""
    from vectorquantizedcpc_tpu.data.corpus import JVSCorpus

    conf = load_conf(
        ["data.corpus.download=true", f"data.corpus.root={tmp_path}"]
    ).data.corpus
    with pytest.raises(RuntimeError, match="manually"):
        JVSCorpus(conf)


def test_download_default_fetcher_egress_error(tmp_path, monkeypatch):
    """The default urllib fetcher turns network failure into an actionable
    error (this environment has no egress — but don't rely on that: stub
    urlopen to fail deterministically)."""
    import urllib.request

    from vectorquantizedcpc_tpu.data.corpus import default_fetcher

    def boom(*a, **k):
        raise OSError("network unreachable")

    monkeypatch.setattr(urllib.request, "urlopen", boom)
    with pytest.raises(RuntimeError, match="no network egress"):
        default_fetcher("https://example.invalid/x.tgz", tmp_path / "x.tgz")
    assert not (tmp_path / "x.tgz.part").exists()


def test_datamodule_wrappers(corpus_dir, features_dir):
    from vectorquantizedcpc_tpu.data.datamodule import VocoderDataModule

    conf = load_conf(["data.loader.batch_size=4"]).data

    class SyntheticDM(VocoderDataModule):
        corpus_name = "synthetic"

    dm = SyntheticDM(conf, data_dir=features_dir)
    dm.setup()
    loader = dm.train_dataloader()
    assert len(loader) == (12 - 3) // 4
    audio, mel, spk = next(iter(loader))
    assert mel.shape == (4, 80, 32)
    val = dm.val_items()
    assert len(val) == 3
    # Val items are full length (variable), batch of 1 semantics.
    assert val[0][1].shape[1] > 32
    assert dm.n_speakers == 3

"""Native clip-sampling engine: .npy parity + dataset batch equivalence.

The native path must be a pure accelerator: batches assembled through
``sample_batch`` (native window copies) must be bit-identical to stacking
``__getitem__`` items (pure numpy), for both dataset contracts.
"""

import numpy as np
import pytest

from vectorquantizedcpc_tpu.configs import load_conf
from vectorquantizedcpc_tpu.data.corpus import SyntheticCorpus
from vectorquantizedcpc_tpu.data.datasets import (
    CPCMelSpkDataset,
    MulawMelSpkDataset,
)
from vectorquantizedcpc_tpu.data.native import NpyWindowStore, native_available
from vectorquantizedcpc_tpu.data.preprocess import preprocess_corpus

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native sampler unavailable (no g++)"
)


@pytest.fixture(scope="module")
def features_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    out = tmp_path_factory.mktemp("features")
    corpus = SyntheticCorpus(root, n_speakers=3, n_utterances=4, duration_s=1.7)
    conf = load_conf([])
    preprocess_corpus(corpus, out, conf.data.dataset.preprocess, num_workers=1)
    return out


def test_window_store_parity(tmp_path, rng):
    arrs, paths = [], []
    for i, t in enumerate((200, 351, 128)):
        a = rng.normal(size=(80, t)).astype(np.float32)
        p = tmp_path / f"f{i}.npy"
        np.save(p, a)
        arrs.append(a)
        paths.append(p)
    store = NpyWindowStore(paths, np.float32, 80)
    ids = np.array([0, 2, 1, 1, 0], np.int32)
    starts = np.array([0, 78, 301, 0, 150], np.int64)
    out = store.sample(ids, starts, 50)
    ref = np.stack([arrs[i][:, s : s + 50] for i, s in zip(ids, starts)])
    np.testing.assert_array_equal(out, ref)
    store.close()


def test_window_store_1d_and_bounds(tmp_path, rng):
    b = rng.integers(-(2**15), 2**15, size=(5000,)).astype(np.int16)
    p = tmp_path / "w.npy"
    np.save(p, b)
    store = NpyWindowStore([p], np.int16, 1)
    out = store.sample(
        np.zeros(3, np.int32), np.array([0, 999, 4000], np.int64), 1000
    )
    np.testing.assert_array_equal(
        out, np.stack([b[s : s + 1000] for s in (0, 999, 4000)])
    )
    with pytest.raises(IndexError, match="out of bounds"):
        store.sample(np.zeros(1, np.int32), np.array([4001], np.int64), 1000)
    store.close()


def test_window_store_rejects_mismatched(tmp_path, rng):
    p = tmp_path / "f.npy"
    np.save(p, rng.normal(size=(80, 100)).astype(np.float32))
    with pytest.raises(ValueError, match="mismatch"):
        NpyWindowStore([p], np.float32, 81)
    with pytest.raises(ValueError, match="mismatch"):
        NpyWindowStore([p], np.float64, 80)


def test_cpc_sample_batch_bit_identical(features_dir):
    conf = load_conf(["training.cpc.sample_frames=20"])
    ds = CPCMelSpkDataset(True, conf.data.dataset, features_dir, seed=3)
    ds.set_epoch(2)
    assert ds._native() is not None  # native engine actually in play
    indices = [2, 0, 1]
    mels, spks = ds.sample_batch(indices)
    ref_items = [ds[i] for i in indices]
    np.testing.assert_array_equal(mels, np.stack([m for m, _ in ref_items]))
    np.testing.assert_array_equal(spks, [s for _, s in ref_items])
    assert mels.dtype == np.float32


def test_mulaw_sample_batch_bit_identical(features_dir):
    conf = load_conf([])
    ds = MulawMelSpkDataset(True, conf.data.dataset, features_dir, seed=5)
    ds.set_epoch(1)
    indices = [3, 1, 0, 2]
    audio, mels, spks = ds.sample_batch(indices)
    ref = [ds[i] for i in indices]
    np.testing.assert_array_equal(audio, np.stack([a for a, _, _ in ref]))
    np.testing.assert_array_equal(mels, np.stack([m for _, m, _ in ref]))
    np.testing.assert_array_equal(spks, [s for _, _, s in ref])
    assert audio.dtype == np.int32 and mels.dtype == np.float32

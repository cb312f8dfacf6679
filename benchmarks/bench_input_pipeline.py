"""Host batch-assembly throughput: native engine vs per-item numpy.

Measures the input-pipeline side of CPC training (the (Spk, Utt, 80, 140)
clip batches of reference train_cpc.py:85-114) on a realistic feature set,
comparing the GIL-free native window copier (data/native.py) against the
pure-Python per-item path. Run anywhere (host-only, no accelerator).
"""

import time

import numpy as np

from vectorquantizedcpc_tpu.configs import load_conf
from vectorquantizedcpc_tpu.data.corpus import SyntheticCorpus
from vectorquantizedcpc_tpu.data.datasets import CPCMelSpkDataset
from vectorquantizedcpc_tpu.data.native import native_available
from vectorquantizedcpc_tpu.data.preprocess import preprocess_corpus


def main():
    import tempfile
    from pathlib import Path

    ws = Path(tempfile.mkdtemp(prefix="vqcpc_bench_io_"))
    conf = load_conf([])
    corpus = SyntheticCorpus(
        ws / "corpus", n_speakers=8, n_utterances=10, duration_s=4.0
    )
    preprocess_corpus(corpus, ws / "features", conf.data.dataset.preprocess)

    ds = CPCMelSpkDataset(True, conf.data.dataset, ws / "features")
    tc = conf.training.cpc
    indices = list(range(tc.n_speakers_per_batch))
    n_iter = 200

    def python_path():
        items = [ds[i] for i in indices]
        mels, spks = zip(*items)
        return np.stack(mels), np.asarray(spks)

    assert native_available(), "native engine not available"
    ref = python_path()
    nat = ds.sample_batch(indices)
    np.testing.assert_array_equal(ref[0], nat[0])  # bit-identical

    for name, fn in (("python", python_path), ("native", ds.sample_batch)):
        arg = () if name == "python" else (indices,)
        fn(*arg)  # warm
        t0 = time.time()
        for i in range(n_iter):
            ds.set_epoch(i)
            fn(*arg)
        dt = (time.time() - t0) / n_iter
        mb = ref[0].nbytes / 1e6
        print(
            f"{name:7s}: {dt * 1e3:7.2f} ms/batch "
            f"({mb / dt:7.0f} MB/s, batch {ref[0].shape})"
        )


if __name__ == "__main__":
    main()

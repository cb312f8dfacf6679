"""Preprocess a corpus into mel / mu-law .npy features + manifest.

The runnable preprocessing CLI the reference snapshot lost (SURVEY.md §3.5;
intended flow per reference README.md:41-43).

    python -m vectorquantizedcpc_tpu.cli.preprocess \\
        data.dataset.name=ZR19 data.corpus.root=/data/zr19 out_dir=./features
"""

from pathlib import Path

from ..configs import apply_runtime, load_conf
from ..data.corpus import get_corpus
from ..data.preprocess import preprocess_corpus


def main() -> None:
    conf = load_conf()
    apply_runtime(conf)
    corpus = get_corpus(conf.data.dataset.name, conf.data.corpus)
    manifest = preprocess_corpus(
        corpus,
        Path(conf.out_dir),
        conf.data.dataset.preprocess,
        num_workers=conf.data.loader.num_workers or 2,
    )
    print(
        f"Preprocessed {len(manifest['utterances'])} utterances, "
        f"{len(manifest['speakers'])} speakers -> {conf.out_dir}"
    )


if __name__ == "__main__":
    main()

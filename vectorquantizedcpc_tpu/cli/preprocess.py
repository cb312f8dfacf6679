"""Preprocess a corpus into mel / mu-law .npy features + manifest.

The runnable preprocessing CLI the reference snapshot lost (SURVEY.md §3.5;
intended flow per reference README.md:41-43).

    python -m vectorquantizedcpc_tpu.cli.preprocess \\
        data.dataset.name=ZR19 data.corpus.root=/data/zr19 out_dir=./features

Destination precedence: a non-default ``out_dir`` wins; with out_dir left
at its default, ``data.dataset.adress_data_root`` / ``data.adress_data_root``
(the keys the trainers READ features from) are used so preprocess+train
round-trip on one flag. Passing out_dir explicitly as the literal default
"./out" is indistinguishable from not passing it.
"""

from pathlib import Path

from ..configs import apply_runtime, load_conf
from ..data.corpus import get_corpus
from ..data.preprocess import preprocess_corpus


def main() -> None:
    conf = load_conf()
    apply_runtime(conf)
    corpus = get_corpus(conf.data.dataset.name, conf.data.corpus)
    # Destination: explicit out_dir wins; otherwise honor the feature-root
    # keys the TRAINERS read from (data.dataset.adress_data_root /
    # data.adress_data_root), so `preprocess data.adress_data_root=X`
    # followed by `train_cpc data.adress_data_root=X` round-trips without
    # the features silently landing in the default ./out.
    out_dir = conf.out_dir
    if out_dir == "./out":
        out_dir = (
            conf.data.dataset.adress_data_root
            or conf.data.adress_data_root
            or out_dir
        )
    manifest = preprocess_corpus(
        corpus,
        Path(out_dir),
        conf.data.dataset.preprocess,
        num_workers=conf.data.loader.num_workers or 2,
    )
    print(
        f"Preprocessed {len(manifest['utterances'])} utterances, "
        f"{len(manifest['speakers'])} speakers -> {out_dir}"
    )


if __name__ == "__main__":
    main()

"""Train the RNN_MS vocoder on a frozen pretrained encoder
(reference train_vocoder_main.py:11-34).

    python -m vectorquantizedcpc_tpu.cli.train_vocoder \\
        cpc_checkpoint=./ckpt/model.ckpt-22000 \\
        data.dataset.name=ZR19 data.corpus.root=/data/zr19
"""

from pathlib import Path

from ..configs import apply_runtime, load_conf
from ..data.corpus import get_corpus
from ..data.preprocess import preprocess_corpus
from ..infer.encode import load_encoder_checkpoint
from ..training.vocoder import train_vocoder


def main() -> None:
    conf = load_conf()
    apply_runtime(conf)

    # Frozen pretrained encoder (reference train_vocoder_main.py:26-31).
    enc_params, vq_state = load_encoder_checkpoint(conf.cpc_checkpoint, conf)

    corpus = get_corpus(conf.data.dataset.name, conf.data.corpus)
    data_dir = Path(
        conf.data.dataset.adress_data_root
        or conf.data.adress_data_root
        or "./features"
    )
    preprocess_corpus(corpus, data_dir, conf.data.dataset.preprocess)

    train_vocoder(conf, enc_params, vq_state, data_dir)


if __name__ == "__main__":
    main()

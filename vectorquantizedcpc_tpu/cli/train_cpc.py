"""Train the VQ-CPC encoder (reference train_cpc.py __main__).

    python -m vectorquantizedcpc_tpu.cli.train_cpc \\
        data.dataset.name=ZR19 data.corpus.root=/data/zr19 checkpoint_dir=./ckpt
"""

from ..configs import apply_runtime, load_conf
from ..training.cpc import train_model


def main() -> None:
    conf = load_conf()
    apply_runtime(conf)
    train_model(conf)


if __name__ == "__main__":
    main()

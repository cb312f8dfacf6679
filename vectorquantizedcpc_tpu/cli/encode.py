"""Export discrete latents as .txt for ABX evaluation (reference encode.py).

    python -m vectorquantizedcpc_tpu.cli.encode \\
        cpc_checkpoint=./ckpt/model.ckpt-22000 in_dir=./features out_dir=./codes
"""

from ..configs import apply_runtime, load_conf
from ..infer.encode import encode_dataset


def main() -> None:
    conf = load_conf()
    apply_runtime(conf)
    n = encode_dataset(conf)
    print(f"Encoded {n} utterances -> {conf.out_dir}")


if __name__ == "__main__":
    main()

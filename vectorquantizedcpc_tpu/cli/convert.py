"""Voice conversion CLI (reference convert.py).

    python -m vectorquantizedcpc_tpu.cli.convert \\
        synthesis_list=./target_vc.json in_dir=./wavs out_dir=./converted \\
        cpc_checkpoint=./ckpt/model.ckpt-22000 \\
        vocoder_checkpoint=./vqcpc_vocoder/default/version_0/checkpoints/model.ckpt-160000
"""

from ..configs import apply_runtime, load_conf
from ..infer.convert import convert


def main() -> None:
    conf = load_conf()
    apply_runtime(conf)
    n = convert(conf)
    print(f"Converted {n} utterances -> {conf.out_dir}")


if __name__ == "__main__":
    main()

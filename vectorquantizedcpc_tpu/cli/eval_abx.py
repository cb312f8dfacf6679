"""Machine-ABX evaluation over encode.py latent dumps.

The reference's flow is encode.py -> external ZeroSpeech ABX toolkit
(reference README.md:89-102). This CLI closes that loop in-repo:

    python -m vectorquantizedcpc_tpu.cli.eval_abx \\
        --features ./codes --items ./items.json [--within] \\
        [--metric cosine|euclidean]
    python -m vectorquantizedcpc_tpu.cli.eval_abx \\
        --features ./codes --item-file ./zr19/english/test/1s/1s.item

``--items`` is a JSON mapping each feature stem to its labels:
``{"<stem>": {"category": "<unit/word id>", "speaker": "<spk id>"}}``.
``--item-file`` instead consumes an official ZeroSpeech/bootphon triphone
``.item`` file (what the ZR19 eval corpus ships; reference
README.md:89-102) — point it at the real corpus and get the ABX number in
one command.
Plain argparse (not the dotted-override config tree): this tool consumes
eval artifacts, not training config.
"""

import argparse
import json


def _dry_run(workdir: str, epochs: int) -> None:
    """One-command pipeline rehearsal: corpus -> preprocess -> train a tiny
    CPC encoder -> encode -> ABX, on the synthetic corpus (VERDICT r3 #8).

    Exercises the exact CLI chain the real ZeroSpeech2019 run needs
    (reference README.md:89-102) so that when the corpus + a pretrained
    checkpoint are available, only the paths change:

        python -m ...cli.preprocess data.corpus.root=<zr19> ...
        python -m ...cli.encode cpc_checkpoint=<ckpt> ...
        python -m ...cli.eval_abx --features codes \\
            --item-file <zr19>/.../1s.item

    The dry run's score is ~chance (synthetic melodies aren't triphones);
    what it validates is the plumbing end to end.
    """
    import subprocess
    import sys
    import tempfile
    from pathlib import Path

    ws = Path(workdir or tempfile.mkdtemp(prefix="vqcpc_abx_dry_"))

    def run(module, *overrides):
        cmd = [
            sys.executable, "-m", f"vectorquantizedcpc_tpu.cli.{module}",
            *overrides,
        ]
        print(f"\n$ {' '.join(cmd)}\n", flush=True)
        subprocess.run(cmd, check=True)

    tiny = [
        "runtime.platform=cpu",
        "model.encoder.channels=64",
        "dim_latent=16",
        "dim_cpc_context=32",
        "size_latent_codebook=64",
        "runtime.precision=float32",
    ]
    data = [
        "data.dataset.name=synthetic",
        f"data.corpus.root={ws}/corpus",
        f"data.dataset.adress_data_root={ws}/features",
    ]
    # download-corpus + preprocess (the synthetic corpus materializes on
    # first use through the same Corpus.prepare path ZR19 download uses).
    run("preprocess", *data, f"out_dir={ws}/features")
    run(
        "train_cpc", *tiny, *data,
        f"checkpoint_dir={ws}/ckpt",
        "training.cpc.sample_frames=32",
        "training.cpc.n_speakers_per_batch=4",
        "training.cpc.n_utterances_per_speaker=4",
        "training.cpc.n_negatives=5",
        f"training.cpc.n_epochs={epochs}",
        "training.cpc.scheduler.warmup_epochs=3",
        f"training.cpc.scheduler.milestones=[{max(4, epochs - 2)}]",
        f"training.cpc.checkpoint_interval={epochs}",
        "training.cpc.log_interval=20",
    )
    run(
        "encode", *tiny,
        f"cpc_checkpoint={ws}/ckpt/model.ckpt-{epochs}",
        f"in_dir={ws}/features", f"out_dir={ws}/codes",
    )
    # Labels from the synthetic corpus naming (V<spk>/<spk>_<utt>.wav):
    # category = utterance slot, speaker = directory name.
    items = {}
    for p in sorted(Path(f"{ws}/codes").glob("*.txt")):
        spk, utt = p.stem.split("_", 1)
        items[p.stem] = {"category": f"u{utt}", "speaker": spk}
    with open(ws / "items.json", "w") as f:
        json.dump(items, f)

    from ..eval.abx import abx_error_rate, load_feature_dir

    feats, cats, spks = load_feature_dir(f"{ws}/codes", str(ws / "items.json"))
    err = abx_error_rate(feats, cats, spks, across=True)
    assert 0.0 <= err <= 1.0
    print(
        json.dumps(
            {
                "abx_error_rate": round(err, 6),
                "dry_run": True,
                "workdir": str(ws),
                "n_items": len(feats),
            }
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--dry-run",
        action="store_true",
        help="rehearse the full chain (synthetic corpus -> preprocess -> "
        "tiny CPC train -> encode -> ABX) in one command; score is "
        "~chance, the point is validating the plumbing",
    )
    ap.add_argument("--workdir", default=None, help="--dry-run scratch dir")
    ap.add_argument(
        "--dry-run-epochs", type=int, default=6, help="--dry-run train length"
    )
    ap.add_argument("--features", help="dir of <stem>.txt dumps")
    group = ap.add_mutually_exclusive_group(required=False)
    group.add_argument("--items", help="items JSON (see docstring)")
    group.add_argument(
        "--item-file",
        help="official ZeroSpeech/bootphon .item file (triphone tasks); "
        "categories = triphones, features sliced by onset/offset",
    )
    ap.add_argument(
        "--frame-period",
        type=float,
        default=0.02,
        help="seconds per latent frame for --item-file slicing (encoder = "
        "10 ms mel hop x2 downsample = 0.02)",
    )
    ap.add_argument(
        "--within",
        action="store_true",
        help="within-speaker task (default: across-speaker)",
    )
    ap.add_argument("--metric", default="cosine", choices=["cosine", "euclidean"])
    ap.add_argument("--max-triples-per-cell", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--platform",
        default=None,
        help="force a jax backend (e.g. cpu); default: auto",
    )
    args = ap.parse_args()

    if args.dry_run:
        _dry_run(args.workdir, args.dry_run_epochs)
        return
    if not args.features or not (args.items or args.item_file):
        ap.error(
            "--features plus one of --items/--item-file is required "
            "(or use --dry-run)"
        )

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from ..eval.abx import abx_error_rate, load_feature_dir, load_item_file

    if args.item_file:
        feats, cats, spks = load_item_file(
            args.item_file, args.features, frame_period=args.frame_period
        )
        with open(args.item_file) as f:
            n_items = sum(
                1 for l in f if l.strip() and not l.startswith("#")
            )
        if len(feats) < n_items:
            print(
                f"warning: {n_items - len(feats)} items skipped (missing "
                "feature file or shorter than 2 frames)"
            )
    else:
        feats, cats, spks = load_feature_dir(args.features, args.items)
        with open(args.items) as f:
            n_items = len(json.load(f))
        if len(feats) < n_items:
            print(f"warning: {n_items - len(feats)} items had no feature file")

    err = abx_error_rate(
        feats,
        cats,
        spks,
        across=not args.within,
        metric=args.metric,
        max_triples_per_cell=args.max_triples_per_cell,
        seed=args.seed,
    )
    task = "within" if args.within else "across"
    print(
        json.dumps(
            {
                "abx_error_rate": round(err, 6),
                "task": task,
                "metric": args.metric,
                "n_items": len(feats),
                "n_categories": len(set(cats)),
                "n_speakers": len(set(spks)),
            }
        )
    )


if __name__ == "__main__":
    main()

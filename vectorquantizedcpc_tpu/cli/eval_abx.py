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


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--features", required=True, help="dir of <stem>.txt dumps")
    group = ap.add_mutually_exclusive_group(required=True)
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

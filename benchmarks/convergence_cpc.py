"""Scripted CPC convergence run on the fast-path stack (VERDICT r4 #1).

Reproduces, as a runnable artifact instead of prose, the end-to-end
soundness check behind the CPC training numbers: N epochs of the SHIPPED
epoch trainer — fused Pallas selection kernel + fused LSTM kernel + RBG
negative-sampling keys + bf16 compute — on the deterministic synthetic
corpus, asserting that loss falls, codebook perplexity rises, and
per-step accuracies improve. A Mosaic miscompile that corrupted gradients
or the VQ-EMA state transition would flatline or diverge these curves.

Usage (TPU; ~2-3 min for the default 300 epochs):

    python benchmarks/convergence_cpc.py [--epochs 300]

Prints one JSON line with the start/end metric triplets, e.g. the round-4
reference trajectory (v5e, 300 epochs): cpc loss 1.85 -> 1.62, perplexity
3.10 -> 4.34, accuracies 41% -> 51-57% (COVERAGE.md CPC row).
"""

import argparse
import json
import tempfile

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--steps-per-epoch", type=int, default=10)
    args = ap.parse_args()

    import jax

    from vectorquantizedcpc_tpu.configs import load_conf
    from vectorquantizedcpc_tpu.data.corpus import get_corpus
    from vectorquantizedcpc_tpu.data.datasets import CPCMelSpkDataset
    from vectorquantizedcpc_tpu.data.preprocess import preprocess_corpus
    from vectorquantizedcpc_tpu.training.cpc import (
        init_train_state,
        make_train_epoch,
    )
    from vectorquantizedcpc_tpu.training.schedule import WarmupSchedule

    conf = load_conf([
        "data.dataset.name=synthetic",
        # Synthetic corpus is 4-speaker; batch like the e2e suite.
        "training.cpc.n_speakers_per_batch=4",
        "data.corpus.download=true",
    ])
    tc = conf.training.cpc

    with tempfile.TemporaryDirectory(prefix="conv_cpc_") as tmp:
        corpus = get_corpus("synthetic", conf.data.corpus)
        preprocess_corpus(corpus, tmp, conf.data.dataset.preprocess)
        dataset = CPCMelSpkDataset(True, conf.data.dataset, tmp, seed=conf.seed)

        state = init_train_state(conf, jax.random.key(conf.seed))
        schedule = WarmupSchedule(
            warmup_epochs=tc.scheduler.warmup_epochs,
            initial_lr=tc.scheduler.initial_lr,
            max_lr=tc.scheduler.max_lr,
            milestones=tc.scheduler.milestones,
            gamma=tc.scheduler.gamma,
        )
        train_epoch = make_train_epoch(conf)

        rng = np.random.default_rng(conf.seed)
        first = last = None
        for epoch in range(1, args.epochs + 1):
            # Fresh clip resamples each epoch, like the shipped loader.
            batches = []
            for _ in range(args.steps_per_epoch):
                idx = rng.permutation(len(dataset))[
                    : tc.n_speakers_per_batch
                ]
                batches.append(np.stack([dataset[i][0] for i in idx]))
            epoch_mels = jax.numpy.asarray(np.stack(batches))
            state, metrics = train_epoch(
                state, epoch_mels, np.float32(schedule(epoch - 1))
            )
            if epoch in (1, args.epochs) or epoch % 50 == 0:
                m = jax.device_get(metrics)
                snap = {
                    "epoch": epoch,
                    "cpc_loss": round(float(np.mean(m["cpc_loss"])), 4),
                    "perplexity": round(float(np.mean(m["perplexity"])), 3),
                    "acc_mean": round(
                        float(np.mean(m["accuracies"])), 4
                    ),
                }
                print(snap, flush=True)
                if first is None:
                    first = snap
                last = snap

    verdict = {
        "epochs": args.epochs,
        "start": first,
        "end": last,
        "loss_decreased": last["cpc_loss"] < first["cpc_loss"],
        "perplexity_increased": last["perplexity"] > first["perplexity"],
        "accuracy_improved": last["acc_mean"] > first["acc_mean"],
    }
    verdict["converged"] = bool(
        verdict["loss_decreased"]
        and verdict["perplexity_increased"]
        and verdict["accuracy_improved"]
    )
    print(json.dumps(verdict))
    if not verdict["converged"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()

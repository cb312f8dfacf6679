"""Async checkpointing + preemption-signal save (SURVEY.md §5.3)."""

import os
import signal

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vectorquantizedcpc_tpu.training import preemption
from vectorquantizedcpc_tpu.training.checkpoint import (
    AsyncCheckpointer,
    latest_checkpoint,
    restore_checkpoint,
)


@pytest.fixture(autouse=True)
def _clean_flag():
    preemption.clear_preemption()
    yield
    preemption.clear_preemption()


def test_async_checkpointer_roundtrip(tmp_path):
    tree = {
        "w": jnp.arange(12.0).reshape(3, 4),
        "b": jnp.ones((4,), jnp.float32),
        "step": 7,
    }
    ck = AsyncCheckpointer()
    ck.save(tmp_path, 3, tree)
    path = ck.wait()
    assert path is not None and path.name == "model.ckpt-3"
    template = jax.tree.map(np.zeros_like, jax.device_get(tree))
    restored = restore_checkpoint(path, template)
    np.testing.assert_array_equal(restored["w"], np.asarray(tree["w"]))
    assert restored["step"] == 7


def test_async_checkpointer_latest_wins_and_serializes(tmp_path):
    ck = AsyncCheckpointer()
    for step in (1, 2, 3):
        ck.save(tmp_path, step, {"x": jnp.full((8,), step, jnp.int32)})
    ck.wait()
    latest = latest_checkpoint(tmp_path)
    assert latest.name == "model.ckpt-3"
    got = restore_checkpoint(latest, {"x": np.zeros(8, np.int32)})
    np.testing.assert_array_equal(got["x"], np.full(8, 3))


def test_async_checkpointer_surfaces_errors(tmp_path):
    blocker = tmp_path / "not_a_dir"
    blocker.write_text("occupied")
    ck = AsyncCheckpointer()
    ck.save(blocker, 1, {"x": jnp.zeros(2)})  # mkdir over a file
    with pytest.raises(OSError):
        ck.wait()
    ck.save(tmp_path, 2, {"x": jnp.zeros(2)})  # usable again afterwards
    assert ck.wait().name == "model.ckpt-2"


def test_async_checkpointer_survives_donation(tmp_path):
    """Train steps donate the state buffers; the async snapshot must not
    read them after deletion (regression: writer held the live tree)."""
    tree = {"x": jnp.arange(8.0)}
    ck = AsyncCheckpointer()
    ck.save(tmp_path, 1, tree)
    bump = jax.jit(
        lambda t: jax.tree.map(lambda a: a + 1, t), donate_argnums=0
    )
    jax.block_until_ready(bump(tree))  # deletes tree's buffers
    got = restore_checkpoint(ck.wait(), {"x": np.zeros(8, np.float32)})
    np.testing.assert_array_equal(got["x"], np.arange(8.0))


def test_sigterm_sets_flag_and_chains():
    assert preemption.install_preemption_handler()
    assert not preemption.preemption_requested()
    os.kill(os.getpid(), signal.SIGTERM)
    assert preemption.preemption_requested()
    preemption.clear_preemption()
    assert not preemption.preemption_requested()


def test_cpc_trainer_preemption_saves_and_exits(tmp_path):
    """Flag set before training: the loop checkpoints epoch 1 and returns."""
    from vectorquantizedcpc_tpu.configs import load_conf
    from vectorquantizedcpc_tpu.data.corpus import SyntheticCorpus
    from vectorquantizedcpc_tpu.data.preprocess import preprocess_corpus
    from vectorquantizedcpc_tpu.training.cpc import train_model

    conf = load_conf(
        [
            "model.encoder.channels=32",
            "dim_latent=8",
            "dim_cpc_context=16",
            "size_latent_codebook=16",
            "training.cpc.sample_frames=16",
            "training.cpc.n_prediction_steps=4",
            "training.cpc.n_speakers_per_batch=2",
            "training.cpc.n_utterances_per_speaker=2",
            "training.cpc.n_negatives=2",
            "training.cpc.n_epochs=50",
            "training.cpc.checkpoint_interval=50",
            "training.cpc.scheduler.warmup_epochs=2",
            "training.cpc.scheduler.milestones=[10]",
            f"checkpoint_dir={tmp_path}/ckpt",
            "data.dataset.name=synthetic",
            f"data.corpus.root={tmp_path}/corpus",
            f"data.dataset.adress_data_root={tmp_path}/features",
            "runtime.precision=float32",
        ]
    )
    corpus = SyntheticCorpus(
        tmp_path / "corpus", n_speakers=2, n_utterances=2, duration_s=0.5
    )
    preprocess_corpus(
        corpus, tmp_path / "features", conf.data.dataset.preprocess
    )

    preemption.request_preemption()
    train_model(conf)

    latest = latest_checkpoint(tmp_path / "ckpt")
    assert latest is not None
    # Far fewer than 50 epochs ran: the loop exited at the first boundary.
    assert int(latest.name.split("-")[-1]) < 5

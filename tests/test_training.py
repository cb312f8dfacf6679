"""Training runtime tests: schedules, checkpoints, train-step behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vectorquantizedcpc_tpu.configs import load_conf
from vectorquantizedcpc_tpu.training.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from vectorquantizedcpc_tpu.training.cpc import (
    init_train_state,
    make_train_epoch,
    make_train_step,
)
from vectorquantizedcpc_tpu.training.schedule import MultiStepSchedule, WarmupSchedule


TINY = [
    "model.encoder.channels=32",
    "dim_latent=8",
    "dim_cpc_context=16",
    "size_latent_codebook=32",
    "training.cpc.sample_frames=20",
    "training.cpc.n_speakers_per_batch=2",
    "training.cpc.n_utterances_per_speaker=2",
    "training.cpc.n_negatives=3",
    "runtime.precision=float32",
]


def test_warmup_schedule_reference_trajectory():
    """Exact trajectory of the reference's own smoke test
    (scheduler.py:51-64: warmup 5, 0.05 -> 0.1, milestones [6, 14], gamma .5)."""
    sched = WarmupSchedule(5, 0.05, 0.1, [6, 14], 0.5)
    # Epoch e trains with lr(last_epoch = e - 1).
    expected = {
        1: 0.05, 2: 0.06, 3: 0.07, 4: 0.08, 5: 0.09,
        6: 0.10,            # warmup complete at last_epoch == warmup_epochs
        7: 0.05,            # milestone 6 crossed
        14: 0.05,
        15: 0.025,          # milestone 14 crossed
        20: 0.025,
    }
    for epoch, lr in expected.items():
        assert sched(epoch - 1) == pytest.approx(lr), f"epoch {epoch}"


def test_warmup_schedule_asserts_order():
    with pytest.raises(AssertionError):
        WarmupSchedule(100, 1e-5, 4e-4, [50], 0.5)


def test_multistep_schedule():
    sched = MultiStepSchedule(4e-4, [10, 20], 0.5)
    assert sched(0) == pytest.approx(4e-4)
    assert sched(9) == pytest.approx(4e-4)
    assert sched(10) == pytest.approx(2e-4)
    assert sched(25) == pytest.approx(1e-4)


@pytest.fixture(scope="module")
def tiny_conf():
    return load_conf(TINY)


@pytest.fixture(scope="module")
def tiny_state(tiny_conf):
    return init_train_state(tiny_conf, jax.random.key(0))


def _fake_batch(conf, rng):
    tc = conf.training.cpc
    t = conf.data.dataset.cpc.clip_length_mel
    return jnp.asarray(
        rng.normal(
            size=(tc.n_speakers_per_batch, tc.n_utterances_per_speaker, 80, t)
        ).astype(np.float32)
    )


def test_train_step_updates_everything(tiny_conf, tiny_state, rng):
    step = make_train_step(tiny_conf)
    batch = _fake_batch(tiny_conf, rng)
    state = jax.tree.map(jnp.copy, tiny_state)
    new_state, metrics = step(state, batch, jax.random.key(1), jnp.float32(1e-3))

    assert np.isfinite(float(metrics["loss"]))
    assert metrics["accuracies"].shape == (6,)
    # Params moved, VQ EMA moved.
    assert not np.allclose(
        np.asarray(new_state.enc.out_w), np.asarray(tiny_state.enc.out_w)
    )
    assert not np.allclose(
        np.asarray(new_state.vq.ema_count), np.asarray(tiny_state.vq.ema_count)
    )


def test_loss_decreases_over_steps(tiny_conf, rng):
    """A few steps on a FIXED batch must reduce the total loss."""
    state = init_train_state(tiny_conf, jax.random.key(0))
    step = make_train_step(tiny_conf)
    batch = _fake_batch(tiny_conf, rng)
    losses = []
    for i in range(30):
        state, metrics = step(
            state, batch, jax.random.key(42), jnp.float32(2e-3)
        )
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_checkpoint_roundtrip(tmp_path, tiny_conf, tiny_state):
    path = save_checkpoint(tmp_path / "ckpt", 7, tiny_state)
    assert path.name == "model.ckpt-7"
    template = init_train_state(tiny_conf, jax.random.key(99))  # different init
    restored = restore_checkpoint(path, template)
    np.testing.assert_array_equal(
        np.asarray(restored.enc.out_w), np.asarray(tiny_state.enc.out_w)
    )
    np.testing.assert_array_equal(
        np.asarray(restored.vq.embedding), np.asarray(tiny_state.vq.embedding)
    )
    assert int(restored.epoch) == int(tiny_state.epoch)


def test_latest_checkpoint_selection(tmp_path, tiny_state):
    d = tmp_path / "ckpts"
    save_checkpoint(d, 10, tiny_state)
    save_checkpoint(d, 2000, tiny_state)
    save_checkpoint(d, 300, tiny_state)
    assert latest_checkpoint(d).name == "model.ckpt-2000"
    assert latest_checkpoint(tmp_path / "nonexistent") is None


def test_resume_continues_identically(tmp_path, tiny_conf, rng):
    """save -> restore -> one step == one step without the roundtrip."""
    state = init_train_state(tiny_conf, jax.random.key(0))
    step = make_train_step(tiny_conf)
    batch = _fake_batch(tiny_conf, rng)
    state, _ = step(state, batch, jax.random.key(5), jnp.float32(1e-3))

    path = save_checkpoint(tmp_path / "c", 1, state)
    template = init_train_state(tiny_conf, jax.random.key(123))
    restored = restore_checkpoint(path, template)

    next_a, ma = step(jax.tree.map(jnp.copy, state), batch, jax.random.key(6), jnp.float32(1e-3))
    next_b, mb = step(restored, batch, jax.random.key(6), jnp.float32(1e-3))
    assert float(ma["loss"]) == pytest.approx(float(mb["loss"]), abs=1e-6)
    np.testing.assert_allclose(
        np.asarray(next_a.enc.out_w), np.asarray(next_b.enc.out_w), atol=1e-6
    )


def test_multi_epoch_dispatch_matches_per_epoch(tiny_conf, rng):
    """make_train_epochs (E epochs in one dispatch,
    training.cpc.epochs_per_dispatch) must reproduce E sequential
    make_train_epoch dispatches exactly: the per-epoch PRNG is derived
    from the device epoch counter (identical draws), the LR vector
    preserves per-epoch LR semantics, and metrics come back stacked."""
    from vectorquantizedcpc_tpu.training.cpc import make_train_epochs

    e_dim, n = 3, 4
    tc = tiny_conf.training.cpc
    t = tiny_conf.data.dataset.cpc.clip_length_mel
    mels = jnp.asarray(
        rng.normal(
            size=(
                e_dim, n, tc.n_speakers_per_batch,
                tc.n_utterances_per_speaker, 80, t,
            )
        ).astype(np.float32)
    )
    lrs = jnp.asarray([1e-3, 5e-4, 2e-4], jnp.float32)

    state_a = init_train_state(tiny_conf, jax.random.key(7))
    state_b = jax.tree.map(jnp.copy, state_a)

    train_epoch = make_train_epoch(tiny_conf)
    per_epoch_losses = []
    for e in range(e_dim):
        state_a, metrics = train_epoch(state_a, mels[e], lrs[e])
        per_epoch_losses.append(np.asarray(metrics["loss"]))

    train_epochs = make_train_epochs(tiny_conf)
    state_b, metrics_g = train_epochs(state_b, mels, lrs)

    assert metrics_g["loss"].shape == (e_dim, n)
    np.testing.assert_array_equal(
        np.asarray(metrics_g["loss"]), np.stack(per_epoch_losses)
    )
    assert int(state_b.epoch) == int(state_a.epoch) == e_dim
    for leaf_a, leaf_b in zip(
        jax.tree.leaves(state_a.enc), jax.tree.leaves(state_b.enc)
    ):
        np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_b))
    np.testing.assert_array_equal(
        np.asarray(state_a.vq.embedding), np.asarray(state_b.vq.embedding)
    )


def test_train_model_epochs_per_dispatch_e2e(tmp_path, rng):
    """The full trainer with epochs_per_dispatch=2 runs, logs, checkpoints
    and produces a loadable checkpoint (grouped-dispatch path of
    train_model)."""
    from vectorquantizedcpc_tpu.training.cpc import train_model

    conf = load_conf(TINY + [
        "data.dataset.name=synthetic",
        f"checkpoint_dir={tmp_path}/ckpt",
        "training.cpc.n_epochs=4",
        "training.cpc.epochs_per_dispatch=2",
        "training.cpc.checkpoint_interval=4",
        "training.cpc.log_interval=2",
        "training.cpc.n_speakers_per_batch=3",
    ])
    state = train_model(conf)
    assert int(state.epoch) == 4
    assert (tmp_path / "ckpt" / "model.ckpt-4").exists()

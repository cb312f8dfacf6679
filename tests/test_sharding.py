"""Parallelism tests on the 8-device virtual CPU mesh: DP+TP correctness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vectorquantizedcpc_tpu.configs import load_conf
from vectorquantizedcpc_tpu.parallel.mesh import make_mesh
from vectorquantizedcpc_tpu.parallel.sharding import (
    batch_sharding,
    state_shardings,
)
from vectorquantizedcpc_tpu.training.cpc import (
    init_train_state,
    make_train_epoch,
    make_train_step,
)

TINY = [
    "model.encoder.channels=64",
    "dim_latent=16",
    "dim_cpc_context=32",
    "size_latent_codebook=64",
    "training.cpc.sample_frames=20",
    "training.cpc.n_prediction_steps=8",
    "training.cpc.n_speakers_per_batch=4",
    "training.cpc.n_utterances_per_speaker=2",
    "training.cpc.n_negatives=3",
    "runtime.precision=float32",
]


@pytest.fixture(scope="module")
def conf():
    return load_conf(TINY)


@pytest.fixture(scope="module")
def mesh(jax_devices):
    return make_mesh(data=2, model=4)


def _batch(conf, rng):
    tc = conf.training.cpc
    t = conf.data.dataset.cpc.clip_length_mel
    return rng.normal(
        size=(tc.n_speakers_per_batch, tc.n_utterances_per_speaker, 80, t)
    ).astype(np.float32)


def test_mesh_construction(mesh):
    assert mesh.shape == {"data": 2, "model": 4}


def test_state_sharding_specs(conf, mesh):
    state = jax.eval_shape(lambda: init_train_state(conf, jax.random.key(0)))
    sh = state_shardings(mesh, state)
    # SegFC stack shards output features over model.
    assert sh.enc.fc_w.spec == P(None, None, "model")
    # LSTM kernels shard the gate axis (4*32=128 divisible by 4).
    assert sh.enc.rnn.wx.spec == P(None, "model")
    assert sh.enc.rnn.wh.spec == P(None, "model")
    # VQ codebook shards the code axis.
    assert sh.vq.embedding.spec == P("model")
    assert sh.vq.ema_count.spec == P("model")
    # CPC predictors + LayerNorms replicated.
    assert sh.cpc.w.spec == P()
    assert sh.enc.ln_in_scale.spec == P()
    # Optimizer moments mirror the parameter sharding.
    mu = sh.opt_state.inner_state[0].mu
    assert mu["enc"].fc_w.spec == P(None, None, "model")


def test_indivisible_dims_fall_back_to_replication(conf, mesh):
    # z_dim=16-col out_w: rows (64) shard over model=4; a 15-dim axis must not.
    from vectorquantizedcpc_tpu.parallel.sharding import _divisible

    assert _divisible(P("model", None), (64, 16), mesh) == P("model")
    assert _divisible(P("model"), (15,), mesh) == P()


def test_sharded_step_matches_unsharded(conf, mesh, rng):
    """DP+TP sharded train step == single-device step (same math)."""
    batch = _batch(conf, rng)

    state_a = init_train_state(conf, jax.random.key(0))
    step_a = make_train_step(conf)
    new_a, m_a = step_a(state_a, jnp.asarray(batch), jax.random.key(7), np.float32(1e-3))

    state_b = init_train_state(conf, jax.random.key(0))
    step_b = make_train_step(conf, mesh)
    sharded_batch = jax.device_put(batch, batch_sharding(mesh, 4))
    new_b, m_b = step_b(state_b, sharded_batch, jax.random.key(7), np.float32(1e-3))

    assert float(m_a["loss"]) == pytest.approx(float(m_b["loss"]), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_a.enc.fc_w), np.asarray(new_b.enc.fc_w), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_a.vq.embedding), np.asarray(new_b.vq.embedding), atol=1e-5
    )
    # Output state keeps its TP sharding (params live distributed).
    assert new_b.enc.fc_w.sharding.spec == P(None, None, "model")


def test_sharded_epoch_runs(conf, mesh, rng):
    state = init_train_state(conf, jax.random.key(0))
    epoch_fn = make_train_epoch(conf, mesh)
    epoch_mels = np.stack([_batch(conf, rng) for _ in range(2)])
    sharded = jax.device_put(epoch_mels, batch_sharding(mesh, 5, axis=1))
    state, metrics = epoch_fn(state, sharded, np.float32(1e-3))
    assert np.isfinite(float(metrics["loss"][-1]))
    assert int(state.epoch) == 1


def test_graft_entry_dryrun(jax_devices):
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_forward_shapes():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.eval_shape(fn, *args)
    loss_shape, (ppl_shape, accs_shape) = out
    assert loss_shape.shape == ()
    assert accs_shape.shape == (6,)

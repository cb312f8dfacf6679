"""CPC encoder training: jitted step + epoch-driven loop.

Re-designs the reference's hand-rolled trainer (train_cpc.py:37-155) for
TPU execution:

- ONE compiled train step (fixed shapes) containing encoder forward, VQ-EMA
  state transition, CPC loss, backward, and the Adam update; buffers donated
  so parameters update in place in HBM.
- The learning rate is a traced scalar argument (no recompilation across the
  warmup/multistep schedule, which steps per EPOCH like the reference,
  train_cpc.py:136).
- Host work (clip sampling) overlaps device compute via the PrefetchLoader;
  metrics are running-averaged exactly like the reference console logging
  (train_cpc.py:99-101,127-131,140-148).
- Checkpoint every ``checkpoint_interval`` epochs + resume restoring
  encoder/cpc/optimizer/VQ state/epoch (reference train_cpc.py:65-76,
  150-153).
"""

import time
from functools import partial
from pathlib import Path
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..configs import ConfGlobal, resolve_compute_dtype
from ..data.corpus import get_corpus
from ..data.datasets import CPCMelSpkDataset
from ..data.loader import PrefetchLoader
from ..data.preprocess import preprocess_corpus
from ..models.cpc import CPCParams, cpc_apply, cpc_apply_with_indices, cpc_init
from ..models.encoder import EncoderParams, encoder_forward, encoder_init
from ..models.vq import VQEMAState
from .checkpoint import (
    AsyncCheckpointer,
    bulk_device_get,
    restore_checkpoint,
    save_checkpoint,
)
from .preemption import install_preemption_handler, preemption_requested
from .schedule import WarmupSchedule


@struct.dataclass
class CPCTrainState:
    enc: EncoderParams
    cpc: CPCParams
    vq: VQEMAState
    opt_state: Any
    epoch: jax.Array  # scalar int32 — completed epochs


def _pallas_mode(conf) -> Tuple[bool, bool]:
    """(use_pallas, interpret) for the fused LSTM in this process.

    TPU: native kernel per runtime.use_pallas. Elsewhere the kernel only
    runs when VQCPC_PALLAS_INTERPRET is set (Pallas interpret mode - used
    by the CPU tests that pin sharded-kernel parity); default is the
    lax.scan path.
    """
    import os

    if jax.default_backend() == "tpu":
        return conf.runtime.use_pallas, False
    interp = bool(os.environ.get("VQCPC_PALLAS_INTERPRET"))
    return conf.runtime.use_pallas and interp, interp


def make_optimizer() -> optax.GradientTransformation:
    """Adam with an injectable learning rate (reference uses plain Adam over
    chained encoder+cpc params; train_cpc.py:53-55)."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=0.0)


def init_train_state(conf: ConfGlobal, rng: jax.Array) -> CPCTrainState:
    r_enc, r_cpc = jax.random.split(rng)
    enc_params, vq_state = encoder_init(r_enc, conf.model.encoder)
    cpc_params = cpc_init(r_cpc, conf.model.cpc)
    opt_state = make_optimizer().init({"enc": enc_params, "cpc": cpc_params})
    return CPCTrainState(
        enc=enc_params,
        cpc=cpc_params,
        vq=vq_state,
        opt_state=opt_state,
        epoch=jnp.zeros((), jnp.int32),
    )


def make_train_step(conf: ConfGlobal, mesh=None, inject_negatives: bool = False):
    """Build the jitted train step. Signature:
    (state, mels (S, U, F, T), rng, lr) -> (state, metrics dict).

    With ``inject_negatives`` the ``rng`` argument is replaced by a
    ``(utt_index, seq_index)`` tuple of precomputed negative-sample indices
    (see models/cpc.py:sample_negative_indices for shapes) — used by the
    lockstep parity tests against the actual reference implementation, where
    both frameworks must consume identical draws (reference model.py:251-272
    samples from the global torch RNG).

    With ``mesh``, the state/batch get DP+TP NamedShardings (speaker axis on
    `data`, wide kernels on `model`; see parallel/sharding.py) and XLA
    inserts the collectives."""
    cpc_conf = conf.model.cpc
    s = cpc_conf.n_speakers_per_batch
    u = cpc_conf.n_utterances_per_speaker
    compute_dtype = resolve_compute_dtype(conf.runtime.precision)
    optimizer = make_optimizer()
    # Fused Pallas LSTM. Under a mesh the kernel runs inside a shard_map
    # over the data axis (models/rnn.py:lstm_apply) - sharded trainers keep
    # the fused-kernel win instead of silently falling back to lax.scan.
    # VQCPC_PALLAS_INTERPRET=1 activates the kernel in Pallas interpret
    # mode off-TPU (CPU parity tests of the sharded kernel path).
    use_pallas, pallas_interpret = _pallas_mode(conf)
    # CPC scoring path: the fused Pallas selection kernel when the Pallas
    # mode is on (exact f32, no HBM sim tensor — ops/cpc_select.py);
    # otherwise bf16 training keeps the XLA similarity/selection chain in
    # bf16 (halves its HBM traffic; precision policy in models/cpc.py).
    select_kernel = use_pallas
    fast_scores = (
        not select_kernel and compute_dtype == jnp.dtype(jnp.bfloat16)
    )

    def step(state: CPCTrainState, mels: jax.Array, rng, lr: jax.Array):
        # (Spk, Utt, Freq, T) -> (Spk*Utt, Freq, T): flatten like the
        # reference (train_cpc.py:110-114); CPC re-splits internally.
        mels_flat = mels.reshape(s * u, mels.shape[2], mels.shape[3])

        def loss_fn(params):
            z, c, new_vq, vq_loss, perplexity = encoder_forward(
                params["enc"], state.vq, mels_flat, compute_dtype,
                use_pallas=use_pallas, mesh=mesh,
                pallas_interpret=pallas_interpret,
            )
            if inject_negatives:
                cpc_loss, accuracies = cpc_apply_with_indices(
                    params["cpc"], cpc_conf, z, c, rng[0], rng[1],
                    exclude_self_negatives=conf.training.cpc.exclude_self_negatives,
                    fast_scores=fast_scores,
                    select_kernel=select_kernel,
                    select_interpret=pallas_interpret,
                    mesh=mesh,
                )
            else:
                cpc_loss, accuracies = cpc_apply(
                    params["cpc"], cpc_conf, z, c, rng,
                    exclude_self_negatives=conf.training.cpc.exclude_self_negatives,
                    fast_scores=fast_scores,
                    select_kernel=select_kernel,
                    select_interpret=pallas_interpret,
                    mesh=mesh,
                )
            total = cpc_loss + vq_loss
            return total, (new_vq, cpc_loss, vq_loss, perplexity, accuracies)

        params = {"enc": state.enc, "cpc": state.cpc}
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        new_vq, cpc_loss, vq_loss, perplexity, accuracies = aux

        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        new_state = state.replace(
            enc=new_params["enc"],
            cpc=new_params["cpc"],
            vq=new_vq,
            opt_state=new_opt_state,
        )
        metrics = {
            "loss": loss,
            "cpc_loss": cpc_loss,
            "vq_loss": vq_loss,
            "perplexity": perplexity,
            "accuracies": accuracies,
        }
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    from ..parallel.sharding import batch_sharding, state_shardings
    from jax.sharding import NamedSharding, PartitionSpec as P

    state_template = jax.eval_shape(
        lambda seed: init_train_state(conf, jax.random.key(seed)), 0
    )
    state_sh = state_shardings(mesh, state_template)
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step,
        donate_argnums=(0,),
        in_shardings=(state_sh, batch_sharding(mesh, 4), repl, repl),
        out_shardings=(state_sh, repl),
    )


def _make_one_step(conf: ConfGlobal, mesh=None):
    """Shared scan body for the epoch trainers: one optimizer step.

    Returns ``one_step((state, lr), (mels, rng)) -> ((state, lr), metrics)``.
    """
    cpc_conf = conf.model.cpc
    s = cpc_conf.n_speakers_per_batch
    u = cpc_conf.n_utterances_per_speaker
    compute_dtype = resolve_compute_dtype(conf.runtime.precision)
    optimizer = make_optimizer()
    use_pallas, pallas_interpret = _pallas_mode(conf)
    # CPC scoring path: the fused Pallas selection kernel when the Pallas
    # mode is on (exact f32, no HBM sim tensor — ops/cpc_select.py);
    # otherwise bf16 training keeps the XLA similarity/selection chain in
    # bf16 (halves its HBM traffic; precision policy in models/cpc.py).
    select_kernel = use_pallas
    fast_scores = (
        not select_kernel and compute_dtype == jnp.dtype(jnp.bfloat16)
    )

    def one_step(carry, inputs):
        state, lr = carry
        mels, rng = inputs
        mels_flat = mels.reshape(s * u, mels.shape[2], mels.shape[3])

        def loss_fn(params):
            z, c, new_vq, vq_loss, perplexity = encoder_forward(
                params["enc"], state.vq, mels_flat, compute_dtype,
                use_pallas=use_pallas, mesh=mesh,
                pallas_interpret=pallas_interpret,
            )
            cpc_loss, accuracies = cpc_apply(
                params["cpc"], cpc_conf, z, c, rng,
                exclude_self_negatives=conf.training.cpc.exclude_self_negatives,
                fast_scores=fast_scores,
                select_kernel=select_kernel,
                select_interpret=pallas_interpret,
                mesh=mesh,
            )
            return cpc_loss + vq_loss, (new_vq, cpc_loss, vq_loss, perplexity, accuracies)

        params = {"enc": state.enc, "cpc": state.cpc}
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        new_vq, cpc_loss, vq_loss, perplexity, accuracies = aux

        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        new_state = state.replace(
            enc=new_params["enc"],
            cpc=new_params["cpc"],
            vq=new_vq,
            opt_state=new_opt_state,
        )
        metrics = {
            "loss": loss,
            "cpc_loss": cpc_loss,
            "vq_loss": vq_loss,
            "perplexity": perplexity,
            "accuracies": accuracies,
        }
        return (new_state, lr), metrics

    return one_step


def _epoch_prng_impl(conf: ConfGlobal) -> str:
    # RBG keys on TPU: the negative-index randint draws cost ~50 us/step
    # under threefry (xprof r4) vs far less under the TPU-native RBG
    # generator; CPC only needs the sampling DISTRIBUTION to match the
    # reference (explicit-index injection covers exact parity,
    # models/cpc.py docstring). Off-TPU (or with runtime.prng_impl set)
    # threefry keeps epoch runs reproducible and comparable with the
    # per-step path at the same seed (ADVICE r4).
    return conf.runtime.prng_impl or (
        "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
    )


def _jit_epoch_fn(conf, mesh, fn, batch_ndim: int):
    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,))

    from ..parallel.sharding import batch_sharding, state_shardings
    from jax.sharding import NamedSharding, PartitionSpec as P

    state_template = jax.eval_shape(
        lambda seed: init_train_state(conf, jax.random.key(seed)), 0
    )
    state_sh = state_shardings(mesh, state_template)
    repl = NamedSharding(mesh, P())
    return jax.jit(
        fn,
        donate_argnums=(0,),
        # Epoch tensor (..., S, U, F, T): leading axes are scan axes;
        # speakers shard over data.
        in_shardings=(
            state_sh,
            batch_sharding(mesh, batch_ndim, axis=batch_ndim - 4),
            repl,
        ),
        out_shardings=(state_sh, repl),
    )


def make_train_epoch(conf: ConfGlobal, mesh=None):
    """Whole-epoch train function: lax.scan of the train step over a stacked
    tensor of batches.

    TPU-first rationale: over a tunneled/remote device, per-step dispatch
    plus the per-step metrics fetch dominates wall clock (measured ~0.5 s/
    step vs 0.5 ms/step compute). One epoch of CPC batches is only a few MB
    (reference shape: ~12 x 8 x 8 x 80 x 140 f32), so we stage the epoch on
    device and run ONE call per epoch; the reference's scheduler semantics
    (per-epoch LR, train_cpc.py:136) make the LR a constant within the scan.

    Signature: (state, mels (N, S, U, F, T), lr) ->
    (state, stacked metrics with leading dim N).
    """
    one_step = _make_one_step(conf, mesh)
    seed = conf.seed
    prng_impl = _epoch_prng_impl(conf)

    def epoch_fn(state: CPCTrainState, all_mels: jax.Array, lr):
        n = all_mels.shape[0]
        # Epoch counter and PRNG derivation live on device: no extra H2D
        # transfers per epoch (the tunnel makes each one ~20 ms).
        epoch = state.epoch + 1
        rng = jax.random.fold_in(
            jax.random.key(seed + 1, impl=prng_impl), epoch
        )
        rngs = jax.random.split(rng, n)
        (state, _), metrics = jax.lax.scan(
            one_step, (state, jnp.float32(lr)), (all_mels, rngs)
        )
        return state.replace(epoch=epoch), metrics

    return _jit_epoch_fn(conf, mesh, epoch_fn, 5)


def make_train_epochs(conf: ConfGlobal, mesh=None):
    """Multi-epoch train function: an outer lax.scan over whole epochs in
    ONE device dispatch (``training.cpc.epochs_per_dispatch``).

    Every dispatch costs ~3-9 ms of host/link overhead that does NOT
    overlap device compute on a remote-attached chip (the r4 xprof
    decomposition: 0.858 ms/step on device vs 1.035 ms/step wall at one
    50-step epoch per dispatch). Folding E epochs into one dispatch
    divides that overhead by E while preserving per-epoch semantics: the
    LR schedule is evaluated host-side into an (E,) vector (per-epoch LR,
    reference train_cpc.py:136), the device epoch counter advances inside
    the scan, and metrics come back stacked (E, N, ...).

    Signature: (state, mels (E, N, S, U, F, T), lrs (E,)) ->
    (state, stacked metrics with leading dims (E, N)).
    """
    one_step = _make_one_step(conf, mesh)
    seed = conf.seed
    prng_impl = _epoch_prng_impl(conf)

    def epochs_fn(state: CPCTrainState, all_mels: jax.Array, lrs):
        n = all_mels.shape[1]

        def body(state, inputs):
            mels_e, lr_e = inputs
            epoch = state.epoch + 1
            rng = jax.random.fold_in(
                jax.random.key(seed + 1, impl=prng_impl), epoch
            )
            rngs = jax.random.split(rng, n)
            (state, _), metrics = jax.lax.scan(
                one_step, (state, lr_e), (mels_e, rngs)
            )
            return state.replace(epoch=epoch), metrics

        return jax.lax.scan(body, state, (all_mels, lrs.astype(jnp.float32)))

    return _jit_epoch_fn(conf, mesh, epochs_fn, 6)


class RunningMean:
    """Incremental running means (reference train_cpc.py:127-131)."""

    def __init__(self):
        self.values: Dict[str, np.ndarray] = {}
        self.count = 0

    def reset(self):
        self.values, self.count = {}, 0

    def update(self, metrics: Dict[str, np.ndarray]):
        self.count += 1
        for k, v in metrics.items():
            v = np.asarray(v)
            prev = self.values.get(k, np.zeros_like(v))
            self.values[k] = prev + (v - prev) / self.count

    def __getitem__(self, k):
        return self.values[k]


def train_model(conf: ConfGlobal, max_steps: Optional[int] = None) -> CPCTrainState:
    """Full CPC training loop (reference train_model, train_cpc.py:37-155).

    ``max_steps`` optionally caps total optimizer steps (testing/benching).
    """
    checkpoint_dir = Path(conf.checkpoint_dir)
    tc = conf.training.cpc

    state = init_train_state(conf, jax.random.key(conf.seed))
    schedule = WarmupSchedule(
        warmup_epochs=tc.scheduler.warmup_epochs,
        initial_lr=tc.scheduler.initial_lr,
        max_lr=tc.scheduler.max_lr,
        milestones=tc.scheduler.milestones,
        gamma=tc.scheduler.gamma,
    )

    start_epoch = 1
    resumed_epoch = None  # suppresses an immediate re-save of this epoch
    if conf.resume != "scratch":
        print(f"Resume checkpoint from: {conf.resume}:")
        state = restore_checkpoint(conf.resume, state)
        start_epoch = int(state.epoch)
        resumed_epoch = start_epoch
        # Reference semantics re-run the checkpointed epoch
        # (train_cpc.py:73,97); the device-side counter increments first.
        state = state.replace(epoch=jnp.asarray(start_epoch - 1, jnp.int32))

    # ---- Data: corpus -> preprocessed features -> per-speaker sampler. ----
    corpus = get_corpus(conf.data.dataset.name, conf.data.corpus)
    data_dir = Path(
        conf.data.dataset.adress_data_root
        or conf.data.adress_data_root
        or (checkpoint_dir / "features")
    )
    preprocess_corpus(corpus, data_dir, conf.data.dataset.preprocess)
    dataset = CPCMelSpkDataset(True, conf.data.dataset, data_dir, seed=conf.seed)
    print(f"Loaded dataset: CPCMelSpkDataset w/ {conf.data.dataset.name} "
          f"({len(dataset)} speakers)")

    loader = PrefetchLoader(
        dataset,
        batch_size=tc.n_speakers_per_batch,
        shuffle=True,
        drop_last=True,
        seed=conf.seed,
    )
    if len(loader) == 0:
        raise ValueError(
            f"Fewer speakers ({len(dataset)}) than n_speakers_per_batch "
            f"({tc.n_speakers_per_batch})."
        )

    # Host-side epoch assembly overlapped one-ahead with device compute:
    # the producer thread samples clips and device_puts the stacked epoch
    # tensor while the previous epoch's scan runs on the TPU.
    import queue as _queue
    import threading as _threading

    steps_per_epoch = len(loader)

    from ..parallel.mesh import mesh_from_conf

    mesh = mesh_from_conf(conf.runtime)
    if mesh is not None:
        from ..parallel.sharding import batch_sharding

    # Epoch grouping: E epochs per device dispatch (amortizes the
    # per-dispatch host/link overhead; make_train_epochs). epd = 1 is the
    # same code path with singleton groups — proven equal to sequential
    # single-epoch dispatches by test_multi_epoch_dispatch_matches_per_
    # epoch, so the trainer carries ONE dispatch path. The producer
    # stages one group ahead; log/checkpoint cadence quantizes to E.
    epd = max(1, int(getattr(tc, "epochs_per_dispatch", 1)))
    if mesh is not None:
        group_sharding = batch_sharding(mesh, 6, axis=2)
    else:
        group_sharding = None

    def _epoch_producer(q: "_queue.Queue", epochs):
        try:
            epochs = list(epochs)
            for g0 in range(0, len(epochs), epd):
                group = epochs[g0 : g0 + epd]
                stacked_epochs = []
                for epoch in group:
                    loader.set_epoch(epoch)
                    stacked_epochs.append(
                        np.stack([m for m, _spk in iter(loader)])
                    )
                stacked = jax.device_put(
                    np.stack(stacked_epochs), group_sharding
                )
                q.put((group, stacked))
            q.put(None)
        except BaseException as e:
            q.put(e)

    loader.device_put = False  # producer stacks then transfers once
    epochs = range(start_epoch, tc.n_epochs + 1)
    q: "_queue.Queue" = _queue.Queue(maxsize=1)
    producer = _threading.Thread(
        target=_epoch_producer, args=(q, epochs), daemon=True
    )
    producer.start()

    train_epochs = make_train_epochs(conf, mesh)
    pending_metrics = []  # device-side metric trees; fetched only at log time
    global_step = 0
    t0 = time.time()
    ckpt_writer = AsyncCheckpointer()
    install_preemption_handler()
    # TensorBoard scalars (the reference has these writer calls commented
    # out, train_cpc.py:141-148; the vocoder trainer here already logs).
    tb_writer = None
    try:
        from tensorboardX import SummaryWriter

        tb_writer = SummaryWriter(str(checkpoint_dir / "tb"))
    except Exception:
        pass
    # Optional device trace of a few post-compile epochs (SURVEY.md §5.1).
    profile_dir = conf.runtime.profile_dir
    profiling = False

    profiled = False
    n_dispatches = 0
    while True:
        item = q.get()
        if item is None:
            break
        if isinstance(item, BaseException):
            raise item
        group, epoch_mels = item
        epoch = group[-1]  # last epoch in this dispatch group

        # Trace strictly POST-compile dispatches: the first dispatch of a
        # fresh run compiles (and, with grouped dispatch, would otherwise
        # satisfy the epoch threshold immediately and put the multi-second
        # XLA compile inside the trace).
        if profile_dir and not profiled and n_dispatches >= 1:
            jax.profiler.start_trace(profile_dir)
            profiling = True
            profiled = True

        lrs = jnp.asarray([schedule(e - 1) for e in group], jnp.float32)
        state, metrics = train_epochs(state, epoch_mels, lrs)
        n_dispatches += 1
        # Flatten (E, N, ...) -> (E*N, ...): downstream metric handling
        # is per-step and shape-agnostic.
        metrics = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]), metrics
        )

        if profiling:
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
            profiling = False
            print(f"Wrote profiler trace to {profile_dir}")
        global_step += steps_per_epoch * len(group)
        pending_metrics.append(metrics)

        if (
            any(e % tc.log_interval == 0 for e in group)
            and epoch != resumed_epoch
        ):
            fetched = bulk_device_get(pending_metrics)
            pending_metrics = []
            meter = RunningMean()
            for m in fetched:
                for i in range(np.asarray(m["loss"]).shape[0]):
                    meter.update(jax.tree.map(lambda x: x[i], m))
            steps_per_sec = meter.count / (time.time() - t0)
            t0 = time.time()
            print(
                "epoch:{}, cpc loss:{:.2E}, vq loss:{:.2E}, perplexity:{:.3f}, "
                "{:.2f} steps/s".format(
                    epoch,
                    float(meter["cpc_loss"]),
                    float(meter["vq_loss"]),
                    float(meter["perplexity"]),
                    steps_per_sec,
                )
            )
            print(100 * meter["accuracies"])
            if tb_writer is not None:
                tb_writer.add_scalar("loss/cpc", float(meter["cpc_loss"]), epoch)
                tb_writer.add_scalar("loss/vq", float(meter["vq_loss"]), epoch)
                tb_writer.add_scalar(
                    "perplexity", float(meter["perplexity"]), epoch
                )
                for k, acc in enumerate(np.ravel(meter["accuracies"])):
                    tb_writer.add_scalar(f"accuracy/step_{k + 1}", float(acc), epoch)
                tb_writer.add_scalar("steps_per_sec", steps_per_sec, epoch)
        elif len(pending_metrics) > 2 * tc.log_interval:
            pending_metrics = pending_metrics[-tc.log_interval :]

        if any(
            e % tc.checkpoint_interval == 0 and e != resumed_epoch
            for e in group
        ):
            # Async: D2H + serialization + write overlap the next epochs.
            # The resumed epoch itself is excluded (it already has a
            # checkpoint on disk); a FRESH run checkpoints whenever the
            # interval divides the epoch, including epoch 1 with
            # interval 1 (previously silently skipped).
            ckpt_writer.save(checkpoint_dir, epoch, state)
            print(f"Saving checkpoint (async): model.ckpt-{epoch}")

        if preemption_requested():
            ckpt_writer.wait()
            final = save_checkpoint(checkpoint_dir, epoch, state)
            print(f"Preempted: saved {final.name}; resume with resume="
                  f"{final} (or the same command + auto-resume).")
            break

        if max_steps is not None and global_step >= max_steps:
            break

    ckpt_writer.wait()
    if tb_writer is not None:
        tb_writer.close()
    return state

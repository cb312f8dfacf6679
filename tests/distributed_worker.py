"""Worker process for the 2-process jax.distributed integration test.

NOT a pytest module (no test_ prefix) — tests/test_distributed.py launches
two of these via subprocess, each forming half of a 2-process CPU cluster
(gloo collectives), and checks both compute the identical globally-sharded
CPC train step. Exercises the REAL public wiring: runtime.* config keys ->
configs.apply_runtime -> parallel.mesh.initialize_distributed ->
mesh_from_conf -> training.cpc.make_train_step(conf, mesh).

Usage: python distributed_worker.py <process_id> <coordinator_port>
Prints one JSON line: {"pid": ..., "processes": ..., "devices": ...,
"loss": ..., "perplexity": ...}.
"""

import json
import sys


def main() -> None:
    pid, port = int(sys.argv[1]), sys.argv[2]

    from vectorquantizedcpc_tpu.configs import apply_runtime, load_conf

    conf = load_conf(
        [
            "runtime.platform=cpu",
            "runtime.num_cpu_devices=2",
            f"runtime.coordinator_address=127.0.0.1:{port}",
            "runtime.num_processes=2",
            f"runtime.process_id={pid}",
            "runtime.mesh_data=2",
            "runtime.mesh_model=2",
            "runtime.precision=float32",
            # Tiny model: 2 processes x 2 virtual CPU devices.
            "model.encoder.channels=64",
            "dim_latent=16",
            "dim_cpc_context=32",
            "size_latent_codebook=64",
            "training.cpc.sample_frames=20",
            "training.cpc.n_prediction_steps=8",
            "training.cpc.n_speakers_per_batch=4",
            "training.cpc.n_utterances_per_speaker=2",
            "training.cpc.n_negatives=3",
        ]
    )
    apply_runtime(conf)  # platform + device count + jax.distributed

    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    from vectorquantizedcpc_tpu.parallel.mesh import mesh_from_conf
    from vectorquantizedcpc_tpu.parallel.sharding import (
        batch_sharding,
        state_shardings,
    )
    from vectorquantizedcpc_tpu.training.cpc import (
        init_train_state,
        make_train_step,
    )

    mesh = mesh_from_conf(conf.runtime)
    repl = NamedSharding(mesh, P())

    # Multi-process: all global arrays must be CREATED with global
    # shardings (inside jit with out_shardings, or via
    # make_array_from_process_local_data) — a process-local array cannot be
    # passed into a globally-sharded jit.
    state_template = jax.eval_shape(
        lambda seed: init_train_state(conf, jax.random.key(seed)), 0
    )
    state_sh = state_shardings(mesh, state_template)
    state = jax.jit(
        lambda seed: init_train_state(conf, jax.random.key(seed)),
        out_shardings=state_sh,
    )(0)
    key = jax.jit(lambda: jax.random.key(1), out_shardings=repl)()
    lr = jax.jit(lambda: np.float32(1e-3), out_shardings=repl)()

    tc = conf.training.cpc
    t = conf.data.dataset.cpc.clip_length_mel
    s, u = tc.n_speakers_per_batch, tc.n_utterances_per_speaker
    # Identical global batch on both processes; each contributes its local
    # speaker shard (the data axis of the (2, 2) mesh maps to processes).
    mels_global = (
        np.random.default_rng(0).normal(size=(s, u, 80, t)).astype(np.float32)
    )
    mels_sh = batch_sharding(mesh, 4)
    local = mels_global[pid * (s // 2) : (pid + 1) * (s // 2)]
    mels = jax.make_array_from_process_local_data(
        mels_sh, local, mels_global.shape
    )

    step = make_train_step(conf, mesh)
    state, metrics = step(state, mels, key, lr)
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    ppl = float(np.asarray(jax.device_get(metrics["perplexity"])))
    print(
        json.dumps(
            {
                "pid": pid,
                "processes": jax.process_count(),
                "devices": jax.device_count(),
                "loss": loss,
                "perplexity": ppl,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

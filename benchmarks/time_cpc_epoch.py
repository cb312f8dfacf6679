"""Quick CPC whole-epoch timing (50 steps/dispatch, min-of-N)."""
import time
import numpy as np
import jax, jax.numpy as jnp

def main():
    _ = jax.device_get(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    from vectorquantizedcpc_tpu.configs import load_conf
    from vectorquantizedcpc_tpu.training.cpc import init_train_state, make_train_epoch

    conf = load_conf([])
    tc = conf.training.cpc
    rng = np.random.default_rng(0)
    n = 50
    mels = jnp.asarray(rng.normal(size=(n, tc.n_speakers_per_batch,
        tc.n_utterances_per_speaker, 80,
        conf.data.dataset.cpc.clip_length_mel)).astype(np.float32))
    state = init_train_state(conf, jax.random.key(0))
    epoch = make_train_epoch(conf)
    holder = {"s": state}
    def run(i):
        holder["s"], m = epoch(holder["s"], mels, np.float32(4e-4))
        return m["loss"]
    jax.block_until_ready(run(0))
    best = float("inf")
    for i in range(5):
        t0 = time.time()
        jax.block_until_ready(run(i + 1))
        best = min(best, time.time() - t0)
    print(f"{n / best:.1f} steps/s  ({best / n * 1e3:.3f} ms/step)", flush=True)

if __name__ == "__main__":
    main()

"""Vocoder train-step microbench (TPU): isolates the teacher-forced
forward+backward at the reference shape (batch 32 x 5,120 samples).

Used to validate gru_scan backward changes (models/rnn.py). Reports
steps/s as a pipelined mean over reps, same methodology as bench.py.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    _ = jax.device_get(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))

    from vectorquantizedcpc_tpu.configs import load_conf
    from vectorquantizedcpc_tpu.models.encoder import encoder_init
    from vectorquantizedcpc_tpu.training import vocoder as voc_train

    conf = load_conf([])
    rng = np.random.default_rng(0)
    enc_params, vq_state = encoder_init(jax.random.key(3), conf.model.encoder)
    vstate = voc_train.init_train_state(conf, jax.random.key(4))
    vstep = voc_train.make_train_step(conf)
    vb = conf.data.loader.batch_size
    clip = conf.data.dataset.clip_length_mel
    hop = conf.data.dataset.mel_stft_stride
    audio = jnp.asarray(rng.integers(0, 256, size=(vb, clip * hop + 1)).astype(np.int32))
    mels = jnp.asarray(rng.normal(size=(vb, 80, clip)).astype(np.float32))
    spk = jnp.asarray(
        rng.integers(0, conf.training_vocoder.model.n_speakers, size=(vb,)).astype(np.int32)
    )

    holder = {"s": vstate}

    def run():
        holder["s"], m = vstep(
            holder["s"], enc_params, vq_state, audio, mels, spk, np.float32(4e-4)
        )
        return m["loss"]

    print("devices ready", flush=True)
    t_c = time.time()
    jax.block_until_ready(run())  # compile
    print(f"compiled in {time.time()-t_c:.0f}s", flush=True)
    for trial in range(3):
        n = 10
        t0 = time.time()
        for _ in range(n):
            out = run()
        jax.block_until_ready(out)
        dt = (time.time() - t0) / n
        print(f"trial {trial}: {1.0/dt:.2f} steps/s ({dt*1e3:.1f} ms/step)",
              flush=True)


if __name__ == "__main__":
    main()

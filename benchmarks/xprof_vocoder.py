"""Device-trace profile of the vocoder teacher-forced train step.

Same methodology as xprof_cpc.py: capture an xprof trace of a few
post-compile steps at the reference shape (batch 32 x 5,120 samples) and
aggregate device-lane op durations — the ground truth for where the
~63 ms step goes (VERDICT r4 #2: vocoder training never profiled).
"""
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from xprof_cpc import aggregate


def main():
    _ = jax.device_get(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    print("warmup done", flush=True)
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
    audio = jnp.asarray(
        rng.integers(0, 256, size=(vb, clip * hop + 1)).astype(np.int32)
    )
    mels = jnp.asarray(rng.normal(size=(vb, 80, clip)).astype(np.float32))
    spk = jnp.asarray(
        rng.integers(
            0, conf.training_vocoder.model.n_speakers, size=(vb,)
        ).astype(np.int32)
    )

    def run(s):
        s, m = vstep(s, enc_params, vq_state, audio, mels, spk, np.float32(4e-4))
        return s, m["loss"]

    vstate, loss = run(vstate)
    jax.block_until_ready(loss)
    print("compiled; tracing 2 steps", flush=True)

    out_dir = tempfile.mkdtemp(prefix="xprof_vocoder_")
    jax.profiler.start_trace(out_dir)
    for _ in range(2):
        vstate, loss = run(vstate)
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()
    print(f"trace in {out_dir}", flush=True)
    aggregate(out_dir, top=50)


if __name__ == "__main__":
    main()

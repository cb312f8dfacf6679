"""Micro-profile of the CPC train step: which stage dominates?"""
import time
import numpy as np
import jax, jax.numpy as jnp

def timeit(f, *args, n=10):
    jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n

def main():
    _ = jax.device_get(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    print("warmup done", flush=True)
    from vectorquantizedcpc_tpu.configs import load_conf
    from vectorquantizedcpc_tpu.models.encoder import (
        encoder_init, _frontend, encoder_forward)
    from vectorquantizedcpc_tpu.models.rnn import lstm_apply
    from vectorquantizedcpc_tpu.models.cpc import cpc_init, cpc_apply
    from vectorquantizedcpc_tpu.models.vq import vq_apply_train
    from vectorquantizedcpc_tpu.training.cpc import init_train_state, make_train_step

    conf = load_conf([])
    rng = np.random.default_rng(0)
    mels = jnp.asarray(rng.normal(size=(64, 80, 140)).astype(np.float32))
    enc, vq = encoder_init(jax.random.key(0), conf.model.encoder)
    cpc = cpc_init(jax.random.key(1), conf.model.cpc)
    dt = jnp.bfloat16

    f_front = jax.jit(lambda m: _frontend(enc, m, dt))
    z_pre = f_front(mels)
    print(f"frontend fwd: {timeit(f_front, mels)*1e3:6.2f} ms", flush=True)

    f_vq = jax.jit(lambda z: vq_apply_train(vq, z.astype(jnp.float32)))
    z_q, *_ = f_vq(z_pre)
    print(f"vq train:     {timeit(f_vq, z_pre)*1e3:6.2f} ms", flush=True)

    for unroll in (1, 8, 16, 32):
        f_lstm = jax.jit(lambda z, u=unroll: lstm_apply(enc.rnn, z.astype(dt), unroll=u)[0])
        print(f"lstm fwd u={unroll:2d}: {timeit(f_lstm, z_q)*1e3:6.2f} ms", flush=True)

    c = jax.jit(lambda z: lstm_apply(enc.rnn, z.astype(dt))[0].astype(jnp.float32))(z_q)
    f_cpc = jax.jit(lambda z, c, k: cpc_apply(cpc, conf.model.cpc, z, c, k))
    print(f"cpc loss fwd: {timeit(f_cpc, z_q, c, jax.random.key(2))*1e3:6.2f} ms", flush=True)

    # Full forward+backward step.
    state = init_train_state(conf, jax.random.key(0))
    step = make_train_step(conf)
    mels4 = mels.reshape(8, 8, 80, 140)
    holder = {"s": state}
    def run(i):
        holder["s"], m = step(holder["s"], mels4, jax.random.key(i), np.float32(4e-4))
        return m["loss"]
    print(f"full step:    {timeit(run, 3)*1e3:6.2f} ms", flush=True)

    # Forward-only loss (no grad) for fwd/bwd split.
    def fwd_only(mels4, key):
        mf = mels4.reshape(64, 80, 140)
        z, c, _, vq_loss, _ = encoder_forward(enc, vq, mf, dt)
        l, _ = cpc_apply(cpc, conf.model.cpc, z, c, key)
        return l + vq_loss
    f_fwd = jax.jit(fwd_only)
    print(f"fwd only:     {timeit(f_fwd, mels4, jax.random.key(3))*1e3:6.2f} ms", flush=True)

if __name__ == "__main__":
    main()

"""Encoder inference profile: conv strategy x component breakdown.

Diagnoses the r2->r3 batched-encode regression (42M -> 25M frames/s at
B=64, T=1024): times the unfold+matmul conv vs XLA's native NWC conv at
both the training clip shape (T=140) and the bench inference shape
(T=1024), then the full encode with each LSTM path.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def bench(fn, *args, n=20):
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    _ = jax.device_get(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    print("warmup done", flush=True)
    from vectorquantizedcpc_tpu.configs import load_conf
    from vectorquantizedcpc_tpu.models.encoder import (
        EncoderParams, _layer_norm, encoder_encode, encoder_init,
    )

    conf = load_conf([])
    enc = conf.model.encoder
    params, vq_state = encoder_init(jax.random.key(0), enc)
    rng = np.random.default_rng(0)

    def conv_unfold(x, w):  # (B, T, F) NWC, w (4, F, C)
        t_out = x.shape[1] // 2
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [
                jax.lax.slice_in_dim(xp, j, j + 2 * (t_out - 1) + 1, 2, axis=1)
                for j in range(4)
            ],
            axis=-1,
        )
        return cols @ w.reshape(-1, w.shape[-1])

    def conv_xla(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2,), [(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=x.dtype,
        )

    for (b, t) in [(64, 140), (64, 1024)]:
        x = jnp.asarray(rng.normal(size=(b, t, 80)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        w = params.conv_w.astype(jnp.bfloat16)
        f_unfold = jax.jit(conv_unfold)
        f_xla = jax.jit(conv_xla)
        # check parity
        a = np.asarray(f_unfold(x, w), np.float32)
        c = np.asarray(f_xla(x, w), np.float32)
        err = np.abs(a - c[:, : a.shape[1]]).max()
        du = bench(f_unfold, x, w)
        dx = bench(f_xla, x, w)
        print(
            f"B={b} T={t}: unfold {du*1e6:.0f} us  xla_conv {dx*1e6:.0f} us  "
            f"(xla out T={c.shape[1]}, max|diff|={err:.2e})",
            flush=True,
        )

    # Full encode breakdown at the bench shape.
    b, t = 64, 1024
    mels = jnp.asarray(rng.normal(size=(b, 80, t)).astype(np.float32))
    for use_pallas in (False, True):
        fn = jax.jit(
            lambda m, up=use_pallas: encoder_encode(
                params, vq_state, m, jnp.bfloat16, use_pallas=up
            )[2]
        )
        d = bench(fn, mels)
        print(
            f"encode use_pallas={use_pallas}: {d*1e3:.2f} ms  "
            f"{b*t/d/1e6:.1f} M frames/s",
            flush=True,
        )

    # Component times: frontend only / frontend+vq.
    from vectorquantizedcpc_tpu.models.encoder import _frontend
    from vectorquantizedcpc_tpu.models.vq import vq_encode

    fe = jax.jit(lambda m: _frontend(params, m, jnp.bfloat16))
    d_fe = bench(fe, mels)
    z_pre = fe(mels)
    vq = jax.jit(lambda zp: vq_encode(vq_state, zp.astype(jnp.float32)))
    d_vq = bench(vq, z_pre)
    from vectorquantizedcpc_tpu.models.rnn import lstm_apply

    z, _idx = vq(z_pre)
    for up in (False, True):
        lf = jax.jit(
            lambda zz, u=up: lstm_apply(
                params.rnn, zz.astype(jnp.bfloat16), use_pallas=u
            )[0]
        )
        d_l = bench(lf, z)
        print(f"lstm use_pallas={up}: {d_l*1e3:.2f} ms", flush=True)
    print(f"frontend: {d_fe*1e3:.2f} ms   vq: {d_vq*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Quick b128 (and b32) decode timing, both precisions — for iterating on
the int8 epilogue (VERDICT r4 item #4). Pipelined, one block per config."""
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    _ = jax.device_get(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    from vectorquantizedcpc_tpu.configs import load_conf
    from vectorquantizedcpc_tpu.models.vocoder import vocoder_init
    from vectorquantizedcpc_tpu.ops.ar_decode import fused_ar_decode

    conf = load_conf([])
    net = conf.training_vocoder.model.network
    params = vocoder_init(jax.random.key(0), net)
    sr = conf.sampling_rate
    rng = np.random.default_rng(0)
    n_frames = int(2.0 * sr) // net.rnnms.upsampling_t // 2
    t_decode = n_frames * 2 * net.rnnms.upsampling_t

    for batch, precision in ((128, "bf16"), (128, "int8"), (32, "bf16"),
                             (32, "int8")):
        z = jnp.asarray(
            rng.integers(0, net.size_i_codebook, size=(batch, n_frames))
        )
        spk = jnp.asarray(rng.integers(0, net.n_speakers, size=(batch,)))
        decode = jax.jit(
            lambda key, p=precision, z=z, s=spk: fused_ar_decode(
                params, net, z, s, key, precision=p
            )
        )
        jax.block_until_ready(decode(jax.random.key(0)))
        t0 = time.time()
        for i in range(3):
            out = decode(jax.random.key(i + 1))
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 3
        print(
            f"b{batch} {precision}: {dt*1e6/t_decode:.2f} us/step  "
            f"{batch*t_decode/dt/1e6:.2f} M/s",
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Quick min-of-N timing of the real fused decode at chosen (batch, precision)
points. Usage: python -u benchmarks/time_decode_points.py b8:bf16 b64:int8 ...
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from vectorquantizedcpc_tpu.configs import load_conf
from vectorquantizedcpc_tpu.models.vocoder import vocoder_init
from vectorquantizedcpc_tpu.ops.ar_decode import fused_ar_decode


def main():
    conf = load_conf([])
    net = conf.training_vocoder.model.network
    sr = conf.sampling_rate
    params = vocoder_init(jax.random.key(0), net)
    rng = np.random.default_rng(0)
    n_frames = int(2.0 * sr) // net.rnnms.upsampling_t // 2
    t_decode = n_frames * 2 * net.rnnms.upsampling_t

    _ = jax.device_get(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    for spec in sys.argv[1:]:
        bs, prec = spec.split(":")
        batch = int(bs[1:])
        z = jnp.asarray(rng.integers(0, net.size_i_codebook, size=(batch, n_frames)))
        spk = jnp.asarray(rng.integers(0, net.n_speakers, size=(batch,)))
        decode = jax.jit(
            lambda key, p=prec, z=z, s=spk: fused_ar_decode(
                params, net, z, s, key, precision=p
            )
        )
        jax.block_until_ready(decode(jax.random.key(0)))
        best = float("inf")
        for i in range(4):
            t0 = time.time()
            jax.block_until_ready(decode(jax.random.key(i + 1)))
            best = min(best, time.time() - t0)
        rtf = best / (t_decode / sr)
        print(
            f"{spec}: {best * 1e6 / t_decode:.2f} us/step rtf={rtf:.5f} "
            f"{batch * t_decode / best / 1e6:.2f}M samples/s",
            flush=True,
        )


if __name__ == "__main__":
    main()

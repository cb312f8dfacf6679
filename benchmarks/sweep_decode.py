"""Batch-size scaling sweep of the fused decode (throughput + latency)."""
import time
import numpy as np
import jax, jax.numpy as jnp

def main():
    _ = jax.device_get(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    print("warmup done", flush=True)
    from vectorquantizedcpc_tpu.configs import load_conf
    from vectorquantizedcpc_tpu.models.vocoder import vocoder_init
    from vectorquantizedcpc_tpu.ops.ar_decode import fused_ar_decode

    conf = load_conf([])
    net = conf.training_vocoder.model.network
    params = vocoder_init(jax.random.key(0), net)
    sr = 16000
    rng = np.random.default_rng(0)
    n_frames = 50  # 1 s of audio
    T = n_frames * 2 * 160

    for B in [1, 4, 8, 16, 32]:
        for prec in (["bf16", "int8"] if B in (8, 32) else ["bf16"]):
            z = jnp.asarray(rng.integers(0, 512, size=(B, n_frames)))
            spk = jnp.asarray(rng.integers(0, 102, size=(B,)))
            f = jax.jit(lambda k, z=z, s=spk, p=prec: fused_ar_decode(
                params, net, z, s, k, precision=p))
            jax.block_until_ready(f(jax.random.key(0)))
            t0 = time.time()
            for i in range(3):
                out = f(jax.random.key(i + 1))
            jax.block_until_ready(out)
            dt = (time.time() - t0) / 3
            print(f"B={B:3d} {prec}: {dt*1e6/T:5.2f} us/step RTF={dt/(T/sr):.4f} "
                  f"{B*T/dt:>12,.0f} samples/s/chip", flush=True)

if __name__ == "__main__":
    main()

"""Phase breakdown of the planned serving drain (VQCPC_SERVING_DEBUG timers).

Reproduces the bench.py serving section exactly (32 slots, sf=8, the same
48-request mixed-length workload) and prints the per-phase wall times of
the 2nd/3rd drain (1st warms compile caches), plus the theoretical kernel
floor: total decoded segment-steps x the raw per-step kernel time.
"""
import os
import time

os.environ["VQCPC_SERVING_DEBUG"] = "1"

import numpy as np
import jax
import jax.numpy as jnp


def main():
    _ = jax.device_get(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    print("warmup done", flush=True)
    from vectorquantizedcpc_tpu.configs import load_conf
    from vectorquantizedcpc_tpu.models.vocoder import vocoder_init
    from vectorquantizedcpc_tpu.infer.serving import ContinuousBatcher

    conf = load_conf([])
    net = conf.training_vocoder.model.network
    params = vocoder_init(jax.random.key(0), net)
    rng = np.random.default_rng(0)
    hop = net.rnnms.upsampling_t
    buckets = [25, 50, 100]
    server = ContinuousBatcher(
        params, net, slots=32, segment_frames=8,
        max_frames=2 * max(buckets) + 32,
    )
    reqs = [
        (
            rng.integers(0, net.size_i_codebook, size=(int(rng.choice(buckets)),)),
            int(rng.integers(0, net.n_speakers)),
        )
        for _ in range(48)
    ]
    valid = sum(2 * len(z_) * hop for z_, _ in reqs)
    for rep in range(3):
        print(f"--- rep {rep}", flush=True)
        for z_, s_ in reqs:
            server.submit(z_, s_)
        t0 = time.time()
        server.run(materialize=False)
        dt_dev = time.time() - t0
        for rid in list(server._pending):
            server.result(rid)
        dt_host = time.time() - t0
        print(f"rep {rep}: dev {dt_dev:.3f}s ({valid/dt_dev/1e6:.2f} M/s) "
              f"host {dt_host:.3f}s ({valid/dt_host/1e6:.2f} M/s)", flush=True)


if __name__ == "__main__":
    main()

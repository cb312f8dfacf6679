"""Sweep the planned-drain serving config (slots x segment_frames) on TPU.

Finds the throughput-optimal slot-pool size and retirement quantum for the
bench.py mixed-length workload. Larger pools amortize per-step fixed kernel
latency over more streams (the raw kernel's us/step is nearly flat in
batch); finer segments waste fewer decoded samples on each stream's last
partial segment. Reports drained-to-device valid samples/s (min-of-N), the
same boundary bench.py uses.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    _ = jax.device_get(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))

    from vectorquantizedcpc_tpu.configs import load_conf
    from vectorquantizedcpc_tpu.infer.serving import ContinuousBatcher
    from vectorquantizedcpc_tpu.models.vocoder import vocoder_init

    conf = load_conf([])
    net = conf.training_vocoder.model.network
    params = vocoder_init(jax.random.key(0), net)
    hop = net.rnnms.upsampling_t
    rng = np.random.default_rng(0)

    buckets = [25, 50, 100]
    reqs = [
        (
            rng.integers(0, net.size_i_codebook, size=(int(rng.choice(buckets)),)),
            int(rng.integers(0, net.n_speakers)),
        )
        for _ in range(48)
    ]
    valid = sum(2 * len(z) * hop for z, _ in reqs)
    print(f"workload: {len(reqs)} utts, {valid} valid samples", flush=True)

    for slots in (32, 48, 64):
        for sf in (8, 16, 32):
            server = ContinuousBatcher(
                params, net, slots=slots, segment_frames=sf,
                max_frames=2 * max(buckets) + 32,
            )
            best = float("inf")
            for rep in range(3):
                for z, s in reqs:
                    server.submit(z, s)
                t0 = time.time()
                server.run(materialize=False)
                dt = time.time() - t0
                for rid in list(server._pending):
                    server.result(rid)
                if rep > 0:
                    best = min(best, dt)
            print(
                f"slots={slots:3d} sf={sf:3d}: {valid/best:>12,.0f} samples/s"
                f"  ({best*1e3:.0f} ms)",
                flush=True,
            )


if __name__ == "__main__":
    main()

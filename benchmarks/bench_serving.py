"""Continuous vs static batching on a mixed-length decode workload (TPU).

Static batching decodes a batch padded to its longest member, so short
utterances bill the longest one's steps. Continuous batching retires
streams per segment and back-fills freed slots from the queue. This
harness submits a realistic length mix and reports both throughputs
(valid samples / wall second per chip).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    _ = jax.device_get(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    print("warmup done", flush=True)

    from vectorquantizedcpc_tpu.configs import load_conf
    from vectorquantizedcpc_tpu.infer.serving import ContinuousBatcher
    from vectorquantizedcpc_tpu.models.vocoder import vocoder_init
    from vectorquantizedcpc_tpu.ops.ar_decode import fused_ar_decode

    conf = load_conf([])
    net = conf.training_vocoder.model.network
    params = vocoder_init(jax.random.key(0), net)
    sr = conf.sampling_rate
    hop = net.rnnms.upsampling_t
    rng = np.random.default_rng(0)

    # Mixed-length workload: 24 utterances over 4 length buckets
    # (0.5/1/2/3 s; deployments bucket lengths upstream — infer/convert.py).
    buckets_codes = [25, 50, 100, 150]  # codes at 50 Hz
    reqs = [
        (
            rng.integers(0, net.size_i_codebook, size=(int(rng.choice(buckets_codes)),)),
            int(rng.integers(0, net.n_speakers)),
        )
        for _ in range(24)
    ]
    total_valid = sum(2 * len(z) * hop for z, _ in reqs)
    print(f"workload: {len(reqs)} utts, {total_valid/sr:.1f} s audio", flush=True)

    slots = 8

    # ---- Static batching: every batch padded to the global max length
    # (one compiled shape; the usual serving setup without length buckets).
    tz_max = max(len(z) for z, _ in reqs)
    batches = [reqs[b0 : b0 + slots] for b0 in range(0, len(reqs), slots)]

    def run_static(batch, key):
        z = np.zeros((slots, tz_max), np.int32)
        for j, (zz, _) in enumerate(batch):
            z[j, : len(zz)] = zz
        spk = np.zeros((slots,), np.int32)
        spk[: len(batch)] = [s for _, s in batch]
        out = fused_ar_decode(
            params, net, jnp.asarray(z), jnp.asarray(spk), key
        )
        jax.block_until_ready(out)

    run_static(batches[0], jax.random.key(99))  # compile
    t0 = time.time()
    for i, batch in enumerate(batches):
        run_static(batch, jax.random.key(i))
    static_wall = time.time() - t0
    static_sps = total_valid / static_wall
    print(
        f"static    : {static_sps:>12,.0f} valid samples/s "
        f"({static_wall:.2f} s wall, pad-to-max batches)",
        flush=True,
    )

    # ---- Continuous batching. -------------------------------------------
    server = ContinuousBatcher(
        params, net, slots=slots, segment_frames=32,
        max_frames=2 * tz_max + 32,
    )
    # Pre-warm every compiled program on the serving path (per-length
    # conditioning, admission, segment step, retirement) by draining one
    # dummy request per length bucket; the timed section below is then
    # steady-state serving (end-to-end incl. admissions).
    for n in buckets_codes:
        server.submit(np.zeros(n, np.int32), 0)
    server.run()

    for z, s in reqs:
        server.submit(z, s)
    t0 = time.time()
    server.run()
    cont_wall = time.time() - t0
    stats = server.stats
    cont_sps = stats["samples_out"] / cont_wall
    print(
        f"continuous: {cont_sps:>12,.0f} valid samples/s "
        f"({cont_wall:.2f} s end-to-end wall incl. admissions, "
        f"{int(stats['steps'])} segments)",
        flush=True,
    )
    print(f"continuous/static: {cont_sps / static_sps:.2f}x", flush=True)


if __name__ == "__main__":
    main()

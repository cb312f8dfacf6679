"""Serving-vs-raw-kernel ratio, bench.py methodology, one process.

Measures the raw b32 fused-decode kernel and the 32-slot continuous
batcher on the SAME process/run (min-of-N both), so the ratio isn't
polluted by cross-run tunnel drift. Mirrors bench.py's serving section
exactly (same workload mix, same boundaries).
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

    # Raw b32 kernel (bench.py decode section, 2 s utterances).
    seconds = 2.0
    n_frames = int(seconds * sr) // hop // 2
    t_decode = n_frames * 2 * hop
    z = jnp.asarray(rng.integers(0, net.size_i_codebook, size=(32, n_frames)))
    spk = jnp.asarray(rng.integers(0, net.n_speakers, size=(32,)))
    decode = jax.jit(
        lambda key: fused_ar_decode(params, net, z, spk, key)
    )
    jax.block_until_ready(decode(jax.random.key(0)))
    best = float("inf")
    for i in range(4):
        t0 = time.time()
        jax.block_until_ready(decode(jax.random.key(i + 1)))
        best = min(best, time.time() - t0)
    kernel_sps = 32 * t_decode / best
    print(f"b32 kernel: {kernel_sps/1e6:.2f} M samples/s "
          f"({best*1e6/t_decode:.2f} us/step)", flush=True)

    buckets = [25, 50, 100]
    server = ContinuousBatcher(
        params, net, slots=32, segment_frames=4,
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
    best_dev, best_host = float("inf"), float("inf")
    for rep in range(4):
        for z_, s_ in reqs:
            server.submit(z_, s_)
        t0 = time.time()
        server.run(materialize=False)
        dt_dev = time.time() - t0
        for rid in list(server._pending):
            server.result(rid)
        dt_host = time.time() - t0
        print(f"rep {rep}: dev {valid/dt_dev/1e6:.2f} M/s  "
              f"host {valid/dt_host/1e6:.2f} M/s", flush=True)
        if rep > 0:
            best_dev = min(best_dev, dt_dev)
            best_host = min(best_host, dt_host)
        server._pending.clear()
        server._results.clear()
    print(f"serving: {valid/best_dev/1e6:.2f} M/s dev, "
          f"{valid/best_host/1e6:.2f} M/s host, "
          f"ratio vs b32 kernel {valid/best_dev/kernel_sps:.3f}, "
          f"host/dev {best_dev/best_host:.3f}", flush=True)

    # RTT-amortized (pipelined) boundary, both sides — bench.py's
    # serving_vs_b32_kernel_inproc methodology.
    n_pipe = 3
    t0 = time.time()
    for rep in range(n_pipe):
        for z_, s_ in reqs:
            server.submit(z_, s_)
        server.run(materialize=False, wait=(rep == n_pipe - 1))
        server._pending.clear()
        server._results.clear()
    sp = n_pipe * valid / (time.time() - t0)
    t0 = time.time()
    for i in range(n_pipe):
        out = decode(jax.random.key(10 + i))
    jax.block_until_ready(out)
    kp = n_pipe * 32 * t_decode / (time.time() - t0)
    print(f"pipelined: serving {sp/1e6:.2f} M/s, kernel {kp/1e6:.2f} M/s, "
          f"inproc ratio {sp/kp:.3f}", flush=True)


if __name__ == "__main__":
    main()

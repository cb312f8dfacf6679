"""Real-TPU benchmark: fused AR decode vs lax.scan decode.

Run in ONE process (the tunneled backend pays a large one-time D2H setup).
Prints timing lines + a summary; used by bench.py and for kernel iteration.
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--skip-scan", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from vectorquantizedcpc_tpu.configs import load_conf
    from vectorquantizedcpc_tpu.models.vocoder import (
        vocoder_generate,
        vocoder_init,
    )
    from vectorquantizedcpc_tpu.ops.ar_decode import fused_ar_decode

    print("devices:", jax.devices(), flush=True)

    # D2H warm-up: the first computed-array fetch in a process can stall for
    # minutes on the tunneled backend; pay it on a trivial op.
    t0 = time.time()
    _ = jax.device_get(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    print(f"D2H warmup: {time.time() - t0:.1f} s", flush=True)

    conf = load_conf([])  # full reference dimensions
    net = conf.training_vocoder.model.network
    params = vocoder_init(jax.random.key(0), net)

    sr = conf.sampling_rate
    n_samples = int(args.seconds * sr)
    n_frames = n_samples // net.rnnms.upsampling_t // 2  # codes at /2 rate
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.integers(0, net.size_i_codebook, size=(args.batch, n_frames)))
    spk = jnp.asarray(rng.integers(0, net.n_speakers, size=(args.batch,)))
    t_decode = n_frames * 2 * net.rnnms.upsampling_t

    # Outer jit: the conditioning prenet + projections must be part of ONE
    # compiled computation — eager dispatch of the prologue dominates
    # otherwise (measured 71 us/step eager vs ~2 us/step jitted).
    @jax.jit
    def run_fused(key):
        return fused_ar_decode(params, net, z, spk, key, chunk=args.chunk)

    t0 = time.time()
    w1 = jax.block_until_ready(run_fused(jax.random.key(1)))
    print(f"fused compile+first run: {time.time() - t0:.1f} s", flush=True)

    n_rep = 3
    t0 = time.time()
    for i in range(n_rep):
        w = jax.block_until_ready(run_fused(jax.random.key(2 + i)))
    dt = (time.time() - t0) / n_rep
    steps_per_s = t_decode / dt
    agg_samples_per_s = args.batch * t_decode / dt
    rtf = dt / (t_decode / sr)
    print(
        f"FUSED: B={args.batch} T={t_decode} {dt*1e3:.0f} ms "
        f"-> {steps_per_s:,.0f} steps/s, {agg_samples_per_s:,.0f} samples/s/chip, "
        f"RTF={rtf:.4f} ({dt*1e6/t_decode:.2f} us/step)",
        flush=True,
    )

    # Sampling sanity: different seeds differ on real hardware.
    w2 = jax.block_until_ready(run_fused(jax.random.key(99)))
    same = bool(jnp.array_equal(w1, w2))
    print(f"seed variation OK: {not same}", flush=True)

    if not args.skip_scan:
        def run_scan(key):
            return vocoder_generate(params, net, z, spk, key)

        t0 = time.time()
        jax.block_until_ready(run_scan(jax.random.key(1)))
        print(f"scan compile+first run: {time.time() - t0:.1f} s", flush=True)
        t0 = time.time()
        jax.block_until_ready(run_scan(jax.random.key(2)))
        dt_scan = time.time() - t0
        print(
            f"SCAN:  B={args.batch} T={t_decode} {dt_scan*1e3:.0f} ms "
            f"-> RTF={dt_scan/(t_decode/sr):.4f} "
            f"({dt_scan*1e6/t_decode:.2f} us/step); fused speedup x{dt_scan/dt:.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()

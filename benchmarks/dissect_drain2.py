"""Part 2 of the drain dissection: segment-kernel efficiency by sf.

Times the drain's scan-of-segments form at sf in {4, 8, 16} and the
monolithic long segment call, all on-device (no serving bookkeeping), to
separate scheduling/utilization losses from kernel-launch overhead.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    _ = jax.device_get(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    from vectorquantizedcpc_tpu.configs import load_conf
    from vectorquantizedcpc_tpu.models.vocoder import vocoder_init
    from vectorquantizedcpc_tpu.ops.ar_decode import (
        DecodeState, fused_ar_decode_segment, init_decode_state,
        prep_decode_weights,
    )

    conf = load_conf([])
    net = conf.training_vocoder.model.network
    params = vocoder_init(jax.random.key(0), net)
    hop = net.rnnms.upsampling_t
    rng = np.random.default_rng(0)
    weights = prep_decode_weights(params, net, "bf16")
    slots = 32
    total_f = 192  # total frames decoded per slot
    staging = jnp.asarray(
        rng.normal(size=(64, 232, 3 * 896)).astype(np.float32), jnp.bfloat16
    )
    st = init_decode_state(slots, net)
    tot_steps = total_f * hop

    # Monolithic first (one compile), then sf sweep.
    seg_long = jnp.asarray(
        rng.normal(size=(slots, total_f, 3 * 896)).astype(np.float32),
        jnp.bfloat16,
    )
    fl = jax.jit(
        lambda s, h, p, k: fused_ar_decode_segment(
            weights, net, s, DecodeState(h=h, prev=p), k
        )
    )
    jax.block_until_ready(fl(seg_long, st.h, st.prev, jax.random.key(0)))
    t0 = time.time()
    for i in range(3):
        out = fl(seg_long, st.h, st.prev, jax.random.key(i))
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 3
    print(
        f"monolithic {total_f}f x {slots}: {dt*1e3:.1f} ms "
        f"({dt*1e6/tot_steps:.2f} us/step, "
        f"{slots*tot_steps/dt/1e6:.2f} M/s)",
        flush=True,
    )

    for sf in (16, 8, 4):
        n2 = total_f // sf
        rows2 = jnp.asarray(rng.integers(0, 64, (n2, slots)), jnp.int32)
        pos2 = jnp.zeros((n2, slots), jnp.int32)
        fresh2 = jnp.zeros((n2, slots), jnp.bool_)

        def chunk2(h, prev, rows_t, pos_t, fresh_t, key, sf=sf):
            def body(carry, inp):
                h, prev = carry
                r, p, fr, kk = inp
                h = jnp.where(fr[:, None], 0.0, h)
                prev = jnp.where(fr, 128, prev)
                seg = jax.vmap(
                    lambda rr, pp: jax.lax.dynamic_slice(
                        staging, (rr, pp, 0), (1, sf, 3 * 896)
                    )[0]
                )(r, p)
                out, stt = fused_ar_decode_segment(
                    weights, net, seg, DecodeState(h=h, prev=prev), kk
                )
                return (stt.h, stt.prev), out

            keys = jax.random.split(key, rows_t.shape[0])
            (h, prev), ys = jax.lax.scan(
                body, (h, prev), (rows_t, pos_t, fresh_t, keys)
            )
            return h, prev, ys

        cj2 = jax.jit(chunk2)
        jax.block_until_ready(
            cj2(st.h, st.prev, rows2, pos2, fresh2, jax.random.key(0))
        )
        t0 = time.time()
        for i in range(3):
            out = cj2(st.h, st.prev, rows2, pos2, fresh2, jax.random.key(i))
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 3
        print(
            f"scan sf={sf} ({n2} iters): {dt*1e3:.1f} ms "
            f"({dt*1e6/tot_steps:.2f} us/step, "
            f"{slots*tot_steps/dt/1e6:.2f} M/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()

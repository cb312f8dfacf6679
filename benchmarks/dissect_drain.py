"""Fine-grained drain dissection: dispatch latency, per-chunk device time,
segmented-kernel throughput vs the monolithic long decode.

Answers: of the warm 48-request drain's ~0.18 s, what is tunnel dispatch
latency, what is conditioning compute, what is segment-kernel inefficiency
(sf=8 launches in a scan vs one long pipelined pallas_call)?
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    _ = jax.device_get(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    from vectorquantizedcpc_tpu.configs import load_conf
    from vectorquantizedcpc_tpu.models.vocoder import (
        build_conditioning_frames, vocoder_init,
    )
    from vectorquantizedcpc_tpu.ops.ar_decode import (
        DecodeState, fused_ar_decode_segment, init_decode_state,
        prep_decode_weights, project_cond_frames,
    )

    conf = load_conf([])
    net = conf.training_vocoder.model.network
    params = vocoder_init(jax.random.key(0), net)
    hop = net.rnnms.upsampling_t
    rng = np.random.default_rng(0)
    weights = prep_decode_weights(params, net, "bf16")

    # (a) dispatch latency of a tiny jitted program (async enqueue time).
    f = jax.jit(lambda x: x + 1)
    x = jnp.ones((32, 128))
    jax.block_until_ready(f(x))
    t0 = time.time()
    for _ in range(20):
        y = f(x)
    enqueue = (time.time() - t0) / 20
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(10):
        jax.block_until_ready(f(x))
    rtt = (time.time() - t0) / 10
    print(f"dispatch enqueue {enqueue*1e3:.2f} ms   blocked RTT {rtt*1e3:.2f} ms",
          flush=True)

    # (b) conditioning compute: one bucket (16, 100 codes) blocked.
    for g, n_codes in [(16, 25), (16, 50), (16, 100), (64, 100)]:
        zs = jnp.asarray(rng.integers(0, net.size_i_codebook, (g, n_codes)))
        spks = jnp.asarray(rng.integers(0, net.n_speakers, (g,)))

        cond = jax.jit(
            lambda z, s: project_cond_frames(
                weights, build_conditioning_frames(params, net, z, s)
            )
        )
        jax.block_until_ready(cond(zs, spks))
        t0 = time.time()
        for _ in range(5):
            jax.block_until_ready(cond(zs, spks))
        print(f"cond g={g} codes={n_codes}: {(time.time()-t0)/5*1e3:.2f} ms",
              flush=True)

    # (c) segmented kernel in a scan (the drain shape: 32 slots, sf=8) vs
    # monolithic: 27 steps x 8 frames, all device-side.
    slots, sf, n_steps = 32, 8, 27
    staging = jnp.asarray(
        rng.normal(size=(64, 232, 3 * 896)).astype(np.float32), jnp.bfloat16
    )
    rows = jnp.asarray(rng.integers(0, 64, (n_steps, slots)), jnp.int32)
    pos = jnp.zeros((n_steps, slots), jnp.int32)
    fresh = jnp.zeros((n_steps, slots), jnp.bool_)

    def chunk(h, prev, rows_t, pos_t, fresh_t, key):
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
            out, st = fused_ar_decode_segment(
                weights, net, seg, DecodeState(h=h, prev=prev), kk
            )
            return (st.h, st.prev), out

        keys = jax.random.split(key, rows_t.shape[0])
        (h, prev), ys = jax.lax.scan(body, (h, prev), (rows_t, pos_t, fresh_t, keys))
        return h, prev, ys

    cj = jax.jit(chunk)
    st = init_decode_state(slots, net)
    jax.block_until_ready(cj(st.h, st.prev, rows, pos, fresh, jax.random.key(0)))
    t0 = time.time()
    for i in range(3):
        out = cj(st.h, st.prev, rows, pos, fresh, jax.random.key(i))
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 3
    tot_steps = n_steps * sf * hop
    print(
        f"scan-drain {n_steps}x{sf}f x {slots} slots: {dt*1e3:.1f} ms  "
        f"{slots*tot_steps/dt/1e6:.2f} M samples/s  "
        f"({dt*1e6/tot_steps:.2f} us/step)",
        flush=True,
    )

    # Monolithic segment call of the same total length (27*8=216 frames).
    seg_long = jnp.asarray(
        rng.normal(size=(slots, n_steps * sf, 3 * 896)).astype(np.float32),
        jnp.bfloat16,
    )
    fl = jax.jit(
        lambda s, st_h, st_p, k: fused_ar_decode_segment(
            weights, net, s, DecodeState(h=st_h, prev=st_p), k
        )
    )
    jax.block_until_ready(fl(seg_long, st.h, st.prev, jax.random.key(0)))
    t0 = time.time()
    for i in range(3):
        out = fl(seg_long, st.h, st.prev, jax.random.key(i))
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 3
    print(
        f"monolithic 216f x {slots}: {dt*1e3:.1f} ms  "
        f"{slots*tot_steps/dt/1e6:.2f} M samples/s  "
        f"({dt*1e6/tot_steps:.2f} us/step)",
        flush=True,
    )

    # sf sweep inside the scan form.
    for sf2 in (8, 16, 32):
        n2 = 216 // sf2
        rows2 = jnp.asarray(rng.integers(0, 64, (n2, slots)), jnp.int32)
        pos2 = jnp.zeros((n2, slots), jnp.int32)
        fresh2 = jnp.zeros((n2, slots), jnp.bool_)

        def chunk2(h, prev, rows_t, pos_t, fresh_t, key, sf2=sf2):
            def body(carry, inp):
                h, prev = carry
                r, p, fr, kk = inp
                h = jnp.where(fr[:, None], 0.0, h)
                prev = jnp.where(fr, 128, prev)
                seg = jax.vmap(
                    lambda rr, pp: jax.lax.dynamic_slice(
                        staging, (rr, pp, 0), (1, sf2, 3 * 896)
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
            f"scan sf={sf2}: {dt*1e3:.1f} ms ({dt*1e6/tot_steps:.2f} us/step)",
            flush=True,
        )


if __name__ == "__main__":
    main()

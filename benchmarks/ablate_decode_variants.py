"""Variant ablation for the fused AR decode kernel.

Times full-structure kernel variants (sampling + one-hot embed + out write)
with different optimization levers, at batch 8 and 32:

- unroll: fori_loop unroll factor
- int8_wh / int8_embed / int8_fc1: weight-only int8 on individual matmuls
- bf16_h: carry the GRU hidden state in bf16 (halves VPU vregs in the gates)

Goal: find why int8 doesn't win at small batch (latency-bound regime) and
which fixed costs can be cut. Run on real TPU only.
"""

import functools
import itertools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, CLASSES, T = 896, 256, 16384
H3 = 3 * H


def _chunk_for(B: int) -> int:
    # Sample-rate cond blocks are double-buffered: keep 2*CHUNK*B*H3*2
    # bytes within ~6 MiB of scoped VMEM (B=32 at CHUNK=64 OOMs at 22 MiB).
    c = 64
    while c > 4 and 2 * c * B * H3 * 2 > (6 << 20):
        c //= 2
    return c


def make_kernel(B, CHUNK, unroll, int8_wh, int8_embed, int8_fc1, bf16_h):
    h_dtype = jnp.bfloat16 if bf16_h else jnp.float32

    def mm(x, w_ref, s_ref, use_int8):
        if use_int8:
            x_i8 = jnp.round(x.astype(jnp.float32) * 127.0).astype(jnp.int8)
            acc = jnp.dot(x_i8, w_ref[:], preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * s_ref[0][None, :]
        return jnp.dot(x.astype(jnp.bfloat16), w_ref[:],
                       preferred_element_type=jnp.float32)

    def kernel(seed_ref, cond_ref, embed_ref, e_s, wh_ref, wh_s,
               fc1_ref, f1_s, fc2_ref, out_ref, h_scr, emb_scr):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            h_scr[:] = jnp.zeros_like(h_scr)
            emb_scr[:] = jnp.zeros_like(emb_scr)

        pltpu.prng_seed(seed_ref[0] + i)

        def step(t):
            h = h_scr[:]
            xp = emb_scr[:] + cond_ref[t].astype(jnp.float32)
            hp = mm(h, wh_ref, wh_s, int8_wh)
            r = jax.nn.sigmoid(xp[:, :H] + hp[:, :H])
            z = jax.nn.sigmoid(xp[:, H:2*H] + hp[:, H:2*H])
            n = jnp.tanh(xp[:, 2*H:] + r * hp[:, 2*H:])
            h_new = ((1 - z) * n + z * h.astype(jnp.float32))
            h_scr[:] = h_new.astype(h_dtype)

            fc = jax.nn.relu(mm(h_new, fc1_ref, f1_s, int8_fc1))
            logits = jnp.dot(fc.astype(jnp.bfloat16), fc2_ref[:],
                             preferred_element_type=jnp.float32)
            bits = pltpu.bitcast(pltpu.prng_random_bits((B, CLASSES)), jnp.int32)
            u = jax.lax.bitwise_and(bits, (1 << 24) - 1).astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-9
            sample = jnp.argmax(logits - jnp.log(-jnp.log(u)), -1).astype(jnp.int32)
            out_ref[t, :] = sample
            iota = jax.lax.broadcasted_iota(jnp.int32, (B, CLASSES), 1)
            if int8_embed:
                onehot = (sample[:, None] == iota).astype(jnp.int8)
                acc = jnp.dot(onehot, embed_ref[:], preferred_element_type=jnp.int32)
                emb_scr[:] = acc.astype(jnp.float32) * e_s[0][None, :]
            else:
                onehot = (sample[:, None] == iota).astype(jnp.bfloat16)
                emb_scr[:] = jnp.dot(onehot, embed_ref[:],
                                     preferred_element_type=jnp.float32)

        def body(k, _):
            # Manual unroll: Mosaic's fori_loop only supports unroll=1/full.
            for j in range(unroll):
                step(k * unroll + j)
            return 0

        jax.lax.fori_loop(0, CHUNK // unroll, body, 0)

    return kernel, h_dtype


def quant(w):
    s = np.abs(w).max(0, keepdims=True) / 127.0
    return (np.round(w / s).astype(np.int8), (s / 127.0).astype(np.float32))


def run(B, unroll=1, int8_wh=False, int8_embed=False, int8_fc1=False,
        bf16_h=False, reps=3):
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.normal(size=(T, B, H3)).astype(np.float32), jnp.bfloat16)
    embed_f = rng.normal(size=(CLASSES, H3)).astype(np.float32)
    wh_f = (rng.normal(size=(H, H3)) * 0.03).astype(np.float32)
    fc1_f = rng.normal(size=(H, 256)).astype(np.float32)
    fc2 = jnp.asarray(rng.normal(size=(256, CLASSES)).astype(np.float32), jnp.bfloat16)
    seed = jnp.asarray([3], jnp.int32)

    def prep(w, use):
        if use:
            v, s = quant(w)
            return jnp.asarray(v), jnp.asarray(s)
        return jnp.asarray(w, jnp.bfloat16), jnp.ones((1, w.shape[1]), jnp.float32)

    embed, e_s = prep(embed_f, int8_embed)
    wh, wh_s = prep(wh_f, int8_wh)
    fc1, f1_s = prep(fc1_f, int8_fc1)

    CHUNK = _chunk_for(B)
    kernel, h_dtype = make_kernel(B, CHUNK, unroll, int8_wh, int8_embed, int8_fc1, bf16_h)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK, B, H3), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec((CHUNK, B), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, H), h_dtype),
            pltpu.VMEM((B, H3), jnp.float32),
        ],
    )
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, B), jnp.int32),
        grid_spec=grid_spec,
    )(*a))

    argsv = (seed, cond, embed, e_s, wh, wh_s, fc1, f1_s, fc2)
    out = f(*argsv)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = f(*argsv)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    tag = (f"b{B} unroll={unroll} wh={'i8' if int8_wh else 'bf'} "
           f"emb={'i8' if int8_embed else 'bf'} fc1={'i8' if int8_fc1 else 'bf'} "
           f"h={'bf16' if bf16_h else 'f32'}")
    print(f"{tag}: {best*1e6/T:.2f} us/step", flush=True)


if __name__ == "__main__":
    import sys

    sel = sys.argv[1] if len(sys.argv) > 1 else "core"
    t0 = time.time()
    _ = jax.device_get(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    print(f"warmup {time.time()-t0:.0f}s", flush=True)
    I8 = dict(int8_wh=True, int8_embed=True, int8_fc1=True)
    if sel == "core":
        for B in (8, 32):
            run(B)                                     # bf16 baseline
            run(B, **I8)                               # current int8
            run(B, unroll=4)
            run(B, unroll=4, **I8)
            run(B, unroll=4, bf16_h=True)
            run(B, unroll=4, bf16_h=True, **I8)
    elif sel == "unroll8":
        run(8, unroll=4)
        run(8, unroll=4, **I8)
        run(8, unroll=2)
        run(8, bf16_h=True)
    elif sel == "parts":
        for B in (8, 32):
            run(B, int8_wh=True)
            run(B, int8_embed=True)
            run(B, int8_fc1=True)
            run(B, unroll=2)
            run(B, unroll=8)
            run(B, bf16_h=True)
    elif sel == "b32x":
        run(32)
        run(32, **I8)
        run(32, int8_wh=True)
        run(32, int8_embed=True)
        run(32, int8_fc1=True)
        run(32, unroll=4)
        run(32, unroll=4, **I8)
        run(32, int8_wh=True, int8_embed=True)
    elif sel == "b64":
        for B in (48, 64):
            run(B)
            run(B, **I8)
            run(B, unroll=4)
            run(B, unroll=4, **I8)

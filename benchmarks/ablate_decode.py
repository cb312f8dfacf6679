"""Ablation: which part of the fused decode kernel costs the time?

Builds stripped-down kernel variants sharing the real structure and times
each on the TPU. One process, warmup first.
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, CLASSES, CHUNK, T = 8, 896, 256, 64, 16384
H3 = 3 * H


def make_kernel(level: int):
    """level: 0=matmul+gates only, 1=+fc head, 2=+sampling, 3=+onehot embed,
    4=+out write (full)."""

    def kernel(seed_ref, cond_ref, embed_ref, wh_ref, fc1_ref, fc2_ref,
               out_ref, h_scr, emb_scr):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            h_scr[:] = jnp.zeros_like(h_scr)
            emb_scr[:] = jnp.zeros_like(emb_scr)

        pltpu.prng_seed(seed_ref[0] + i)

        def body(t, _):
            h = h_scr[:]
            xp = emb_scr[:] + cond_ref[t].astype(jnp.float32)
            hp = jnp.dot(h.astype(jnp.bfloat16), wh_ref[:],
                         preferred_element_type=jnp.float32)
            r = jax.nn.sigmoid(xp[:, :H] + hp[:, :H])
            z = jax.nn.sigmoid(xp[:, H:2*H] + hp[:, H:2*H])
            n = jnp.tanh(xp[:, 2*H:] + r * hp[:, 2*H:])
            h_new = (1 - z) * n + z * h
            h_scr[:] = h_new

            sample = jnp.zeros((B,), jnp.int32)
            if level >= 1:
                fc = jax.nn.relu(jnp.dot(h_new.astype(jnp.bfloat16), fc1_ref[:],
                                         preferred_element_type=jnp.float32))
                logits = jnp.dot(fc.astype(jnp.bfloat16), fc2_ref[:],
                                 preferred_element_type=jnp.float32)
                sample = jnp.argmax(logits, -1).astype(jnp.int32)
            if level >= 2:
                bits = pltpu.bitcast(pltpu.prng_random_bits((B, CLASSES)), jnp.int32)
                u = jax.lax.bitwise_and(bits, (1 << 24) - 1).astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-9
                sample = jnp.argmax(logits - jnp.log(-jnp.log(u)), -1).astype(jnp.int32)
            if level >= 3:
                onehot = (sample[:, None] == jax.lax.broadcasted_iota(
                    jnp.int32, (B, CLASSES), 1)).astype(jnp.bfloat16)
                emb_scr[:] = jnp.dot(onehot, embed_ref[:],
                                     preferred_element_type=jnp.float32)
            if level >= 4:
                out_ref[t, :] = sample
            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0)
        @pl.when(i >= 0)
        def _():
            out_ref[0, :] = jnp.full((B,), i, jnp.int32)  # keep out alive

    return kernel


def run(level):
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.normal(size=(T, B, H3)).astype(np.float32), jnp.bfloat16)
    embed = jnp.asarray(rng.normal(size=(CLASSES, H3)).astype(np.float32), jnp.bfloat16)
    wh = jnp.asarray(rng.normal(size=(H, H3)).astype(np.float32), jnp.bfloat16)
    fc1 = jnp.asarray(rng.normal(size=(H, 256)).astype(np.float32), jnp.bfloat16)
    fc2 = jnp.asarray(rng.normal(size=(256, CLASSES)).astype(np.float32), jnp.bfloat16)
    seed = jnp.asarray([3], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK, B, H3), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK, B), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H3), jnp.float32),
        ],
    )
    f = jax.jit(lambda *a: pl.pallas_call(
        make_kernel(level),
        out_shape=jax.ShapeDtypeStruct((T, B), jnp.int32),
        grid_spec=grid_spec,
    )(*a))

    out = f(seed, cond, embed, wh, fc1, fc2)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(3):
        out = f(seed, cond, embed, wh, fc1, fc2)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 3
    print(f"level {level}: {dt*1e6/T:.2f} us/step ({T/dt:,.0f} steps/s)", flush=True)


if __name__ == "__main__":
    t0 = time.time()
    _ = jax.device_get(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    print(f"warmup {time.time()-t0:.0f}s", flush=True)
    for level in [2, 3, 4]:
        run(level)

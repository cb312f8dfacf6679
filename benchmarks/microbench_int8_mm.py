"""Isolate the per-step cost of the AR-decode recurrent matmul: bf16 vs
int8(static-scale) on the real MXU, at decode batch sizes.

Runs a Pallas kernel that does ONLY the (B, H) x (H, 3H) matmul chain for
N steps (each step feeding the next, like the AR recursion), so the
measured time is the serialized matmul latency + quant overhead and
nothing else. Decides whether weight-only INT8 can beat bf16 in principle
at this shape.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, OUT = 896, 2688
STEPS = 20000


def _kernel(w_ref, scale_ref, h0_ref, out_ref, *, mode: str, batch: int):
    def body(t, h):
        if mode == "bf16":
            acc = jnp.dot(
                h.astype(jnp.bfloat16), w_ref[:],
                preferred_element_type=jnp.float32,
            )
        else:
            h_i8 = jnp.round(h * 127.0).astype(jnp.int8)
            acc = jnp.dot(
                h_i8, w_ref[:], preferred_element_type=jnp.int32
            ).astype(jnp.float32) * scale_ref[0][None, :]
        # Cheap nonlinearity to keep h bounded and the chain serialized.
        return jnp.tanh(acc[:, :H] * 0.01)

    out_ref[:] = jax.lax.fori_loop(0, STEPS, body, h0_ref[:])


@functools.partial(jax.jit, static_argnames=("mode", "batch"))
def run(w, scale, h0, mode, batch):
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode, batch=batch),
        out_shape=jax.ShapeDtypeStruct((batch, H), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(w, scale, h0)


def main():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(H, OUT)).astype(np.float32) * 0.05
    w_bf16 = jnp.asarray(w, jnp.bfloat16)
    w_i8 = jnp.asarray(np.clip(np.round(w / 0.01), -127, 127), jnp.int8)
    scale = jnp.full((1, OUT), 0.01 / 127.0, jnp.float32)

    for batch in (8, 32):
        h0 = jnp.asarray(rng.normal(size=(batch, H)) * 0.1, jnp.float32)
        for mode in ("bf16", "int8"):
            wgt = w_bf16 if mode == "bf16" else w_i8
            jax.block_until_ready(run(wgt, scale, h0, mode, batch))
            best = float("inf")
            for _ in range(5):
                t0 = time.time()
                jax.block_until_ready(run(wgt, scale, h0, mode, batch))
                best = min(best, time.time() - t0)
            print(
                f"B={batch:3d} {mode}: {best / STEPS * 1e9:7.1f} ns/step",
                flush=True,
            )


if __name__ == "__main__":
    main()

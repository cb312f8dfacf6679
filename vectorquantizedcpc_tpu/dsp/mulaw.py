"""Mu-law companding.

Capability parity with the reference's mulaw_encode/mulaw_decode
(/root/reference/preprocess.py:20-35). Works on both numpy arrays and JAX
arrays (pure ``numpy``-API math via the array's own namespace).
"""

import numpy as np

import jax.numpy as jnp


def _xp(x):
    """Pick numpy or jax.numpy based on the input array type."""
    return jnp if isinstance(x, jnp.ndarray) else np


def mulaw_encode(x, mu: int):
    """Linear continuous [-1, 1] -> mu-law discrete [0, mu).

    Matches reference preprocess.py:20-27: quantization by
    ``floor((f(x) + 1) / 2 * (mu - 1) + 0.5)`` where ``f`` is the mu-law
    compressor. Returns integer codes in ``[0, mu - 1]``.
    """
    xp = _xp(x)
    m = mu - 1
    fx = xp.sign(x) * xp.log1p(m * xp.abs(x)) / xp.log1p(m)
    return xp.floor((fx + 1) / 2 * m + 0.5).astype(xp.int32)


def mulaw_to_float(y, mu: int):
    """Discrete mu-law code [0, mu) -> float mu-law representation [-1, 1]."""
    xp = _xp(y)
    m = mu - 1
    return 2 * y.astype(xp.float32) / m - 1.0


def mulaw_decode(y, mu: int):
    """Mu-law [-1, 1] (float) or [0, mu) (integer codes) -> linear [-1, 1].

    Matches reference preprocess.py:30-35 for float input; integer input is
    first mapped to the float mu-law domain (the inverse of the quantization
    in :func:`mulaw_encode`).
    """
    xp = _xp(y)
    if xp.issubdtype(y.dtype, xp.integer):
        y = mulaw_to_float(y, mu)
    m = mu - 1
    return xp.sign(y) / m * ((1 + m) ** xp.abs(y) - 1)

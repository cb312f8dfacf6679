"""Fused VQ nearest-neighbour Pallas kernel.

Reference math: squared-L2 argmin over the 512-entry codebook
(reference model.py:103-115,126-131). The XLA path (models/vq.py)
materializes the (N, 512) distance matrix to HBM between the matmul and the
argmin; this kernel keeps the codebook + the distance tile in VMEM, fusing

    scores = x @ e^T  (MXU)  ->  dist = |e|^2 - 2*scores  (VPU)
    -> argmin over codes     ->  quantized = onehot(idx) @ e  (MXU)

per N-tile in one pass. Note |x|^2 is constant across codes, so it cannot
change the argmin and is omitted — indices are exactly the reference's
(ties resolve to the lowest index in both, since argmin is first-match).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vq_kernel(x_ref, e_ref, idx_ref, q_ref, *, n_codes: int):
    x = x_ref[:].astype(jnp.float32)  # (TILE_N, D)
    e = e_ref[:].astype(jnp.float32)  # (M, D)

    scores = jnp.dot(x, e.T, preferred_element_type=jnp.float32)  # (TILE_N, M)
    e_sq = jnp.sum(e * e, axis=1)  # (M,)
    dist = e_sq[None, :] - 2.0 * scores

    idx = jnp.argmin(dist, axis=-1).astype(jnp.int32)  # (TILE_N,)
    # 2-D (TILE_N, 1) output: Mosaic's layout for 1-D s32 blocks disagrees
    # with XLA's tiling choice on real TPUs (observed: XLA {0:T(1024)} vs
    # Mosaic {0:T(512)} -> compile failure); 2-D avoids the mismatch.
    idx_ref[:] = idx[:, None]

    onehot = (
        idx[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, n_codes), 1)
    ).astype(jnp.float32)
    q_ref[:] = jnp.dot(onehot, e, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def vq_encode_fused(
    embedding: jax.Array,  # (M, D)
    x_flat: jax.Array,  # (N, D)
    tile_n: int = 512,
    interpret: bool = False,
):
    """(indices (N,), quantized (N, D)) — fused distance+argmin+lookup."""
    n, d = x_flat.shape
    m = embedding.shape[0]

    n_pad = -(-n // tile_n) * tile_n
    x_padded = jnp.pad(x_flat, ((0, n_pad - n), (0, 0))) if n_pad != n else x_flat

    grid_spec = pl.GridSpec(
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # codebook resident
        ],
        out_specs=(
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    )
    idx, quantized = pl.pallas_call(
        functools.partial(_vq_kernel, n_codes=m),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x_padded, embedding)
    return idx[:n, 0], quantized[:n]

"""Named-sharding rules for parameter/optimizer/batch pytrees.

Path-pattern driven: every leaf of a train state (including the optimizer
moments, whose tree embeds the same parameter paths) gets a PartitionSpec
from its name + shape. Tensor-parallel choices (see SURVEY.md §2.8 and
BASELINE.md "codebook and vocoder weights tensor-sharded"):

- SegFC stack ``fc_w (4, C, C)``          -> shard output features (axis 2)
- conv kernel ``conv_w (K, I, O)``        -> shard output channels (axis 2)
- LSTM/GRU kernels ``wx/wh (D, G*H)``     -> shard the gate axis (axis 1)
  and their gate-sized biases            -> shard axis 0
- encoder projection ``out_w (C, Z)``     -> shard the CONTRACTING axis 0
  (z_dim=64 is too small to shard; XLA reduces partials with a psum)
- VQ codebook + EMA stats ``(M, D)/(M,)`` -> shard codes (axis 0): the
  distance matrix partitions over codes, argmin finishes with a cheap
  cross-shard min-reduce
- vocoder AR GRU / FC / embeddings        -> same rules via wx/wh/fc names
- CPC predictors (12, C, Z)               -> replicated (tiny)
- LayerNorm scales/biases, scalars        -> replicated
- batch (S, U, F, T) / (B, ...)           -> shard the leading axis on data

All rules degrade to replication when the axis size does not divide the
mesh axis (guard for tiny test configs).
"""

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def _spec_for(path: str, shape) -> P:
    ndim = len(shape)
    if ndim == 0:
        return P()
    # VQ codebook state: shard the code axis.
    if re.search(r"\.(embedding|ema_count|ema_weight)$", path) and "vq" in path:
        return P(MODEL_AXIS, *([None] * (ndim - 1)))
    # Recurrent kernels / stacked FC kernels: shard the last (gate/output)
    # feature axis.
    if re.search(r"\.(wx|wh|fc_w|conv_w|fc1_w|fc2_w)$", path):
        return P(*([None] * (ndim - 1)), MODEL_AXIS)
    # Gate-sized biases accompany the kernels' column sharding.
    if re.search(r"\.(b|bx|bh|fc1_b|fc2_b)$", path) and ndim == 1:
        return P(MODEL_AXIS)
    # Encoder output projection: shard the contracting axis (rows).
    if re.search(r"\.out_w$", path):
        return P(MODEL_AXIS, None)
    return P()


def _divisible(spec: P, shape, mesh: Mesh) -> P:
    """Replace axes that don't divide evenly with replication."""
    fixed = []
    for dim, axis in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axis is None:
            fixed.append(None)
        else:
            size = mesh.shape[axis]
            fixed.append(axis if dim % size == 0 else None)
    while fixed and fixed[-1] is None:  # normalize: P(None,..) == P()
        fixed.pop()
    return P(*fixed)


def state_shardings(mesh: Mesh, state_template: Any) -> Any:
    """NamedSharding pytree for a train state (works on shapes or arrays)."""

    def leaf_sharding(path, leaf):
        name = jax.tree_util.keystr(path)
        shape = getattr(leaf, "shape", ())
        spec = _divisible(_spec_for(name, shape), shape, mesh)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, state_template)


def batch_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard the batch/speaker axis ``axis`` over the data axis (for epoch
    tensors (N_steps, S, U, F, T) pass axis=1: axis 0 is the scan axis)."""
    spec = [None] * ndim
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_tree(tree: Any, shardings: Any) -> Any:
    return jax.device_put(tree, shardings)

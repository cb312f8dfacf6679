"""Device mesh construction and multi-host initialization.

The reference is strictly single-process/single-GPU (SURVEY.md §2.8), so
this layer is a new first-class component: a (data, model) mesh over which
the CPC batch shards on its speaker axis (DP) and the wide parameters
(SegFC 512x512 stack, LSTM/GRU gate matrices, vocoder weights) shard on
their output feature axes (TP). XLA inserts the collectives — all-gather /
reduce-scatter of matmul partials over ICI within a slice, psum of DP
gradients over DCN across hosts.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = 1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh from the available devices.

    ``data * model`` must divide the device count; extra devices are left
    unused (explicitly erroring instead would make single-chip defaults
    awkward). Device order follows jax.devices(), which enumerates ICI
    neighbours adjacently, so the contiguous ``model`` axis rides ICI.
    """
    if devices is None:
        devices = jax.devices()
    n = data * model
    if len(devices) < n:
        raise ValueError(
            f"Mesh ({data} x {model}) needs {n} devices, found {len(devices)}"
        )
    grid = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (jax.distributed). No-op when single-process.

    On TPU pods the arguments are auto-detected from the environment; on
    other platforms pass them explicitly.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

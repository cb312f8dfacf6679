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
    platform: Optional[str] = None,
) -> None:
    """Multi-host bring-up (jax.distributed). No-op when single-process.

    On TPU pods the arguments are auto-detected from the environment (call
    with no arguments); for explicit clusters pass all three. Wired to the
    ``runtime.coordinator_address`` / ``num_processes`` / ``process_id``
    config keys via configs.apply_runtime(), which every CLI calls before
    first device use.

    On the CPU platform (multi-process integration tests, SURVEY.md §4)
    cross-process collectives need the gloo transport; it is enabled here
    because the flag only takes effect before backend init.
    """
    if not (num_processes is not None and num_processes > 1
            or coordinator_address):
        return
    if platform == "cpu":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    explicit = all(
        v is not None for v in (coordinator_address, num_processes, process_id)
    )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        # Explicit clusters must not fall back to TPU-pod autodetection.
        **({"cluster_detection_method": "deactivate"} if explicit else {}),
    )


def mesh_from_conf(runtime) -> Optional[Mesh]:
    """(data, model) mesh from runtime.mesh_data/mesh_model; None if 1x1.

    The single shared entry point both trainers (training/cpc.py,
    training/vocoder.py) use, so TP'd training is reachable from every
    public CLI with the same two config keys.
    """
    if runtime.mesh_data * runtime.mesh_model > 1:
        mesh = make_mesh(runtime.mesh_data, runtime.mesh_model)
        print(f"Mesh: data={runtime.mesh_data} model={runtime.mesh_model}")
        return mesh
    return None


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

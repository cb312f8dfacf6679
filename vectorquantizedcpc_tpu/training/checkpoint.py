"""Checkpointing: single-file msgpack trees for params + optimizer + EMA state.

TPU-native equivalent of the reference's two checkpoint schemes
(SURVEY.md §5.4): the CPC trainer's manual
``{encoder, cpc, optimizer, scheduler, epoch}`` dict saved as
``model.ckpt-{epoch}.pt`` (reference train_cpc.py:17-33) and the vocoder's
Lightning ``last.ckpt`` layout (reference train_vocoder.py:66-71,96-134).

Format: ``flax.serialization`` msgpack bytes of the full state tree, one
atomic file per checkpoint named ``model.ckpt-<step>`` — restored into typed
templates so downstream code gets real dataclasses back. (Orbax was measured
at 30-130 s per tiny tree in this environment — tensorstore's many-small-
files layout interacts badly with this filesystem — so msgpack it is: one
bulk D2H transfer + one sequential write, ~milliseconds.)

A PyTorch -> JAX importer for reference checkpoints lives in
``torch_import.py`` (parity testing without retraining).
"""

import os
import re
from pathlib import Path
from typing import Any, Optional, Union

import jax
from flax import serialization


_CKPT_RE = re.compile(r"model\.ckpt-(\d+)$")


_PACKER_CACHE: dict = {}


def bulk_device_get(tree: Any) -> Any:
    """Fetch a pytree with ONE compiled packing step + few D2H transfers.

    Two pathologies of the tunneled TPU backend are avoided here:
    (a) each *eager* op compiles remotely with seconds of latency, so the
    ravel+concat packing runs inside a single jitted function (compiled once
    per tree signature, cached); (b) per-device_get calls suffer sporadic
    multi-second stalls, so all leaves are packed into one buffer per dtype
    and fetched in a single device_get. Non-array leaves pass through.
    """
    import jax.numpy as jnp
    import numpy as np

    leaves, treedef = jax.tree.flatten(tree)
    dev_idx = [i for i, l in enumerate(leaves) if isinstance(l, jax.Array)]
    if not dev_idx:
        return tree

    sig = (
        treedef,
        tuple((leaves[i].shape, jnp.dtype(leaves[i].dtype).name) for i in dev_idx),
    )
    cached = _PACKER_CACHE.get(sig)
    if cached is None:
        groups: dict = {}
        for i in dev_idx:
            groups.setdefault(jnp.dtype(leaves[i].dtype).name, []).append(i)

        def pack(dev_leaves):
            by_dt = {}
            for dt, idxs in groups.items():
                parts = [dev_leaves[dev_idx.index(i)].ravel() for i in idxs]
                by_dt[dt] = (
                    parts[0] if len(parts) == 1 else jnp.concatenate(parts)
                )
            return by_dt

        cached = (jax.jit(pack), groups)
        _PACKER_CACHE[sig] = cached
    packer, groups = cached

    host = jax.device_get(packer([leaves[i] for i in dev_idx]))

    out = list(leaves)
    for dt, idxs in groups.items():
        flat = host[dt]
        offset = 0
        for i in idxs:
            n = int(np.prod(leaves[i].shape, dtype=np.int64))
            out[i] = flat[offset : offset + n].reshape(leaves[i].shape)
            offset += n
    return jax.tree.unflatten(treedef, out)


def save_checkpoint(checkpoint_dir: Union[str, Path], step: int, tree: Any) -> Path:
    """Save a pytree (may contain flax.struct dataclasses) at ``step``.

    Number in the filename is the epoch/step, mirroring the reference's
    ``model.ckpt-{epoch}.pt`` naming (train_cpc.py:31). The write is atomic
    (tmp file + rename) so a preempted save never corrupts a checkpoint.
    """
    checkpoint_dir = Path(checkpoint_dir)
    checkpoint_dir.mkdir(parents=True, exist_ok=True)
    path = checkpoint_dir / f"model.ckpt-{step}"
    # One bulk D2H transfer; serialization then runs on host numpy.
    host_tree = bulk_device_get(tree)
    data = serialization.to_bytes(host_tree)
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


class AsyncCheckpointer:
    """Overlap checkpoint D2H + serialization + disk write with training.

    :meth:`save` dispatches an on-device copy of the tree (async, ~HBM
    bandwidth) and returns immediately; a writer thread then fetches and
    writes while the main thread keeps dispatching train steps (SURVEY.md
    §5.3 "async checkpointing"). The copy is essential, not an
    optimization: the jitted train steps DONATE their state buffers, so a
    writer still holding the live tree would read deleted arrays — the
    copy is enqueued before the next donation in program order, so it
    always snapshots consistent values. At most one write is in flight —
    a new save first joins the previous one, bounding host memory at ~one
    checkpoint. Writer errors surface at the next save/wait call instead
    of being swallowed.
    """

    def __init__(self) -> None:
        self._thread: Optional["threading.Thread"] = None
        self._error: Optional[BaseException] = None
        self._last_path: Optional[Path] = None

    def save(self, checkpoint_dir: Union[str, Path], step: int, tree: Any) -> None:
        import threading

        import jax.numpy as jnp

        self.wait()
        snapshot = jax.tree.map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, tree
        )

        def write() -> None:
            try:
                self._last_path = save_checkpoint(
                    checkpoint_dir, step, snapshot
                )
            except BaseException as e:  # surfaced on the next save/wait
                self._error = e

        self._thread = threading.Thread(
            target=write, name=f"ckpt-writer-{step}", daemon=True
        )
        self._thread.start()

    def wait(self) -> Optional[Path]:
        """Block until the in-flight write (if any) lands; return its path."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err
        return self._last_path


def restore_checkpoint(path: Union[str, Path], template: Any) -> Any:
    """Restore into the structure/dtypes of ``template`` (same pytree shape)."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


def latest_checkpoint(checkpoint_dir: Union[str, Path]) -> Optional[Path]:
    """Highest-step ``model.ckpt-*`` under ``checkpoint_dir`` (auto-resume;
    reference train_vocoder.py:117-134 resumes iff last.ckpt exists)."""
    checkpoint_dir = Path(checkpoint_dir)
    if not checkpoint_dir.exists():
        return None
    best, best_step = None, -1
    for p in checkpoint_dir.iterdir():
        m = _CKPT_RE.search(p.name)
        if m and int(m.group(1)) > best_step:
            best, best_step = p, int(m.group(1))
    return best

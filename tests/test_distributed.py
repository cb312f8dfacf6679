"""2-process jax.distributed integration test (SURVEY.md §5.8).

Launches two real OS processes that form a CPU cluster (local coordinator,
gloo collectives) through the PUBLIC config surface
(runtime.coordinator_address / num_processes / process_id -> apply_runtime)
and run one globally-sharded (data=2, model=2) CPC train step each. Both
must agree bit-for-bit on the replicated metrics — the gradient psum and
TP collectives crossed the process boundary.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

_WORKER = Path(__file__).parent / "distributed_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train_step():
    port = _free_port()
    env = dict(os.environ)
    # The workers pick platform/device-count via runtime.* config keys
    # (jax.config); a conflicting XLA_FLAGS device-count force would win.
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    # The worker must import the package regardless of whether it was
    # pip-installed into the interpreter running pytest (CI venvs differ).
    repo_root = str(Path(__file__).resolve().parents[1])
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, env.get("PYTHONPATH")) if p
    )

    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), str(pid), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))

    by_pid = {o["pid"]: o for o in outs}
    assert set(by_pid) == {0, 1}
    for o in outs:
        assert o["processes"] == 2
        assert o["devices"] == 4
        assert np.isfinite(o["loss"])
    # Replicated metrics must be identical across processes — the DP psum
    # and TP collectives actually crossed the process boundary.
    assert by_pid[0]["loss"] == by_pid[1]["loss"]
    assert by_pid[0]["perplexity"] == by_pid[1]["perplexity"]

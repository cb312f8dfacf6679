"""Device-trace profile of the CPC whole-epoch train scan.

The tunneled chip adds ~3-4 ms of dispatch latency per call, so host-side
micro-timings (benchmarks/profile_cpc.py) cannot resolve sub-ms stages.
This captures an xprof trace of ONE 50-step epoch dispatch and aggregates
device-lane op durations from the perfetto trace JSON, printing the top
ops — the ground truth for where the 4-5 ms CPC step actually goes.
"""
import glob
import gzip
import json
import os
import tempfile
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp


def aggregate(trace_dir, top=40):
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # Device lanes: process names containing "TPU" (not the python host).
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items() if "TPU" in n or "/device" in n}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    wall = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e["name"].split(".")[0]
            tot[name] += e.get("dur", 0.0)
            cnt[name] += 1
            wall += e.get("dur", 0.0)
    print(f"total device op-time: {wall/1e3:.2f} ms  (pids: "
          f"{[pid_name[p] for p in dev_pids]})")
    for name, d in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{d/1e3:9.3f} ms  x{cnt[name]:<5d} {name}")


def main():
    _ = jax.device_get(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    print("warmup done", flush=True)
    from vectorquantizedcpc_tpu.configs import load_conf
    from vectorquantizedcpc_tpu.training.cpc import (
        init_train_state, make_train_epoch,
    )

    conf = load_conf([])
    tc = conf.training.cpc
    rng = np.random.default_rng(0)
    n_batches = 50
    epoch_mels = jnp.asarray(
        rng.normal(
            size=(n_batches, tc.n_speakers_per_batch,
                  tc.n_utterances_per_speaker, 80,
                  conf.data.dataset.cpc.clip_length_mel)
        ).astype(np.float32)
    )
    state = init_train_state(conf, jax.random.key(0))
    train_epoch = make_train_epoch(conf)
    state, m = train_epoch(state, epoch_mels, np.float32(4e-4))
    jax.block_until_ready(m["loss"])
    print("compiled; tracing one epoch", flush=True)

    out_dir = tempfile.mkdtemp(prefix="xprof_cpc_")
    jax.profiler.start_trace(out_dir)
    state, m = train_epoch(state, epoch_mels, np.float32(4e-4))
    jax.block_until_ready(m["loss"])
    jax.profiler.stop_trace()
    print(f"trace in {out_dir}", flush=True)
    aggregate(out_dir)


if __name__ == "__main__":
    main()

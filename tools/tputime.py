"""Device-time measurement via the JAX profiler (wall clock over the axon
tunnel is dispatch-dominated and unreliable for sub-ms ops)."""
import collections
import glob
import gzip
import json
import os
import tempfile

import jax

__all__ = ["device_time_ms", "device_top_ops"]


def _parse(trace_dir):
    f = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    ev = json.load(gzip.open(f))
    pid_names = {e["pid"]: e["args"].get("name", "") for e in ev["traceEvents"]
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    durs, cnts = collections.Counter(), collections.Counter()
    for e in ev["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e and "TPU" in pid_names.get(e["pid"], ""):
            durs[e["name"]] += e["dur"]
            cnts[e["name"]] += 1
    return durs, cnts


def device_time_ms(fn, *args, n=5):
    """Total device time per call of jitted fn (ms), from the top-level
    module event."""
    out = fn(*args)
    jax.block_until_ready(out)
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(n):
                out = fn(*args)
            jax.block_until_ready(out)
        durs, cnts = _parse(td)
    top = [(d, name) for name, d in durs.items() if name.startswith("jit")]
    if not top:
        return sum(durs.values()) / n / 1e3
    return max(top)[0] / n / 1e3


def device_top_ops(fn, *args, n=3, k=20):
    """[(ms_per_call, count_per_call, op_name)] sorted desc."""
    out = fn(*args)
    jax.block_until_ready(out)
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(n):
                out = fn(*args)
            jax.block_until_ready(out)
        durs, cnts = _parse(td)
    rows = [(d / n / 1e3, cnts[name] // n, name) for name, d in durs.most_common(k)]
    return rows

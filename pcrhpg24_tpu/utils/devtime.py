"""Device-time measurement via jax.profiler traces.

Wall-clock timing through the axon tunnel carries >=100 ms one-sided
dispatch jitter, which even min-of-N slope estimates fail to reject at
the ~1 ms scale.  `device_ms` instead captures a profiler trace of one
call and reads the duration of the outermost device event — the number
the hardware actually spent, immune to host/tunnel noise.  The TPU
analogue of the reference's GLTimerQueries (src/GLTimerQueries.cpp).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile


def _device_pids(events):
    pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            n = e.get("args", {}).get("name", "")
            if "TPU" in n or "/device:" in n or "TensorCore" in n:
                pids.add(e["pid"])
    return pids


def trace_jit_ms(root: str, prefix: str = "jit_") -> dict[str, float]:
    """Total duration (ms) per outermost jit_* device event in a trace."""
    cands = sorted(
        glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not cands:
        raise FileNotFoundError(f"no trace under {root}")
    with gzip.open(cands[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    pids = _device_pids(events)
    out: dict[str, float] = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in pids:
            continue
        name = e.get("name", "")
        if name.startswith(prefix):
            key = name.split("(")[0]
            out[key] = out.get(key, 0.0) + e.get("dur", 0) / 1e3
    return out


def device_ms(fn, *args, key: str | None = None, reps: int = 1) -> float:
    """Device ms of one traced call of an already-jitted `fn`.

    `key`: jit event name to read (default: jit_<fn name>).  When the
    traced program is called `reps` times, returns the total (caller
    divides).  fn must have been called once already (compiled).
    """
    import jax

    with tempfile.TemporaryDirectory() as d:
        with jax.profiler.trace(d):
            for _ in range(reps):
                out = fn(*args)
            jax.block_until_ready(out)
        times = trace_jit_ms(d)
    if key is None:
        key = "jit_" + getattr(fn, "__name__", getattr(
            getattr(fn, "__wrapped__", None), "__name__", ""))
    for k, v in times.items():
        if k == key or k.startswith(key):
            return v
    # fall back: the single largest jit event
    if times:
        return max(times.values())
    raise KeyError(f"no jit event matching {key!r}; saw {list(times)}")

"""XPlane trace parsing: per-XLA-module DEVICE execution times.

The benchmark's wall clocks include dispatch latency through the axon
tunnel (~100 ms/10 MB), so round-over-round comparisons of wall numbers
confound chip capability with tunnel weather (VERDICT r2 item 2).  This
module extracts the ground truth from a ``jax.profiler`` trace: the
device plane's "XLA Modules" line carries one event per executable
dispatch with its on-device duration.

Usage::

    with jax.profiler.trace(log_dir):
        run()                      # must SYNC before the trace closes
    times = module_device_times(log_dir)   # {"jit_train_step": [0.24..]}

Parsing uses the XSpace protobuf bundled with tensorflow
(``tensorflow.tsl.profiler.protobuf.xplane_pb2``); import is deferred and
failures degrade to ``{}`` so the benchmark still reports wall numbers on
hosts without tensorflow.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List


def _newest_xspace(log_dir: str):
    """Newest ``*.xplane.pb`` under ``log_dir`` parsed into an XSpace."""
    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return None
    path = max(paths, key=os.path.getmtime)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace


def module_device_times(log_dir: str) -> Dict[str, List[float]]:
    """Map XLA module name -> list of device execution durations (sec).

    Reads every device plane's "XLA Modules" line (TPU planes are named
    like ``/device:TPU:0``; the CPU backend emits the same structure).
    Module names keep their fingerprint suffix stripped up to the first
    ``(`` so e.g. ``jit_train_step(fingerprint)`` groups as
    ``jit_train_step``.
    """
    try:
        xspace = _newest_xspace(log_dir)
    except Exception:
        return {}
    if xspace is None:
        return {}
    out: Dict[str, List[float]] = {}
    for plane in xspace.planes:
        if "host" in plane.name.lower():
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Modules":
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                name = name.split("(", 1)[0]
                out.setdefault(name, []).append(ev.duration_ps * 1e-12)
    return out


def min_module_time(times: Dict[str, List[float]], substr: str
                    ) -> float | None:
    """Min device time over dispatches of the module whose name contains
    ``substr`` (min = the contention-free capability number), or None."""
    durs = [d for name, ds in times.items() if substr in name for d in ds]
    return min(durs) if durs else None

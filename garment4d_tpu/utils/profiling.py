"""Tracing / profiling utilities.

The reference has a single ad-hoc wall-clock timer around the LBS call
(`modules/mesh_encoder.py:434-441`, SURVEY.md section 5). Here profiling is a
first-class subsystem: jax.profiler traces (viewable in TensorBoard /
Perfetto), per-step timers that force completion through the async dispatch
queue, and a trace summariser that aggregates device time per op kind.
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import re
import time
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (xplane + trace.json.gz) into log_dir."""
    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Wall-clock step timer that forces async completion via a tiny host
    fetch (block_until_ready is unreliable through some PJRT transports)."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, sync_array=None):
        t0 = time.perf_counter()
        holder = {}

        def sync(x):
            holder["x"] = x

        yield sync
        x = holder.get("x", sync_array)
        if x is not None:
            leaf = jax.tree_util.tree_leaves(x)[0]
            np.asarray(jnp.ravel(leaf)[0])
        self.times.append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        arr = np.asarray(self.times[1:] or self.times)  # drop compile step
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "steps": len(self.times),
        }


def summarize_trace(log_dir: str, top: int = 15) -> Dict[str, float]:
    """Aggregate device time (ms) per HLO op kind from the newest trace."""
    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return {}
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    groups: Dict[str, float] = collections.Counter()
    for e in data.get("traceEvents", []):
        name = e.get("name", "")
        dur = e.get("dur", 0)
        if re.fullmatch(r"[a-z_\-0-9\.]+", name) and dur:
            groups[name.split(".")[0]] += dur / 1e3
    return dict(collections.Counter(groups).most_common(top))

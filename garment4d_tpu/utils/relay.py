"""Transient-device-failure hardening for the axon TPU relay.

The relay between this host and the TPU chip can drop a request mid-flight:
a host fetch (`np.asarray(device_array)`) then raises
`jax.errors.JaxRuntimeError` with FAILED_PRECONDITION / INTERNAL even though
the program and its inputs are fine (observed killing the round-2 driver
bench, BENCH_r02.json). These helpers retry the *whole computation*, not just
the fetch: after a relay failure the device buffer may be unrecoverable, so
the compute thunk is re-dispatched from host-side inputs.
"""

from __future__ import annotations

import sys
import time
from typing import Callable, TypeVar

T = TypeVar("T")

# Substrings that mark a transient device/relay failure worth retrying (vs a
# programming error, which should surface immediately).
_TRANSIENT_MARKERS = (
    "FAILED_PRECONDITION",
    "FailedPrecondition",
    "DEADLINE_EXCEEDED",
    "UNAVAILABLE",
    "INTERNAL",
    "Socket closed",
    "transport",
)

# Deterministic failures that ALSO carry a transient-looking status code and
# must fail fast, never retry. The round-3 bench burned ~8 min/attempt
# retrying a Mosaic scoped-VMEM OOM that surfaced as `INTERNAL: ... HTTP 500`
# (VERDICT r3 weak #5): a kernel that does not fit VMEM will not fit on the
# next attempt either. Relay-side compile flakes (a bare HTTP 500 with none
# of these signatures, observed on the posed train-step compile,
# tools/train_synth.py) stay retryable.
_PERMANENT_MARKERS = (
    "Mosaic",                       # Mosaic lowering/compile errors
    "scoped vmem",                  # "exceeded scoped vmem limit"
    "Scoped allocation",
    "tpu_compile_helper",           # Mosaic backend-compiler crash
    "RESOURCE_EXHAUSTED",           # HBM/VMEM OOM is shape-deterministic
    "XlaRuntimeError: UNIMPLEMENTED",
)


def is_transient(err: BaseException) -> bool:
    msg = f"{type(err).__name__}: {err}"
    if any(m in msg for m in _PERMANENT_MARKERS):
        return False
    return any(m in msg for m in _TRANSIENT_MARKERS)


def call_with_retry(fn: Callable[[], T], *, attempts: int = 4,
                    delay_s: float = 5.0, label: str = "device op") -> T:
    """Run `fn` (dispatch + host fetch) with bounded retries on transient
    relay/device failures. Non-transient errors propagate immediately."""
    last: BaseException | None = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as err:  # noqa: BLE001 - classified below
            if not is_transient(err):
                raise
            last = err
            print(f"[relay] transient failure in {label} "
                  f"(attempt {i + 1}/{attempts}): {type(err).__name__}: "
                  f"{str(err)[:200]}", file=sys.stderr, flush=True)
            if i + 1 < attempts:
                time.sleep(delay_s * (i + 1))
    raise last  # type: ignore[misc]


def fetch_np(compute_fn: Callable[[], object], *, attempts: int = 4,
             delay_s: float = 5.0, label: str = "fetch"):
    """`np.asarray(compute_fn())` with the whole dispatch+fetch retried.

    `compute_fn` must be safe to re-run (pure function of host-side inputs);
    re-running it re-creates the device buffers a failed relay call may have
    poisoned."""
    import numpy as np

    def once():
        return np.asarray(compute_fn())

    return call_with_retry(once, attempts=attempts, delay_s=delay_s,
                           label=label)

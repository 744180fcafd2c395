"""Process pool for host-only (numpy, no-JAX) workers.

Collection workers (collect/window.py:run_detect) never touch the device —
they are pure host code. But on TPU pods the interpreter bootstrap itself can
be device-aware: this image's sitecustomize imports jax and registers the
PJRT backend in EVERY new python process whenever the device-pool env var is
set, costing ~2.1 s of pure import time per spawned worker (measured; a
clean interpreter + numpy is 0.33 s). With a spawn-context pool (required —
the parent has initialized JAX and is multithreaded, so fork can deadlock)
each worker pays that tax before its first window.

`host_only_pool` strips the device-discovery env vars from `os.environ` for
the duration of worker spawning, so children boot as plain CPython + numpy.
The parent's own environment is restored before returning; the parent's
device connection is untouched (its backend registered at its own startup).

Workers are force-spawned inside the clean-env scope: `spawn` snapshots the
environment when `Process.start()` runs, which `ProcessPoolExecutor` does
synchronously on submit while idle workers are scarce. If a future Python
changes that timing, stragglers merely spawn with the original env — a
performance miss, never a correctness one.
"""

from __future__ import annotations

import concurrent.futures
import multiprocessing
import os

# Env vars that make a fresh interpreter attach to the accelerator runtime.
_DEVICE_ENV_KEYS = ("PALLAS_AXON_POOL_IPS",)


def host_only_pool(max_workers: int) -> concurrent.futures.ProcessPoolExecutor:
    saved = {k: os.environ.pop(k)
             for k in _DEVICE_ENV_KEYS if k in os.environ}
    try:
        pool = concurrent.futures.ProcessPoolExecutor(
            max_workers=max_workers,
            mp_context=multiprocessing.get_context("spawn"))
        # one submit per worker: each sees no idle worker and starts a new
        # Process now, under the cleaned environment
        futures = [pool.submit(os.getpid) for _ in range(max_workers)]
        concurrent.futures.wait(futures, timeout=60)
        return pool
    finally:
        os.environ.update(saved)

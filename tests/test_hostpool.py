"""host_only_pool: collection workers must boot without the device runtime.

The image's sitecustomize imports jax + registers the PJRT backend in every
new interpreter when the device-pool env var is set (~2.1 s/worker);
host-only collection workers skip that (utils/hostpool.py).
"""

import os
import sys

from svision_tpu.utils.hostpool import host_only_pool

_KEY = "PALLAS_AXON_POOL_IPS"


def _worker_probe():
    return {
        "env_key_set": _KEY in os.environ,
        "jax_imported": "jax" in sys.modules,
        "pid": os.getpid(),
    }


def test_workers_boot_without_device_env(monkeypatch):
    monkeypatch.setenv(_KEY, "10.0.0.1")
    pool = host_only_pool(2)
    try:
        probes = [pool.submit(_worker_probe).result() for _ in range(4)]
    finally:
        pool.shutdown()
    assert all(not p["env_key_set"] for p in probes)
    # parent env restored
    assert os.environ[_KEY] == "10.0.0.1"


def test_workers_never_import_jax(monkeypatch):
    monkeypatch.delenv(_KEY, raising=False)
    pool = host_only_pool(1)
    try:
        probe = pool.submit(_worker_probe).result()
    finally:
        pool.shutdown()
    assert not probe["jax_imported"]
    assert probe["pid"] != os.getpid()


def test_pool_runs_collection_entry_points():
    """The real worker function must be importable/picklable under spawn."""
    from svision_tpu.cli import _collect_worker  # noqa: F401  (import only)
    pool = host_only_pool(2)
    try:
        assert pool.submit(os.getpid).result() > 0
    finally:
        pool.shutdown()

"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the distributed-test strategy from SURVEY.md §4(4): multi-chip sharding
is validated on host CPU devices; real-TPU runs happen in bench.py only.
"""
import os

# Force CPU: the harness exports JAX_PLATFORMS=axon (real TPU tunnel) and its
# sitecustomize re-forces the platform after jax import, so setting the env
# var is not enough — update the config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# Test tiers (pytest.ini): `-m smoke` = the <60 s per-commit gate — unit +
# kernel parity + one real CLI e2e (test_tabix::test_cli_bgzip_flag drives
# run_pipeline end to end). Everything else (TF byte-identity suites,
# multi-process launches, training) stays in the full tier.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

SMOKE_MODULES = {
    "test_annotation", "test_bam_io", "test_call_parity",
    "test_callset_cluster", "test_cluster", "test_collect_parity",
    "test_dotplot", "test_evaluate", "test_fast_inflate", "test_graph_parity",
    "test_graph_scale", "test_hashplot", "test_io_fuzz", "test_noise",
    "test_prefilter", "test_rasterize", "test_tabix", "test_truvari",
}


# individually heavy tests excluded from the smoke tier (they stay in the
# "not slow" pre-merge tier); keeps the cold-cache gate comfortably inside
# its 60 s budget on a 2-vCPU box
SMOKE_EXCLUDE = {"test_aggregate_parity"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in SMOKE_MODULES and item.name not in SMOKE_EXCLUDE:
            item.add_marker(pytest.mark.smoke)


# --- smoke-tier wall-clock budget (VERDICT r2 item 7) ----------------------
# The tier's promise is <60 s on a 2-vCPU box; enforce it so a creeping
# per-commit gate fails loudly instead of silently outgrowing its budget.
SMOKE_BUDGET_S = 60.0


def pytest_configure(config):
    import time
    # arm ONLY for the plain smoke tier: a substring test would also match
    # `-m "not smoke"` and fail green long-tier runs on the 60 s budget
    if (config.option.markexpr or "").strip() == "smoke":
        config._smoke_t0 = time.time()


def pytest_sessionfinish(session, exitstatus):
    import time
    t0 = getattr(session.config, "_smoke_t0", None)
    if t0 is not None and exitstatus == 0:
        elapsed = time.time() - t0
        if elapsed > SMOKE_BUDGET_S:
            print(f"\nFAIL: smoke tier took {elapsed:.1f}s "
                  f"> {SMOKE_BUDGET_S:.0f}s budget (pytest.ini promise)")
            session.exitstatus = 1

"""Honor JAX_PLATFORMS in environments whose site hooks force a device
backend.

Some TPU-pool images install a sitecustomize that registers the accelerator
PJRT plugin in EVERY python process and force-selects it via
`jax.config.update("jax_platforms", ...)` — which silently overrides the
user's `JAX_PLATFORMS=cpu` (the config knob beats the env var once set).
A subprocess that was explicitly asked to run on CPU then attaches to the
device tunnel instead; two such processes sharing a single-tenant tunnel
deadlock in their first host<->device transfer.

Call this at process entry (before the first jax.devices()/jit) from every
CLI/main that may be launched as a worker subprocess."""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # jax absent or backend already initialized: nothing to fix

"""Persistent XLA compilation cache.

The fused encoder+CNN program costs 20-260 s to compile through the TPU
tunnel (the backend is shared, so compile latency is highly variable) while
executing in ~60 ms. The reference pays nothing here only because TF1 ships a
pre-built graph; for parity of *user experience* every svision-tpu entry
point enables JAX's persistent compilation cache so a program shape is
compiled once per machine, not once per run.

Opt out with SVISION_JAX_CACHE=none (or --jax-cache none on the CLI).
"""

from __future__ import annotations

import logging
import os

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "svision-tpu",
                        "jax")


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache. Returns the dir (or None
    when disabled). Safe to call before or after backend init, but must run
    before the first jit compilation to benefit it."""
    path = path or os.environ.get("SVISION_JAX_CACHE") or _DEFAULT
    if path.lower() == "none":
        return None
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even fast compiles: CPU-backend compiles of the big scan
        # program take ~4 s and are worth skipping on reruns too
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as exc:  # unwritable dir, unknown flag on old jax, ...
        logging.warning("persistent JAX cache disabled: %s", exc)
        return None
    return path

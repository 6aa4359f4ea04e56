"""Persistent XLA compilation cache.

On this platform a fresh XLA program costs ~20s-minutes to compile, so the
cache is the difference between a 30-minute and a 3-minute corpus sweep
re-run.  It is opt-in per entry point (bench.py, evaluate, CLI — the
device-bound paths) rather than global: CPU test runs would otherwise fill
it with host-specific AOT objects whose machine-feature stamps can differ
from the executing host (the cpu_aot_loader SIGILL warning).

A warm cache lives in the repo (.jax_cache) and ships with it.
"""

from __future__ import annotations

import os

import jax


def default_cache_dir() -> str:
    return os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point XLA's persistent compilation cache at the repo .jax_cache."""
    path = path or default_cache_dir()
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        return path
    except Exception:  # pragma: no cover - older jax without the knobs
        return None

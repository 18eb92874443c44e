"""Persistent XLA compilation cache helper.

First compiles on a TPU host take tens of seconds; enabling jax's
persistent cache makes every later process reuse them (the compile-time
analog of the artifact cache's serialized executables, which cover only
exact input shapes).

Measured caveat (2026-08-17): through the axon REMOTE-compile tunnel the
persistent cache does not help — compilation happens service-side
(second identical compile: 626 s vs 409 s first). On standard TPU VMs
with local compilation it behaves normally. Keep opt-in."""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/smelter_tpu/xla")
_enabled = False


def enable_compile_cache(directory: str | None = None) -> str:
    """Idempotently enable jax's persistent compilation cache."""
    global _enabled
    import jax

    directory = directory or os.environ.get("SMELTER_COMPILE_CACHE", _DEFAULT_DIR)
    os.makedirs(directory, exist_ok=True)
    if not _enabled:
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    return directory

"""Honor JAX platform env vars through jax.config (axon-plugin workaround).

Some PJRT plugin environments (the tunneled axon TPU plugin here) ignore
``JAX_PLATFORMS``/``JAX_PLATFORM_NAME`` and still run plugin discovery at
backend init — when the plugin's transport is down, EVERY fresh JAX
process blocks there, even one that asked for CPU. Setting the platform
list through ``jax.config`` before the first backend use skips foreign
plugin initialization entirely, so a CPU-forced CLI run (tests, dry runs,
host-only tooling) never depends on TPU reachability.

Called at the top of every CLI ``main()`` (train/evaluate/predict) and by
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import os

__all__ = ["honor_platform_env", "enable_compilation_cache"]


def honor_platform_env() -> None:
    """Apply JAX_PLATFORMS / JAX_PLATFORM_NAME via jax.config (no-op when
    unset or when the backend is already initialized)."""
    # JAX_PLATFORM_NAME first: plugin environments pre-export
    # JAX_PLATFORMS=<plugin> globally, so the legacy var is the only
    # channel a user has left to force CPU — it must win
    plat = os.environ.get("JAX_PLATFORM_NAME") or os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:
        # backend already initialized or unknown platform string: keep the
        # default behavior rather than failing the CLI
        pass


def enable_compilation_cache() -> None:
    """Turn on JAX's persistent compilation cache for CLI processes.

    Every CLI process compiles its programs fresh; through the tunneled
    chip a flagship compile costs minutes, and sweep tooling
    (tools/weak_ab.py, tools/quality_ab.py) launches dozens of CLI
    processes at identical shapes. The persistent cache keys serialized
    executables by HLO + compile options + backend, so repeat processes
    load in seconds instead. Opt out with JAX_COMPILATION_CACHE_DIR=""
    (empty); any non-empty value overrides the default directory.
    """
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    if not cache_dir:
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that takes meaningful compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags: run uncached

"""Persistent XLA compilation cache.

The flagship programs take minutes to compile (a 256px train step ~10 min
through the remote-TPU tunnel, ~4 min for the 64px CPU variant on this
1-CPU host), and the CLIs/tools/driver checks run in fresh processes.
Enabling jax's disk cache makes every rerun of an unchanged program a
cache hit. Keyed by HLO + compile options, so code changes naturally miss.

Set COCOSNET_COMPILATION_CACHE=0 to disable, or point
JAX_COMPILATION_CACHE_DIR somewhere persistent across machines.
"""

import os


def enable_compilation_cache() -> None:
    if os.environ.get("COCOSNET_COMPILATION_CACHE", "1") in ("0", "false"):
        return
    import jax
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass  # older jax or read-only fs: compilation just stays uncached

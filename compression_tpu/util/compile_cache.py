"""Persistent XLA compilation cache enabling that actually works here.

The axon sitecustomize imports jax into every process BEFORE user code
runs, so `os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ...)` in a
script is too late — jax's config already read the (absent) variable.
The round-4 discovery: the cache directory had never been created by
any bench run.  `jax.config.update` works at any time before the first
compilation; every bench/tool entry point calls `enable()`.

With the cache active, paper-scale model inits and the native coding
jits compile once per code version and replay from disk (~100 ms)
instead of re-paying minutes of remote XLA compile per process.
"""

import os

DEFAULT = os.path.expanduser("~/.cache/jax_comp_cache")


def enable(path: str | None = None, min_compile_secs: float = 0.5):
    """Points jax's persistent compilation cache at `path` (created on
    first write).  Safe to call multiple times."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path or DEFAULT)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs)

"""Persistent XLA compilation cache for the CLI entry points.

The reference pays zero compile cost (eager torch); under jit every
(shape, nf, rescale) bucket compiles once PER PROCESS — tens of seconds to
minutes at production shapes on this toolchain (DEVNOTES).  JAX's
persistent compilation cache turns that into a disk hit on every process
start after the first, which is the user-experience parity the reference
gets for free.

Enabled by default from every CLI entry point (``config.parse_cli``);
opt out with ``CERMVS_COMPILE_CACHE=0`` or point ``CERMVS_COMPILE_CACHE``
at a different directory.  Measured cold/warm numbers live in
BENCH_NOTES.md (round 5).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "cermvs_tpu", "xla")

_done = False


def setup_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Returns the directory in use, or None when disabled
    (``CERMVS_COMPILE_CACHE=0``).  Safe to call multiple times and before
    or after backend init (jax reads the config at compile time).
    """
    global _done
    env = os.environ.get("CERMVS_COMPILE_CACHE", "")
    if env in ("0", "off", "none"):
        return None
    cache_dir = cache_dir or (env if env else _DEFAULT_DIR)
    if _done:
        return cache_dir
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every entry (default skips tiny/fast compiles; process restarts
    # replay ALL buckets, so small entries add up through the tunnel too)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _done = True
    return cache_dir

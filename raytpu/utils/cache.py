"""Persistent XLA compilation cache.

Frame compiles over the dev-tunnel TPU take 3-10 minutes; the driver
bench recompiles the same six preset executables every run. Pointing
JAX's persistent compilation cache at a repo-local directory pulls those
repeat compiles out of every bench/CLI invocation (roadmap "bench
budget" item). The reference has no analog — Vulkan pipelines ship a
driver-managed pipeline cache implicitly (`/root/reference/src/main.cpp`
creates pipelines per run and relies on the ICD's own cache).

Call :func:`enable_compilation_cache` BEFORE the first ``jax.jit``
execution; enabling after traced executables exist only helps later
compiles. Safe to call on any backend (CPU tests simply cache locally);
failures (read-only filesystem, old jax) are non-fatal.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache; returns the directory
    actually used, or None if the cache could not be enabled.

    Default location is ``<repo>/.jaxcache`` (gitignored); override via
    the ``RAYTPU_JAX_CACHE`` env var (``0``/``off`` disables).
    """
    env = os.environ.get("RAYTPU_JAX_CACHE", "")
    if env.lower() in ("0", "off", "none"):
        return None
    d = cache_dir or env or os.path.join(_REPO_ROOT, ".jaxcache")
    try:
        import jax

        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # cache everything that took >1 s to compile, regardless of size
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return d
    except Exception:  # pragma: no cover - depends on jax version/fs
        return None

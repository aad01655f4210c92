"""Per-machine JAX persistent-cache directory.

XLA:CPU AOT artifacts embed the compile machine's CPU feature set but
the persistent cache key does NOT include it, so a cache written on a
host with different features (VM migration, heterogeneous CI) loads
binaries that can mis-execute — observed here as "Execution supplied
49 buffers but compiled program expected 533" and SIGILL-class
segfaults mid-suite.  Key the directory on the local cpuinfo flags so
every machine gets its own cache.
"""
from __future__ import annotations

import hashlib
import os
import platform


def jax_cache_dir(prefix: str = "/tmp/jax_cache_hmtpu") -> str:
    tag = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    tag = hashlib.md5(line.encode()).hexdigest()[:10]
                    break
    except OSError:
        pass
    return f"{prefix}_{tag}"


def set_default_env() -> str:
    """Point JAX_COMPILATION_CACHE_DIR at the per-machine dir unless
    the caller already chose one.  Returns the directory in effect."""
    d = os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                              jax_cache_dir())
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES",
                          "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                          "0.5")
    return d

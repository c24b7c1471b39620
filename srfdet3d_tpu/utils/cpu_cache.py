"""Machine-keyed persistent compile-cache directory for CPU runs.

XLA:CPU persists AOT-compiled executables keyed only by program, not by
host ISA; loading an entry written on a machine with different CPU
features logs "Machine type used for XLA:CPU compilation doesn't match
the machine type for execution ... could lead to execution errors such
as SIGILL".  The driver may run the CPU-forced multichip dryrun (and the
test suite) on a different machine than the one that populated the
cache, so the cache dir is suffixed with a hash of the host's CPU flags:
each machine gets its own entries and cross-machine AOT loads never
happen.

Kept dependency-free (stdlib only) so tests/conftest.py can use it before
jax initializes.
"""

from __future__ import annotations

import hashlib


def cpu_cache_suffix() -> str:
    """Short stable hash of the host CPU's feature flags ('' if unknown)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(
                        line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "unknown"

"""Host-CPU fingerprint for persistent-compile-cache keying.

XLA:CPU AOT executables are compiled against the build host's exact CPU
feature set; loading a cached executable on a host with different
features is undefined behavior (observed: hard SIGSEGV inside
``compilation_cache.get_executable_and_time`` when a container image
moved between machines with different AVX-512 subsets -- XLA itself only
logs a warning before crashing).  Keying the cache directory by a digest
of the CPU flags makes a foreign host a clean cache miss instead of a
crash.
"""

from __future__ import annotations

import hashlib

__all__ = ["cpu_cache_tag"]


def cpu_cache_tag() -> str:
    """Short digest of this host's CPU feature flags (and model name)."""
    try:
        flags = model = ""
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if not flags and ln.startswith("flags"):
                    flags = ln
                elif not model and ln.startswith("model name"):
                    model = ln
                if flags and model:
                    break
        return hashlib.sha256((model + flags).encode()).hexdigest()[:10]
    except OSError:  # non-Linux fallback: one shared bucket
        return "nohostid"

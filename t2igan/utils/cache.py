"""Persistent XLA compile cache: enablement + stale-entry validation.

The axon TPU relay costs minutes per remote compile, and the jax
persistent cache captures those server-side compiles (a warmed re-run of
the geneval graph compiles in ~21 s instead of ~11 min).  CPU compiles of
the full adversarial step are similarly expensive.  Every entry point
(root CLIs, bench.py, the multichip dryrun) should therefore call
:func:`enable_compile_cache` before building models.

Hazard handled here: the cache directory survives across rounds while the
executing host changes, and stale XLA:CPU AOT executables are loaded
despite machine-feature mismatches ("could lead to execution errors such
as SIGILL", cpu_aot_loader.cc).  :func:`validate_cache` purges exactly the
host-specific CPU AOT entries (classified by the embedded LLVM x86 feature
string) and keeps the host-independent TPU entries; a HOST.json
fingerprint marker makes the scan a no-op on an unchanged host.

Known cosmetic noise: cpu_aot_loader.cc also warns about ``+prefer-no-
scatter``/``+prefer-no-gather`` "features" on entries compiled on THIS
host — those are LLVM codegen tuning flags XLA adds at compile time, not
CPU ISA features, so the loader's host-feature probe never reports them.
Such warnings on an unchanged host (HOST.json fingerprint matches) do not
indicate a stale entry; the ISA feature sets in the message agree.
"""

from __future__ import annotations

import json
import os
from typing import Optional


def default_cache_dir() -> str:
    """``$T2IGAN_COMPILE_CACHE`` if set, else ``.jax_cache`` at the repo
    root (three levels above this file)."""
    env = os.environ.get("T2IGAN_COMPILE_CACHE")
    if env:
        return env
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, ".jax_cache")


def _host_fingerprint() -> str:
    """Stable fingerprint of this host's CPU ISA feature set."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(flags.encode()).hexdigest()[:16]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:16]


# Classifier markers: XLA:CPU AOT cache entries embed the compile machine's
# LLVM x86 feature string (the same one cpu_aot_loader.cc prints on
# mismatch); TPU executables never carry LLVM x86 feature syntax.
_CPU_AOT_MARKERS = (b"prefer-no-scatter", b"+sse2", b"+64bit")


def _entry_is_cpu_aot(path: str) -> bool:
    """True iff the (zstd-framed, jax default) cache entry embeds an LLVM
    x86 feature string — i.e. it is a host-specific XLA:CPU AOT result."""
    tail = b""
    overlap = max(len(m) for m in _CPU_AOT_MARKERS) - 1
    try:
        import zstandard as zstd

        with open(path, "rb") as f, \
                zstd.ZstdDecompressor().stream_reader(f) as r:
            while True:
                out = r.read(1 << 20)
                if not out:
                    break
                buf = tail + out
                if any(m in buf for m in _CPU_AOT_MARKERS):
                    return True
                tail = buf[-overlap:]
    except Exception:
        return False  # unreadable/other framing — assume portable, keep it
    return False


def validate_cache(cache_dir: Optional[str] = None) -> int:
    """Purge XLA:CPU AOT cache entries compiled on a different host.

    TPU/axon entries are host-independent and are KEPT (they hold the
    multi-minute remote compiles).  Returns the number of purged entries."""
    cache_dir = cache_dir or default_cache_dir()
    if not os.path.isdir(cache_dir):
        return 0
    marker = os.path.join(cache_dir, "HOST.json")
    fp = _host_fingerprint()
    try:
        with open(marker) as f:
            if json.load(f).get("fingerprint") == fp:
                return 0
    except (OSError, ValueError):
        pass
    purged = 0
    for name in os.listdir(cache_dir):
        if not name.endswith("-cache"):
            continue
        path = os.path.join(cache_dir, name)
        if _entry_is_cpu_aot(path):
            try:
                os.unlink(path)
                purged += 1
            except OSError:
                pass
    with open(marker, "w") as f:
        json.dump({"fingerprint": fp}, f)
    if purged:
        print(f"compile cache: purged {purged} stale XLA:CPU AOT entries "
              f"(host fingerprint changed)", flush=True)
    return purged


def enable_compile_cache(cache_dir: Optional[str] = None) -> str:
    """Validate + enable the persistent compile cache.  Safe to call more
    than once; returns the cache directory in use."""
    import jax

    cache_dir = cache_dir or default_cache_dir()
    validate_cache(cache_dir)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    return cache_dir

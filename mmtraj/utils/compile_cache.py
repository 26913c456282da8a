"""Persistent XLA compilation cache (VERDICT r3 next-round #3).

Cold-start compile is the dominant fixed cost of every mmtraj surface on the
real chip: the flagship full-unroll eval program paid 808 s in BENCH_r03, the
S=5 population program ~300 s, the oversample export lowering ~210 s.  JAX's
persistent compilation cache amortizes all of that across processes — but on
this machine it CANNOT be enabled via environment variables from inside a
script: the axon sitecustomize imports jax at interpreter startup (to register
the TPU PJRT plugin), so `JAX_COMPILATION_CACHE_DIR` set in a script body is
read too late and silently ignored.  `jax.config.update` after import works on
both the axon TPU backend and CPU (probe-verified this round: env-in-body →
no cache dir created; config.update → cache files written).

`enable_compile_cache()` is therefore the one supported way to turn the cache
on in-process, and every mmtraj entry point (CLI, bench.py, benchmarks) calls
it by default.  Users control it with the MMTRAJ_COMPILE_CACHE env var:

  unset / empty    → default dir  ~/.cache/mmtraj/xla  (created on demand)
  a path           → that directory
  "0"/"off"/"none" → disabled

The directory is size-bounded (VERDICT r4 #9): enable trims it to
MMTRAJ_COMPILE_CACHE_MAX_GB (default 4 GB) by evicting least-recently-used
entries first (mtime order — JAX's lru_cache layer touches entries on hit,
so mtime tracks recency).  `python -m mmtraj.cli cache [--clear|--trim-gb X]`
inspects and manages it by hand.

Reference counterpart: none — the reference is an eager CPU/GPU loop with no
compilation step (SURVEY.md §1 L0); this is a TPU-native runtime obligation.
"""

from __future__ import annotations

import os
from typing import Optional

_OFF = ("0", "off", "none", "false")

# Bounded-size policy (VERDICT r4 #9): every traced-graph-changing knob
# writes a new entry forever (the flagship eval program alone is ~10 MB),
# so enable_compile_cache() trims the directory to this cap, LRU by mtime,
# before handing it to JAX.  Override with MMTRAJ_COMPILE_CACHE_MAX_GB
# (a float; "0" / negative disables trimming).  4 GB holds ~400 flagship
# programs — far more than any round has ever compiled — while bounding a
# years-long accumulation.
_DEFAULT_MAX_GB = 4.0


def resolve_cache_dir(path: Optional[str] = None) -> Optional[str]:
    """Explicit arg > MMTRAJ_COMPILE_CACHE env > per-user default.

    Returns None when disabled (arg or env set to one of {0, off, none,
    false}, case-insensitive)."""
    if path is None:
        path = os.environ.get("MMTRAJ_COMPILE_CACHE") or None
    if path is not None and path.lower() in _OFF:
        return None
    if path is None:
        path = os.path.join(
            os.path.expanduser("~"), ".cache", "mmtraj", "xla")
    return path


def _entries(path: str) -> list:
    """Cache files under ``path`` (recursive) as (mtime, size, fullpath),
    oldest first.  Tolerates files vanishing mid-scan (concurrent trims)."""
    out = []
    for root, _dirs, files in os.walk(path):
        for name in files:
            fp = os.path.join(root, name)
            try:
                st = os.stat(fp)
            except OSError:
                continue
            out.append((st.st_mtime, st.st_size, fp))
    out.sort()
    return out


def cache_stats(path: Optional[str] = None) -> dict:
    """{dir, entries, total_bytes} for the resolved cache directory (which
    may not exist yet — then entries=0)."""
    resolved = resolve_cache_dir(path)
    if resolved is None or not os.path.isdir(resolved):
        return {"dir": resolved, "entries": 0, "total_bytes": 0}
    ents = _entries(resolved)
    return {"dir": resolved, "entries": len(ents),
            "total_bytes": sum(e[1] for e in ents)}


def trim_cache(path: Optional[str] = None,
               max_bytes: Optional[float] = None) -> tuple[int, int]:
    """Evict least-recently-used entries (by mtime — JAX's lru_cache touches
    entries on hit, so mtime IS recency) until the directory is under
    ``max_bytes``.  Returns (entries_removed, bytes_removed).

    ``max_bytes`` defaults to MMTRAJ_COMPILE_CACHE_MAX_GB (else 4 GB);
    ``max_bytes=0`` removes everything (clear)."""
    resolved = resolve_cache_dir(path)
    if resolved is None or not os.path.isdir(resolved):
        return 0, 0
    if max_bytes is None:
        gb = float(os.environ.get("MMTRAJ_COMPILE_CACHE_MAX_GB",
                                  _DEFAULT_MAX_GB))
        if gb <= 0:
            return 0, 0
        max_bytes = gb * 1e9
    ents = _entries(resolved)
    total = sum(e[1] for e in ents)
    removed_n = removed_b = 0
    for mtime, size, fp in ents:  # oldest first
        if total <= max_bytes:
            break
        try:
            os.remove(fp)
        except OSError:
            continue
        total -= size
        removed_n += 1
        removed_b += size
    return removed_n, removed_b


def clear_cache(path: Optional[str] = None) -> tuple[int, int]:
    """Remove every cache entry; returns (entries_removed, bytes_removed)."""
    return trim_cache(path, max_bytes=0)


def enable_compile_cache(path: Optional[str] = None,
                         min_compile_secs: float = 1.0) -> Optional[str]:
    """Enable JAX's persistent compilation cache in-process.

    Idempotent; safe before or after backend init.  Returns the resolved
    cache directory, or None if disabled.  min_compile_secs=1.0 skips
    caching trivial programs (the cache's own default of 1 s) — the
    programs that matter here compile in minutes.
    """
    resolved = resolve_cache_dir(path)
    if resolved is None:
        return None
    os.makedirs(resolved, exist_ok=True)
    # Bounded-size policy: evict LRU entries past the cap before JAX starts
    # writing.  A no-op scan when under the cap (the common case); set
    # MMTRAJ_COMPILE_CACHE_MAX_GB=0 to never trim.
    trim_cache(resolved)
    import jax

    jax.config.update("jax_compilation_cache_dir", resolved)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    # Cache regardless of how long ago the entry was written (the default
    # policy already does this; pinned explicitly so a jax upgrade changing
    # the default doesn't silently stop caching the long-compile programs).
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    if os.environ.get("MMTRAJ_EXPLAIN_CACHE_MISSES", "").lower() in (
            "1", "true", "yes", "on"):
        # Debug aid: XLA logs WHY a lookup missed (which key component
        # changed) and the cache layer logs hits/writes.  Costs nothing when
        # off; indispensable when a program that "should" hit recompiles.
        import logging

        jax.config.update("jax_explain_cache_misses", True)
        for name in ("jax._src.compilation_cache", "jax._src.compiler",
                     "jax._src.lru_cache", "jax._src.cache_key"):
            lg = logging.getLogger(name)
            lg.setLevel(logging.DEBUG)
            if not lg.handlers:
                lg.addHandler(logging.StreamHandler())
    return resolved

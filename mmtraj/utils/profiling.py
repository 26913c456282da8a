"""Tracing/profiling hooks (SURVEY.md §5: jax.profiler around the step fn).

`trace_ctx` wraps any region in a jax.profiler trace that can be opened in
TensorBoard/XProf (`xplane.pb` under {out_dir}/profile); `annotate` names
regions inside a trace.  Debug aids: `enable_nan_debugging` flips the jax
NaN-checker (use for diagnosis only — it forces per-op sync), and
`assert_finite_tree` is a chex-based pytree guard usable in tests and debug
runs.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional


@contextlib.contextmanager
def trace_ctx(out_dir: Optional[str], enabled: bool = True) -> Iterator[None]:
    """Profile the enclosed region to {out_dir}/profile when enabled."""
    if not (enabled and out_dir):
        yield
        return
    import jax

    logdir = os.path.join(out_dir, "profile")
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    """Named sub-region inside a trace (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def enable_nan_debugging() -> None:
    """Raise on the first NaN produced by any jitted op (slow; debug only)."""
    import jax

    jax.config.update("jax_debug_nans", True)


def assert_finite_tree(tree, label: str = "tree") -> None:
    """chex assertion that every leaf is finite (debug/test utility); the
    failure names ``label`` and chex's whole-tree message names the leaf
    path."""
    import chex

    try:
        chex.assert_tree_all_finite(tree)
    except AssertionError as e:
        raise AssertionError(f"non-finite values in {label}: {e}") from e


def summarize_trace(trace_dir: str, top: int = 15):
    """Parse a jax.profiler trace offline and return device-time op stats.

    Reads the ``*.xplane.pb`` under ``trace_dir`` (as written by `trace_ctx`
    or ``cli train --profile``) with the xprof converter — no TensorBoard UI
    needed; this machine has no browser.  Returns
    ``(by_category, top_ops)``: totals in microseconds by HLO op category,
    and the ``top`` individual ops as (time_us, category, name, occurrences).
    Degrades to (None, None) if xprof is unavailable.
    """
    import glob
    import json as _json
    from collections import defaultdict

    try:
        from xprof.convert import raw_to_tool_data as _r2t
    except ImportError:
        return None, None
    xplanes = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                               recursive=True))
    if not xplanes:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir!r}")
    data, _ = _r2t.xspace_to_tool_data([xplanes[-1]], "hlo_stats", {})
    d = _json.loads(data if isinstance(data, str) else data.decode())
    cols = [c["id"] for c in d["cols"]]
    i_cat, i_name = cols.index("category"), cols.index("hlo_op_name")
    i_occ, i_tot = cols.index("occurrences"), cols.index("total_time")
    rows = []
    for r in d["rows"]:
        v = [c["v"] for c in r["c"]]
        rows.append((float(v[i_tot]), str(v[i_cat]), str(v[i_name]), int(v[i_occ])))
    rows.sort(reverse=True)
    by_cat = defaultdict(float)
    for t, cat, _, _ in rows:
        by_cat[cat] += t
    return dict(sorted(by_cat.items(), key=lambda x: -x[1])), rows[:top]


def print_trace_summary(trace_dir: str, top: int = 15) -> None:
    """Human-readable version of `summarize_trace` (used by `cli profile-stats`)."""
    by_cat, rows = summarize_trace(trace_dir, top)
    if by_cat is None:
        print("xprof is not installed; cannot parse traces offline")
        return
    total = sum(by_cat.values()) or 1.0
    print(f"device time by HLO category ({total:,.0f} us total):")
    for cat, t in by_cat.items():
        print(f"  {t:12,.0f} us {100 * t / total:5.1f}%  {cat}")
    print(f"top {len(rows)} ops:")
    for t, cat, name, occ in rows:
        print(f"  {t:10,.0f} us {100 * t / total:4.1f}% x{occ:<5d} [{cat}] {name}")

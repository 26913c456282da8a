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
    """chex assertion that every leaf is finite (debug/test utility)."""
    import chex
    import jax

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        chex.assert_tree_all_finite(leaf)

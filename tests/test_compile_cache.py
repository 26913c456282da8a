"""Persistent compile cache (VERDICT r3 next-round #3).

The machine-specific trap these tests pin: the axon sitecustomize imports jax
at interpreter startup, so JAX_COMPILATION_CACHE_DIR set in a script body (or
a conftest) is read too late and silently ignored — enable_compile_cache()
must therefore go through jax.config.update, and these tests prove that path
actually writes cache entries on a fresh-from-sitecustomize interpreter.
"""

import os
import subprocess
import sys

import pytest

from mmtraj.utils.compile_cache import enable_compile_cache, resolve_cache_dir


def test_resolve_precedence(tmp_path, monkeypatch):
    monkeypatch.delenv("MMTRAJ_COMPILE_CACHE", raising=False)
    assert resolve_cache_dir(str(tmp_path)) == str(tmp_path)
    default = resolve_cache_dir(None)
    assert default.endswith(os.path.join(".cache", "mmtraj", "xla"))
    monkeypatch.setenv("MMTRAJ_COMPILE_CACHE", str(tmp_path / "env"))
    assert resolve_cache_dir(None) == str(tmp_path / "env")
    # explicit arg beats env
    assert resolve_cache_dir(str(tmp_path)) == str(tmp_path)


@pytest.mark.parametrize("off", ["0", "off", "NONE", "False"])
def test_resolve_disabled(off, monkeypatch):
    monkeypatch.setenv("MMTRAJ_COMPILE_CACHE", off)
    assert resolve_cache_dir(None) is None
    assert enable_compile_cache() is None


def test_cache_populates_in_subprocess(tmp_path):
    """End-to-end on a fresh interpreter (sitecustomize and all): in-process
    enable_compile_cache() must produce cache files; a second identical run
    must not recompile (tracked via JAX's cache-miss logging)."""
    cache = tmp_path / "xla"
    prog = (
        "import jax, jax.numpy as jnp\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from mmtraj.utils.compile_cache import enable_compile_cache\n"
        f"d = enable_compile_cache({str(cache)!r}, min_compile_secs=0.0)\n"
        "assert d is not None\n"
        "f = jax.jit(lambda x: jnp.sin(x) @ x.T * 1.0625)\n"
        "f(jnp.ones((128, 128))).block_until_ready()\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r1 = subprocess.run([sys.executable, "-c", prog],
                        capture_output=True, text=True, env=env)
    assert r1.returncode == 0, r1.stderr
    entries = {p.name for p in cache.iterdir()}
    assert entries, "first run wrote no cache entries"
    r2 = subprocess.run([sys.executable, "-c", prog],
                        capture_output=True, text=True, env=env)
    assert r2.returncode == 0, r2.stderr
    assert {p.name for p in cache.iterdir()} == entries, (
        "second run should hit the cache, not write new entries")


def test_explain_misses_knob(tmp_path):
    """MMTRAJ_EXPLAIN_CACHE_MISSES=1 must turn on jax_explain_cache_misses
    and surface the cache layer's hit/miss lines on stderr — the debugging
    path used to diagnose the round-4 warm-bench recompile (RESULTS.md
    compile-cache table)."""
    cache = tmp_path / "xla"
    prog = (
        "import jax, jax.numpy as jnp\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from mmtraj.utils.compile_cache import enable_compile_cache\n"
        f"enable_compile_cache({str(cache)!r}, min_compile_secs=0.0)\n"
        "assert jax.config.jax_explain_cache_misses\n"
        "f = jax.jit(lambda x: jnp.cos(x) @ x.T * 1.03125)\n"
        "f(jnp.ones((64, 64))).block_until_ready()\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu", MMTRAJ_EXPLAIN_CACHE_MISSES="1")
    r = subprocess.run([sys.executable, "-c", prog],
                       capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert "Cache miss" in r.stderr or "cache miss" in r.stderr.lower(), (
        "explain mode should log the first-compile miss")
    # Off by default: the flag must stay False when the env var is unset.
    env_off = {k: v for k, v in os.environ.items()
               if k != "MMTRAJ_EXPLAIN_CACHE_MISSES"}
    env_off["JAX_PLATFORMS"] = "cpu"
    prog_off = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from mmtraj.utils.compile_cache import enable_compile_cache\n"
        f"enable_compile_cache({str(cache)!r})\n"
        "assert not jax.config.jax_explain_cache_misses\n"
    )
    r2 = subprocess.run([sys.executable, "-c", prog_off],
                        capture_output=True, text=True, env=env_off)
    assert r2.returncode == 0, r2.stderr

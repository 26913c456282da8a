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


def test_stats_trim_clear_lru(tmp_path, monkeypatch):
    """Size management (VERDICT r4 #9): stats count every entry; trim evicts
    oldest-mtime first until under the cap; clear empties; enable() applies
    the MMTRAJ_COMPILE_CACHE_MAX_GB policy automatically."""
    import time

    from mmtraj.utils.compile_cache import (cache_stats, clear_cache,
                                            trim_cache)

    cache = tmp_path / "xla"
    cache.mkdir()
    monkeypatch.setenv("MMTRAJ_COMPILE_CACHE", str(cache))
    now = time.time()
    for i in range(5):  # entry i: 1000 bytes, older i = older mtime
        p = cache / f"entry{i}"
        p.write_bytes(b"x" * 1000)
        os.utime(p, (now - 100 + i, now - 100 + i))

    s = cache_stats()
    assert (s["entries"], s["total_bytes"]) == (5, 5000)

    # Trim to 2500 bytes: must remove the 3 OLDEST (entry0..2), keep 3/4.
    n, b = trim_cache(max_bytes=2500)
    assert (n, b) == (3, 3000)
    assert sorted(p.name for p in cache.iterdir()) == ["entry3", "entry4"]

    # enable() trims by the env policy (cap ~0 GB -> tiny, evicts to fit).
    monkeypatch.setenv("MMTRAJ_COMPILE_CACHE_MAX_GB", "0.000001")  # 1 kB
    d = enable_compile_cache()
    assert d == str(cache)
    assert [p.name for p in cache.iterdir()] == ["entry4"]

    # MAX_GB=0 disables trimming entirely.
    (cache / "big").write_bytes(b"y" * 10000)
    monkeypatch.setenv("MMTRAJ_COMPILE_CACHE_MAX_GB", "0")
    enable_compile_cache()
    assert (cache / "big").exists()

    n, b = clear_cache()
    assert n == 2 and cache_stats()["entries"] == 0


def test_cli_cache_subcommand(tmp_path, monkeypatch, capsys):
    from mmtraj.cli import main as cli_main

    cache = tmp_path / "xla"
    cache.mkdir()
    (cache / "e1").write_bytes(b"x" * 2048)
    monkeypatch.setenv("MMTRAJ_COMPILE_CACHE", str(cache))
    assert cli_main(["cache"]) == 0
    out = capsys.readouterr().out
    assert str(cache) in out and "entries: 1" in out
    assert cli_main(["cache", "--clear"]) == 0
    out = capsys.readouterr().out
    assert "cleared 1 entries" in out and "entries: 0" in out

